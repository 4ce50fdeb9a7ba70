"""Byte-pair-encoding tokenizer training, Spark-first.

The canonical BPE recipe (Sennrich et al. 2016, the tokenizer-training
prep step of every LLM data pipeline), restructured around the one
insight that makes it cluster-cheap: merges are learned over the WORD
FREQUENCY TABLE, not the corpus. One corpus-wide aggregate produces
(word, count); every subsequent round touches only that vocabulary-
sized table — pair counting is a partial-agg shuffle over word types
weighted by frequency, the argmax pair is a TakeOrderedAndProject, and
the merge application is a map-only fold. The corpus itself is read
exactly once regardless of the number of merges.

Driver traffic: ONE row per merge round (the winning pair) — the same
bounded-collect contract as the k-means trainer. Lineage is truncated
per round with localCheckpoint so the plan doesn't nest ``num_merges``
aggregates deep.

Greedy left-to-right merge application is a Catalyst ``aggregate``
fold over the symbol array (no UDF): the accumulator appends each
symbol, merging it into the previous slot when (prev, cur) equals the
learned pair — the exact semantics of the reference implementation's
sequential scan, because a symbol produced by a merge in THIS round
can't be merged again this round (its text no longer equals the pair's
left side... unless it legitimately does, e.g. (a,a) on "a a a a",
where greedy left-to-right is precisely what the fold computes).

Determinism: pair ties break lexicographically (count desc, a asc,
b asc), so the merge sequence is a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens

#: End-of-word sentinel (kept out of the char alphabet by using a
#: multi-char marker, as in the original BPE paper).
EOW = "</w>"


def _word_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """(sym: array<string>, cnt) — one row per distinct word, symbols =
    its characters plus the end-of-word marker."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(F.filter(F.split(F.col("w"), ""),
                              lambda c: c != ""),
                     F.array(F.lit(EOW))).alias("sym"),
            "cnt")
    )


def _adjacent_pairs(syms: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent symbol pairs over the word table."""
    n = F.size("sym")
    return (
        syms.where(n >= 2)
        .select("cnt", F.explode(F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at("sym", i + 1).alias("a"),
                F.element_at("sym", i + 2).alias("b")))).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("n"))
    )


def _apply_merge(sym: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b — a pure
    Catalyst fold (see module docstring for why greedy is exact)."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(a + b)))
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(df: DataFrame, text_col: str = "text",
              num_merges: int = 32,
              min_pair_count: int = 2,
              strategy: str = "auto",
              max_driver_vocab: int = 2_000_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list — the tokenizer artifact ``bpe_encode`` (and
    any external BPE implementation) consumes.

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (merging hapax pairs only memorizes
    noise). At 100 TB, train on a content-addressed sample
    (sampling.split_assign) — the merge table saturates long before
    the full corpus is needed; the algorithm itself only ever
    re-scans the word-frequency table.

    ``strategy`` picks where the merge loop runs; both paths produce
    the IDENTICAL merge list (same counts, same tie-break; asserted
    against each other in tests):

    - ``"driver"``: ONE corpus-wide word-count shuffle, collect the
      (word, count) table, run the merge rounds in plain Python —
      the classic trainer shape (HF tokenizers / sentencepiece train
      on exactly this aggregate). The collect is Heaps-law bounded
      (word TYPES grow ~O(corpus^0.5), ≈10M types for 100 TB of
      natural language — tens of MB), not corpus-sized; 16 driver
      rounds of Spark job scheduling + codegen per unique merge
      literal would cost more than the whole collect.
    - ``"distributed"``: every round is a vocabulary-sized partial-agg
      shuffle + 1-row collect + map-only fold. The path for corpora
      whose TYPE table itself breaks the driver (adversarial/non-NL
      bytes where Heaps' law fails).
    - ``"auto"`` (default): count word types first; driver path iff
      ``<= max_driver_vocab``.
    """
    syms = _word_symbols(df, text_col).localCheckpoint()
    if strategy == "auto":
        strategy = ("driver" if syms.count() <= max_driver_vocab
                    else "distributed")
    if strategy == "driver":
        rows = syms.collect()           # bounded: word TYPES, not corpus
        return _train_local([(list(r["sym"]), r["cnt"]) for r in rows],
                            num_merges, min_pair_count)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = (_adjacent_pairs(syms)
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1).collect())          # bounded: one row / round
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        syms = syms.select(_apply_merge(F.col("sym"), a, b).alias("sym"),
                           "cnt").localCheckpoint()
    return merges


def _train_local(vocab: list[tuple[list[str], int]], num_merges: int,
                 min_pair_count: int) -> list[tuple[str, str]]:
    """The merge loop over an in-memory (symbols, count) word table —
    byte-for-byte the semantics of the distributed rounds: frequency-
    weighted adjacent pair counts, argmax by (count desc, a asc,
    b asc), greedy left-to-right application, early stop below
    ``min_pair_count``."""
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, cnt in vocab:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (a, b), n = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        for sym, _ in vocab:
            out: list[str] = []
            for x in sym:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            sym[:] = out
    return merges


def _esc_str(s: str) -> str:
    """Escape the bracket-structure metacharacters in a symbol text."""
    return (s.replace("\\", "\\\\")
            .replace("[", "\\[").replace("]", "\\]"))


def _esc_char(c: Column) -> Column:
    return (F.when(c == "\\", F.lit("\\\\"))
            .when(c == "[", F.lit("\\["))
            .when(c == "]", F.lit("\\]"))
            .otherwise(c))


def _unesc(s: Column) -> Column:
    # Escaped text is a sequence of units {'\\\\', '\\[', '\\]', c};
    # leftmost-first replacement in this order only ever matches
    # whole units (a raw '[' / ']' cannot precede its own unescape
    # pass, and after the bracket passes every remaining backslash
    # belongs to a '\\\\' pair), so the chain is unambiguous.
    s = F.replace(s, F.lit("\\["), F.lit("["))
    s = F.replace(s, F.lit("\\]"), F.lit("]"))
    return F.replace(s, F.lit("\\\\"), F.lit("\\"))


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id",
               text_col: str = "text",
               impl: str = "replace") -> DataFrame:
    """Tokenize documents with a learned merge list: chars+EOW per
    word, merges applied in learned order — map-only (the merge list
    is a plan constant), fan-out bounded by words per doc.

    Output: (id, word_idx, subwords array<string>, n_subwords).

    ``impl="replace"`` (default) runs each word as a bracketed symbol
    STRING (``[l][o][w][</w>]``, metacharacters escaped) and applies
    each merge as one literal ``replace(s, '[a][b]', '[ab]')`` —
    leftmost non-overlapping replacement IS the greedy left-to-right
    merge (the scan resumes past each new token, which can therefore
    never re-merge within its own round — exactly the fold's rule).
    ``impl="fold"`` is the direct ``aggregate``-fold transcription of
    that rule, kept as the executable semantics spec: equivalence is
    asserted in tests, but 2·len array copies per element make the
    nested folds ~20x slower per merge, and Catalyst's nested-HOF
    analysis cost grows with the merge count.
    """
    words = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("word_idx", "_w"))
    chars = F.filter(F.split(F.col("_w"), ""), lambda c: c != "")
    if impl == "fold":
        sym = F.concat(chars, F.array(F.lit(EOW)))
        for a, b in merges:
            sym = _apply_merge(sym, a, b)
    elif impl == "replace":
        s = F.concat(F.lit("["),
                     F.array_join(F.transform(chars, _esc_char), "]["),
                     F.lit("][" + _esc_str(EOW) + "]"))
        for a, b in merges:
            ea, eb = _esc_str(a), _esc_str(b)
            s = F.replace(s, F.lit(f"[{ea}][{eb}]"),
                          F.lit(f"[{ea}{eb}]"))
        inner = F.regexp_replace(s, r"^\[|\]$", "")
        sym = F.transform(F.split(inner, r"\]\["), _unesc)
    else:
        raise ValueError(f"unknown impl {impl!r}")
    return words.select(
        id_col, "word_idx", sym.alias("subwords"),
        F.size(sym).cast("bigint").alias("n_subwords"))
