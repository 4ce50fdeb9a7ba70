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
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list — the tokenizer artifact ``bpe_encode`` (and
    any external BPE implementation) consumes.

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (merging hapax pairs only memorizes
    noise). At 100 TB, train on a content-addressed sample
    (sampling.split_assign) — the merge table saturates long before
    the full corpus is needed; the algorithm itself only ever
    re-scans the word-frequency table.
    """
    syms = _word_symbols(df, text_col).localCheckpoint()
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


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Tokenize documents with a learned merge list: chars+EOW per
    word, merges applied in learned order — map-only (the merge list
    is a plan constant), fan-out bounded by words per doc.

    Output: (id, word_idx, subwords array<string>, n_subwords)."""
    words = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("word_idx", "_w"))
    sym = F.concat(F.filter(F.split(F.col("_w"), ""), lambda c: c != ""),
                   F.array(F.lit(EOW)))
    for a, b in merges:
        sym = _apply_merge(sym, a, b)
    return words.select(
        id_col, "word_idx", sym.alias("subwords"),
        F.size(sym).cast("bigint").alias("n_subwords"))
