"""Corpus-curation operators for LLM training-data pipelines.

The reference repo stops at search/analytics over a fixed corpus; a
training-data pipeline additionally needs the hygiene passes that run
BEFORE a corpus is trainable. This module adds the standard quartet,
each as a pure Catalyst expression plan (no UDFs, codegen-friendly):

- ``pii_scrub``:        regex redaction of emails / URLs / IPv4 /
                        phone numbers (C4-style cleaning)
- ``decontaminate``:    benchmark n-gram overlap flagging (the GPT-3
                        appendix-C / open-LM-eval decontamination
                        shape: any shared word n-gram taints the doc)
- ``repetition_features``: Gopher-style repetition signals (top-word
                        fraction, duplicate-bigram fraction)
- ``pack_sequences``:   concatenate-then-chunk assignment of documents
                        to fixed token-budget training sequences

Scale notes (why these shapes survive 100 TB):
- pii_scrub is map-only: regexp_replace/regexp_count run inside
  whole-stage codegen, no shuffle, no Python.
- decontaminate broadcasts the BENCHMARK shingle set (benchmarks are
  small — 1e5..1e6 n-grams — by construction), so the corpus is never
  shuffled: scan -> explode -> broadcast-hash-join -> partial-agg by
  doc. The corpus-side explode is bounded by tokens-per-doc.
- repetition_features: duplicate-bigram fraction is computed per-row
  with array ops (zero shuffle); top-word fraction is one
  explode + two partial-aggregable groupBys keyed by doc id — the
  natural parallel key, no skew (each doc is one group).
- pack_sequences shuffles once on the partition column (source/shard)
  and runs an ordered window within it — never a global sort. The
  budget arithmetic is per-row after the running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens

#: Redaction patterns, applied in this order (URLs first so an address
#: inside a URL is consumed by the URL rule when scrubbing). Kept to
#: the Java-regex ∩ RE2 common subset (no lookaround, no backrefs) so
#: the DuckDB oracle can run the byte-identical pattern.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://\S+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str = "text_clean") -> DataFrame:
    """Append per-category PII match counts (on the ORIGINAL text, so
    categories count independently even when spans overlap) and a
    scrubbed ``out_col`` with all four categories replaced in
    ``PII_PATTERNS`` order. Map-only; every expression is JVM-side.
    """
    c = F.col(text_col)
    for name, pat, _ in PII_PATTERNS:
        df = df.withColumn(f"n_{name}", F.regexp_count(c, F.lit(pat)))
    scrubbed = c
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.withColumn(out_col, scrubbed)


def _strict_shingles(tok_col, n: int):
    """n-word shingles with NO short-document fallback: a document with
    fewer than n tokens yields an empty array (decontamination must not
    compare whole short docs against benchmark n-grams — that is a
    different, far looser predicate than the n-gram rule)."""
    return F.when(
        F.size(tok_col) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tok_col) - n),
            lambda i: F.array_join(F.slice(tok_col, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(docs: DataFrame, benchmark: DataFrame, id_col: str,
                  text_col: str, n: int = 8) -> DataFrame:
    """Flag corpus documents sharing any word ``n``-gram with the
    benchmark set. Returns (id_col, n_hits) for contaminated docs only,
    where n_hits counts DISTINCT shared shingles.

    The benchmark side is aggregated to a distinct shingle set and
    broadcast — the corpus (the 100 TB side) is scanned once and never
    shuffled at full width: ``array_distinct`` dedups shingles PER ROW
    before the explode, which makes (id, shingle) globally distinct
    with zero shuffle (cross-doc duplicates differ in id), so the only
    corpus-side exchange is the final per-doc count — and that one is
    keyed by doc id, partial-aggregates map-side, and carries only the
    (tiny) benchmark-hit rows.
    """
    bench_sh = (
        benchmark
        .select(tokens(F.col(text_col)).alias("_tk"))
        .select(F.explode(_strict_shingles(F.col("_tk"), n)).alias("shingle"))
        .distinct()  # benchmark-sized: the small side, fine to shuffle
    )
    corpus_sh = (
        docs
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
        .select(id_col,
                F.explode(F.array_distinct(
                    _strict_shingles(F.col("_tk"), n))).alias("shingle"))
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate_bloom(docs: DataFrame, benchmark: DataFrame, id_col: str,
                        text_col: str, n: int = 8,
                        m_bits: int | None = None,
                        k: int | None = None) -> DataFrame:
    """:func:`decontaminate`, with a broadcast Bloom prefilter on the
    corpus side — SAME result, cheaper 100 TB plan.

    The exact operator ships every shingle of every document into the
    benchmark join probe; almost all of them are clean and get dropped
    ON THE OTHER SIDE of the probe. Here a Bloom filter over the
    benchmark shingles (operators/bloom.py — a few-KiB plan literal,
    k xxhash64 probes + bit tests) runs as a plain WHERE predicate
    right after the corpus-side explode, inside whole-stage codegen:
    ~all clean shingles die in the scan stage, before any join
    machinery. The exact join then removes the false positives, and
    Bloom filters have no false negatives — so the output is
    bit-identical to :func:`decontaminate`, which is exactly what the
    oracle checks.

    Why this matters at 100 TB: when the benchmark is small the exact
    join already broadcasts and the filter merely trims probe volume —
    but when the benchmark shingle set is too big to broadcast, the
    exact path must SHUFFLE the full corpus shingle explosion for a
    sort-merge join, while this path shuffles only the Bloom
    survivors (|contaminated| + FP·|corpus|, with FP sized by
    ``m_bits``/``k``). The filter artifact stays a few MB however big
    the benchmark row count is.
    """
    bench_sh, words = build_decontamination_filter(
        benchmark, text_col, n, m_bits, k)
    return decontaminate_probe(docs, bench_sh, words, id_col, text_col,
                               n, m_bits, k)


def build_decontamination_filter(benchmark: DataFrame, text_col: str,
                                 n: int = 8, m_bits: int | None = None,
                                 k: int | None = None):
    """Build-once half of :func:`decontaminate_bloom`: returns
    (bench_shingles DataFrame, bloom words list). Split out so
    long-lived pipelines (streaming ingest) pay the filter build a
    single time and probe every micro-batch against it."""
    from .bloom import DEFAULT_K, DEFAULT_M_BITS, bloom_build

    m_bits = DEFAULT_M_BITS if m_bits is None else m_bits
    k = DEFAULT_K if k is None else k
    bench_raw = (
        benchmark
        .select(tokens(F.col(text_col)).alias("_tk"))
        .select(F.explode(_strict_shingles(F.col("_tk"), n)).alias("shingle"))
    )
    # bit_or is idempotent -> no distinct() before the build; one
    # shuffle (the m_bits/64-word aggregate), one bounded collect.
    words = bloom_build(bench_raw, "shingle", m_bits, k)
    return bench_raw.distinct(), words


def decontaminate_probe(docs: DataFrame, bench_sh: DataFrame,
                        words: list[int], id_col: str, text_col: str,
                        n: int = 8, m_bits: int | None = None,
                        k: int | None = None) -> DataFrame:
    """Probe half of :func:`decontaminate_bloom`: Bloom-prefilter the
    corpus shingles (codegen WHERE), exact-join the survivors against
    ``bench_sh`` to drop false positives, count distinct hits per doc."""
    from .bloom import DEFAULT_K, DEFAULT_M_BITS, bloom_might_contain

    m_bits = DEFAULT_M_BITS if m_bits is None else m_bits
    k = DEFAULT_K if k is None else k
    corpus_sh = (
        docs
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
        .select(id_col,
                F.explode(F.array_distinct(
                    _strict_shingles(F.col("_tk"), n))).alias("shingle"))
        .where(bloom_might_contain(F.col("shingle"), words, m_bits, k))
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def repetition_features(df: DataFrame, id_col: str,
                        text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``top_word_frac``: frequency of the most common token / total
      tokens (natural-language docs sit well below ~0.1; templated or
      degenerate docs spike).
    - ``dup_2gram_frac``: 1 - distinct/total word bigrams — the
      "fraction of duplicate n-grams" rule, computed entirely per-row
      with array ops (size / array_distinct), no shuffle.

    Only ``top_word_frac`` needs aggregation (explode + groupBy doc,
    word; then max/sum per doc) — both levels partial-aggregate, keyed
    by the document id so there is no skewable hot key.
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
    g2 = _strict_shingles(F.col("_tk"), 2)
    dup = toked.select(
        id_col,
        F.when(F.size(g2) == 0, F.lit(0.0))
        .otherwise(F.round(
            F.lit(1.0) - F.size(F.array_distinct(g2)).cast("double")
            / F.size(g2), 6)).alias("dup_2gram_frac"))
    wc = (
        toked.select(id_col, F.explode("_tk").alias("w"))
        .groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    )
    top = (
        wc.groupBy(id_col)
        .agg(F.round(F.max("c").cast("double") / F.sum("c"), 6)
             .alias("top_word_frac"))
    )
    return top.join(dup, id_col)


def pack_sequences(df: DataFrame, id_col: str, part_col: str,
                   order_col: str, budget: int,
                   text_col: str = "text") -> DataFrame:
    """Assign documents to fixed-budget training sequences with the
    concatenate-then-chunk strategy: within each ``part_col`` shard the
    token stream is laid out in ``order_col`` order and cut every
    ``budget`` tokens; a document starts at its running-sum offset and
    belongs to sequence ``floor(start / budget)`` (it may straddle the
    cut — exactly how block-packed LM training data is built).

    Output: (id, part, n_tok, seq_id, tok_offset). One shuffle on the
    shard column; the window is ordered within shard only, so no
    single-task global sort at any scale — shard granularity (file,
    source, date) is the parallelism knob.

    NULL contract (r14, null-audit class B): ``order_col`` must define
    each document's slot in the stream, so NULL order keys are
    EXCLUDED — they have no deterministic offset (two NULL-key docs
    could land either way around), and Spark (NULLS FIRST) and ANSI
    (NULLS LAST) would stream them through opposite ends of every
    shard, shifting every other document's offsets. An oracle replay
    must carry the same ``IS NOT NULL`` guard. A NULL ``part_col`` is
    one more shard (identical grouping both engines) and a NULL text
    yields NULL n_tok/seq_id for that row alone (sum() skips NULLs in
    both engines).
    """
    w = (Window.partitionBy(part_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ntok = F.size(tokens(F.col(text_col)))
    return (
        df.where(F.col(order_col).isNotNull())
        .select(F.col(id_col), F.col(part_col), ntok.alias("n_tok"),
                F.col(order_col))
        .withColumn("_start", F.sum("n_tok").over(w) - F.col("n_tok"))
        .select(id_col, part_col, "n_tok",
                F.floor(F.col("_start") / budget).alias("seq_id"),
                (F.col("_start") % budget).alias("tok_offset"))
    )


def unit_dedup_stats(df: DataFrame, id_col: str, text_col: str = "text",
                     sep: str = r"\.\s+") -> DataFrame:
    """Corpus-level duplicate-UNIT statistics (Dolma/C4-style
    paragraph- or sentence-level dedup): split each document into
    units on ``sep`` (a Java/RE2-common regex), normalize
    (lower+trim, empties dropped), and flag every unit occurrence
    that is not the globally FIRST occurrence of that unit (first =
    lowest (doc_id, position)).

    Output: (id, n_units, n_dup_units, dup_ratio) per document.

    Scale shape: first-occurrence detection is a ``min(struct(doc,
    pos))`` AGGREGATE keyed by unit — partial aggregation collapses
    each mapper's occurrences of a hot unit to one row, so a
    boilerplate sentence repeated 10^8 times costs its reducer ONE
    row per upstream partition, where the window/row_number
    formulation would sort all 10^8 rows on a single key. The join
    back on unit hits the same partitioning Catalyst just produced
    (exchange reuse), and the final stats aggregate keys by doc id —
    the natural parallel key.
    """
    units = (
        df.select(
            F.col(id_col).alias("_doc"),
            F.posexplode(
                F.filter(
                    F.transform(F.split(F.lower(F.col(text_col)), sep),
                                lambda s: F.trim(s)),
                    lambda s: s != "",
                )
            ).alias("_pos", "_unit"),
        )
    )
    firsts = units.groupBy("_unit").agg(
        F.min(F.struct(F.col("_doc"), F.col("_pos"))).alias("_first"))
    flagged = (
        units.join(firsts, "_unit")
        .select("_doc",
                ((F.col("_first._doc") != F.col("_doc"))
                 | (F.col("_first._pos") != F.col("_pos")))
                .cast("int").alias("_dup"))
    )
    return (
        flagged.groupBy(F.col("_doc").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_units"),
             F.sum("_dup").cast("bigint").alias("n_dup_units"))
        .withColumn("dup_ratio",
                    F.round(F.col("n_dup_units").cast("double")
                            / F.col("n_units").cast("double"), 6))
    )


def chunk_text(df: DataFrame, id_col: str, text_col: str = "text",
               size: int = 32, stride: int = 24) -> DataFrame:
    """Split each document into overlapping token-window chunks with
    provenance — the RAG-indexing / long-document-splitting
    counterpart to ``pack_sequences`` (which assigns whole docs to
    training sequences; this SPLITS one doc into many windows).

    Output: (id, chunk_id, start_tok, n_chunk_toks, chunk_text) —
    chunk i covers tokens [i*stride, i*stride + size); the final
    window may be short; empty documents emit no chunks.

    Entirely map-only (tokenize → per-row start sequence → explode →
    slice/join): no shuffle at any scale, and the explode fan-out per
    row is ceil(n_tok/stride), bounded by document length. The token
    array is materialized before the explode so the higher-order
    slice reads an attribute, not a re-evaluated split (the
    word_shingles lesson, dedup.py).
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
    n = F.size("_tk")
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))) \
              .otherwise(F.array().cast("array<int>"))
    return (
        toked.select(F.col(id_col), "_tk",
                     F.posexplode(starts).alias("chunk_id", "start_tok"))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("bigint"),
            F.col("start_tok").cast("bigint"),
            F.least(F.lit(size), n - F.col("start_tok")).cast("bigint")
            .alias("n_chunk_toks"),
            F.array_join(F.slice("_tk", F.col("start_tok") + 1, size), " ")
            .alias("chunk_text"),
        )
    )


def _win_key(win_col, key_mode: str):
    """Join/aggregate key for one window's text (both span operators).

    - ``xxhash64``: the engine default — fixed 8-byte keys, cheapest
      hash in the JVM, not replayable outside Spark.
    - ``md5``: ``unhex(substr(md5(win), 1, 16))`` — ALSO a fixed
      8-byte key, but spelled from primitives DuckDB shares
      byte-for-byte (md5 hex + unhex), so the cross-engine oracle can
      replay the exact keying (r16; previously the oracle twin joined
      on the RAW ~window-word strings — guide §2.3 "shuffle keys, not
      payloads": at stride 1 the window column is ~8x the corpus, so
      raw-string keys shuffle an order of magnitude more bytes than
      the documents themselves).
    - ``raw``: the window text itself (pre-r16 oracle-twin shape,
      kept for A/B reference).

    Any hash key changes the result only on a 64-bit collision
    between DISTINCT window texts (~n^2/2^65; zero observed across
    sf0.001/0.01/0.1 — outputs byte-identical to raw), and the oracle
    computes the SAME key, so engine and oracle stay in lockstep even
    then.
    """
    if key_mode == "xxhash64":
        return F.xxhash64(win_col)
    if key_mode == "md5":
        return F.unhex(F.substring(F.md5(win_col), 1, 16))
    if key_mode == "raw":
        return win_col
    raise ValueError(f"unknown key_mode: {key_mode!r}")


def duplicated_spans(df: DataFrame, id_col: str, text_col: str = "text",
                     window: int = 8, key_mode: str = "xxhash64") -> DataFrame:
    """ExactSubstr-style duplicated-span statistics (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): flag
    every fixed-length token window whose exact text occurs earlier in
    the corpus (earlier = lower (doc, pos)), and report, per document,
    how many tokens sit inside at least one such duplicated window —
    the span mass an ExactSubstr cut pass would remove.

    The paper builds a corpus-wide suffix array, which has no
    distributed analogue; stride-1 windows of length ``window`` are
    the Spark-natural approximation. It is EXACT for the question
    "which maximal duplicated substrings of >= window tokens exist"
    (any such substring is a run of duplicated windows, and the merged
    coverage arithmetic below reconstructs the run's length); shorter
    duplicates are deliberately ignored, matching the paper's
    min-match-length knob.

    Output: (id, n_tok, n_dup_windows, n_dup_tokens, dup_tok_ratio).

    Scale shape, stage by stage:
    - windows: map-only explode, fan-out = tokens per doc (identical
      to chunk_text at stride 1) — no shuffle;
    - first-occurrence: the min(struct(doc,pos)) AGGREGATE keyed by
      window (the unit_dedup_stats shape) — map-side partials collapse
      a 10^8-copy boilerplate window to one row per upstream
      partition, where a row_number window would sort all copies on
      one key. The flag join back reuses the partitioning Catalyst
      just produced (exchange reuse), and fan-out per hot key is
      occurrences x 1 (firsts is unique per key) — never d^2;
    - coverage: merged-interval LENGTH without materializing
      intervals: for dup window starts sorted per doc, each start
      covers min(window, next_start - start) new tokens (the last
      covers window). One lead() window partitioned BY DOC — the
      natural parallel key, no skew.

    ``key_mode`` picks the join/aggregate key — always a fixed 8-byte
    hash in production ("xxhash64" engine default, "md5" when the
    DuckDB oracle must replay the keying byte-for-byte); see
    ``_win_key``. Either way the shuffle carries 8-byte keys instead
    of ~window-word strings — the difference between shuffling ~8x
    the corpus and ~1/8 of it at 100 TB.
    """
    toked = df.select(F.col(id_col).alias("_doc"),
                      tokens(F.col(text_col)).alias("_tk"))
    n = F.size("_tk")
    wins = (
        toked.where(n >= window)
        .select("_doc", F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n - window),
                lambda s: F.array_join(
                    F.slice("_tk", s + 1, window), " "))).alias("_pos", "_win"))
    )
    wins = wins.select("_doc", "_pos",
                       _win_key(F.col("_win"), key_mode).alias("_key"))
    firsts = wins.groupBy("_key").agg(
        F.min(F.struct(F.col("_doc"), F.col("_pos"))).alias("_first"))
    # NULL contract (r15, sf0.1 stress audit): the flag predicate must
    # be null-SAFE — with a NULL id in the corpus, min(struct) ranks
    # it smallest, and a plain != against the NULL winner goes
    # three-valued, silently UNFLAGGING every true duplicate of that
    # window. eqNullSafe keeps the flagging total whatever ids hold.
    is_first = (F.col("_first._doc").eqNullSafe(F.col("_doc"))
                & F.col("_first._pos").eqNullSafe(F.col("_pos")))
    flagged = (
        wins.join(firsts, "_key")
        .where(~is_first)
        .select("_doc", F.col("_pos").alias("_s"))
    )
    nxt = F.lead("_s").over(Window.partitionBy("_doc").orderBy("_s"))
    cov = (
        flagged.withColumn(
            "_c", F.when(nxt.isNull(), F.lit(window))
                   .otherwise(F.least(F.lit(window), nxt - F.col("_s"))))
        .groupBy("_doc")
        .agg(F.count(F.lit(1)).alias("_ndw"), F.sum("_c").alias("_ndt"))
    )
    return (
        toked.select("_doc", n.alias("_n")).join(cov, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.col("_n").cast("bigint").alias("n_tok"),
            F.coalesce("_ndw", F.lit(0)).cast("bigint").alias("n_dup_windows"),
            F.coalesce("_ndt", F.lit(0)).cast("bigint").alias("n_dup_tokens"),
            F.round(F.coalesce("_ndt", F.lit(0)).cast("double")
                    / F.col("_n").cast("double"), 6).alias("dup_tok_ratio"),
        )
    )


def cut_duplicated_spans(df: DataFrame, id_col: str, text_col: str = "text",
                         window: int = 8,
                         key_mode: str = "xxhash64") -> DataFrame:
    """The ACTIONABLE form of ``duplicated_spans``: actually remove
    every token covered by a duplicated window occurrence (global
    first occurrences stay — one copy of each substring survives, the
    Lee et al. ExactSubstr cut) and re-emit the cleaned text.

    Output: (id, n_tok, n_removed, clean_text); documents with nothing
    to cut pass through intact.

    Scale shape: same window/first-occurrence machinery as
    ``duplicated_spans`` (map-side min(struct), occurrences x 1 join
    fan-out); the cut itself aggregates each doc's flagged starts into
    ONE array row (state bounded by the doc's own length, like the
    token array) and applies the mask as a Catalyst filter-exists
    expression — per-doc work is O(n_tok x n_flagged) with no
    additional shuffle beyond the doc-keyed aggregate.
    """
    toked = df.select(F.col(id_col).alias("_doc"),
                      tokens(F.col(text_col)).alias("_tk"))
    n = F.size("_tk")
    wins = (
        toked.where(n >= window)
        .select("_doc", F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n - window),
                lambda s: F.array_join(
                    F.slice("_tk", s + 1, window), " "))).alias("_pos", "_win"))
    )
    wins = wins.select("_doc", "_pos",
                       _win_key(F.col("_win"), key_mode).alias("_key"))
    firsts = wins.groupBy("_key").agg(
        F.min(F.struct(F.col("_doc"), F.col("_pos"))).alias("_first"))
    # null-SAFE first-occurrence test — see duplicated_spans (a plain
    # != against a NULL-id min(struct) winner silently unflags).
    is_first = (F.col("_first._doc").eqNullSafe(F.col("_doc"))
                & F.col("_first._pos").eqNullSafe(F.col("_pos")))
    starts = (
        wins.join(firsts, "_key")
        .where(~is_first)
        .groupBy("_doc")
        .agg(F.sort_array(F.collect_list("_pos")).alias("_ss"))
    )
    ss = F.coalesce(F.col("_ss"), F.array().cast("array<int>"))
    covered = lambda i: F.exists(  # noqa: E731
        ss, lambda s: (s <= i) & (i < s + window))
    # guard: sequence(0, -1) would DESCEND for an empty doc
    kept = F.when(n > 0, F.filter(F.sequence(F.lit(0), n - 1),
                                  lambda i: ~covered(i))) \
            .otherwise(F.array().cast("array<int>"))
    return (
        toked.join(starts, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            n.cast("bigint").alias("n_tok"),
            (n - F.size(kept)).cast("bigint").alias("n_removed"),
            F.array_join(
                F.transform(kept, lambda i: F.element_at("_tk", i + 1)),
                " ").alias("clean_text"),
        )
    )
