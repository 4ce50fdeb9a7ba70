"""Corpus-curation and LM-scoring tiers: curation pipeline, chunking, ExactSubstr spans, unigram/bigram LM, NB classifier, hash-BoW, CSV/JSON scalar suites, window suites, clustering, canonicalization, corpus splits, Q18, knn join, snapshot diff.

Split from the monolithic ``catalog.py`` (round 7): registration side
effects only — every query lands in ``catalog.QUERIES`` /
``catalog.ORACLES`` via the shared :func:`~.catalog.register`
decorator, and the public surface is still
``twitter_analysis_spark.catalog``. No behavior change; the split is
review / merge-conflict surface only.
"""

from __future__ import annotations

import os  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .catalog import (FIXTURE_TWEETS, ORACLES, QUERIES,  # noqa: F401
                      _SH_CAPPED_SQL, _SHINGLES_SQL, _TOKS_SQL, _t,
                      maybe_broadcast, register)
from .operators import dedup as _dedup  # noqa: F401
from .operators import multimodal as _mm  # noqa: F401
from .operators import similarity as _sim  # noqa: F401
from .operators import textstats as _ts  # noqa: F401
from .operators import curation as _cur  # noqa: F401
from .operators import linkage as _lk  # noqa: F401
from .operators import rollup as _roll  # noqa: F401

# ---------------------------------------------------------------------------
# Composite: the training-data curation pipeline end-to-end — quality
# gate + near-duplicate removal in one declarative plan. This is the
# 100 TB use-case the extension operators exist for; each stage is
# itself oracle-checked above, and the composition is oracle-checked
# here (CTEs reuse the exact per-stage SQL).
# ---------------------------------------------------------------------------

def _build_curate_oracle() -> str:
    feat = ORACLES["text_quality_features"].strip()
    pairs = ORACLES["dedup_ngram_jaccard"].strip()
    return f"""
    SELECT f.doc_id, f.n_tokens, f.quality_score
    FROM ({feat}) f
    WHERE f.doc_id IS NOT NULL
      AND f.quality_score >= 0.4 AND f.n_tokens >= 5
      AND f.doc_id NOT IN (SELECT id2 FROM ({pairs}) p)
    """



@register("corpus_curation", None)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keep documents that (a) clear the heuristic quality gate and
    # (b) are not the higher-id member of any near-duplicate pair
    # (lowest id survives, the standard web-dedup convention). The
    # near-dup set is the exact Jaccard operator; swapping in
    # dedup_minhash_lsh turns this into the sub-quadratic 100 TB plan
    # with identical survivor semantics on the verified pairs.
    # NULL contract (r14, class D): a curated document needs an
    # identity — the oracle's NOT IN goes three-valued on a NULL
    # doc_id (dropping it) while the left-anti join keeps it; the
    # exclusion is explicit on both sides.
    docs = (_t(spark, sf_dir, "documents")
            .where(F.col("doc_id").isNotNull()))
    feat = _ts.quality_features(docs.select("doc_id", "text")).drop("text")
    # Deliberately NO cleanup list: this row is one of the three the
    # shingle-cap plan pin greps (tests/test_plans.py — the cap must
    # stay visible in the returned lazy plan), so the persisted index
    # follows the documented leak-until-clearCache contract instead
    # of a materialize-then-release that would collapse the plan.
    pairs = _dedup.ngram_jaccard_pairs(docs, "doc_id", "text",
                                       n=3, threshold=0.1)
    dups = pairs.select(F.col("id2").alias("doc_id")).distinct()
    return (
        feat.where((F.col("quality_score") >= 0.4) & (F.col("n_tokens") >= 5))
        .join(dups, "doc_id", "left_anti")
        .select("doc_id", "n_tokens", "quality_score")
    )


ORACLES["corpus_curation"] = _build_curate_oracle()


@register(
    "text_chunk_windows",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             unnest(CASE WHEN len(tk) > 0
               THEN [{{'chunk_id': CAST((s / 24) AS BIGINT),
                      'start_tok': CAST(s AS BIGINT),
                      'n_chunk_toks': CAST(least(32, len(tk) - s) AS BIGINT),
                      'chunk_text': array_to_string(tk[s+1:s+32], ' ')}}
                     for s in generate_series(0, len(tk) - 1, 24)]
               ELSE [] END, recursive := true)
      FROM toks
    )
    SELECT doc_id, chunk_id, start_tok, n_chunk_toks, chunk_text
    FROM chunks
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Overlapping token-window chunking (size 32, stride 24) with
    # provenance — curation.chunk_text. Map-only: the plan is scan →
    # tokenize → per-row explode, zero shuffles (the oracle hash-match
    # covers window boundaries, the short final window, and the
    # chunk-id/offset arithmetic).
    return _cur.chunk_text(_t(spark, sf_dir, "documents"), "doc_id",
                           size=32, stride=24)


@register(
    "text_unit_dedup",
    r"""
    WITH arr AS (
      SELECT doc_id, list_filter(list_transform(
               string_split_regex(lower(replace(text, ' a ', '. ')),
                                  '\.\s+'),
               s -> trim(s)), s -> s <> '') AS us
      FROM documents WHERE doc_id IS NOT NULL
    ),
    units AS (
      SELECT doc_id,
             unnest([{'pos': i-1, 'u': us[i]}
                     for i in generate_series(1, len(us))],
                    recursive := true)
      FROM arr
    ),
    flagged AS (
      SELECT doc_id,
             CASE WHEN row_number() OVER (PARTITION BY u
                                          ORDER BY doc_id, pos) > 1
                  THEN 1 ELSE 0 END AS dup
      FROM units
    )
    SELECT doc_id, count(*) AS n_units,
           CAST(sum(dup) AS BIGINT) AS n_dup_units,
           round(sum(dup)::DOUBLE / count(*), 6) AS dup_ratio
    FROM flagged GROUP BY doc_id
    """,
)
def text_unit_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus-level duplicate-unit statistics (Dolma/C4-style paragraph
    # dedup, curation.unit_dedup_stats). The synthetic corpus has no
    # sentence punctuation, so the catalog adapter synthesizes unit
    # boundaries by rewriting the filler token ' a ' to '. ' —
    # IDENTICALLY on both engines — before the real operator runs;
    # on a real corpus the operator consumes natural sentence/
    # paragraph breaks directly (planted-fixture tests cover that
    # path). First-occurrence detection is a min(struct) aggregate,
    # not a window — the skew-safe 100 TB shape (see operator doc).
    # NULL contract (r14, class A): first-occurrence order is keyed
    # by (doc_id, pos), so a NULL doc id has no position in it (Spark's
    # min(struct) ranks NULL smallest, ANSI row_number NULLS LAST ranks
    # it last — opposite winners); NULL ids are excluded both sides.
    docs = (_t(spark, sf_dir, "documents")
            .where(F.col("doc_id").isNotNull()))
    adapted = docs.select(
        "doc_id", F.regexp_replace("text", " a ", ". ").alias("text"))
    return _cur.unit_dedup_stats(adapted, "doc_id", "text")


@register(
    "text_dup_spans",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
               WHERE doc_id IS NOT NULL),
    wins AS (
      SELECT doc_id,
             unnest(CASE WHEN len(tk) >= 8 THEN
               [{{'pos': i-1, 'k': unhex(substr(md5(
                      array_to_string(tk[i:i+7], ' ')), 1, 16))}}
                for i in generate_series(1, len(tk) - 7)] ELSE [] END,
               recursive := true)
      FROM t),
    fl AS (
      SELECT doc_id, pos
      FROM (SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY k
                                      ORDER BY doc_id, pos) AS rn
            FROM wins)
      WHERE rn > 1),
    cov AS (
      SELECT doc_id, count(*) AS ndw,
             sum(CASE WHEN nxt IS NULL THEN 8
                      ELSE least(8, nxt - pos) END) AS ndt
      FROM (SELECT doc_id, pos,
                   lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
            FROM fl)
      GROUP BY doc_id)
    SELECT t.doc_id, CAST(len(tk) AS BIGINT) AS n_tok,
           CAST(COALESCE(ndw, 0) AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(ndt, 0) AS BIGINT) AS n_dup_tokens,
           round(COALESCE(ndt, 0)::DOUBLE / len(tk), 6) AS dup_tok_ratio
    FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
    """,
)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ExactSubstr-style duplicated-span statistics (Lee et al. 2021;
    # curation.duplicated_spans): stride-1 8-token windows, global
    # first-occurrence flagging via the skew-safe min(struct)
    # aggregate, merged-coverage token counts per document. Keys are
    # 8-byte md5-derived hashes (r16: unhex(substr(md5(win),1,16)),
    # spelled IDENTICALLY in the oracle so DuckDB still replays the
    # whole pipeline including the keying — previously raw window
    # strings, i.e. ~8x-the-corpus shuffle keys; outputs verified
    # byte-identical to the raw-key formulation at sf0.001/0.01/0.1,
    # and engine/oracle agree even under a hash collision because
    # both compute the same key). The oracle's row_number formulation
    # is flag-equivalent to min(struct) and fine at oracle scale; the
    # xxhash64 engine default is benched as text_dup_spans_xxhash64.
    # NULL contract (r15, sf0.1 stress audit — the text_unit_dedup
    # r14 class these sibling rows missed): first-occurrence order is
    # keyed by (doc_id, pos), so a NULL id has no position in it
    # (Spark's min(struct) ranks it smallest, ANSI row_number NULLS
    # LAST ranks it last — opposite winners); excluded both sides.
    return _cur.duplicated_spans(
        _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull()),
        "doc_id", "text", window=8, key_mode="md5")


@register(
    "text_cut_dup_spans",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
               WHERE doc_id IS NOT NULL),
    wins AS (
      SELECT doc_id,
             unnest(CASE WHEN len(tk) >= 8 THEN
               [{{'pos': i-1, 'k': unhex(substr(md5(
                      array_to_string(tk[i:i+7], ' ')), 1, 16))}}
                for i in generate_series(1, len(tk) - 7)] ELSE [] END,
               recursive := true)
      FROM t),
    fl AS (
      SELECT doc_id, pos
      FROM (SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY k
                                      ORDER BY doc_id, pos) AS rn
            FROM wins)
      WHERE rn > 1),
    ss AS (SELECT doc_id, list(pos ORDER BY pos) AS s
           FROM fl GROUP BY doc_id),
    cut AS (
      SELECT t.doc_id, tk,
             [tk[i+1] for i in generate_series(0, len(tk)-1)
              if len(list_filter(COALESCE(s, []),
                                 x -> x <= i AND i < x + 8)) = 0] AS kept
      FROM t LEFT JOIN ss ON t.doc_id = ss.doc_id)
    SELECT doc_id,
           CAST(len(tk) AS BIGINT) AS n_tok,
           CAST(len(tk) - len(kept) AS BIGINT) AS n_removed,
           -- DuckDB's array_to_string([]) is NULL; Spark's is ''
           COALESCE(array_to_string(kept, ' '), '') AS clean_text
    FROM cut
    """,
)
def text_cut_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The ExactSubstr CUT (curation.cut_duplicated_spans): duplicated
    # 8-token window occurrences are removed from the text (global
    # first occurrences survive), re-emitting the cleaned corpus. The
    # oracle replays window flagging AND the mask-reconstruction of
    # clean_text token-for-token. 8-byte md5-derived keys spelled
    # identically in the oracle (r16 — see text_dup_spans; previously
    # raw window strings); engine default is xxhash64 as there.
    # NULL contract (r15): same (doc_id, pos) first-occurrence order
    # as text_dup_spans — NULL ids excluded both sides.
    return _cur.cut_duplicated_spans(
        _t(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull()),
        "doc_id", "text", window=8, key_mode="md5")


@register(
    "text_unigram_xent",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
    m AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    st AS (SELECT sum(c) AS n, count(*) AS v FROM m)
    SELECT doc_id,
           count(*) AS n_tok,
           CAST(0 AS BIGINT) AS n_oov,
           round(sum(-ln((c + 1)::DOUBLE / (n + v + 1)::DOUBLE))
                 / count(*), 6) AS xent
    FROM toks JOIN m USING (tok), st
    GROUP BY doc_id
    """,
)
def text_unigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CCNet/KenLM-style perplexity quality filter at unigram order
    # (textstats.unigram_lm_xent): per-document cross-entropy under a
    # Laplace-smoothed global unigram LM, self-trained on the corpus
    # (so n_oov = 0 here; the held-out-model path with real OOV mass
    # is covered by planted-fixture tests). Both engines compute
    # -ln((c+1)/(N+V+1)) in the same expression shape; the per-doc sum
    # is rounded at 1e-6, far above ln's cross-libm ulp noise.
    docs = _t(spark, sf_dir, "documents")
    return _ts.unigram_lm_xent(docs, "doc_id", "text")


@register(
    "text_vocab_coverage",
    f"""
    WITH toks AS (SELECT unnest({_TOKS_SQL}) AS tok FROM documents),
    m AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT sum(c) AS t FROM m),
    top AS (SELECT tok, c FROM m ORDER BY c DESC, tok LIMIT 100)
    SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS INT) AS rank,
           tok, c,
           round(CAST(sum(c) OVER (ORDER BY c DESC, tok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / t::DOUBLE, 6) AS coverage
    FROM top, tot
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tokenizer-prep vocabulary table (textstats.vocab_topk): top-100
    # tokens by corpus frequency with cumulative coverage fraction.
    # The ordered window runs AFTER the top-k cut (the q11 pattern —
    # global windows are fine on provably tiny inputs); ties break by
    # token so both engines produce one canonical ranking.
    docs = _t(spark, sf_dir, "documents")
    return _ts.vocab_topk(docs, k=100, text_col="text")


def _nb_classifier_oracle() -> str:
    feat = ORACLES["text_quality_features"].strip()
    return f"""
    WITH lab AS (
      SELECT f.doc_id, d.text,
             CASE WHEN f.quality_score >= 0.5 THEN 1 ELSE 0 END AS y
      FROM ({feat}) f JOIN documents d USING (doc_id)
      WHERE f.doc_id IS NOT NULL),
    occ AS (SELECT doc_id, y, unnest({_TOKS_SQL}) AS tok FROM lab),
    cnt AS (SELECT tok, sum(y) AS c1, sum(1 - y) AS c0
            FROM occ GROUP BY tok),
    st AS (SELECT sum(c1) AS n1, sum(c0) AS n0, count(*) AS v FROM cnt),
    pr AS (SELECT sum(y) AS d1, sum(1 - y) AS d0 FROM lab),
    scored AS (
      SELECT occ.doc_id, count(*) AS n_tok,
             round(ln((d1 + 1)::DOUBLE / (d0 + 1)::DOUBLE)
                   + sum(ln((c1 + 1)::DOUBLE / (n1 + v)::DOUBLE)
                         - ln((c0 + 1)::DOUBLE / (n0 + v)::DOUBLE)),
                   6) AS nb_score
      FROM occ JOIN cnt USING (tok), st, pr
      GROUP BY occ.doc_id, d1, d0)
    SELECT doc_id, n_tok, nb_score, nb_score > 0 AS pred FROM scored
    """


@register("text_nb_classifier", _nb_classifier_oracle())
def text_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Learned quality filter, GPT-3/CC-net shape (textstats.
    # nb_quality_classifier): multinomial Naive Bayes trained on the
    # heuristic quality_score >= 0.5 weak labels, scoring every doc's
    # log-odds of "high quality". The oracle retrains from scratch —
    # labels, token-class counts, smoothing, prior — and replays the
    # identical ln arithmetic (rounded at 1e-6, far above cross-libm
    # ulp noise). NULL contract (r14, class A): a training example
    # needs a doc identity — the oracle's USING join silently drops
    # NULL ids while the engine-side trainer (no join) kept them; the
    # exclusion is now explicit on both sides. NULL text stays: it
    # yields zero tokens and a label-0 prior row, identically.
    docs = _t(spark, sf_dir, "documents") \
        .where(F.col("doc_id").isNotNull())
    return _ts.nb_quality_classifier(docs, "doc_id", "text")


def _budget_select_oracle(budget: int) -> str:
    feat = ORACLES["text_quality_features"].strip()
    return f"""
    WITH r AS (
      SELECT doc_id, quality_score AS quality,
             CAST(n_tokens AS BIGINT) AS n_tok,
             sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
      FROM ({feat}))
    SELECT doc_id, quality, n_tok FROM r WHERE cum <= {budget}
    """


@register("corpus_budget_select", _budget_select_oracle(10_000))
def corpus_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Greedy best-tokens-under-budget cut (operators/sampling.py:
    # select_within_budget): highest quality first, 10k-token budget.
    # The oracle is the NAIVE global cumsum formulation; the engine's
    # two-phase plan (cumsum over bounded per-quality aggregates +
    # one boundary-group window) is proved equivalent by the hash.
    docs = _t(spark, sf_dir, "documents")
    feats = (_ts.quality_features(docs.select("doc_id", "text"))
             .select("doc_id", "quality_score", "n_tokens"))
    from .operators.sampling import select_within_budget
    return select_within_budget(feats, "doc_id", "quality_score",
                                "n_tokens", budget=10_000)


def _corpus_report_oracle() -> str:
    feat = ORACLES["text_quality_features"].strip()
    return f"""
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(f.n_tokens) AS BIGINT) AS n_tokens,
           CAST(min(f.n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(f.n_tokens) AS BIGINT) AS max_tokens,
           round(CAST(sum(CAST(round(f.quality_score * 1000000)
                               AS BIGINT)) AS DOUBLE)
                 / (count(*) * 1000000.0), 6) AS mean_quality,
           count(DISTINCT d.lang) AS n_langs
    FROM documents d JOIN ({feat}) f USING (doc_id)
    GROUP BY d.source
    """


@register("corpus_report", _corpus_report_oracle())
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-source corpus card (the dataset-documentation stats a
    # training run records next to the data): doc/token counts, token
    # range, mean quality, language cardinality. The quality mean is
    # an exact integer sum of 1e6-quantized scores divided once (the
    # sim_kmeans_ivf device), so no float reduction is
    # order-dependent. One partial-agg shuffle keyed by source.
    docs = _t(spark, sf_dir, "documents")
    feats = _ts.quality_features(docs.select("doc_id", "text")) \
        .select("doc_id", "n_tokens", "quality_score")
    n = F.count(F.lit(1))
    qsum = F.sum(F.round(F.col("quality_score") * F.lit(1000000.0))
                 .cast("long"))
    return (
        docs.select("doc_id", "source", "lang")
        .join(feats, "doc_id")
        .groupBy("source")
        .agg(n.alias("n_docs"),
             F.sum("n_tokens").cast("bigint").alias("n_tokens"),
             F.min("n_tokens").cast("bigint").alias("min_tokens"),
             F.max("n_tokens").cast("bigint").alias("max_tokens"),
             F.round(qsum.cast("double") / (n * F.lit(1000000.0)), 6)
             .alias("mean_quality"),
             F.countDistinct("lang").alias("n_langs"))
    )


ORACLE_BIGRAM_LM = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    occ_t AS (
      SELECT doc_id, unnest([{{'pos': i-1, 'tok': tk[i],
               'prev': CASE WHEN i > 1 THEN tk[i-1] END}}
              for i in generate_series(1, len(tk))], recursive := true)
      FROM t WHERE doc_id % 2 = 0),
    uni AS (SELECT tok, count(*) AS c1 FROM occ_t GROUP BY tok),
    st AS (SELECT sum(c1) AS n, count(*) AS v FROM uni),
    big AS (SELECT prev, tok, count(*) AS c2 FROM occ_t
            WHERE prev IS NOT NULL GROUP BY prev, tok),
    ctx AS (SELECT prev, count(*) AS cc FROM occ_t
            WHERE prev IS NOT NULL GROUP BY prev),
    occ_s AS (
      SELECT doc_id, unnest([{{'pos': i-1, 'tok': tk[i],
               'prev': CASE WHEN i > 1 THEN tk[i-1] END}}
              for i in generate_series(1, len(tk))], recursive := true)
      FROM t WHERE doc_id % 2 = 1)
    SELECT o.doc_id, count(*) AS n_tok,
           CAST(sum(CASE WHEN o.prev IS NOT NULL AND big.c2 IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
           round(sum(CASE
             WHEN o.prev IS NULL THEN
               -ln((COALESCE(uni.c1, 0) + 1)::DOUBLE / (n + v + 1)::DOUBLE)
             WHEN big.c2 IS NOT NULL THEN
               -ln(big.c2::DOUBLE / ctx.cc::DOUBLE)
             ELSE
               -ln(0.4 * ((COALESCE(uni.c1, 0) + 1)::DOUBLE
                          / (n + v + 1)::DOUBLE))
           END) / count(*), 6) AS xent
    FROM occ_s o
    LEFT JOIN big ON o.prev = big.prev AND o.tok = big.tok
    LEFT JOIN ctx ON o.prev = ctx.prev
    LEFT JOIN uni ON o.tok = uni.tok, st
    GROUP BY o.doc_id
"""


@register("text_bigram_xent", ORACLE_BIGRAM_LM)
def text_bigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Order-2 stupid-backoff LM score (textstats.bigram_lm_xent):
    # trained on the even-id half of the corpus, scoring the odd half
    # — a real train/score split so the backoff and OOV paths carry
    # live traffic (self-scoring would never back off). The oracle
    # retrains both count tables and replays the three-way CASE with
    # identical arithmetic shapes (one ln per branch, rounded 1e-6).
    docs = _t(spark, sf_dir, "documents")
    return _ts.bigram_lm_xent(
        docs.where(F.col("doc_id") % 2 == 1), "doc_id", "text",
        train=docs.where(F.col("doc_id") % 2 == 0))


@register(
    "text_hash_bow",
    f"""
    WITH occ AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents)
    SELECT doc_id,
           CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64 AS bucket,
           count(*) AS cnt
    FROM occ GROUP BY doc_id, bucket
    """,
)
def text_hash_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Feature-hashing vectorizer (textstats.hash_bow): tokens hashed
    # into 64 buckets, exact integer counts — the vocabulary-free
    # document vector that bridges the text tier to the embedding tier
    # (assemble_dense output feeds dedup/similarity operators; pinned
    # by tests). md5 bucketing here so the oracle rebuilds every
    # bucket assignment; xxhash64 is the engine default.
    return _ts.hash_bow(_t(spark, sf_dir, "documents"), "doc_id", "text",
                        dim=64, hash_fn="md5")


def _split_leakage_oracle() -> str:
    return f"""
    WITH s AS (
      SELECT doc_id, text,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 2)) AS INT) < 25
                  THEN 'val' ELSE 'train' END AS split
      FROM documents),
    toks AS (SELECT doc_id, split, {_TOKS_SQL} AS tk FROM s),
    sh AS (
      SELECT doc_id, split,
             unnest(CASE WHEN len(tk) >= 8 THEN
               list_distinct([array_to_string(tk[i:i+7], ' ')
                              for i in generate_series(1, len(tk)-7)])
             ELSE [] END) AS shingle
      FROM toks),
    train_sh AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train')
    SELECT v.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM (SELECT * FROM sh WHERE split = 'val') v
    JOIN train_sh USING (shingle)
    GROUP BY v.doc_id
    """


@register("corpus_split_leakage", _split_leakage_oracle())
def corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Train→val n-gram leakage report (eval hygiene for the corpus'
    # OWN splits): the content-addressed split_assign partition, then
    # decontaminate with the TRAIN side as the "benchmark" — val docs
    # sharing any 8-gram with train are flagged with their distinct
    # shared-shingle counts. Same broadcast/explode shape as
    # text_decontaminate (the val side is the small one here, but the
    # operator is symmetric in which side explodes-distinct).
    from .operators.sampling import split_assign
    docs = split_assign(_t(spark, sf_dir, "documents")
                        .select("doc_id", "text"), "doc_id")
    train = docs.where(F.col("split") == "train")
    val = docs.where(F.col("split") == "val")
    return _cur.decontaminate(val, train, "doc_id", "text", n=8)


@register(
    "c13_json_extract",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def c13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Semi-structured props column: from_json with an explicit schema
    # (JVM-side Jackson parse, one pass) rather than per-field
    # get_json_object calls that would re-parse the string per
    # extraction. Integer sum — no decimal dance needed.
    ev = _t(spark, sf_dir, "events").withColumn(
        "_p", F.from_json("props", "k BIGINT"))
    return (
        ev.where(F.col("_p.k") > 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("_p.k").alias("sum_k"))
    )


# ---------------------------------------------------------------------------
# Breadth beyond the reference: pivot, set difference, cumulative windows.
# The reference's only "wide" output is hand-formatted Streamlit columns
# (app.py:196-259); these give the engine the standard OLAP reshaping ops.
# ---------------------------------------------------------------------------

@register(
    "a12_pivot_matrix",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END)
                AS DOUBLE) AS qty_f,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END)
                AS DOUBLE) AS qty_o,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a12_pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pivot = one hash aggregation whose output columns are the pivot
    # values. Passing the value list explicitly skips the extra
    # distinct-values job Spark otherwise runs first — at 100 TB that
    # pre-job is a full extra scan of the fact table.
    p = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            .alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # Missing (flag, status) combos: NULL for the sum on both engines,
    # 0 for the count (pivot leaves NULL -> coalesce to match CASE ELSE 0).
    return p.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_f"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
        F.col("O_qty").alias("qty_o"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
    )


@register(
    "u3_intersect_except",
    """
    (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
     INTERSECT
     SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def u3_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Set-op complement to U1/U2 union (SURVEY.md §2.7 notes the
    # reference has no intersect/except). Spark plans both as hash
    # aggregates over a single shuffle on the key — the same cost shape
    # as dropDuplicates, no join materialization.
    orders = _t(spark, sf_dir, "orders")
    by_prio = lambda p: orders.where(F.col("o_orderpriority") == p).select("o_custkey")
    return (
        by_prio("1-URGENT")
        .intersect(by_prio("2-HIGH"))
        .subtract(by_prio("5-LOW"))
    )


@register(
    "t9_cumulative_daily",
    """
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS dv
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           CAST(dv AS DOUBLE) AS daily_value,
           CAST(SUM(dv) OVER (PARTITION BY event_type
                              ORDER BY (day IS NOT NULL),
                                       COALESCE(day, DATE '2000-01-01')
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_value
    FROM daily
    """,
)
def t9_cumulative_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Running total done scale-safe: aggregate the fact table down to
    # (event_type, day) FIRST, then window over the tiny aggregate —
    # the unbounded-preceding frame never sees the raw events, and the
    # window is partitioned by event_type so it parallelizes (no
    # single-partition global-window trap). The oracle window pins
    # Spark's NULLS-FIRST placement for the one possible NULL day per
    # type (a group key) via the null-free
    # `(day IS NOT NULL), COALESCE(day, ...)` sort — DuckDB 1.0.0's
    # window ORDER BY is nondeterministic on NULL-bearing keys even
    # with explicit NULLS FIRST (r14 probe, see t8_moving_avg).
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("dv"))
    )
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return daily.select(
        "event_type", "day",
        F.col("dv").cast("double").alias("daily_value"),
        F.sum("dv").over(w).cast("double").alias("cum_value"),
    )


# ---------------------------------------------------------------------------
# Training-data text tier: n-gram language-model stats and TF-IDF term
# weighting over the documents corpus. Natural extensions of the
# reference's keyword analytics (cache.py:220-240) toward what a
# pretraining-corpus pipeline actually computes.
# ---------------------------------------------------------------------------

@register(
    "text_bigram_topk",
    """
    WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
    b AS (SELECT unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS z FROM t)
    SELECT z[1] || ' ' || z[2] AS bigram, count(*) AS cnt
    FROM b GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20
    """,
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bigrams without a UDF: materialize the token array once, then
    # zip_with over two offset slices builds adjacent pairs JVM-side
    # inside whole-stage codegen. explode -> hash agg (map-side
    # partials) -> TakeOrderedAndProject; the full bigram table is
    # never sorted, only the top-k heap per partition.
    docs = _t(spark, sf_dir, "documents").select(
        F.split(F.col("text"), " ").alias("w"))
    return (
        docs.select(F.explode(F.expr(
            "zip_with(slice(w, 1, greatest(size(w)-1, 0)),"
            "         slice(w, 2, greatest(size(w)-1, 0)),"
            "         (a, b) -> concat(a, ' ', b))")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "text_tfidf_topk",
    """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents WHERE doc_id IS NOT NULL),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents
          WHERE doc_id IS NOT NULL),
    scored AS (
      SELECT tf.doc_id, tf.term,
             (CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE))
               / CAST(dfreq.df AS DOUBLE) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
      WHERE tf.doc_id < 20
    )
    SELECT doc_id, term, score,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS BIGINT) AS rk
    FROM scored QUALIFY rk <= 5
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TF-IDF with exact cross-engine arithmetic: tf, df, n_docs are all
    # integers held exactly in doubles, so score = tf*n/df is a single
    # IEEE multiply+divide on identical inputs in both engines — no
    # log() whose libm last bits could hash-mismatch. Document
    # frequency is vocabulary-sized, so it broadcasts; the corpus-wide
    # doc count rides along as a broadcast scalar. Only the scored
    # subset pays the per-doc window.
    # Two independent corpus passes, each minimal for what it needs:
    # document frequency = "docs containing the term", computed by
    # dedup'ing terms WITHIN each doc array-side (array_distinct — a
    # per-row operation, no shuffle) then one groupBy(term) with
    # map-side partials. That replaces the former corpus-wide
    # groupBy(doc_id, term) shuffle, which this plan previously
    # executed TWICE (once under dfreq, once under the scored subset
    # — self-join on an unpersisted subtree). The scoring-side tf
    # filters to the target docs BEFORE the explode, so its shuffle
    # is 20 documents, not the corpus.
    #
    # NULL contract (r14, null-audit class A): document frequency is
    # "number of DOCUMENTS containing the term", which needs a doc
    # identity — an oracle GROUP BY doc_id would collapse every
    # NULL-id doc into one phantom document while the array-side
    # explode counts each row, splitting df. NULL ids are excluded
    # explicitly on both sides; NULL text stays (no tokens, no rows).
    docs = _t(spark, sf_dir, "documents") \
        .where(F.col("doc_id").isNotNull())
    dfreq = (
        docs.select(F.explode(F.array_distinct(F.split("text", " ")))
                    .alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    tf = (
        docs.where(F.col("doc_id") < 20)
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(maybe_broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score",
                    (F.col("tf").cast("double") * F.col("n_docs").cast("double"))
                    / F.col("df").cast("double"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 5)
        .select("doc_id", "term", "score", "rk")
    )


# ---------------------------------------------------------------------------
# SQL surface: correlated subqueries through spark.sql over registered
# views. One Catalyst underneath — Spark decorrelates these into the
# same semi/aggregate-join plans the DataFrame API would build, so the
# SQL front door costs nothing at scale.
# ---------------------------------------------------------------------------

_EXISTS_SQL = """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > 150000)
"""

_SCALAR_SUB_SQL = """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders o
    WHERE o_totalprice >
      (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              / count(*)
       FROM orders o2
       WHERE o2.o_orderpriority = o.o_orderpriority)
"""


@register("f11_exists_subquery", _EXISTS_SQL)
def f11_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Correlated EXISTS -> Catalyst decorrelates to a left-semi hash
    # join on o_custkey (same plan as j4_semi_join). Identical ANSI
    # text runs on DuckDB as the oracle.
    from .sources.io import load_tables
    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_EXISTS_SQL)


@register("f12_scalar_subquery", _SCALAR_SUB_SQL)
def f12_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Correlated scalar aggregate -> one partial+final agg per priority
    # class joined back to the fact table (5 groups, broadcastable).
    # The class average goes through exact DECIMAL summation so the
    # comparison threshold is bit-identical across engines — a row
    # sitting on the boundary must fall the same way in both.
    from .sources.io import load_tables
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(_SCALAR_SUB_SQL)


@register(
    "c14_array_hof_suite",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(w, x -> length(x) > 4)) AS BIGINT) AS n_long,
           CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
             AS tok_len_sum,
           array_to_string((list_sort(list_distinct(w)))[1:3], ' ') AS first3
    FROM t
    """,
)
def c14_array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Higher-order array functions run as codegen'd JVM lambdas over
    # the materialized token array — one scan, zero shuffles, zero
    # Python. The reference's per-row Python list loops
    # (cache.py:215-218) become engine expressions.
    t = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("w"))
    return t.select(
        "doc_id",
        F.size(F.filter("w", lambda x: F.length(x) > 4)).cast("bigint")
        .alias("n_long"),
        F.aggregate("w", F.lit(0).cast("bigint"),
                    lambda acc, x: acc + F.length(x)).alias("tok_len_sum"),
        # Space-joined string (not array) so the driver canonicalizer can
        # hash the column; the slice/sort/distinct HOF chain is unchanged.
        # NULL text passes through as NULL (array_to_string(NULL) is
        # NULL in SQL, concat_ws never is) — while ''-text stays '' on
        # both sides; null-total per the r13 audit class C.
        F.when(F.col("w").isNull(), F.lit(None).cast("string"))
        .otherwise(F.concat_ws(
            " ", F.slice(F.array_sort(F.array_distinct("w")), 1, 3)))
        .alias("first3"),
    )


@register(
    "a13_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def a13_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arbitrary grouping sets (not just the rollup/cube lattices):
    # Catalyst plans one Expand over a single scan — each input row is
    # replicated once per set, then one partial+final hash aggregate.
    # Never N separate scans unioned.
    return (
        _t(spark, sf_dir, "lineitem")
        .groupingSets([["l_returnflag"], ["l_linestatus"], []],
                      "l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "t10_window_suite",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           lag(o_orderkey) OVER w AS prev_key,
           lead(o_orderkey) OVER w AS next_key
    FROM orders
    WHERE o_custkey < 100 AND o_orderkey IS NOT NULL
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY (o_totalprice IS NULL),
                          COALESCE(o_totalprice, 0) DESC, o_orderkey)
    """,
)
def t10_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The ranking/offset window family in one pass: all five functions
    # share a single window spec, so Spark sorts each partition once
    # and evaluates every function in the same Window operator. The
    # ORDER BY ends with the unique key -> rank/ntile/lag assignments
    # are total-order deterministic across engines.
    #
    # NULL contract (r14, class B — surfaced by the 1/10-rate stress
    # audit): the tie-break IS the unique key, so a NULL o_orderkey
    # breaks the total order (and sorts at opposite ends per engine);
    # rows missing it are excluded both sides. NULL o_totalprice stays
    # (DESC places NULLs last in both engines); the oracle spells that
    # placement with null-free keys ((price IS NULL), COALESCE DESC)
    # because DuckDB 1.0.0's window sort is nondeterministic over
    # NULL-bearing keys (SCALE.md hazard 21).
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .where((F.col("o_custkey") < 100)
               & F.col("o_orderkey").isNotNull())
        .select(
            "o_orderkey", "o_orderpriority", "o_totalprice",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.lag("o_orderkey").over(w).alias("prev_key"),
            F.lead("o_orderkey").over(w).alias("next_key"),
        )
    )


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
    ), sh AS (
      {_SH_CAPPED_SQL}
    ), sizes AS (
      SELECT doc, count(*) AS n FROM sh GROUP BY doc
    ), inter AS (
      SELECT a.doc AS id1, b.doc AS id2, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY a.doc, b.doc
    ), p AS (
      SELECT id1, id2
      FROM inter JOIN sizes s1 ON s1.doc = id1 JOIN sizes s2 ON s2.doc = id2
      WHERE n_common::DOUBLE / (s1.n + s2.n - n_common) >= 0.1
    ), e AS (
      SELECT id1 AS a, id2 AS b FROM p UNION SELECT id2, id1 FROM p
    ), reach AS (
      SELECT a AS node, b AS r FROM e
      UNION
      SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a
    )
    SELECT node AS doc, least(node, min(r)) AS cluster
    FROM reach GROUP BY node
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pairwise near-dup output -> duplicate CLUSTERS via distributed
    # min-label propagation (operators/dedup.py:connected_components).
    # The oracle computes the same transitive closure with a recursive
    # CTE — fine at oracle scale, quadratic in cluster size at 100 TB,
    # which is exactly why the engine side iterates joins instead.
    # The CC loop runs eagerly and its result is a checkpoint leaf,
    # so the shingle index is fully consumed by the time it returns —
    # released (even if CC raises) rather than leaking per call.
    # local_threshold=0: this row EXISTS as driver-level evidence for
    # the distributed min-label loop, so the size gate that would
    # route a graph this small to the driver-side union-find is
    # disabled here (compositions like canonicalize keep the default).
    with _dedup.released() as cl:
        pairs = _dedup.ngram_jaccard_pairs(
            _t(spark, sf_dir, "documents"), "doc_id", "text", n=3,
            threshold=0.1, cleanup=cl)
        return (_dedup.connected_components(pairs, local_threshold=0)
                .select(F.col("node").alias("doc"), "cluster"))


def _canonical_oracle() -> str:
    clusters = ORACLES["dedup_clusters"].strip()
    feat = ORACLES["text_quality_features"].strip()
    return f"""
    WITH cl AS ({clusters}),
    q AS (SELECT doc_id, quality_score FROM ({feat})),
    lab AS (
      SELECT q.doc_id, COALESCE(cl.cluster, q.doc_id) AS cluster,
             quality_score
      FROM q LEFT JOIN cl ON cl.doc = q.doc_id),
    best AS (
      SELECT cluster, doc_id AS canonical_id
      FROM (SELECT cluster, doc_id,
                   row_number() OVER (PARTITION BY cluster
                                      ORDER BY quality_score DESC,
                                               doc_id) AS rn
            FROM lab)
      WHERE rn = 1)
    SELECT l.doc_id, CAST(l.cluster AS BIGINT) AS cluster,
           CAST(b.canonical_id AS BIGINT) AS canonical_id,
           l.doc_id = b.canonical_id AS keep
    FROM lab l JOIN best b USING (cluster)
    """


@register("dedup_canonical", _canonical_oracle())
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keep-one-per-cluster selection (operators/dedup.py:canonicalize):
    # near-dup clusters (same pairs/threshold as dedup_clusters) keep
    # their HIGHEST-QUALITY member (quality_features blend, ties to
    # the lowest doc_id), everything else is marked for dropping —
    # the decision layer between pairwise dedup output and an actual
    # smaller corpus. The canonical pick is a max(struct) aggregate,
    # not a rank window, so a mega-cluster collapses map-side (the
    # unit_dedup_stats argument); the oracle recomputes clusters
    # (recursive CTE), quality, and the argmax with the identical
    # tie-break.
    docs = _t(spark, sf_dir, "documents")
    # canonicalize consumes pairs through the eager CC loop; after it
    # returns, the result references only the checkpointed cluster
    # table and the scored frame — the shingle index releases on exit
    # (exception-safe: a CC non-convergence must not strand it).
    with _dedup.released() as cl:
        pairs = _dedup.ngram_jaccard_pairs(docs, "doc_id", "text",
                                           n=3, threshold=0.1,
                                           cleanup=cl)
        scored = _ts.quality_features(docs.select("doc_id", "text"))
        return _dedup.canonicalize(scored, pairs)


@register("dedup_clusters_star", ORACLES["dedup_clusters"])
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same pairs and the SAME recursive-CTE oracle as dedup_clusters,
    # but clustered by the O(log n) large-star/small-star algorithm
    # (operators/dedup.py:connected_components_star) — driver-level
    # evidence that both algorithms produce identical components on
    # the real near-dup graph. local_threshold=0 keeps that evidence
    # honest: the star loop itself must run here, not the size-gated
    # local fast path.
    with _dedup.released() as cl:
        pairs = _dedup.ngram_jaccard_pairs(
            _t(spark, sf_dir, "documents"), "doc_id", "text", n=3,
            threshold=0.1, cleanup=cl)
        return (_dedup.connected_components_star(pairs,
                                                 local_threshold=0)
                .select(F.col("node").alias("doc"), "cluster"))


@register(
    "corpus_split_assign",
    """
    SELECT doc_id, lang,
           CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                     AS INT) < 25
                THEN 'val' ELSE 'train' END AS split
    FROM documents
    """,
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Content-addressed train/val split (operators/sampling.py): the
    # assignment is a pure function of doc_id, so it survives
    # repartitioning and incremental corpus growth — and both engines
    # compute the identical md5 bucket.
    from .operators.sampling import split_assign
    return split_assign(
        _t(spark, sf_dir, "documents").select("doc_id", "lang"),
        "doc_id", val_fraction=0.1)


@register(
    "q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderdate
    FROM orders o JOIN big ON o.o_orderkey = big.l_orderkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q18 shape: aggregate the fact table, filter on the
    # aggregate (HAVING), then join the surviving keys back. The
    # having-filter runs on the agg output — far smaller than the fact
    # table — so the join probe side is tiny and AQE converts it to a
    # broadcast at runtime.
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
             .alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
        .select("l_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "f13_not_in_subquery",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT')
    """,
)
def f13_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT IN <subquery> carries ANSI three-valued NULL semantics (one
    # NULL in the subquery empties the result), so Catalyst plans a
    # null-AWARE anti join — different operator from the plain
    # left-anti of f4_absence_filter. Expressed through spark.sql to
    # exercise exactly that path; DuckDB runs the identical text.
    from .sources.io import load_tables
    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
    """)


@register(
    "a14_multi_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a14_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two DIFFERENT distinct columns in one aggregate: Catalyst's
    # Expand rewrite replicates each row once per distinct set, then a
    # two-level aggregation dedups and counts — one scan, no self-join
    # of the fact table against itself per distinct column.
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_parts"),
             F.countDistinct("l_suppkey").alias("n_supps"),
             F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "sim_knn_join",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
    pairs AS (
      SELECT q.qid, e.vec_id AS cid,
             round(list_dot_product(qv, v) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))),
                   6) AS cosine
      FROM q JOIN e ON e.vec_id <> q.qid
    )
    SELECT qid, cid, cosine,
           CAST(row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, cid) AS BIGINT) AS rk
    FROM pairs QUALIFY rk <= 3
    """,
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batched k-NN join (operators/similarity.py:knn_join): broadcast
    # query batch -> JVM cosine -> per-partition heap prune
    # (mapInPandas, selection only) -> one window over k*|Q|*partitions
    # survivors. The corpus side never shuffles at full width.
    emb = _t(spark, sf_dir, "embeddings")
    return _sim.knn_join(
        emb.where(F.col("vec_id") < 10), emb, k=3,
        qid_col="vec_id", qvec_col="embedding",
        cid_col="vec_id", cvec_col="embedding")


@register(
    "j8_snapshot_diff",
    """
    WITH old AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN n_chars + 1 ELSE n_chars END
               AS n_chars
      FROM documents WHERE doc_id % 7 <> 0
    ), new AS (SELECT doc_id, n_chars FROM documents)
    SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN n.n_chars <> o.n_chars THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM new n FULL OUTER JOIN old o ON n.doc_id = o.doc_id
    """,
)
def j8_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Snapshot diff = the catalog's full-outer-join shape
    # (operators/sampling.py:snapshot_diff). The "previous snapshot" is
    # carved deterministically from the same table (doc_id % 7 removed,
    # n_chars perturbed on % 5) so both engines diff identical inputs:
    # expect added (%7==0), changed (%5==0 and not added), unchanged.
    docs = _t(spark, sf_dir, "documents")
    old = (docs.where(F.col("doc_id") % 7 != 0)
           .select("doc_id",
                   F.when(F.col("doc_id") % 5 == 0,
                          F.col("n_chars") + 1)
                   .otherwise(F.col("n_chars")).alias("n_chars")))
    from .operators.sampling import snapshot_diff
    return snapshot_diff(old, docs.select("doc_id", "n_chars"),
                         "doc_id", ["n_chars"])


# ---------------------------------------------------------------------------
# TPC-H shape suite (round 3 widening): scan-heavy aggregate, top-k
# customer revenue, conditional revenue share, anti-join + scalar
# threshold. Dates adapted to the synthetic tables' 1995-2001 span.
# ---------------------------------------------------------------------------

