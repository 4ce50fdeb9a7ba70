"""TPC-H shape suite (Q4-Q22 family) plus PII scrub, decontamination, repetition quality, packing, domain mix, k-means IVF, training-set assembly, shuffle order.

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

@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q6 shape: single-table scan aggregate. Every predicate is a
    # plain column comparison, so all three reach the Parquet reader as
    # PushedFilters and the aggregate itself is a map-side partial ->
    # one-row final: no wide shuffle at any scale. The degenerate
    # no-GROUP-BY sum is the pattern's point — scan throughput bound.
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.where((F.col("l_shipdate") >=
                  F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
                 & (F.col("l_shipdate") <
                    F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
                 & (F.col("l_discount") >= 0.04)
                 & (F.col("l_discount") <= 0.08)
                 & (F.col("l_quantity") < 24))
        .agg(F.sum(price * disc).cast("double").alias("revenue"))
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q10 shape: which customers returned the most revenue in a
    # quarter. The date filter prunes orders before the fact join, the
    # returnflag filter prunes lineitem at the scan; customer is a
    # broadcast dim. One orders⋈lineitem shuffle, then a top-20 via
    # TakeOrderedAndProject on the (already small) per-customer agg.
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz")))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_effect",
    """
    WITH s AS (
      SELECT SUM(CASE WHEN p.p_type = 'PROMO'
                      THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                           (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS total
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    )
    SELECT CAST(100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE)
                AS DOUBLE) AS promo_revenue_pct
    FROM s
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q14 shape: conditional revenue share. part is a broadcast
    # dim; both sums ride one scan + one partial-aggregable pipeline.
    # Determinism: both sums are exact decimals, the single division
    # happens once on bit-identical doubles (module docstring rules).
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz")))
    part = _t(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    rev = price * (F.lit(1) - disc)
    zero = F.lit(0).cast("decimal(18,2)")
    s = (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
             .alias("promo"),
             F.sum(rev).alias("total"))
    )
    return s.select(
        (F.lit(100.0) * F.col("promo").cast("double")
         / F.col("total").cast("double")).alias("promo_revenue_pct"))


@register(
    "q22_dormant_customers",
    """
    WITH thr AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           count(*) AS n_custs,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_bal
    FROM customer c, thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q22 shape, re-dated: above-average-balance customers with
    # no orders in the final year, rolled up by nation. The scalar
    # threshold is a 1-row broadcast (exact decimal sum / count, one
    # IEEE division — no order-dependent double avg); the NOT EXISTS is
    # a left-anti join against the date-pruned orders slice, never the
    # full orders table.
    cust = _t(spark, sf_dir, "customer")
    thr = (cust.where(F.col("c_acctbal") > 0)
           .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double") / F.count(F.lit(1))).alias("avg_bal")))
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >=
        F.lit("2001-01-01 00:00:00").cast("timestamp_ntz")).select("o_custkey")
    return (
        cust.join(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_custs"),
             F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
             .alias("total_bal"))
    )


# ---------------------------------------------------------------------------
# Extension suite 5 (round 3): corpus curation — PII scrub,
# decontamination, repetition quality, sequence packing, domain mix
# (operators/curation.py, operators/sampling.py).
# ---------------------------------------------------------------------------

from .operators import curation as _cur         # noqa: E402

#: Strict 4-word shingles (no short-doc fallback) — the decontamination
#: n-gram. Real pipelines use n=8..13; this synthetic word-salad corpus
#: has ZERO 8-gram overlap across the %97 split (verified), so the
#: driver row runs n=4 to keep the check non-trivial; the n=8 semantics
#: are pytest-covered with planted contamination.
_SH4_SQL = """
    CASE WHEN len(tk) >= 4
      THEN [array_to_string(tk[i:i+3], ' ') for i in generate_series(1, len(tk)-3)]
      ELSE [] END
"""


@register(
    "text_pii_scrub",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com http://ex.org/p/'
                  || CAST(doc_id AS VARCHAR)
                  || ' 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                  || ' +44 7700-90' || CAST(doc_id % 90 + 10 AS VARCHAR) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, 'https?://\S+')) AS INT) AS n_url,
           CAST(len(regexp_extract_all(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
             AS n_email,
           CAST(len(regexp_extract_all(t,
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
           CAST(len(regexp_extract_all(t, '\+?\d[\d\- ]{7,}\d')) AS INT)
             AS n_phone,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, 'https?://\S+', '<URL>', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g') AS t_clean
    FROM aug
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PII redaction (operators/curation.py:pii_scrub). The synthetic
    # corpus contains no PII, so the query plants one deterministic
    # email/URL/IP/phone per row (pure function of doc_id, built
    # identically in the oracle) — the driver row then verifies the
    # regex semantics of count + scrub agree cross-engine on every
    # row. Map-only; whole-stage codegen; no shuffle.
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com http://ex.org/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" 192.168."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 +44 7700-90"),
            (F.col("doc_id") % 90 + 10).cast("string"),
        ).alias("t"))
    return (
        _cur.pii_scrub(aug, "t", "t_clean")
        .select("doc_id", "n_url", "n_email", "n_ipv4", "n_phone", "t_clean")
    )


@register(
    "text_decontaminate",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest({_SH4_SQL}) AS shingle FROM toks
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
    SELECT s.doc_id, count(*) AS n_hits
    FROM sh s JOIN bench b ON s.shingle = b.shingle
    WHERE s.doc_id % 97 <> 0
    GROUP BY s.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benchmark decontamination (operators/curation.py:decontaminate):
    # docs sharing any word 4-gram with the pseudo-benchmark slice
    # (doc_id % 97 == 0) are flagged with their distinct-shingle hit
    # count. The benchmark shingle set broadcasts; the corpus side is
    # scanned once, never shuffled at full width.
    docs = _t(spark, sf_dir, "documents")
    return _cur.decontaminate(
        docs.where(F.col("doc_id") % 97 != 0),
        docs.where(F.col("doc_id") % 97 == 0),
        "doc_id", "text", n=4)


@register(
    "text_repetition_quality",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    wc AS (
      SELECT doc_id, w, count(*) AS c
      FROM (SELECT doc_id, unnest(tk) AS w FROM toks) GROUP BY doc_id, w
    ),
    top AS (
      SELECT doc_id,
             round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
               AS top_word_frac
      FROM wc GROUP BY doc_id
    ),
    g2 AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 2
               THEN [array_to_string(tk[i:i+1], ' ')
                     for i in generate_series(1, len(tk)-1)]
               ELSE [] END AS gs
      FROM toks
    )
    SELECT t.doc_id, t.top_word_frac,
           CASE WHEN len(gs) = 0 THEN 0.0
                ELSE round(1.0 - CAST(len(list_distinct(gs)) AS DOUBLE)
                           / len(gs), 6) END AS dup_2gram_frac
    FROM top t JOIN g2 ON t.doc_id = g2.doc_id
    """,
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gopher-style repetition signals
    # (operators/curation.py:repetition_features): most-common-word
    # fraction + duplicate-bigram fraction per document.
    docs = _t(spark, sf_dir, "documents")
    out = _cur.repetition_features(docs, "doc_id", "text")
    return out.select("doc_id", "top_word_frac", "dup_2gram_frac")


@register(
    "corpus_pack_sequences",
    f"""
    WITH d AS (
      SELECT doc_id, source, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok
      FROM documents WHERE doc_id IS NOT NULL
    ),
    s AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - n_tok AS strt
      FROM d
    )
    SELECT doc_id, source, n_tok,
           CAST(strt // 512 AS BIGINT) AS seq_id,
           CAST(strt % 512 AS BIGINT) AS tok_offset
    FROM s
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Concatenate-then-chunk sequence packing
    # (operators/curation.py:pack_sequences): per-source token stream
    # cut every 512 tokens; each doc gets (seq_id, tok_offset). The
    # window is per-source — no global single-task sort. The oracle
    # carries the operator's NULL contract (order keys must be
    # non-null — a NULL doc_id has no deterministic stream slot and
    # would shift every other doc's offsets differently per engine).
    docs = _t(spark, sf_dir, "documents")
    out = _cur.pack_sequences(docs, "doc_id", "source", "doc_id",
                              budget=512, text_col="text")
    return out.select("doc_id", "source",
                      F.col("n_tok").cast("bigint").alias("n_tok"),
                      "seq_id", F.col("tok_offset").cast("bigint")
                      .alias("tok_offset"))


@register(
    "corpus_domain_mix",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(source || '|' || CAST(doc_id AS VARCHAR)),
                        doc_id) AS rn
      FROM documents WHERE doc_id IS NOT NULL)
    WHERE rn <= CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                     THEN 10 ELSE 5 END
    """,
)
def corpus_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Domain-mixture sampling (operators/sampling.py:deterministic_mix):
    # even-numbered sources contribute 10 docs, odd 5 — the fixed-ratio
    # "mix domains into the training blend" step, ordered by a content
    # hash both engines reproduce bit-for-bit (no RNG seed semantics to
    # align).
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    quota = F.when(
        F.substring(F.col("source"), 4, 10).cast("int") % 2 == 0,
        F.lit(10)).otherwise(F.lit(5))
    from .operators.sampling import deterministic_mix
    return deterministic_mix(docs, "source", "doc_id", quota)


def _kmeans_cos_sql(vec: str, cent: str) -> str:
    """DuckDB cosine between a vector and a centroid expression,
    mirroring similarity.cosine's sequential folds."""
    return (f"list_dot_product({vec}, {cent}) / "
            f"(sqrt(list_dot_product({vec}, {vec})) * "
            f"sqrt(list_dot_product({cent}, {cent})))")


#: One bit-reproducible Lloyd round (similarity.kmeans_fit_exact):
#: seed = 8 lowest-id raw vectors; assign = lexicographic struct max
#: (cos, cell) exactly like ivf_assign's sort_array trick; update =
#: exact BIGINT sums of 1e6-quantized unit components (commutative, so
#: partition/scan order can't matter); re-assign; occupancy + mean
#: cosine with the mean ALSO routed through an integer sum so no float
#: reduction anywhere is order-dependent.
_KMEANS_ASSIGN_PREFIX = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
    seeds AS (
      SELECT list(v ORDER BY vec_id) AS s
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
    ),
    a0 AS (
      SELECT vec_id, v,
             (list_max([{{'c': {_kmeans_cos_sql('v', 's[k]')},
                         'cell': k - 1}}
                        for k in generate_series(1, 8)])).cell AS cell
      FROM e, seeds
    ),
    qt AS (
      SELECT cell, pos,
             CAST(round(v[pos] / sqrt(list_dot_product(v, v)) * 1000000.0)
                  AS BIGINT) AS qc
      FROM a0 CROSS JOIN generate_series(1, 64) t(pos)
    ),
    trained AS (
      SELECT cell, list(CAST(sc AS DOUBLE) ORDER BY pos) AS cv
      FROM (SELECT cell, pos, sum(qc) AS sc FROM qt GROUP BY cell, pos)
      GROUP BY cell
    ),
    cents AS (
      SELECT g.k - 1 AS cell, COALESCE(t.cv, s[g.k]) AS cv
      FROM generate_series(1, 8) g(k) CROSS JOIN seeds
      LEFT JOIN trained t ON t.cell = g.k - 1
    ),
    cl AS (SELECT list(cv ORDER BY cell) AS cs FROM cents),
    a1 AS (
      SELECT vec_id, v,
             list_max([{{'c': {_kmeans_cos_sql('v', 'cs[k]')},
                        'cell': k - 1}}
                       for k in generate_series(1, 8)]) AS best
      FROM e, cl
    )"""

ORACLE_KMEANS = _KMEANS_ASSIGN_PREFIX + """
    SELECT CAST(best.cell AS INT) AS cell,
           count(*) AS n_vecs,
           round(CAST(sum(CAST(round(best.c * 1000000.0) AS BIGINT))
                      AS DOUBLE) / (count(*) * 1000000.0), 3) AS mean_cos
    FROM a1 GROUP BY best.cell
"""

#: SemDeDup tail over the shared trained-assignment prefix: rank =
#: (cos-to-centroid asc, id asc) inside each cell; j is dropped when a
#: before-ranked i in the same cell has cosine >= eps to it. The pair
#: cosine replays Spark's sequential zip_with/aggregate folds
#: (list_dot_product — same left-fold order, identical IEEE doubles),
#: so the >= eps decision is bit-identical cross-engine.
ORACLE_SEMANTIC_DEDUP = _KMEANS_ASSIGN_PREFIX + """,
    asg AS (SELECT vec_id, v, best.cell AS cell, best.c AS cc FROM a1),
    drp AS (
      SELECT DISTINCT j.vec_id FROM asg j JOIN asg i
      ON i.cell = j.cell
     AND (i.cc < j.cc OR (i.cc = j.cc AND i.vec_id < j.vec_id))
     AND list_dot_product(i.v, j.v)
         / (sqrt(list_dot_product(i.v, i.v))
            * sqrt(list_dot_product(j.v, j.v))) >= 0.35)
    SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
           d.vec_id IS NULL AS kept
    FROM asg a LEFT JOIN drp d ON a.vec_id = d.vec_id
"""


@register(
    "corpus_weighted_repeat",
    """
    WITH w AS (
      SELECT doc_id, source,
             CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                  THEN 2.5 ELSE 0.5 END AS wt
      FROM documents),
    n AS (
      SELECT doc_id, source,
             CAST(floor(wt) AS BIGINT) +
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 3)) AS INT) % 1000
                       < CAST((wt - floor(wt)) * 1000 AS BIGINT)
                  THEN 1 ELSE 0 END AS nc
      FROM w)
    SELECT doc_id, source,
           unnest(CASE WHEN nc > 0
                  THEN [i for i in generate_series(0, nc - 1)]
                  ELSE [] END) AS copy_idx
    FROM n
    """,
)
def corpus_weighted_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weighted domain UPSAMPLING (operators/sampling.py:
    # weighted_repeat): even-numbered sources at weight 2.5 (every doc
    # 2-3 copies), odd at 0.5 (half the docs) — the epochs-per-domain
    # mix knob. The fractional decision is the md5-bucket device from
    # split_assign, so the oracle reproduces every copy count exactly.
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    wt = F.when(F.substring(F.col("source"), 4, 10).cast("int") % 2 == 0,
                F.lit(2.5)).otherwise(F.lit(0.5))
    from .operators.sampling import weighted_repeat
    return weighted_repeat(docs, "doc_id", wt)


@register("sim_kmeans_ivf", ORACLE_KMEANS)
def sim_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spherical k-means IVF fit, cross-engine-checked END TO END: one
    # QUANTIZED Lloyd round (similarity.kmeans_fit_exact — integer-sum
    # centroid update, so every reduction in the fit is order-
    # independent), then the trained cells' occupancy + mean cosine.
    # The mean is likewise an exact integer sum divided once, so the
    # whole row — seed selection, assignment argmax (incl. tie-break),
    # training update, re-assignment, and the final stats — is
    # bit-reproducible in DuckDB (ORACLE_KMEANS). The float-avg
    # trainer kmeans_fit (slightly better centroids) stays the
    # production default; tests/test_dedup_similarity.py asserts its
    # monotone-objective and coverage properties.
    emb = _t(spark, sf_dir, "embeddings")
    cents = _sim.kmeans_fit_exact(emb, nlist=8, iters=1)
    n = F.count(F.lit(1))
    qcos = F.round(F.col("cell_cos") * F.lit(1000000.0)).cast("long")
    return (
        _sim.ivf_assign(emb, cents, with_cos=True)
        .groupBy("cell")
        .agg(n.alias("n_vecs"),
             F.round(F.sum(qcos).cast("double") / (n * F.lit(1000000.0)), 3)
             .alias("mean_cos"))
    )


def _scrub_sql(col: str) -> str:
    """DuckDB regexp_replace chain mirroring curation.pii_scrub (same
    patterns, same order; 'g' = replace-all to match Spark)."""
    expr = col
    for _, pat, repl in _cur.PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def _build_training_set_oracle() -> str:
    feat = ORACLES["text_quality_features"].strip()
    pairs = ORACLES["dedup_ngram_jaccard"].strip()
    return f"""
    WITH toks0 AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    sh4 AS (
      SELECT DISTINCT doc_id, unnest(CASE WHEN len(tk) >= 4
        THEN [array_to_string(tk[i:i+3], ' ')
              for i in generate_series(1, len(tk)-3)]
        ELSE [] END) AS shingle
      FROM toks0
    ),
    bench AS (SELECT DISTINCT shingle FROM sh4 WHERE doc_id % 97 = 0),
    contaminated AS (
      SELECT DISTINCT s.doc_id FROM sh4 s JOIN bench b USING (shingle)
      WHERE s.doc_id % 97 <> 0
    ),
    kept AS (
      SELECT f.doc_id FROM ({feat}) f
      WHERE f.quality_score >= 0.4 AND f.n_tokens >= 5
        AND f.doc_id % 97 <> 0
        AND f.doc_id NOT IN (SELECT id2 FROM ({pairs}) p)
        AND f.doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    sized AS (
      SELECT d.doc_id,
             CASE WHEN CAST(('0x' ||
                    substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2)) AS INT) < 25
                  THEN 'val' ELSE 'train' END AS split,
             CAST(len(list_filter(string_split_regex(
                    lower({_scrub_sql('d.text')}), '\\s+'),
                    t -> t <> '')) AS BIGINT) AS n_tok
      FROM documents d JOIN kept k ON d.doc_id = k.doc_id
    ),
    packed AS (
      SELECT doc_id, split, n_tok,
             sum(n_tok) OVER (PARTITION BY split ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - n_tok AS strt
      FROM sized
    )
    SELECT doc_id, split, n_tok,
           CAST(strt // 512 AS BIGINT) AS seq_id,
           CAST(strt % 512 AS BIGINT) AS tok_offset
    FROM packed
    """


@register("corpus_training_set", None)
def corpus_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The WHOLE training-data assembly as ONE declarative plan:
    # quality gate -> near-dup removal -> benchmark decontamination ->
    # PII scrub -> content-addressed train/val split -> fixed-budget
    # sequence packing (per-split token stream, budget 512). Every
    # stage is the already-verified operator, and the WHOLE thing is
    # one lazy DAG: the near-dup stage runs with persist_index=False
    # because its pairs feed exactly one anti-join here (the r11
    # eager-checkpoint + persisted-index shape cost this row +54% at
    # sf0.1 — A/B 4.9 -> 3.2 s — and a storage barrier AQE can't see
    # through; the index persist pays only on the multi-branch
    # dedup_ngram_jaccard row, which keeps it). At 100 TB the same
    # composition holds: the anti-join right sides are the (small)
    # violator sets, the benchmark side broadcasts, and packing
    # windows per split shard — swap ngram_jaccard_pairs for
    # minhash_lsh_pairs to make the near-dup stage sub-quadratic
    # with identical survivor semantics.
    from .operators.sampling import split_assign

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 97 != 0)   # benchmark held out
    feat = _ts.quality_features(docs.select("doc_id", "text")).drop("text")
    good = (feat.where((F.col("quality_score") >= 0.4)
                       & (F.col("n_tokens") >= 5)).select("doc_id"))
    # Nothing persisted, nothing to release: the violator set stays a
    # lazy sub-plan of the composite (the shingle-cap filter is
    # therefore visible in THIS row's executed plan too).
    dups = (_dedup.ngram_jaccard_pairs(docs, "doc_id", "text",
                                       n=3, threshold=0.1,
                                       persist_index=False)
            .select(F.col("id2").alias("doc_id")).distinct())
    contam = _cur.decontaminate(
        corpus, docs.where(F.col("doc_id") % 97 == 0),
        "doc_id", "text", n=4).select("doc_id")
    kept = (corpus.select("doc_id", "text")
            .join(good, "doc_id")
            .join(dups, "doc_id", "left_anti")
            .join(contam, "doc_id", "left_anti"))
    scrubbed = (_cur.pii_scrub(kept, "text", "t_clean")
                .select("doc_id", "t_clean"))
    staged = split_assign(scrubbed, "doc_id", val_fraction=0.1)
    packed = _cur.pack_sequences(staged, "doc_id", "split", "doc_id",
                                 budget=512, text_col="t_clean")
    return packed.select(
        "doc_id", "split", F.col("n_tok").cast("bigint").alias("n_tok"),
        "seq_id", F.col("tok_offset").cast("bigint").alias("tok_offset"))


ORACLES["corpus_training_set"] = _build_training_set_oracle()


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q15 shape: aggregate view + scalar-subquery max + join
    # back. The revenue table is per-supplier (cardinality = supplier
    # count, tiny next to lineitem at any scale), so the max is a
    # broadcast one-row cross join against it and the supplier lookup
    # broadcasts too; the only big-data work is the date-pruned
    # lineitem scan-agg. Ties on the max all surface (set semantics,
    # same as the SQL). Decimal equality keeps the comparison exact
    # cross-engine; the double cast happens only at output.
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    rev = (
        li.where((F.col("l_shipdate") >=
                  F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
                 & (F.col("l_shipdate") <
                    F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")))
        .groupBy("l_suppkey")
        .agg(F.sum(price * (F.lit(1) - disc)).alias("rev_dec"))
    )
    mx = rev.agg(F.max("rev_dec").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.col("rev_dec") == F.col("_mx"))
        .join(maybe_broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.col("rev_dec").cast("double").alias("total_revenue"))
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q21 shape (adapted: 'late' = shipped >90 days after the
    # order date, since this lineitem has no commit/receipt dates):
    # the canonical correlated EXISTS + NOT-EXISTS-on-the-same-table
    # pattern, expressed as left_semi + left_anti joins on the order
    # key with a supplier-inequality residual. Both joins are equi on
    # l_orderkey (shuffle/SMJ-able, AQE-skew-splittable); the anti
    # side reuses the already-filtered `late` subtree, which is tiny
    # relative to lineitem; supplier is a broadcast dim; TakeOrdered
    # caps the result.
    li = _t(spark, sf_dir, "lineitem")
    ords = _t(spark, sf_dir, "orders")
    sup = _t(spark, sf_dir, "supplier")
    late = (
        li.join(ords.where(F.col("o_orderstatus") == "F"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") >
               F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    a = late.alias("a")
    others = li.select("l_orderkey", "l_suppkey").alias("b")
    waited = a.join(
        others,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        "left_semi")
    sole_blame = waited.alias("x").join(
        late.alias("c"),
        (F.col("x.l_orderkey") == F.col("c.l_orderkey"))
        & (F.col("x.l_suppkey") != F.col("c.l_suppkey")),
        "left_anti")
    return (
        sole_blame
        .join(maybe_broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q4 shape (adapted: 'late line' = shipped >60 days after
    # the order date, since this lineitem has no commit/receipt
    # dates): correlated EXISTS over lineitem, expressed as a
    # left_semi join. The orders side is date-pruned BEFORE the join
    # (the quarter predicate reaches the Parquet scan), so the semi
    # join's build side is one quarter of orders, not the full table;
    # the residual ship-vs-order-date comparison rides on the equi
    # key. Five-row grouped output — partial agg + single exchange.
    li = _t(spark, sf_dir, "lineitem")
    ords = _t(spark, sf_dir, "orders")
    q = ords.where(
        (F.col("o_orderdate") >=
         F.lit("1995-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") <
           F.lit("1995-10-01 00:00:00").cast("timestamp_ntz")))
    waited = q.join(
        li.select("l_orderkey", "l_shipdate"),
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") >
           F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi")
    return (
        waited.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q8_market_share",
    """
    WITH volumes AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                               THEN volume ELSE 0 END) AS DOUBLE) /
                 CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM volumes
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q8 shape (adapted to this schema: p_type='ECONOMY' as the
    # part class, customer-region 'AMERICA', target nation NATION_1):
    # the 8-table national-market-share join. Shape matters at 100 TB:
    # lineitem is the only big fact — orders joins it on the shuffle
    # key, while part, supplier, customer, nation x2, and region are
    # all true dims and BROADCAST, so the plan is one fact-fact
    # shuffle plus a broadcast cascade, never a chain of shuffles.
    # The part and date filters land before any join (scan pruning).
    # Decimal partial sums keep the per-year totals exact
    # cross-engine; the share ratio is rounded to 6 places so the
    # double division hashes identically in Spark and the oracle.
    li = _t(spark, sf_dir, "lineitem")
    ords = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    sup = _t(spark, sf_dir, "supplier")
    prt = _t(spark, sf_dir, "part")

    cust_nat = (cust.join(F.broadcast(nat.alias("n1")),
                          F.col("c_nationkey") == F.col("n1.n_nationkey"))
                .join(F.broadcast(reg.where(F.col("r_name") == "AMERICA")),
                      F.col("n1.n_regionkey") == F.col("r_regionkey"))
                .select("c_custkey"))
    sup_nat = (sup.join(F.broadcast(nat.alias("n2")),
                        F.col("s_nationkey") == F.col("n2.n_nationkey"))
               .select("s_suppkey", F.col("n2.n_name").alias("supp_nation")))
    ords_w = ords.where(
        (F.col("o_orderdate") >=
         F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") <
           F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")))

    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    vols = (
        li.join(maybe_broadcast(prt.where(F.col("p_type") == "ECONOMY")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(ords_w, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust_nat), F.col("o_custkey") == F.col("c_custkey"),
              "left_semi")
        .join(maybe_broadcast(sup_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.year("o_orderdate").cast("int").alias("o_year"),
                (price * (F.lit(1) - disc)).alias("volume"),
                "supp_nation")
    )
    return (
        vols.groupBy("o_year")
        .agg(F.sum(F.when(F.col("supp_nation") == "NATION_1",
                          F.col("volume")).otherwise(F.lit(0))
                   ).alias("_target"),
             F.sum("volume").alias("_total"))
        .select("o_year",
                F.round(F.col("_target").cast("double")
                        / F.col("_total").cast("double"), 6)
                .alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q7_volume_shipping",
    """
    WITH shipping AS (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
             (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q7 shape: bilateral trade volume between two nations by
    # ship year. The nation-pair disjunction is applied AFTER both
    # broadcast nation joins (it references both sides), but the
    # two nation dims, supplier, and customer all broadcast, so the
    # only shuffle is lineitem⋈orders — the Q8 fact-fact pattern.
    # Date pruning reaches the lineitem scan. Decimal partials, double
    # only at output.
    li = _t(spark, sf_dir, "lineitem")
    ords = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    sup = _t(spark, sf_dir, "supplier")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    cust_n = (cust.join(F.broadcast(nat.alias("n2")),
                        F.col("c_nationkey") == F.col("n2.n_nationkey"))
              .select("c_custkey", F.col("n2.n_name").alias("cust_nation")))
    sup_n = (sup.join(F.broadcast(nat.alias("n1")),
                      F.col("s_nationkey") == F.col("n1.n_nationkey"))
             .select("s_suppkey", F.col("n1.n_name").alias("supp_nation")))
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    return (
        li.where((F.col("l_shipdate") >=
                  F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
                 & (F.col("l_shipdate") <
                    F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(sup_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size = 1
      -- Exact-integer replica of Spark's decimal threshold: DuckDB's
      -- avg(DECIMAL) returns DOUBLE, but Spark's avg(decimal(18,2)) is
      -- decimal(22,6) = round-half-up(sum*1e6/n)/1e6, and 0.2*avg is
      -- decimal(26,7). Comparing qty*1e7 < 2*round_half_up(sum*1e6/n)
      -- in HUGEINT reproduces that boundary bit-for-bit (quantities
      -- are integral, so every cast below is exact). COUNT(l_quantity)
      -- not COUNT(*): avg() divides by the NON-NULL count in both
      -- engines, and the integer replica must too (r14 null audit).
      AND CAST(l.l_quantity AS HUGEINT) * 10000000 <
          (SELECT 2 * ((2 * CAST(SUM(l2.l_quantity) AS HUGEINT) * 1000000
                        + COUNT(l2.l_quantity))
                       // (2 * COUNT(l2.l_quantity)))
           FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q17 shape (adapted: p_size=1 stands in for the container
    # filter this schema lacks): correlated scalar AVG subquery —
    # Catalyst decorrelates it into a per-part aggregate joined back
    # on l_partkey, so the plan is two scans of lineitem (one
    # aggregated) plus a broadcast part filter, never a per-row
    # subquery execution. The threshold is decimal-exact on the Spark
    # side (avg(decimal(18,2)) -> decimal(22,6) HALF_UP, x0.2 ->
    # decimal(26,7)); the oracle replays that arithmetic in HUGEINT
    # (see the SQL comment) because DuckDB's avg(DECIMAL) would
    # otherwise degrade to DOUBLE and misclassify boundary rows.
    li = _t(spark, sf_dir, "lineitem")
    prt = _t(spark, sf_dir, "part")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    per_part = (li.groupBy(F.col("l_partkey").alias("_pk"))
                .agg((F.lit(0.2).cast("decimal(3,1)")
                      * F.avg(qty)).alias("_thresh")))
    return (
        li.join(maybe_broadcast(prt.where(F.col("p_size") == 1)),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("_pk"))
        .where(qty < F.col("_thresh"))
        .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double") / F.lit(7.0)).cast("double")
             .alias("avg_yearly"))
    )


@register(
    "q11_important_nations",
    """
    WITH by_nation AS (
      SELECT n.n_name,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS value_dec
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, CAST(value_dec AS DOUBLE) AS value
    FROM by_nation
    WHERE value_dec > (SELECT CAST(0.04 AS DECIMAL(3,2)) * SUM(value_dec)
                       FROM by_nation)
    ORDER BY value DESC, n_name
    """,
)
def q11_important_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q11 shape (adapted: supplier-nation value share from
    # lineitem, since this schema has no partsupp): a grouped
    # aggregate filtered by a GLOBAL scalar threshold over the same
    # aggregate. The per-nation frame is nation-cardinality (tiny), so
    # the global re-aggregate and the threshold join are broadcast
    # one-row operations; the only big-data work is the single
    # lineitem scan-agg. Decimal partials make the 4% threshold
    # comparison exact cross-engine.
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    sup_n = (sup.join(F.broadcast(nat),
                      F.col("s_nationkey") == F.col("n_nationkey"))
             .select("s_suppkey", "n_name"))
    by_nation = (
        li.join(maybe_broadcast(sup_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).alias("value_dec"))
    )
    # Global threshold via an unpartitioned window over the ALREADY
    # AGGREGATED frame: one pass over lineitem total. A scalar-agg +
    # join-back formulation re-executed the whole scan-agg subtree
    # (measured 2×); the single-partition window is safe because the
    # frame is nation-cardinality (fixed ~25 rows) at ANY corpus size.
    w = Window.partitionBy()
    return (
        by_nation
        .withColumn("_t", F.lit(0.04).cast("decimal(3,2)")
                    * F.sum("value_dec").over(w))
        .where(F.col("value_dec") > F.col("_t"))
        .select("n_name", F.col("value_dec").cast("double").alias("value"))
        .orderBy(F.desc("value"), "n_name")
    )


@register(
    "q16_supplier_count",
    """
    SELECT p.p_brand, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13)
      AND l.l_suppkey IS NOT NULL
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0
                                AND s_suppkey IS NOT NULL)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q16 shape (adapted: supplier-part relationships come from
    # lineitem since this schema has no partsupp, and negative acctbal
    # stands in for the complaints exclusion): filtered part dim
    # broadcast onto lineitem, a NOT IN exclusion that Catalyst plans
    # as a null-aware anti join against the (tiny, broadcast)
    # blocklist, then a count-distinct grouped by part attributes —
    # the distinct is a two-phase aggregate (partial dedup map-side),
    # never a corpus re-shuffle per group.
    #
    # NULL contract (r15, sf0.1 null audit): ANSI NOT IN is three-
    # valued — one NULL in the blocklist turns EVERY row's predicate
    # UNKNOWN (the oracle returned 0 rows), and a NULL probe key is
    # UNKNOWN too, where a left-anti join keeps it. Both sides pin
    # the NOT-EXISTS reading: non-null probe keys against a non-null
    # blocklist (a supplier exclusion needs a supplier id). No-op on
    # null-free input; pinned in tests/test_null_contracts.py.
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_suppkey").isNotNull())
    prt = _t(spark, sf_dir, "part")
    sup = _t(spark, sf_dir, "supplier")
    bad = sup.where((F.col("s_acctbal") < 0)
                    & F.col("s_suppkey").isNotNull()).select("s_suppkey")
    return (
        li.join(maybe_broadcast(prt.where((F.col("p_brand") != "Brand#1")
                                      & F.col("p_size").isin(1, 5, 9, 13))),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(bad),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@register(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q19 shape: a disjunction of (brand, size-range,
    # quantity-range) conjuncts spanning both join sides. Catalyst
    # derives the side-local residuals (p_brand IN (...) and the size
    # upper bound push to the part scan; the quantity envelope pushes
    # to lineitem), so each side is pre-filtered before the broadcast
    # join even though the full OR can only be evaluated after it.
    li = _t(spark, sf_dir, "lineitem")
    prt = _t(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")

    def arm(brand: str, smax: int, qlo: int, qhi: int):
        return ((F.col("p_brand") == brand)
                & F.col("p_size").between(1, smax)
                & F.col("l_quantity").between(qlo, qhi))

    return (
        li.join(maybe_broadcast(prt), F.col("l_partkey") == F.col("p_partkey"))
        .where(arm("Brand#1", 15, 1, 11)
               | arm("Brand#2", 25, 10, 20)
               | arm("Brand#3", 35, 20, 30))
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double")
             .alias("revenue"))
    )


@register(
    "q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey  = l.l_partkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q9 shape (adapted: this schema has no partsupp, so
    # p_retailprice*quantity stands in for ps_supplycost*quantity):
    # product-type profit by supplier nation x order year. Join
    # topology at scale: the part filter prunes lineitem FIRST via a
    # size-gated broadcast (name predicate reaches the part scan), the
    # supplier->nation chain rides a second small build side, and the
    # only shuffle-eligible join is the pre-filtered lineitem slice
    # against orders — one fact shuffle, like q8. Profit stays exact
    # DECIMAL until the final cast so partial aggregation is
    # order-independent cross-engine.
    li = _t(spark, sf_dir, "lineitem")
    prt = _t(spark, sf_dir, "part")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    ords = _t(spark, sf_dir, "orders")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    cost = (F.col("p_retailprice").cast("decimal(18,2)")
            * F.col("l_quantity").cast("decimal(18,2)"))
    sup_n = (sup.join(F.broadcast(nat),
                      F.col("s_nationkey") == F.col("n_nationkey"))
             .select("s_suppkey", "n_name"))
    return (
        li.join(maybe_broadcast(prt.where(F.col("p_name").contains("bolt"))
                                .select("p_partkey", "p_retailprice")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(sup_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(price * (F.lit(1) - disc) - cost).cast("double")
             .alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q12_shipmode_priority",
    """
    SELECT l.l_returnflag AS shipmode,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate >  o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_returnflag
    ORDER BY shipmode
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q12 shape (adapted: l_returnflag stands in for the missing
    # l_shipmode, and 'late' = shipped >30 days after the order date,
    # the same receipt-vs-commit surrogate family as q4): two-way
    # conditional counting over the lineitem-orders join. The ship
    # window prunes the lineitem scan before the join; the late-ship
    # comparison is a residual on the equi key; the CASE counters
    # collapse map-side (partial agg over 3 groups), so the join is
    # the only shuffle.
    li = _t(spark, sf_dir, "lineitem")
    ords = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    win = li.where(
        (F.col("l_shipdate") >=
         F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") <
           F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")))
    return (
        win.join(ords.select("o_orderkey", "o_orderdate", "o_orderpriority"),
                 (F.col("l_orderkey") == F.col("o_orderkey"))
                 & (F.col("l_shipdate") >
                    F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")))
        .groupBy(F.col("l_returnflag").alias("shipmode"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
             .alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).cast("bigint")
             .alias("low_line_count"))
        .orderBy("shipmode")
    )


# Q20's nested-IN chain is register()ed with engine-native timestamp
# literals on each side; the texts are otherwise identical so BOTH
# engines decorrelate the same three-level subquery.
_Q20_BODY = """
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
          AND l_shipdate >= {t0}
          AND l_shipdate <  {t1}
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >
          (SELECT CAST(0.5 AS DECIMAL(2,1))
                  * SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
           FROM lineitem l2
           WHERE l2.l_partkey = lineitem.l_partkey
             AND l2.l_shipdate >= {t0}
             AND l2.l_shipdate <  {t1}))
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name IN ('NATION_3', 'NATION_7'))
    ORDER BY s_name, s_suppkey
"""


@register(
    "q20_excess_suppliers",
    _Q20_BODY.format(t0="TIMESTAMP '1996-01-01 00:00:00'",
                     t1="TIMESTAMP '1997-01-01 00:00:00'"),
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q20 shape (adapted: lineitem is the supplier-part relation
    # since this schema has no partsupp; 'excess stock' = the supplier
    # shipped more than half of a part's windowed volume): a
    # three-level nested IN chain with a correlated HAVING aggregate,
    # run through spark.sql so CATALYST does the decorrelation — the
    # part-name IN becomes a semi join build side, the correlated
    # 0.5*SUM threshold becomes a per-part aggregate joined back on
    # the grouping key (never a per-row re-scan), and the outer INs
    # become left-semi hash joins. Exact-decimal threshold comparison
    # so boundary rows classify identically cross-engine.
    from .sources.io import load_tables
    load_tables(spark, sf_dir, ("supplier", "lineitem", "part", "nation"))
    return spark.sql(_Q20_BODY.format(
        t0="TIMESTAMP_NTZ '1996-01-01 00:00:00'",
        t1="TIMESTAMP_NTZ '1997-01-01 00:00:00'"))


# ---------------------------------------------------------------------------
# Pre-aggregated time-series rollups (operators/rollup.py): the
# materialized-aggregate tier. ts_hourly_rollup is the stored grain;
# ts_rollup_reagg proves daily-from-hourly == daily-from-raw exactly
# (decimal partials), which is what licenses serving dashboards from
# the rollup instead of the 100 TB raw scan.
# ---------------------------------------------------------------------------

from .operators import rollup as _roll          # noqa: E402


@register(
    "corpus_shuffle_order",
    """
    WITH ordered AS (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5(concat(CAST(doc_id AS VARCHAR), ':42')),
                        doc_id) - 1 AS pos
      FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT doc_id,
           CAST(pos % 8 AS BIGINT) AS shard,
           CAST(pos // 8 AS BIGINT) AS shard_pos
    FROM ordered
    """,
)
def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic epoch-shuffle/shard assignment for training data
    # loaders. The oracle's one-window global ORDER BY is exactly the
    # plan we must NOT run at scale (single-task sort); the operator
    # computes the identical total order via range repartition +
    # per-partition offsets (distributed zipWithIndex). Hash-equality
    # of the two IS the scalability proof: same answer, shuffle-safe
    # plan.
    from .operators.sampling import global_shuffle_order

    docs = _t(spark, sf_dir, "documents")
    return global_shuffle_order(docs, "doc_id", seed=42, n_shards=8)


