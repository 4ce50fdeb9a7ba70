"""Rollups, BPE, SemDeDup, PageRank, skew join, Z-order layout, product analytics (funnel/cohort/SCD2), triangles, Count-Min, PMI, anomaly z-score, DQ gate, aHash, rank bucketize, linkage tier (PPJoin, fuzzy, bloom decontaminate), skyline.

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
from .catalog_tpch import ORACLE_SEMANTIC_DEDUP  # noqa: F401

@register(
    "ts_hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           min(value) AS min_value, max(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS avg_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def ts_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The stored rollup grain, presented (avg derived at read time,
    # decimal sums surfaced as double). One map-side-partial shuffle
    # over (hour, type) — the build cost is amortized over every
    # dashboard query that then skips the raw scan. The HLL user
    # sketch is exercised in tests (no cross-engine hash for sketches).
    ev = _t(spark, sf_dir, "events")
    return _roll.present(_roll.rollup(ev, "hour", with_sketch=False))


@register(
    "ts_rollup_reagg",
    """
    SELECT date_trunc('day', ts) AS bucket_ts, event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           min(value) AS min_value, max(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS avg_value
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
)
def ts_rollup_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Daily stats computed FROM the hourly rollup, never from raw —
    # while the oracle aggregates the raw table directly. count/sum/
    # min/max merge exactly because the stored sums are DECIMAL
    # partials (order-independent), so the two sides hash-match: the
    # lossless re-aggregation guarantee, checked end-to-end. The
    # second aggregation runs over the already-tiny hourly frame.
    ev = _t(spark, sf_dir, "events")
    hourly = _roll.rollup(ev, "hour", with_sketch=False)
    daily = _roll.present(_roll.reaggregate(hourly, "day"))
    # Day-grain buckets surface as DATE (DuckDB's date_trunc('day')
    # convention); the stored rollup keeps the timestamp form.
    return daily.withColumn("bucket_ts", F.to_date("bucket_ts"))


# ---------------------------------------------------------------------------
# BPE tokenizer training + encoding (operators/bpe.py) as a driver row.
# ---------------------------------------------------------------------------

def _bpe_oracle(n_merges: int, out_k: int) -> str:
    """Full cross-engine replay of BPE training AND encoding.

    DuckDB has no iterative constructs we can aggregate inside, so the
    ``n_merges`` training rounds are UNROLLED into chained MATERIALIZED
    CTEs (plain inlining would re-expand stage k-1 four times per stage
    — 4^n blowup; MATERIALIZED makes each stage evaluate once).

    Each word is represented as a bracketed symbol string
    ``[l][o][w][</w>]``. Applying merge (a, b) is then one
    ``replace(s, '[a][b]', '[ab]')`` — SQL replace is leftmost
    non-overlapping, which is EXACTLY the greedy left-to-right merge
    fold of operators/bpe.py::_apply_merge: after a replacement the
    scan resumes past the new token, and the fold likewise never
    re-merges a token produced in the same round (verified against an
    independent dict-of-word-freqs BPE in tests). Safe because the
    corpus charset is lowercase ASCII words (no '[' / ']' / literal
    '</w>' in any token — the row would be ill-defined otherwise).

    Stage k: ``b{k}`` picks the argmax pair over frequency-weighted
    adjacent pairs of the TRAIN word table (count desc, a asc, b asc,
    min pair count 2 — bpe_train's exact tie-break), then ``w{k}`` /
    ``e{k}`` apply it to the train / encode word tables. Once no pair
    reaches the threshold, every later stage is provably a no-op
    (pair counts are unchanged), which mirrors bpe_train's early stop.
    """
    rep = ("replace(s, (SELECT '['||a||']['||b||']' FROM b{k}), "
           "(SELECT '['||a||b||']' FROM b{k}))")
    head = f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
    wf AS (SELECT tok, count(*) AS cnt, doc_id % 2 = 0 AS train
           FROM toks GROUP BY tok, doc_id % 2 = 0),
    sym0 AS (SELECT '[' || array_to_string(
                [tok[i] for i in generate_series(1, len(tok))], '][')
                || '][</w>]' AS s, cnt, train FROM wf),
    w0 AS MATERIALIZED (SELECT s, sum(cnt) AS cnt FROM sym0
                        WHERE train GROUP BY s),
    e0 AS MATERIALIZED (SELECT s, sum(cnt) AS cnt FROM sym0
                        WHERE NOT train GROUP BY s)"""
    stages = []
    for k in range(1, n_merges + 1):
        r = rep.format(k=k)
        stages.append(f"""
    b{k} AS MATERIALIZED (
      SELECT p.a AS a, p.b AS b, sum(cnt) AS n FROM (
        SELECT cnt, unnest([{{'a': sym[i], 'b': sym[i+1]}}
                            for i in generate_series(1, len(sym)-1)]) AS p
        FROM (SELECT string_split(trim(s, '[]'), '][') AS sym, cnt
              FROM w{k - 1}))
      GROUP BY p.a, p.b HAVING sum(cnt) >= 2
      ORDER BY n DESC, a, b LIMIT 1),
    w{k} AS MATERIALIZED (
      SELECT CASE WHEN EXISTS (SELECT 1 FROM b{k}) THEN {r}
             ELSE s END AS s, cnt FROM w{k - 1}),
    e{k} AS MATERIALIZED (
      SELECT CASE WHEN EXISTS (SELECT 1 FROM b{k}) THEN {r}
             ELSE s END AS s, cnt FROM e{k - 1})""")
    tail = f"""
    fin AS (SELECT unnest(string_split(trim(s, '[]'), '][')) AS subword,
                   cnt FROM e{n_merges}),
    agg AS (SELECT subword, CAST(sum(cnt) AS BIGINT) AS cnt
            FROM fin GROUP BY subword
            ORDER BY cnt DESC, subword LIMIT {out_k})
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, subword) AS INT)
             AS rank,
           subword, cnt FROM agg"""
    return head + "," + ",".join(stages) + "," + tail


@register("text_bpe_tokenize", _bpe_oracle(16, 30))
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The tokenizer-training prep step of an LLM data pipeline
    # (operators/bpe.py): learn 16 BPE merges on the even-doc_id half
    # of the corpus, encode the odd half with them, and report the
    # top-30 subword vocabulary with counts. The oracle replays BOTH
    # halves — the merge sequence (argmax pair per round, exact
    # tie-break) and the greedy encoding — so a hash match certifies
    # the trainer end-to-end, not just the encode fold. Spark cost
    # per round is one partial-agg shuffle over the WORD TYPE table
    # (vocabulary-sized, saturates long before the corpus grows), a
    # 1-row collect, and a map-only merge fold — the corpus itself is
    # read once regardless of merge count.
    from .operators import bpe as _bpe

    docs = _t(spark, sf_dir, "documents")
    merges = _bpe.bpe_train(docs.where(F.col("doc_id") % 2 == 0),
                            "text", num_merges=16, min_pair_count=2)
    enc = _bpe.bpe_encode(docs.where(F.col("doc_id") % 2 == 1),
                          merges, "doc_id", "text")
    top = (enc.select(F.explode("subwords").alias("subword"))
           .groupBy("subword").agg(F.count(F.lit(1)).alias("cnt"))
           .orderBy(F.desc("cnt"), F.asc("subword")).limit(30))
    w = Window.orderBy(F.desc("cnt"), F.asc("subword"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "subword", "cnt")


@register("dedup_semantic", ORACLE_SEMANTIC_DEDUP)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SemDeDup (operators/dedup.py:semantic_dedup): cluster the
    # embedding space with the quantized bit-reproducible k-means,
    # then prune cosine-near-identical vectors WITHIN each cluster,
    # keeping the one farthest from its centroid. The oracle replays
    # the whole chain — seeding, quantized Lloyd update, assignment
    # argmax, the in-cell pair search, and the keep-the-outlier rank
    # rule — on top of the same trained-assignment SQL prefix the
    # sim_kmeans_ivf row already proves.
    emb = _t(spark, sf_dir, "embeddings")
    return _dedup.semantic_dedup(emb, "vec_id", "embedding",
                                 nlist=8, eps=0.35)


def _pagerank_oracle(iters: int, n_buckets: int = 150) -> str:
    """Unrolled-CTE DuckDB replay of operators/graph.py:pagerank_exact.

    Every value is a BIGINT/HUGEINT and every division an integer DIV,
    so iteration i's table is bit-identical to Spark's — the same
    quantized-replay technique ORACLE_KMEANS uses for Lloyd rounds.
    """
    scale = 10**12
    dst = (f"CAST(json_extract_string(props, '$.k') AS BIGINT)"
           f" % {n_buckets}")
    prefix = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT user_id AS src, {dst} AS dst
      FROM events
      WHERE {dst} IS NOT NULL AND user_id != {dst}
    ),
    nodes AS MATERIALIZED (SELECT src AS node FROM e
                           UNION SELECT dst FROM e),
    deg AS MATERIALIZED (SELECT src, count(*) AS out_deg
                         FROM e GROUP BY src),
    nst AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
    r0 AS MATERIALIZED (
      SELECT node, {scale} // (SELECT n FROM nst) AS rank_q FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
    r{i} AS MATERIALIZED (
      SELECT nd.node,
             {15 * scale} // (100 * (SELECT n FROM nst))
             + (85 * (COALESCE(c.contrib_q, 0)
                      + d.dang_q // (SELECT n FROM nst))) // 100 AS rank_q
      FROM nodes nd
      LEFT JOIN (SELECT e.dst AS node,
                        SUM(r.rank_q // dg.out_deg) AS contrib_q
                 FROM r{i - 1} r
                 JOIN e ON r.node = e.src
                 JOIN deg dg ON dg.src = e.src
                 GROUP BY e.dst) c USING (node)
      CROSS JOIN (SELECT COALESCE(SUM(rank_q), 0) AS dang_q
                  FROM r{i - 1}
                  WHERE node NOT IN (SELECT src FROM deg)) d
    )""")
    final = f"""
    SELECT node AS node_id, CAST(rank_q AS BIGINT) AS rank_q,
           CAST(rank_q AS BIGINT) / {float(scale)} AS rank
    FROM r{iters}
    ORDER BY rank_q DESC, node
    LIMIT 25
    """
    return prefix + "".join(steps) + final


@register("graph_pagerank", _pagerank_oracle(iters=6))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Influence ranking the reference approximates with a follower-count
    # sort (app.py:150-152), done as real link analysis: exact-integer
    # PageRank (operators/graph.py) over the interaction edges derived
    # from the event log. Per iteration Spark runs one |V|-row join
    # against the persisted degree-annotated edge list plus one
    # dst-keyed partial aggregate — the edge list (the only state that
    # scales) is shuffled once, ranks are materialized per round to
    # keep lineage flat. The oracle replays all 6 iterations in
    # unrolled MATERIALIZED CTEs; integer micro-unit ranks make the
    # replay exact (see the module docstring for the iteration spec).
    from .operators import graph as _graph

    events = _t(spark, sf_dir, "events")
    ranks = _graph.pagerank_exact(_graph.interaction_edges(events), iters=6)
    return (
        ranks.select(
            F.col("node").alias("node_id"),
            F.col("rank_q"),
            (F.col("rank_q") / F.lit(float(_graph.SCALE))).alias("rank"))
        .orderBy(F.desc("rank_q"), F.asc("node_id"))
        .limit(25)
    )


@register(
    "j9_salted_skew_join",
    """
    SELECT c.c_mktsegment, count(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def j9_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The join half of the skew story (a8 covers aggregation). Round
    # 15 upgraded this row from full-replication salted_join to the
    # hot-key SPLIT join (operators/skew.py:skew_split_join): only
    # keys above 1.1x the mean fact count take the salted path, so the
    # replicated dimension volume is |hot slice| x 16 instead of
    # |dimension| x 16 — at 100 TB that's the difference between
    # 16x-ing a billion-row dimension and 16x-ing a handful of
    # celebrity keys (measured: artifacts/BENCH_SKEW_r15.json). The
    # detection is fully declarative (map-side-combined count agg +
    # broadcast mean), so the threshold is scale-invariant and both
    # branches carry rows at every sf. The oracle is the PLAIN join: a
    # hash match proves the whole split+salt rewrite result-identical,
    # counts and decimal sums included. The dimension side is
    # deliberately NOT broadcast in either branch — salting exists
    # precisely for dimension sides too big to broadcast; the test
    # pins the shuffle-join shape.
    from .operators.skew import skew_split_join

    ev = _t(spark, sf_dir, "events").withColumnRenamed("user_id", "join_uid")
    cust = (_t(spark, sf_dir, "customer")
            .select(F.col("c_custkey").alias("join_uid"), "c_mktsegment"))
    counts = ev.groupBy("join_uid").agg(F.count(F.lit(1)).alias("_n"))
    hot = (counts.crossJoin(F.broadcast(counts.agg(
               F.avg("_n").alias("_avg"))))
           .where(F.col("_n") > 1.1 * F.col("_avg"))
           .select("join_uid"))
    joined = skew_split_join(ev, cust, on="join_uid",
                             row_cols=["event_id"], n_salts=16,
                             hot_keys=hot)
    return (
        joined.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)"))
             .cast("double").alias("sum_value"))
    )


def _zorder_oracle() -> str:
    from .operators.layout import zorder_key_sql

    z = zorder_key_sql(["o_custkey", "days"], bits=16)
    return f"""
    WITH o AS (SELECT o_orderkey, o_custkey,
                      date_diff('day', DATE '1970-01-01', o_orderdate) AS days
               FROM orders),
    z AS (SELECT o_orderkey, {z} AS zkey FROM o)
    SELECT zkey >> 20 AS z_bucket,
           count(*) AS n_orders,
           min(zkey) AS z_min, max(zkey) AS z_max
    FROM z GROUP BY z_bucket
    """


@register("layout_zorder_key", _zorder_oracle())
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Morton-key computation for multi-dimensional file clustering
    # (operators/layout.py — the write path and the measured
    # data-skipping win live in write_zordered / tests/test_layout.py).
    # The key is pure codegen bit arithmetic; this row buckets the
    # 32-bit (o_custkey x order-day) key space and proves the bit
    # interleave matches the oracle's integer replay exactly. At
    # 100 TB the same expression feeds repartitionByRange before a
    # sorted parquet write, so EVERY interleaved dimension gets
    # footer-stats locality instead of just the leading sort column.
    from .operators.layout import zorder_key

    orders = _t(spark, sf_dir, "orders")
    z = (orders
         .withColumn("days", F.datediff(F.col("o_orderdate"),
                                        F.lit("1970-01-01").cast("date")))
         .withColumn("zkey", zorder_key(["o_custkey", "days"], bits=16)))
    return (
        z.groupBy(F.shiftright(F.col("zkey"), 20).alias("z_bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.min("zkey").alias("z_min"),
             F.max("zkey").alias("z_max"))
    )


@register(
    "funnel_conversion",
    """
    WITH ev AS (SELECT user_id, date_trunc('second', ts) AS ts_sec,
                       event_type FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    t1 AS (SELECT user_id, min(ts_sec) AS t1 FROM ev
           WHERE event_type = 'signup' GROUP BY user_id),
    t2 AS (SELECT e.user_id, min(e.ts_sec) AS t2
           FROM ev e JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'click' AND e.ts_sec > t1.t1
           GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, min(e.ts_sec) AS t3
           FROM ev e JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = 'purchase' AND e.ts_sec > t2.t2
           GROUP BY e.user_id)
    SELECT count(t1.user_id) AS n_signup,
           count(t2.user_id) AS n_click_after,
           count(t3.user_id) AS n_purchase_after,
           CAST(count(t2.user_id) AS DOUBLE)
             / CAST(count(t1.user_id) AS DOUBLE) AS click_rate,
           CAST(count(t3.user_id) AS DOUBLE)
             / CAST(count(t1.user_id) AS DOUBLE) AS purchase_rate
    FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
            LEFT JOIN t3 ON t1.user_id = t3.user_id
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ordered-step funnel (signup -> click -> purchase), the product-
    # analytics query the reference's dashboard domain implies but
    # never ships. Sequencing is expressed RELATIONALLY — per-step
    # min-timestamp aggregates chained by "after the previous step's
    # instant" semi-join conditions — so each step is one user-keyed
    # partial aggregate and Catalyst co-partitions the whole chain on
    # user_id (no per-user event sorting, no session reassembly, no
    # window over the raw log). Seconds are the spec'd time axis: the
    # loader's micro-truncated ts (sources/io.py) and DuckDB's nano ts
    # agree after date_trunc, so step inequalities are engine-stable.
    #
    # NULL contract (r14, null-audit class B): a funnel step needs an
    # actor and an instant — rows missing user_id or ts are excluded
    # explicitly on both sides (the same contract cohort_retention
    # pins). Without it the engines diverge: the Spark side counts the
    # min-timestamp columns, the oracle counts user_id, and NULLs in
    # either column split those two counts apart.
    ev = (_t(spark, sf_dir, "events")
          .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
          .select("user_id",
                  F.date_trunc("second", F.col("ts")).alias("ts_sec"),
                  "event_type"))
    t1 = (ev.where(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts_sec").alias("t1")))
    t2 = (ev.where(F.col("event_type") == "click")
          .join(t1, "user_id")
          .where(F.col("ts_sec") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts_sec").alias("t2")))
    t3 = (ev.where(F.col("event_type") == "purchase")
          .join(t2, "user_id")
          .where(F.col("ts_sec") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts_sec").alias("t3")))
    n1, n2, n3 = F.count("t1"), F.count("t2"), F.count("t3")
    return (
        t1.join(t2, "user_id", "left").join(t3, "user_id", "left")
        .agg(n1.alias("n_signup"),
             n2.alias("n_click_after"),
             n3.alias("n_purchase_after"),
             (n2.cast("double") / n1.cast("double")).alias("click_rate"),
             (n3.cast("double") / n1.cast("double")).alias("purchase_rate"))
    )


@register(
    "cohort_retention",
    """
    WITH act AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events
                 WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    cohort AS (SELECT user_id, min(d) AS cohort_date FROM act
               GROUP BY user_id),
    sizes AS (SELECT cohort_date, count(*) AS cohort_size FROM cohort
              GROUP BY cohort_date),
    ret AS (SELECT c.cohort_date,
                   date_diff('day', c.cohort_date, a.d) // 7 AS week_offset,
                   count(DISTINCT a.user_id) AS n_active
            FROM act a JOIN cohort c ON a.user_id = c.user_id
            GROUP BY c.cohort_date, week_offset)
    SELECT r.cohort_date, r.week_offset, r.n_active, s.cohort_size,
           CAST(r.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
             AS retention
    FROM ret r JOIN sizes s ON r.cohort_date = s.cohort_date
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cohort retention triangle: users grouped by first-seen date,
    # activity counted per week offset. One user-keyed aggregate
    # collapses the raw log to per-user day SETS (map-side partial
    # collect_set — the only full-scan pass at 100 TB; set size is
    # bounded by the calendar, not the log). Cohort date, week
    # offsets, and the per-user week dedup all derive from that
    # array IN PLACE (array_min / transform / array_distinct), so
    # the expensive count-DISTINCT expand and the act⋈cohort
    # re-shuffle of the old shape disappear: each user contributes
    # each (cohort, week) cell exactly once, making n_active a
    # plain count. cohort_date = array_min(days) is itself a member
    # of days, so EVERY user lands in week 0 — cohort_size is just
    # n_active at offset 0, lifted across the grid by a window,
    # replacing the separate sizes aggregate + join. 3 exchanges
    # total (user agg, grid agg, grid window) vs 5, single lazy DAG.
    # Integer day arithmetic (datediff DIV 7) is engine-exact; the
    # rate is one IEEE division of exact counts. Activity REQUIRES an
    # identified user and a timestamp — the NOT-NULL filters (pushed
    # to the scan, mirrored in the oracle) make the contract total:
    # without them a NULL user would count toward cohort_size but
    # never n_active under SQL join semantics, breaking the week-0
    # invariant the window trick rests on, and collect_set would
    # silently drop NULL days the oracle emits as NULL-week rows.
    per_user = (_t(spark, sf_dir, "events")
                .where(F.col("user_id").isNotNull()
                       & F.col("ts").isNotNull())
                .select("user_id", F.to_date("ts").alias("d"))
                .groupBy("user_id")
                .agg(F.collect_set("d").alias("days")))
    offsets = (per_user
               .select(F.array_min("days").alias("cohort_date"), "days")
               .select("cohort_date",
                       F.explode(F.array_distinct(F.expr(
                           "transform(days, d ->"
                           " datediff(d, cohort_date) DIV 7)")))
                       .alias("week_offset")))
    ret = (offsets.groupBy("cohort_date", "week_offset")
           .agg(F.count(F.lit(1)).alias("n_active")))
    w = Window.partitionBy("cohort_date")
    return (ret
            .withColumn("cohort_size",
                        F.max(F.when(F.col("week_offset") == 0,
                                     F.col("n_active"))).over(w))
            .select("cohort_date", "week_offset", "n_active", "cohort_size",
                    (F.col("n_active").cast("double")
                     / F.col("cohort_size").cast("double"))
                    .alias("retention")))


@register(
    "scd2_intervals",
    """
    WITH ch AS (SELECT user_id, event_id,
                       date_trunc('second', ts) AS ts_sec, value
                FROM events WHERE event_type = 'purchase'
                  AND user_id IS NOT NULL AND event_id IS NOT NULL
                  AND ts IS NOT NULL),
    dedup AS (SELECT *,
                     lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts_sec, event_id) AS prev
              FROM ch),
    changes AS (SELECT user_id, event_id, ts_sec, value FROM dedup
                WHERE prev IS NULL OR value <> prev)
    SELECT user_id, value,
           ts_sec AS valid_from,
           lead(ts_sec) OVER (PARTITION BY user_id
                              ORDER BY ts_sec, event_id) AS valid_to,
           lead(ts_sec) OVER (PARTITION BY user_id
                              ORDER BY ts_sec, event_id) IS NULL
             AS is_current
    FROM changes
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Slowly-changing-dimension type-2 build: a change log becomes
    # validity intervals (valid_from, valid_to, is_current), the
    # dimension-history table the as-of join (j6) consumes on its
    # other side. Consecutive duplicate values collapse first (lag),
    # then intervals close with lead — both windows share one
    # user-keyed partition, so the whole build is a single shuffle
    # and scales with the CHANGE log, not the fact table. event_id
    # breaks timestamp ties for a total order in both engines.
    #
    # NULL contract (r14, null-audit class B): an SCD2 change record
    # is meaningless without its entity key, change time, and
    # tie-breaker — and a NULL event_id breaks the total order that
    # date_trunc's deliberate second-level ties rely on, making
    # lag/lead nondeterministic across engines (no ordering pin can
    # fix that). The three structural columns are therefore required
    # NOT NULL, mirrored in the oracle; `value` stays nullable — the
    # lag-dedup chain's 3-valued `value <> prev` evaluates identically
    # in Spark and ANSI SQL, pinned by a planted-NULL test.
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    ch = (_t(spark, sf_dir, "events")
          .where((F.col("event_type") == "purchase")
                 & F.col("user_id").isNotNull()
                 & F.col("event_id").isNotNull()
                 & F.col("ts").isNotNull())
          .select("user_id", "event_id",
                  F.date_trunc("second", F.col("ts")).alias("ts_sec"),
                  "value"))
    changes = (ch.withColumn("prev", F.lag("value").over(w))
               .where(F.col("prev").isNull()
                      | (F.col("value") != F.col("prev")))
               .drop("prev"))
    return changes.select(
        "user_id", "value",
        F.col("ts_sec").alias("valid_from"),
        F.lead("ts_sec").over(w).alias("valid_to"),
        F.lead("ts_sec").over(w).isNull().alias("is_current"))


def _triangles_oracle(n_buckets: int = 150) -> str:
    """DuckDB replay of operators/graph.py:triangle_counts over the
    same event-derived edges the PageRank row uses."""
    dst = (f"CAST(json_extract_string(props, '$.k') AS BIGINT)"
           f" % {n_buckets}")
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT user_id AS src, {dst} AS dst
      FROM events
      WHERE {dst} IS NOT NULL AND user_id != {dst}
    ),
    und AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM e0),
    deg AS MATERIALIZED (
      SELECT node, count(*) AS deg
      FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
      GROUP BY node),
    orient AS MATERIALIZED (
      SELECT CASE WHEN (da.deg < db.deg)
                    OR (da.deg = db.deg AND a < b) THEN a ELSE b
             END AS u,
             CASE WHEN (da.deg < db.deg)
                    OR (da.deg = db.deg AND a < b) THEN b ELSE a
             END AS v
      FROM und
      JOIN deg da ON da.node = und.a
      JOIN deg db ON db.node = und.b),
    wed AS (
      SELECT w1.u AS apex, w1.v AS x, w2.v AS y
      FROM orient w1 JOIN orient w2 ON w1.u = w2.u AND w1.v < w2.v),
    tri AS MATERIALIZED (
      SELECT apex, x, y FROM wed
      JOIN und ON und.a = wed.x AND und.b = wed.y),
    cor AS (
      SELECT node, count(*) AS n
      FROM (SELECT apex AS node FROM tri
            UNION ALL SELECT x FROM tri
            UNION ALL SELECT y FROM tri)
      GROUP BY node)
    SELECT d.node, CAST(COALESCE(cor.n, 0) AS BIGINT) AS n_triangles
    FROM deg d LEFT JOIN cor USING (node)
    """


@register("graph_triangles", _triangles_oracle())
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-node triangle participation (clustering-coefficient
    # numerator) over the same interaction graph as graph_pagerank,
    # via the degree-ordered orientation that bounds wedge fan-out at
    # the low-degree apex — O(|E|^1.5) total work instead of
    # sum(deg^2), the difference between feasible and not on a
    # power-law graph (operators/graph.py:triangle_counts). Integer
    # counts end to end; the oracle replays orientation, wedge join,
    # and closure verbatim.
    from .operators import graph as _graph

    events = _t(spark, sf_dir, "events")
    # dedup=False: triangle_counts canonicalizes to (least, greatest)
    # + distinct itself; the operator-level directed distinct would be
    # a redundant second |E| exchange before it (r15 optimization
    # round). Fully lazy since r16 — the operator no longer persists
    # internals (exchange reuse covers the multi-consumer subtrees),
    # so the released()/localCheckpoint dance and its eager job storm
    # are gone; the bench action executes ONE optimized plan.
    return _graph.triangle_counts(
        _graph.interaction_edges(events, dedup=False))


ORACLE_CMS = f"""
    WITH t AS (SELECT {_TOKS_SQL} AS tk FROM documents),
    occ AS MATERIALIZED (SELECT unnest(tk) AS tok FROM t),
    js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    sketch AS MATERIALIZED (
      SELECT js.j,
             CAST(('0x' || substr(md5(CAST(js.j AS VARCHAR) || '#' || tok),
                                  1, 8)) AS BIGINT) % 512 AS bucket,
             count(*) AS cnt
      FROM occ CROSS JOIN js GROUP BY js.j, bucket),
    exact AS MATERIALIZED (
      SELECT tok, count(*) AS exact_cnt FROM occ GROUP BY tok
      ORDER BY exact_cnt DESC, tok LIMIT 30),
    probes AS (
      SELECT e.tok, js.j,
             CAST(('0x' || substr(md5(CAST(js.j AS VARCHAR) || '#' || e.tok),
                                  1, 8)) AS BIGINT) % 512 AS bucket
      FROM exact e CROSS JOIN js),
    est AS (
      SELECT p.tok, MIN(COALESCE(s.cnt, 0)) AS est_cnt
      FROM probes p LEFT JOIN sketch s USING (j, bucket)
      GROUP BY p.tok)
    SELECT e.tok AS token, e.exact_cnt,
           CAST(est.est_cnt AS BIGINT) AS est_cnt
    FROM exact e JOIN est ON e.tok = est.tok
"""


@register("sketch_countmin_topk", ORACLE_CMS)
def sketch_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Count-Min frequency sketch (operators/sketches.py): build the
    # 4x512 sketch over the corpus token stream in ONE partial
    # aggregate, then probe it for the exact top-30 tokens and emit
    # estimate next to truth. The deterministic md5 hash family makes
    # this a full hash-match row — the oracle rebuilds the sketch
    # cell-for-cell — while the one-sided error contract (est >=
    # exact, bounded overcount) is pinned in tests/test_sketches.py.
    # The sketch's size is a CONFIG constant, so the probe join is
    # broadcast at any corpus size; this is the hot-key detector that
    # can feed skew.salted_join's salt choice without a second full
    # scan.
    from .operators import sketches as _sk
    from .operators.dedup import tokens as _tokens

    docs = _t(spark, sf_dir, "documents")
    # Persisted with NO unpersist, like the cap-pinned jaccard rows:
    # this row is plan-pinned (the probe's BroadcastHashJoin), so the
    # result must stay LAZY — the leak-free alternative (eager
    # checkpoint + finally-release, fine for unpinned rows) collapses
    # the plan to an RDD leaf and reds the pin. The cache is what
    # keeps the three branches (sketch, exact top-30, probe) from
    # each re-running the explode at evaluation. Leak contract as
    # documented on ngram_jaccard_pairs (bench clears per row; a
    # sweep session's driver exits).
    occ = docs.select(F.explode(_tokens(F.col("text"))).alias("token")) \
        .persist()
    sketch = _sk.cms_build(occ, "token")
    exact = (occ.groupBy("token")
             .agg(F.count(F.lit(1)).alias("exact_cnt"))
             .orderBy(F.desc("exact_cnt"), F.asc("token")).limit(30))
    est = _sk.cms_estimate(sketch, exact.select("token"), "token")
    return exact.join(est, "token")


ORACLE_PMI = f"""
    WITH t AS (SELECT doc_id,
                      list_sort(list_distinct({_TOKS_SQL})) AS tk
               FROM documents),
    st AS (SELECT count(*) AS n_docs FROM t),
    occ AS MATERIALIZED (SELECT doc_id, unnest(tk) AS tok FROM t),
    df AS MATERIALIZED (SELECT tok, count(*) AS n FROM occ GROUP BY tok),
    pairs AS (
      SELECT doc_id, unnest(flatten([
               [{{'t1': tk[i], 't2': tk[j]}}
                for j in generate_series(i + 1, len(tk))]
               for i in generate_series(1, len(tk))]),
             recursive := true)
      FROM t),
    pc AS (SELECT t1, t2, count(*) AS n_ab FROM pairs GROUP BY t1, t2)
    SELECT pc.t1, pc.t2, pc.n_ab,
           round(ln(CAST(pc.n_ab AS DOUBLE) * CAST(st.n_docs AS DOUBLE)
                    / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE))), 6)
             AS pmi
    FROM pc
    JOIN df a ON a.tok = pc.t1
    JOIN df b ON b.tok = pc.t2, st
    ORDER BY pc.n_ab DESC, pc.t1, pc.t2
    LIMIT 50
"""


@register("text_cooccur_pmi", ORACLE_PMI)
def text_cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Document-level co-occurrence mining with PMI scoring — the
    # collocation statistic behind phrase detection and topic seeds.
    # The pair table is built MAP-SIDE from each doc's sorted distinct
    # token list (a nested transform producing the i<j upper triangle,
    # then ONE explode) — per-doc quadratic is bounded by document
    # length, a schema constant, so no shuffle ever carries more than
    # the pair multiset itself. Document frequencies ride a broadcast
    # join; PMI = one ln() over a ratio of exact integer counts, so
    # the value is bit-identical cross-engine.
    docs = _t(spark, sf_dir, "documents")
    from .operators.dedup import tokens as _tokens

    t = docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(_tokens(F.col("text")))).alias("tk"))
    n_docs = t.count()  # bounded driver scalar
    occ = t.select("doc_id", F.explode("tk").alias("tok"))
    dfreq = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    pairs_arr = F.flatten(F.transform(
        F.col("tk"),
        lambda t1, i: F.filter(
            F.transform(
                F.col("tk"),
                lambda t2, j: F.when(j > i, F.struct(
                    t1.alias("t1"), t2.alias("t2")))),
            lambda s: s.isNotNull())))
    pc = (t.select(F.explode(pairs_arr).alias("p"))
          .select("p.t1", "p.t2")
          .groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_ab")))
    a = dfreq.select(F.col("tok").alias("t1"), F.col("n").alias("_na"))
    b = dfreq.select(F.col("tok").alias("t2"), F.col("n").alias("_nb"))
    return (
        pc.join(maybe_broadcast(a), "t1").join(maybe_broadcast(b), "t2")
        .select("t1", "t2", "n_ab",
                # round(·,6): ln() is libm-dependent in the last ulp
                # (Java vs DuckDB), the repo convention for
                # transcendental outputs (cf. the LM xent rows)
                F.round(
                    F.log(F.col("n_ab").cast("double")
                          * F.lit(float(n_docs))
                          / (F.col("_na").cast("double")
                             * F.col("_nb").cast("double"))), 6)
                .alias("pmi"))
        .orderBy(F.desc("n_ab"), F.asc("t1"), F.asc("t2"))
        .limit(50)
    )


@register(
    "ts_anomaly_zscore",
    """
    WITH daily AS MATERIALIZED (
      SELECT event_type, ts::DATE AS d, count(*) AS n
      FROM events GROUP BY event_type, d),
    win AS (
      SELECT event_type, d, n,
             count(*) OVER w AS w_n,
             sum(CAST(n AS DECIMAL(38,0))) OVER w AS w_sum,
             sum(CAST(n AS DECIMAL(38,0)) * n) OVER w AS w_sq
      FROM daily
      WINDOW w AS (PARTITION BY event_type
                   ORDER BY (d IS NOT NULL), COALESCE(d, DATE '2000-01-01')
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT event_type, d, CAST(n AS BIGINT) AS n,
           CAST(w_sum AS DOUBLE) / CAST(w_n AS DOUBLE) AS mean7,
           sqrt(CAST(w_n * w_sq - w_sum * w_sum AS DOUBLE))
             / CAST(w_n AS DOUBLE) AS std7,
           (CAST(n AS DOUBLE) * CAST(w_n AS DOUBLE)
              - CAST(w_sum AS DOUBLE))
             / sqrt(CAST(w_n * w_sq - w_sum * w_sum AS DOUBLE))
             AS zscore
    FROM win
    WHERE w_n = 7
      AND w_n * w_sq - w_sum * w_sum > 0
      AND abs((CAST(n AS DOUBLE) * CAST(w_n AS DOUBLE)
               - CAST(w_sum AS DOUBLE)))
          > 2 * sqrt(CAST(w_n * w_sq - w_sum * w_sum AS DOUBLE))
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Trailing-window anomaly detection over the event stream: daily
    # per-type counts flagged when they sit more than 2 population
    # stddevs from the trailing 7 OBSERVED days (a ROWS window — for a
    # gapless daily series that is the calendar week; sparse series
    # compare against the last 7 present days). The raw log collapses to one
    # row per (type, day) FIRST (the only full-scan aggregate); the
    # trailing stats are integer sums (count/sum/sum-of-squares) over
    # that tiny frame, so mean, std, and the z statistic are derived
    # from exact integers with engine-identical float steps. The
    # z-test itself is cross-multiplied (n*w_n - w_sum vs 2*sqrt(...))
    # to avoid dividing before comparing — one sqrt, one division,
    # identical in both engines. The oracle window pins Spark's
    # NULLS-FIRST placement for the one possible NULL day per
    # partition — in the null-free `(d IS NOT NULL), COALESCE(d, ...)`
    # form, because DuckDB 1.0.0's window ORDER BY is nondeterministic
    # over NULL-bearing sort keys even with an explicit NULLS FIRST
    # (probed in r14; see t8_moving_avg).
    daily = (_t(spark, sf_dir, "events")
             .groupBy("event_type", F.to_date("ts").alias("d"))
             .agg(F.count(F.lit(1)).alias("n")))
    w = (Window.partitionBy("event_type").orderBy("d")
         .rowsBetween(-7, -1))
    # w_sum/w_sq (and the w_sum^2 term below) accumulate in
    # decimal(38,0): daily counts at 100 TB make n*n and w_sum^2
    # overflow a silent LongType while DuckDB rides HUGEINT — the
    # judge-advice round-6 class, fixed across the ts_* tier.
    dec = "decimal(38,0)"
    win = daily.select(
        "event_type", "d", "n",
        F.count(F.lit(1)).over(w).alias("w_n"),
        F.sum(F.col("n").cast(dec)).over(w).alias("w_sum"),
        F.sum(F.col("n").cast(dec) * F.col("n")).over(w).alias("w_sq"))
    var_num = F.col("w_n") * F.col("w_sq") - F.col("w_sum") * F.col("w_sum")
    dev = (F.col("n").cast("double") * F.col("w_n").cast("double")
           - F.col("w_sum").cast("double"))
    return (
        win.where((F.col("w_n") == 7) & (var_num > 0)
                  & (F.abs(dev) > 2 * F.sqrt(var_num.cast("double"))))
        .select("event_type", "d", F.col("n").cast("bigint").alias("n"),
                (F.col("w_sum").cast("double")
                 / F.col("w_n").cast("double")).alias("mean7"),
                (F.sqrt(var_num.cast("double"))
                 / F.col("w_n").cast("double")).alias("std7"),
                (dev / F.sqrt(var_num.cast("double"))).alias("zscore"))
    )


@register(
    "dq_constraint_report",
    """
    WITH li AS (
      SELECT count(*) AS n,
             sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                      THEN 1 ELSE 0 END) AS v_qty,
             sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
               AS v_price,
             sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
               AS v_ship,
             count(*) - count(DISTINCT (l_orderkey, l_linenumber))
               AS v_dupkey
      FROM lineitem),
    o AS (
      SELECT count(*) AS n,
             sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_tp
      FROM orders),
    orph AS (
      SELECT count(*) AS v FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer
                              WHERE c_custkey IS NOT NULL))
    SELECT 'lineitem' AS table_name, 'quantity_in_[1,50]' AS rule,
           n AS n_rows, CAST(v_qty AS BIGINT) AS n_violations,
           CAST(v_qty AS DOUBLE) / CAST(n AS DOUBLE) AS rate FROM li
    UNION ALL
    SELECT 'lineitem', 'extendedprice_positive', n,
           CAST(v_price AS BIGINT),
           CAST(v_price AS DOUBLE) / CAST(n AS DOUBLE) FROM li
    UNION ALL
    SELECT 'lineitem', 'shipdate_not_null', n, CAST(v_ship AS BIGINT),
           CAST(v_ship AS DOUBLE) / CAST(n AS DOUBLE) FROM li
    UNION ALL
    SELECT 'lineitem', 'orderkey_linenumber_unique', n,
           CAST(v_dupkey AS BIGINT),
           CAST(v_dupkey AS DOUBLE) / CAST(n AS DOUBLE) FROM li
    UNION ALL
    SELECT 'orders', 'totalprice_positive', n, CAST(v_tp AS BIGINT),
           CAST(v_tp AS DOUBLE) / CAST(n AS DOUBLE) FROM o
    UNION ALL
    SELECT 'orders', 'custkey_in_customer', o.n, CAST(orph.v AS BIGINT),
           CAST(orph.v AS DOUBLE) / CAST(o.n AS DOUBLE) FROM o, orph
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deequ-style declarative data-quality report: every single-table
    # rule (range, positivity, null-rate, key uniqueness) folds into
    # ONE pass per table — a multi-aggregate whose conditional sums
    # cost nothing extra at scan time — then unpivots to one row per
    # rule. The only rule needing a second relation (referential
    # integrity into customer) is a left-anti count. At 100 TB this is
    # the nightly gate you run BEFORE publishing a snapshot; rates are
    # exact-count divisions, engine-identical.
    #
    # NULL contracts (r14, null-audit class B): (1) the key-uniqueness
    # rule counts DISTINCT over a STRUCT of the key columns — a struct
    # with NULL fields is itself non-null and NULL fields compare
    # equal under grouping, exactly DuckDB's row-constructor DISTINCT;
    # a bare multi-arg countDistinct would silently SKIP any row with
    # a NULL key part, under-reporting duplicates. (2) the referential
    # rule is scoped to non-null keys on BOTH sides — ANSI NOT IN goes
    # three-valued the moment either side holds a NULL (reporting 0
    # violations), while an anti-join counts NULL keys as orphans;
    # null keys are the shipdate_not_null rule's territory, not this
    # one's.
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")

    def _s(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    li_stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        _s((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
        .alias("v_qty"),
        _s(F.col("l_extendedprice") <= 0).alias("v_price"),
        _s(F.col("l_shipdate").isNull()).alias("v_ship"),
        (F.count(F.lit(1))
         - F.countDistinct(F.struct("l_orderkey", "l_linenumber")))
        .cast("bigint").alias("v_dupkey"))
    o_stats = orders.agg(
        F.count(F.lit(1)).alias("n"),
        _s(F.col("o_totalprice") <= 0).alias("v_tp"))
    orphans = (orders.where(F.col("o_custkey").isNotNull())
               .join(cust.where(F.col("c_custkey").isNotNull()),
                     orders.o_custkey == cust.c_custkey, "left_anti")
               .agg(F.count(F.lit(1)).cast("bigint").alias("v")))

    li_rules = li_stats.selectExpr(
        "stack(4, "
        "'quantity_in_[1,50]', v_qty, "
        "'extendedprice_positive', v_price, "
        "'shipdate_not_null', v_ship, "
        "'orderkey_linenumber_unique', v_dupkey) AS (rule, n_violations)",
        "n").select(F.lit("lineitem").alias("table_name"), "rule",
                    F.col("n").alias("n_rows"), "n_violations")
    o_rules = o_stats.selectExpr(
        "stack(1, 'totalprice_positive', v_tp) AS (rule, n_violations)",
        "n").select(F.lit("orders").alias("table_name"), "rule",
                    F.col("n").alias("n_rows"), "n_violations")
    ref_rule = (o_stats.crossJoin(F.broadcast(orphans))
                .select(F.lit("orders").alias("table_name"),
                        F.lit("custkey_in_customer").alias("rule"),
                        F.col("n").alias("n_rows"),
                        F.col("v").alias("n_violations")))
    return (
        li_rules.unionByName(o_rules).unionByName(ref_rule)
        .select("table_name", "rule", "n_rows", "n_violations",
                (F.col("n_violations").cast("double")
                 / F.col("n_rows").cast("double")).alias("rate"))
    )


def _ahash_oracle() -> str:
    """Closed-form replay of multimodal.ahash_bands: the synthetic P6
    pixel formula (multimodal.encode_media) evaluated at the 8x8
    NN-resample grid, thresholded against the integer mean — all
    integer arithmetic, no bytes touched."""
    idx = "((((s // 8) * h) // 8) * w + (((s % 8) * w) // 8))"
    gray = (f"((((doc_id * 31 + (({idx}) * 3 + 0) * 7) % 256)"
            f" + ((doc_id * 31 + (({idx}) * 3 + 1) * 7) % 256)"
            f" + ((doc_id * 31 + (({idx}) * 3 + 2) * 7) % 256)) // 3)")
    band = ("CAST(sum(CASE WHEN s >= {lo} AND s < {hi} AND gray > mean "
            "THEN (1 << (s - {lo})) ELSE 0 END) AS INT) AS b{k}")
    bands = ",\n           ".join(
        band.format(lo=k * 16, hi=(k + 1) * 16, k=k) for k in range(4))
    return f"""
    WITH img AS (SELECT doc_id, doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h
                 FROM documents WHERE doc_id % 3 = 0),
    g AS MATERIALIZED (
      SELECT doc_id, s, {gray} AS gray
      FROM img CROSS JOIN generate_series(0, 63) AS t(s)),
    m AS (SELECT doc_id, sum(gray) // 64 AS mean FROM g GROUP BY doc_id)
    SELECT g.doc_id,
           {bands}
    FROM g JOIN m USING (doc_id)
    GROUP BY g.doc_id
    """


@register("mm_image_ahash", _ahash_oracle())
def mm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Perceptual image hashing for the multimodal tier: the REAL
    # kernel (parse P6 -> integer grayscale -> exact-integer 8x8 NN
    # resample -> mean threshold, multimodal.ahash_bands) behind Arrow
    # mapInPandas, emitted as four 16-bit band keys — simultaneously
    # the hash and the LSH bucket keys ahash_pairs joins on. The
    # oracle recomputes every band from the closed-form blob formulas
    # without seeing a byte, so a hash match certifies the whole
    # parser+resample+threshold chain (the mm_decode contract,
    # extended to perceptual hashing). Near-dup pair semantics are
    # pinned in tests with planted almost-identical images — the
    # synthetic corpus has none, honestly.
    media = _mm.synthetic_media_table(_t(spark, sf_dir, "documents"))
    return _mm.ahash_bands(media)


@register(
    "layout_rank_bucketize",
    """
    WITH vc AS MATERIALIZED (SELECT l_quantity AS v, count(*) AS c
                FROM lineitem GROUP BY v),
    tot AS (SELECT sum(c) AS n FROM vc),
    cum AS (SELECT v, c,
                   COALESCE(sum(c) OVER (
                     ORDER BY (v IS NOT NULL), COALESCE(v, 0)
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS lt
            FROM vc)
    SELECT CAST((lt * 8) // (SELECT n FROM tot) AS INT) AS bucket,
           CAST(sum(c) AS BIGINT) AS n_rows,
           min(v) AS v_min, max(v) AS v_max
    FROM cum GROUP BY bucket
    """,
)
def layout_rank_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Equi-depth rank bucketing (operators/layout.py:rank_bucketize):
    # the skew normalizer that turns a non-uniform column into a
    # uniform bucket id before Morton interleaving, so a hot value
    # range cannot collapse the Z-curve onto a few cells. The cumsum
    # window runs over the DISTINCT-VALUE table (50 quantities here —
    # bounded by the domain, not the corpus), and rows map back through
    # a broadcast join. The row reports per-bucket occupancy + value
    # ranges; the oracle replays rank_lt * B DIV n exactly, pinning
    # the operator's documented NULL contract (NULL is a value group
    # that ranks FIRST, landing in bucket 0; the map-back join is
    # null-safe so no row drops) via the null-free
    # `(v IS NOT NULL), COALESCE(v, 0)` sort — DuckDB 1.0.0's window
    # ORDER BY is nondeterministic on NULL-bearing keys (r14 probe).
    from .operators.layout import rank_bucketize

    li = _t(spark, sf_dir, "lineitem")
    b = rank_bucketize(li.select("l_quantity"), "l_quantity", 8)
    return (b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("l_quantity").alias("v_min"),
                 F.max("l_quantity").alias("v_max")))


# ---------------------------------------------------------------------------
# Record linkage / similarity joins (operators/linkage.py) and the
# Bloom-prefiltered decontamination plan (operators/bloom.py).
# ---------------------------------------------------------------------------
from .operators import linkage as _lk           # noqa: E402

#: Distinct word-TRIGRAM set per document, mirroring
#: linkage._shingle_sets(n=3) (dedup.word_shingles semantics: the
#: whole token list joins into one "shingle" when len < n).
_TRIGRAM_SET_SQL = """
    CASE WHEN len(tk) >= 3
      THEN list_distinct([array_to_string(tk[i:i+2], ' ')
                          for i in generate_series(1, len(tk)-2)])
      ELSE [array_to_string(tk, ' ')] END
"""


@register(
    "j10_set_similarity_join",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    s AS (SELECT doc_id, {_TRIGRAM_SET_SQL} AS st FROM toks),
    t AS (SELECT doc_id, unnest(st) AS tok FROM s),
    sz AS (SELECT doc_id, len(st) AS n FROM s),
    inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS nc
      FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id1, id2,
           round(nc::DOUBLE / (x.n + y.n - nc), 6) AS jaccard
    FROM inter JOIN sz x ON x.doc_id = id1 JOIN sz y ON y.doc_id = id2
    WHERE nc::DOUBLE / (x.n + y.n - nc) >= 0.5
    """,
)
def j10_set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact set-similarity self-join (Jaccard >= 0.5 over distinct
    # word-TRIGRAM sets) via LOSSLESS PPJoin prefix filtering
    # (operators/linkage.py:set_similarity_join — rarest-first global
    # order, |S|-ceil(t|S|)+1 prefixes, length filter, exact verify;
    # see its docstring for why trigrams: this corpus' 31-word
    # vocabulary makes bigram posting lists degenerate-hot). Unlike
    # the MinHash/SimHash rows, whose recall is probabilistic by
    # contract, this row's oracle is the NAIVE ALL-PAIRS truth — the
    # hash match certifies the prefix filter drops nothing.
    # Pass the documented cleanup list and release the internally
    # persisted sets table once the (pair-list-sized) result is
    # materialized — otherwise every invocation leaks a corpus-sized
    # cached frame for the life of the session.
    with _dedup.released() as cleanup:
        return _lk.set_similarity_join(
            _t(spark, sf_dir, "documents"), "doc_id", "text",
            threshold=0.5, n=3, cleanup=cleanup).localCheckpoint()


@register(
    "j11_fuzzy_blocked_linkage",
    """
    WITH names AS (
      SELECT p_name AS name, count(*) AS n,
             list_extract(string_split(p_name, ' '), -1) AS blk
      FROM part GROUP BY 1, 3)
    SELECT a.name AS name_a, b.name AS name_b,
           levenshtein(a.name, b.name) AS dist,
           a.n AS n_a, b.n AS n_b
    FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
    WHERE abs(len(a.name) - len(b.name)) <= 2
      AND levenshtein(a.name, b.name) <= 2
    """,
)
def j11_fuzzy_blocked_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Entity-resolution linkage (operators/linkage.py:
    # blocked_fuzzy_pairs): collapse part rows to the distinct-name
    # dictionary (quadratic work runs on the VOCABULARY, not the
    # corpus), block on the head noun (last token), prune by the
    # length lower bound, verify with JVM levenshtein <= 2. Blocking
    # recall is part of the declared contract (same honesty clause as
    # the LSH rows); the oracle replays block + verify exactly.
    return _lk.blocked_fuzzy_pairs(
        _t(spark, sf_dir, "part"), "p_name",
        F.element_at(F.split(F.col("name"), " "), -1), max_dist=2)


@register("text_decontaminate_bloom", ORACLES["text_decontaminate"])
def text_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    # decontaminate with the broadcast Bloom prefilter
    # (operators/bloom.py): the benchmark shingle set is compressed
    # into an 8 KiB bit array baked into the scan as a plan literal;
    # per-document shingle ARRAYS are filtered before the explode, so
    # clean documents emit ZERO probe rows. The exact broadcast join
    # removes false positives and Bloom has no false negatives, hence
    # this row shares text_decontaminate's oracle verbatim — the hash
    # match proves result identity between the two plans.
    docs = _t(spark, sf_dir, "documents")
    return _cur.decontaminate_bloom(
        docs.where(F.col("doc_id") % 97 != 0),
        docs.where(F.col("doc_id") % 97 == 0),
        "doc_id", "text", n=4)


@register(
    "a15_skyline_pareto",
    """
    WITH pts AS (
      SELECT p_brand, p_retailprice, p_size, count(*) AS n_parts
      FROM part
      WHERE p_brand IS NOT NULL AND p_retailprice IS NOT NULL
        AND p_size IS NOT NULL
      GROUP BY 1, 2, 3)
    SELECT p_brand, p_retailprice, p_size, n_parts
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_brand = p.p_brand
        AND q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def a15_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-brand Pareto front (operators/layout.py:skyline_2d —
    # minimize price, maximize size) without the textbook quadratic
    # dominance join: dedup to distinct points, keep the max-size
    # point per (brand, price), then one per-brand running-max window
    # ordered by price. Work after the first (map-side-partial)
    # hash-agg is O(distinct points); the window partitions by brand,
    # so no global sort and no skew pileup. The oracle is the naive
    # NOT EXISTS dominance predicate, carrying the operator's NULL
    # contract explicitly (dominance is undefined on a missing
    # coordinate — NULL brand/price/size points are excluded in both
    # engines rather than surviving the oracle's three-valued NOT
    # EXISTS by accident while vanishing from the running-max sweep).
    from .operators.layout import skyline_2d

    return skyline_2d(_t(spark, sf_dir, "part"),
                      "p_brand", "p_retailprice", "p_size",
                      count_col="n_parts")


