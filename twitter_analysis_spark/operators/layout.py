"""Multi-dimensional data layout: Z-order (Morton) clustering.

Parquet data skipping is one-dimensional: sorting files by ``ts``
makes time predicates cheap but scatters every other column across all
files. At 100 TB the dominant cost of a selective query is how many
files its predicate can SKIP via footer min/max stats, so layout is a
first-class operator, not a DBA afterthought. Z-ordering interleaves
the bits of several columns into one sort key, giving every
participating dimension locality at once: a range predicate on ANY of
them touches only the files whose min/max straddle it (the technique
Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``; Morton 1966).

Spark shape: computing the key is a pure map (bit arithmetic inside
whole-stage codegen — no UDF); clustering is one
``repartitionByRange`` shuffle on the key plus an in-partition sort,
exactly what a sorted write costs. The skip-effectiveness win is
measured, not asserted, in tests/test_layout.py: per-file min/max
spread shrinks for BOTH dimensions vs a single-column sort.

The key spec (replayed verbatim by the catalog oracle): each column is
masked to ``bits`` low bits, then bit b of column i lands at position
``b * n_cols + i``. Masking makes the operator total on any BIGINT
input; for real data, quantile-rank columns first (percentile buckets)
so skewed domains fill the grid evenly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Default bits per dimension: 16 bits x 2 dims stays in a BIGINT with
#: room for 4 dims.
DEFAULT_BITS = 16


def zorder_key(cols: Sequence[str | Column],
               bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleaved BIGINT key over the given integer columns."""
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} cols x {bits} bits exceeds BIGINT")
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        masked = (F.col(c) if isinstance(c, str) else c) \
            .cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(masked, b).bitwiseAND(F.lit(1)),
                            b * d + i))
    return key


def zorder_key_sql(cols: Sequence[str], bits: int = DEFAULT_BITS) -> str:
    """The identical key as portable SQL (the DuckDB oracle twin)."""
    d = len(cols)
    mask = (1 << bits) - 1
    # Each term fully parenthesized: DuckDB gives |, & and << equal
    # precedence with left associativity, so a bare "a << 1 | b << 3"
    # parses as ((a << 1) | b) << 3 and overflows.
    terms = [
        f"(((({c} & {mask}) >> {b}) & 1) << {b * d + i})"
        for i, c in enumerate(cols) for b in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def write_zordered(df: DataFrame, cols: Sequence[str], path: str,
                   n_files: int, bits: int = DEFAULT_BITS) -> None:
    """Cluster ``df`` on the Z-key and write ``n_files`` parquet files.

    ``repartitionByRange`` samples the key distribution so files hold
    contiguous, evenly sized Z-ranges; the in-partition sort tightens
    per-row-group stats inside each file. The helper key column is
    dropped from the written schema.
    """
    zk = "__zorder"
    (df.withColumn(zk, zorder_key(cols, bits))
       .repartitionByRange(n_files, F.col(zk))
       .sortWithinPartitions(zk)
       .drop(zk)
       .write.mode("overwrite").parquet(path))


def file_stats_index(spark, path: str,
                     cols: Sequence[str]) -> DataFrame:
    """Per-file min/max index over ``cols`` — explicit data skipping.

    Parquet already stores these stats in footers, but OSS Spark only
    exploits them per-row-group AFTER opening each file; at 100 TB the
    win is not opening files at all. This builds the small-table
    analogue of Delta/Iceberg file statistics: one row per file with
    min/max per indexed column (plus row count), computed with one
    scan that is amortized over every subsequent pruned read. Rebuild
    after compaction/layout changes; the index is tiny (a row per
    file) and is itself a DataFrame — persist it wherever the rollups
    live.
    """
    df = spark.read.parquet(path).withColumn("file", F.input_file_name())
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("file").agg(*aggs)


def pruned_read(spark, path: str, index: DataFrame,
                ranges: dict[str, tuple]) -> DataFrame:
    """Read only the files whose stats can satisfy ``ranges``.

    ``ranges``: {col: (lo, hi)} closed intervals. A file survives when
    no indexed column proves it disjoint (min > hi or max < lo) — the
    standard can-match test, conservative under NULLs because min/max
    ignore them. The surviving file list is a bounded driver collect
    (one short string per file — the same order of driver state Spark's
    own file listing already holds). The returned frame re-applies the
    range predicate row-wise, so the result equals the full-scan
    filter exactly; with a Z-ordered layout (write_zordered) most
    files fall to the stats test and are never opened.
    """
    pred = None
    for c, (lo, hi) in ranges.items():
        p = (F.col(f"max_{c}") >= F.lit(lo)) & \
            (F.col(f"min_{c}") <= F.lit(hi))
        pred = p if pred is None else (pred & p)
    files = [r["file"] for r in index.where(pred).select("file").collect()]
    if not files:  # every file proved disjoint: an empty typed frame
        return spark.read.parquet(path).where(F.lit(False))
    row_pred = None
    for c, (lo, hi) in ranges.items():
        p = F.col(c).between(F.lit(lo), F.lit(hi))
        row_pred = p if row_pred is None else (row_pred & p)
    return spark.read.parquet(*files).where(row_pred)


def rank_bucketize(df: DataFrame, col: str, n_buckets: int,
                   out_col: str = "bucket") -> DataFrame:
    """Equi-depth bucket ids for a skewed column — the rank
    normalization the Z-order docstring calls for before interleaving
    a non-uniform dimension.

    Spec (exact, engine-portable): ``bucket(v) = (rank_lt(v) *
    n_buckets) DIV n`` where ``rank_lt`` counts rows strictly below
    ``v`` — ties share a bucket, every bucket holds ~n/n_buckets rows
    up to tie granularity, and the assignment is a pure function of
    the value distribution (order- and partitioning-independent).

    Plan: one value-count aggregate (distinct-value-sized), a
    cumulative window over THAT table — not the corpus — and a
    broadcast map-back join. Safe whenever the column's cardinality is
    bounded (grades, quantities, categorical codes, pre-quantized
    floats); for unbounded columns pre-quantize first, or the
    value table itself becomes the problem.

    NULL contract (total): NULL is one more value group that sorts
    FIRST (Spark's ASC default — an oracle replay must pin NULLS
    FIRST), so NULL rows land in bucket 0 and the map-back join is
    null-SAFE equality; no input row is ever dropped.
    """
    from pyspark.sql import Window

    vc = df.groupBy(F.col(col).alias("_v")) \
        .agg(F.count(F.lit(1)).alias("_c"))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    tot = vc.agg(F.sum("_c").alias("_n"))
    mapping = (vc.select(
        "_v", F.coalesce(F.sum("_c").over(w), F.lit(0)).alias("_lt"))
        .crossJoin(F.broadcast(tot))
        .select("_v", F.expr(f"(_lt * {n_buckets}) DIV _n")
                .cast("int").alias(out_col)))
    return df.join(F.broadcast(mapping), df[col].eqNullSafe(mapping["_v"])) \
        .drop("_v")


def skyline_2d(df: DataFrame, group_col: str, min_col: str, max_col: str,
               count_col: str = "n_rows") -> DataFrame:
    """Per-group 2-D Pareto front (minimize ``min_col``, maximize
    ``max_col``) without the textbook quadratic dominance join.

    Three stages, each bounded by the DISTINCT point set after the
    first hash-agg (which partial-aggregates map-side, so the 100 TB
    fact table collapses before any shuffle):

    1. dedup rows to points with multiplicity;
    2. keep only the max-``max_col`` point per (group, ``min_col``) —
       any same-x lower-y point is dominated by it;
    3. one per-group running-max window ordered by ``min_col``: a
       point survives iff its y strictly exceeds every strictly-
       smaller-x point's y (one row per x after step 2, so "rows
       preceding" is exactly "strictly cheaper").

    The window partitions by the group column — no global sort, no
    single-partition funnel. For the ungrouped skyline at scale,
    range-partition by x and carry per-partition maxima, the same
    two-phase shape global_shuffle_order uses.

    NULL contract: Pareto dominance is undefined on a missing
    coordinate (every comparison against it is three-valued), so rows
    with a NULL group or coordinate are EXCLUDED up front — the same
    explicit predicate an oracle must carry. Without it a NULL-y point
    silently vanishes from the running-max sweep while surviving a
    NOT-EXISTS dominance check.
    """
    pts = (df.where(F.col(group_col).isNotNull()
                    & F.col(min_col).isNotNull()
                    & F.col(max_col).isNotNull())
           .groupBy(group_col, min_col, max_col)
           .agg(F.count(F.lit(1)).alias(count_col)))
    return _skyline_pass(pts, group_col, min_col, max_col, count_col) \
        .select(group_col, min_col, max_col, count_col)


def skyline_2d_global(df: DataFrame, min_col: str, max_col: str,
                      count_col: str = "n_rows",
                      n_parts: int = 32) -> DataFrame:
    """Ungrouped 2-D Pareto front via the classic two-phase plan.

    A global skyline cannot use one running-max window (that is a
    single-partition sort). Instead: (1) dedup to distinct points,
    (2) range-partition by x and run the per-PARTITION skyline with
    the same running-max window keyed by ``spark_partition_id()`` —
    LOSSLESS pruning, because a point dominated within its partition
    is dominated globally, and any partitioning preserves that; (3)
    the survivors (at most #partitions * |per-partition front|, tiny)
    take one final single-partition pass. Range partitioning on x
    makes phase-2 pruning effective (each partition sees a coherent x
    band), but correctness never depends on it. NULL-coordinate rows
    are excluded up front (dominance is undefined on missing data —
    see skyline_2d).
    """
    pts = (df.where(F.col(min_col).isNotNull()
                    & F.col(max_col).isNotNull())
           .groupBy(min_col, max_col)
           .agg(F.count(F.lit(1)).alias(count_col))
           .repartitionByRange(n_parts, F.col(min_col)))
    pid = F.spark_partition_id()
    local = _skyline_pass(pts.withColumn("_g", pid),
                          "_g", min_col, max_col, count_col)
    # survivors are a few rows per partition: one ordered pass is fine
    return _skyline_pass(local.withColumn("_g", F.lit(0)),
                         "_g", min_col, max_col, count_col) \
        .select(min_col, max_col, count_col)


def _skyline_pass(pts: DataFrame, group_col: str, min_col: str,
                  max_col: str, count_col: str) -> DataFrame:
    """One grouped skyline sweep over an already-deduped point table
    (shared by skyline_2d phases): keep the max-y point per (group,
    x), then drop points whose y fails the strictly-cheaper running
    max."""
    per_x = Window.partitionBy(group_col, min_col).orderBy(F.desc(max_col))
    best = (pts.withColumn("_rn", F.row_number().over(per_x))
            .where(F.col("_rn") == 1).drop("_rn"))
    cheaper = Window.partitionBy(group_col).orderBy(min_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    return (best.withColumn("_mx", F.max(max_col).over(cheaper))
            .where(F.col("_mx").isNull() | (F.col(max_col) > F.col("_mx")))
            .drop("_mx"))


#: Planner-estimate gate for :func:`ranked_cumsum`'s auto strategy —
#: same philosophy as catalog.maybe_broadcast: under the gate, the
#: plain single-window plan is provably cheap and skips the two-phase
#: form's ~3 extra jobs (checkpoint, offset collect, join); above it,
#: the unpartitioned window is a one-task wall and the two-phase plan
#: takes over. Tests force the two-phase path explicitly.
_WINDOW_GATE_BYTES = 64 << 20


def ranked_cumsum(df: DataFrame, order_cols: Sequence[Column],
                  value_col: str | Column | None = None,
                  n_parts: int = 32,
                  rank_col: str = "rank", cum_col: str = "cum",
                  strategy: str = "auto",
                  cleanup: list | None = None) -> DataFrame:
    """Exact global ``row_number`` (and optional running sum) over a
    TOTAL order — the dimension-rank primitive a18/a20 use.

    ``Window.orderBy(...)`` with no partitioning funnels the whole
    frame through ONE task: fine for a 25-row nation table, a wall at
    a 10^8-row dimension. ``strategy``:

    - ``"window"``: the plain single-task window (cheapest while the
      frame is genuinely small — no extra jobs, fully lazy).
    - ``"two_phase"``: (1) range-partition by the order key — rows
      land in key-ordered partition bands; (2) per-PARTITION
      ranks/cumsums via a window keyed by ``spark_partition_id()``;
      (3) one bounded driver collect of per-partition (count, sum)
      totals yields each band's global offset, added back through a
      broadcast join (the zipWithIndex shape
      ``sampling.global_shuffle_order`` also uses). Every step is
      distributed; driver traffic is ``n_parts`` rows.
    - ``"auto"`` (default): consult Catalyst's size estimate for the
      optimized subplan — window under ``_WINDOW_GATE_BYTES``, two
      phase above (the maybe_broadcast discipline; both paths produce
      identical rows, asserted in tests, so the gate can never change
      results).

    ``order_cols`` MUST define a total order (end with a unique
    tie-breaker): two-phase ranks of tied keys would otherwise depend
    on which side of a band boundary they landed. In the two-phase
    path the ranged frame is ``localCheckpoint``-ed to pin band
    placement against recomputation (rank VALUES are placement-
    independent, but the checkpoint keeps the count job and the
    output plan reading one materialization); pass ``cleanup`` to
    receive it for release (dedup.py convention). Release semantics:
    ``unpersist()`` on a localCheckpoint is a cache-manager no-op —
    the blocks are reclaimed by the ContextCleaner once the LAST
    reference drops, so the cleanup threading's real job is making
    the caller the owner of that last reference (drop it promptly
    after materializing downstream). The frame is dictionary-sized
    (the distinct order keys), never corpus-sized.

    Returns ``df``'s columns plus ``rank_col`` (1-based BIGINT) and,
    when ``value_col`` is given, ``cum_col`` (inclusive running sum
    of it, in its own sum type).
    """
    from pyspark.sql import Window

    if strategy == "auto":
        try:
            est = int(df._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes())
            strategy = ("window" if est <= _WINDOW_GATE_BYTES
                        else "two_phase")
        except Exception:   # Connect / stats unavailable
            strategy = "two_phase"
    if strategy == "window":
        w = Window.orderBy(*order_cols)
        out = df.withColumn(rank_col,
                            F.row_number().over(w).cast("bigint"))
        if value_col is not None:
            vcol = (F.col(value_col) if isinstance(value_col, str)
                    else value_col)
            out = out.withColumn(
                cum_col, F.sum(vcol).over(
                    w.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)))
        return out
    if strategy != "two_phase":
        raise ValueError(f"unknown strategy {strategy!r}")

    ranged = (df.repartitionByRange(n_parts, *order_cols)
              .localCheckpoint())
    if cleanup is not None:
        cleanup.append(ranged)
    pid = ranged.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = pid.withColumn("_lrk", F.row_number().over(w).cast("bigint"))
    aggs = [F.count(F.lit(1)).alias("_n")]
    if value_col is not None:
        vcol = F.col(value_col) if isinstance(value_col, str) else value_col
        local = local.withColumn(
            "_lcs", F.sum(vcol).over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)))
        aggs += [F.sum(vcol).alias("_s"), F.count(vcol).alias("_c")]
    # Bounded collect: one row per range partition.
    parts = {r["_pid"]: r for r in
             local.groupBy("_pid").agg(*aggs).collect()}
    rows, n_off, s_off, nn_off = [], 0, 0, 0
    for p in sorted(parts):
        rows.append((p, n_off, s_off, nn_off))
        n_off += parts[p]["_n"]
        if value_col is not None:
            # A range partition whose value_col is entirely NULL
            # aggregates _s = NULL; the single-window path treats such
            # a stretch as contributing 0 to the running sum (F.sum
            # skips nulls), so the offset must too — and a None here
            # would both TypeError this loop and null-poison every
            # later partition's cumsum through the string round-trip.
            s = parts[p]["_s"]
            s_off += s if s is not None else 0
            nn_off += parts[p]["_c"]
    spark = df.sparkSession
    offsets = spark.createDataFrame(
        [(p, n, str(s), c) for p, n, s, c in rows],
        schema="_pid int, _noff bigint, _soff string, _nnoff bigint")
    out = (local.join(F.broadcast(offsets), "_pid")
           .withColumn(rank_col, F.col("_noff") + F.col("_lrk")))
    if value_col is not None:
        # _soff travels as a string so arbitrary sum types (decimal,
        # bigint) round-trip the driver exactly; cast back to the
        # running sum's own type before adding. Window semantics for
        # NULL stretches: the running sum is NULL only while ZERO
        # non-null values precede the row globally — so a row whose
        # local prefix is all-NULL (_lcs IS NULL) still carries the
        # prior partitions' sum if any of THEM held a value (_nnoff
        # tracks that; `_soff + NULL` alone would null the row).
        base = F.col("_soff").cast(out.schema["_lcs"].dataType)
        out = out.withColumn(
            cum_col,
            F.when(F.col("_lcs").isNotNull(), base + F.col("_lcs"))
            .when(F.col("_nnoff") > 0, base)
            .otherwise(F.lit(None).cast(out.schema["_lcs"].dataType)))
    return out.drop("_pid", "_lrk", "_lcs", "_noff", "_soff", "_nnoff")
