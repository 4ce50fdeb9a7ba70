"""Pre-aggregated time-series rollups: build, re-aggregate, refresh.

The hypertable-rollup / materialized-aggregate pattern the reference
never needed (its corpus was 10,984 tweets; cache.py:223-240 just
recounts everything) but a 100 TB event lake lives on:

- **Build once, query many.** An hourly rollup of a 100 TB event table
  is ~3-4 orders of magnitude smaller (one row per (hour, event_type)
  instead of one per event). Dashboards and repeated range queries hit
  the rollup, not the raw scan.
- **Only mergeable state goes in the rollup.** count / decimal-sum /
  min / max re-aggregate exactly to any coarser grain; distinct-user
  counts are kept as HLL *sketches* (``hll_sketch_agg``), which union
  losslessly-in-sketch-space where a stored ``approx_count_distinct``
  number would be unmergeable. avg is derived (sum/count) at read
  time, never stored.
- **Sums are stored as DECIMAL(18,2), not double.** Re-aggregating
  double partial sums would re-order float addition and drift from a
  direct aggregation of the raw data; decimal partials make
  daily-from-hourly *bit-identical* to daily-from-raw — which is
  exactly what the ``ts_rollup_reagg`` driver oracle checks.
- **Refresh is partition-scoped.** Late-arriving data touches a few
  date partitions; ``refresh_rollup(dates=...)`` recomputes only those
  groups from a date-pruned raw scan and swaps them in with Spark's
  dynamic partition overwrite, leaving every other partition's files
  untouched. A full rebuild at 100 TB is a non-starter.

Reference parity: generalizes the corpus-wide keyword recount
(cache.py:223-240) into the standard warehouse pre-aggregation
maintenance loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Grain -> date_trunc unit. Coarser grains must be reachable from
#: finer ones (hour rolls up to day, day to month).
GRAINS = ("hour", "day", "month")


def _check_grain(grain: str) -> None:
    if grain not in GRAINS:
        raise ValueError(f"grain must be one of {GRAINS}, got {grain!r}")


def rollup(events: DataFrame, grain: str = "hour",
           with_sketch: bool = True) -> DataFrame:
    """Aggregate raw events to one row per (``grain`` bucket,
    event_type), keeping only mergeable state.

    One shuffle on the grouping key with map-side partial aggregation;
    the output carries ``grain_date`` so sinks can partition by date
    and ``refresh_rollup`` can overwrite single partitions.
    """
    _check_grain(grain)
    bucket = F.date_trunc(grain, F.col("ts")).cast("timestamp_ntz")
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        # DECIMAL partials: exact, order-independent, re-aggregable.
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_dec"),
        F.min(F.col("value")).alias("min_value"),
        F.max(F.col("value")).alias("max_value"),
    ]
    if with_sketch:
        # Mergeable distinct state: a stored NUMBER of distinct users
        # cannot roll up (distinct is not sum-decomposable); the HLL
        # sketch unions exactly in sketch space.
        aggs.append(F.hll_sketch_agg("user_id").alias("users_hll"))
    return (
        events
        .groupBy(bucket.alias("bucket_ts"), "event_type")
        .agg(*aggs)
        .withColumn("grain_date", F.to_date("bucket_ts"))
    )


def reaggregate(rolled: DataFrame, grain: str = "day") -> DataFrame:
    """Re-aggregate a finer rollup to a coarser grain WITHOUT touching
    raw data.

    count/sum/min/max merge exactly (decimal sums commute), HLL
    sketches union; the result is indistinguishable from aggregating
    the raw table at ``grain`` — the ``ts_rollup_reagg`` oracle proves
    it against a direct DuckDB aggregation.
    """
    _check_grain(grain)
    bucket = F.date_trunc(grain, F.col("bucket_ts")).cast("timestamp_ntz")
    aggs = [
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_dec").alias("sum_value_dec"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ]
    if "users_hll" in rolled.columns:
        aggs.append(F.hll_union_agg("users_hll").alias("users_hll"))
    return (
        rolled
        .groupBy(bucket.alias("bucket_ts"), "event_type")
        .agg(*aggs)
        .withColumn("grain_date", F.to_date("bucket_ts"))
        # sum(bigint) widens to bigint already; keep the name stable.
        .withColumn("n_events", F.col("n_events").cast("bigint"))
    )


def present(rolled: DataFrame) -> DataFrame:
    """User-facing projection of a rollup: derived avg, double sums,
    HLL estimate. Kept OUT of the stored rollup so the stored state
    stays mergeable."""
    out = rolled.select(
        "bucket_ts", "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sum_value_dec").cast("double").alias("sum_value"),
        "min_value", "max_value",
        # Exact decimal sum and exact count, ONE IEEE division: the
        # cross-engine-deterministic average recipe (catalog docstring).
        (F.col("sum_value_dec").cast("double")
         / F.col("n_events").cast("double")).alias("avg_value"),
        *([F.hll_sketch_estimate("users_hll").alias("n_users_approx")]
          if "users_hll" in rolled.columns else []),
    )
    return out


def prune_to_dates(src: DataFrame, grain: str, dates: list,
                   partition_col: str) -> DataFrame:
    """Constrain a date-partitioned source to the physical partitions
    covering the listed grain buckets.

    The refresh's ``ts``-bucket predicate is a *derived expression*, so
    a date-partitioned Parquet layout cannot partition-prune from it —
    the scan would still open every directory. This helper adds the
    equivalent RANGE predicate on the physical partition column
    (``[d, d+1day)`` for hour/day grain, ``[d, next month)`` for month
    grain), which Catalyst turns into non-empty PartitionFilters —
    the scan opens only the listed dates' directories. Assumes the
    partition column equals ``to_date(ts)`` (boundary-exact for every
    grain, since all three grains bucket within a calendar date).
    """
    from datetime import timedelta

    _check_grain(grain)
    pred = None
    for dd in dates:
        if grain == "month":
            end = (dd.replace(day=28) + timedelta(days=4)).replace(day=1)
        else:
            end = dd + timedelta(days=1)
        p = (F.col(partition_col) >= F.lit(dd)) & \
            (F.col(partition_col) < F.lit(end))
        pred = p if pred is None else (pred | p)
    return src.where(pred)


def refresh_rollup(spark: SparkSession, events: DataFrame, path: str,
                   grain: str = "hour",
                   dates: list[str] | None = None,
                   partition_col: str | None = None) -> None:
    """Materialize (or incrementally refresh) a rollup at ``path``,
    partitioned by ``grain_date``.

    ``dates=None`` rebuilds the whole rollup with a *static* overwrite
    (the entire path is replaced, so partitions whose grain_date no
    longer exists in the source — e.g. after deletions — are dropped,
    not left stale).

    With a date list, ``dates`` are ``grain_date`` PARTITION values:
    the raw scan is pruned to every row whose *grain bucket* is listed
    (for hour/day grain that is the row's own date; for month grain a
    listed '2024-03-01' pulls in all of March — pruning to individual
    days there would overwrite the month partition with a partial
    aggregate). Spark's *dynamic* partition overwrite then replaces
    exactly the partitions present in the refreshed frame — every other
    partition's files are untouched, which tests assert by file set.
    A listed date whose source rows were ALL deleted produces no
    refreshed rows, which dynamic overwrite would silently skip — so
    those partitions are explicitly deleted afterwards (the rollup
    must not serve data whose raw rows are gone).

    Scale note: the prune predicate is an expression over ``ts``, so a
    plain date-partitioned raw layout will NOT partition-prune from it
    alone — at 100 TB, pass ``partition_col`` (the physical date
    partition column, assumed equal to ``to_date(ts)``) and
    ``prune_to_dates`` adds the range predicate that reaches the scan
    as real PartitionFilters; the ``ts``-bucket filter then merely
    re-trims rows inside those (already exact) partitions.
    """
    from datetime import date as _date

    src = events
    if dates is not None:
        # Fail loudly on malformed inputs for EVERY grain: a bad date
        # string would otherwise coerce to NULL inside isin() and turn
        # the refresh into a silent no-op for that date.
        parsed = []
        for d in dates:
            dd = d if isinstance(d, _date) else _date.fromisoformat(str(d))
            if grain == "month" and dd.day != 1:
                raise ValueError(
                    "month-grain refresh dates must be month starts "
                    f"(YYYY-MM-01 grain_date partition values); got {d!r}")
            parsed.append(dd)
        if partition_col is not None:
            src = prune_to_dates(src, grain, parsed, partition_col)
        bucket_date = F.to_date(F.date_trunc(grain, F.col("ts")))
        src = src.where(bucket_date.isin(parsed))
    rolled = rollup(src, grain=grain)
    mode = "static" if dates is None else "dynamic"
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode)
    try:
        # Rebalance by the partition column before the partitioned
        # write (SCALE.md hazard 18): the aggregate's output is hashed
        # on (bucket_ts, event_type) — uncorrelated with grain_date —
        # so at cluster scale every task would otherwise write into
        # every refreshed date (tasks x dates files per refresh).
        (rolled.hint("rebalance", "grain_date")
         .write.mode("overwrite")
         .partitionBy("grain_date").parquet(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    if dates is not None:
        # Drop listed partitions the refreshed frame no longer covers
        # (all their source rows were deleted). Bounded driver work:
        # distinct grain_date over an already-aggregated frame. This
        # second evaluation of `rolled` is NOT a re-run of the write's
        # scan+agg: Catalyst prunes the distinct-dates projection down
        # to a grain_date-only pass. Do NOT persist `rolled` to "share"
        # the two evaluations — A/B-measured at sf0.1 (30-date full
        # refresh): persist made the refresh 3-4x SLOWER (9.9/6.2 s vs
        # 2.3/1.9 s), because caching materializes the full aggregate
        # into memory format and blocks the pruned second pass.
        alive = {r["grain_date"]
                 for r in rolled.select("grain_date").distinct().collect()}
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for dd in parsed:
            if dd not in alive:
                p = jvm.org.apache.hadoop.fs.Path(f"{path}/grain_date={dd}")
                fs = p.getFileSystem(conf)
                if fs.exists(p):
                    fs.delete(p, True)
