"""Rollup tier invariants: lossless re-aggregation, HLL accuracy,
partition-scoped incremental refresh."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from twitter_analysis_spark.operators import rollup as R
from twitter_analysis_spark.sources.io import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_reagg_equals_direct(spark, sf_dir):
    """daily-from-hourly must equal daily-from-raw bit-for-bit: the
    decimal partial sums make re-aggregation exact, which is the whole
    license for serving from the rollup."""
    ev = load_table(spark, sf_dir, "events")
    via_hourly = R.present(R.reaggregate(R.rollup(ev, "hour",
                                                  with_sketch=False), "day"))
    direct = R.present(R.rollup(ev, "day", with_sketch=False))
    assert _rows(via_hourly) == _rows(direct)


def test_month_from_day_from_hour(spark, sf_dir):
    """Merge chains compose: hour -> day -> month == hour -> month."""
    ev = load_table(spark, sf_dir, "events")
    hourly = R.rollup(ev, "hour", with_sketch=False)
    chained = R.present(R.reaggregate(R.reaggregate(hourly, "day"), "month"))
    direct = R.present(R.reaggregate(hourly, "month"))
    assert _rows(chained) == _rows(direct)


def test_hll_union_estimate_close(spark, sf_dir):
    """Unioned HLL sketches at day grain estimate the exact per-day
    distinct-user count within HLL's error envelope (lgConfigK default
    12 -> ~1.6% stderr; assert a loose 10%)."""
    ev = load_table(spark, sf_dir, "events")
    daily = R.present(R.reaggregate(R.rollup(ev, "hour"), "day"))
    exact = (ev.groupBy(
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("bucket_ts"),
        "event_type")
        .agg(F.countDistinct("user_id").alias("n_exact")))
    joined = daily.join(exact, ["bucket_ts", "event_type"]).collect()
    assert joined, "join produced no rows"
    for r in joined:
        assert abs(r["n_users_approx"] - r["n_exact"]) <= 0.10 * r["n_exact"]


def _partition_files(path: str) -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for d in os.listdir(path):
        if d.startswith("grain_date="):
            out[d] = {f for f in os.listdir(os.path.join(path, d))
                      if f.endswith(".parquet")}
    return out


def test_refresh_touches_only_listed_partitions(spark, sf_dir, tmp_path):
    """Incremental refresh rewrites exactly the listed date partitions
    (fresh part-file names there, identical file sets elsewhere) and
    the refreshed table equals a from-scratch rebuild."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup_hour")
    R.refresh_rollup(spark, ev, path)
    before = _partition_files(path)
    assert len(before) > 2

    # Late-data simulation: drop one event type on one day, refresh
    # only that date.
    day = sorted(before)[1].split("=", 1)[1]
    ev2 = ev.where(~((F.to_date("ts") == day)
                     & (F.col("event_type") == "click")))
    R.refresh_rollup(spark, ev2, path, dates=[day])
    after = _partition_files(path)

    changed = {d for d in before if before[d] != after.get(d)}
    assert changed == {f"grain_date={day}"}

    rebuilt = str(tmp_path / "rollup_full")
    R.refresh_rollup(spark, ev2, rebuilt)
    got = spark.read.parquet(path)
    want = spark.read.parquet(rebuilt)
    cols = sorted(got.columns)
    assert _rows(R.present(got.select(cols))) == _rows(R.present(want.select(cols)))


def test_refresh_drops_fully_deleted_partition(spark, sf_dir, tmp_path):
    """A listed date whose source rows were ALL deleted must not leave
    a stale partition behind (dynamic overwrite alone would skip it)."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup_del")
    R.refresh_rollup(spark, ev, path)
    day = sorted(_partition_files(path))[1].split("=", 1)[1]

    ev2 = ev.where(F.to_date("ts") != day)     # the whole day is gone
    R.refresh_rollup(spark, ev2, path, dates=[day])
    assert f"grain_date={day}" not in _partition_files(path)
    # remaining data still equals a from-scratch rebuild
    rebuilt = str(tmp_path / "rollup_del_full")
    R.refresh_rollup(spark, ev2, rebuilt)
    got, want = spark.read.parquet(path), spark.read.parquet(rebuilt)
    cols = sorted(got.columns)
    assert _rows(R.present(got.select(cols))) == \
        _rows(R.present(want.select(cols)))


def test_refresh_rejects_malformed_dates(spark, sf_dir, tmp_path):
    """Malformed date strings must raise for EVERY grain, not coerce
    to NULL and silently no-op the refresh."""
    import pytest

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup_bad")
    for grain in ("hour", "day", "month"):
        with pytest.raises(ValueError):
            R.refresh_rollup(spark, ev, path, grain=grain,
                             dates=["not-a-date"])


def test_partition_col_prune_reaches_scan(spark, sf_dir, tmp_path):
    """With partition_col set, the refresh's source scan carries real
    PartitionFilters (the ts-bucket predicate alone can't prune a
    date-partitioned layout), and the refreshed partition is identical
    to one refreshed without physical pruning."""
    import datetime as dt

    ev = load_table(spark, sf_dir, "events")
    raw = str(tmp_path / "events_by_date")
    (ev.withColumn("event_date", F.to_date("ts"))
       .write.partitionBy("event_date").parquet(raw))
    back = spark.read.parquet(raw)

    day = ev.select(F.to_date("ts").alias("d")).distinct() \
            .orderBy("d").limit(1).collect()[0]["d"]

    # the pruned source plan must show non-empty PartitionFilters
    pruned = R.prune_to_dates(back, "day", [day], "event_date")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    filt = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert filt.strip(), f"PartitionFilters empty in:\n{plan}"
    assert "event_date" in filt

    # month grain covers the whole month's date partitions
    m0 = day.replace(day=1)
    month_pruned = R.prune_to_dates(back, "month", [m0], "event_date")
    days_in = {r["event_date"] for r in
               month_pruned.select("event_date").distinct().collect()}
    assert days_in and all(d.month == m0.month and d.year == m0.year
                           for d in days_in)

    # end-to-end: physically-pruned refresh == unpruned refresh
    p1, p2 = str(tmp_path / "r_pruned"), str(tmp_path / "r_plain")
    R.refresh_rollup(spark, back, p1, grain="day", dates=[day],
                     partition_col="event_date")
    R.refresh_rollup(spark, ev, p2, grain="day", dates=[day])
    got = spark.read.parquet(p1).drop("users_hll")
    want = spark.read.parquet(p2).drop("users_hll")
    cols = sorted(got.columns)
    assert _rows(got.select(cols)) == _rows(want.select(cols))
