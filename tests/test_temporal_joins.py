"""As-of and range join semantics on hand-built inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_analysis_spark.operators.asof import asof_join
from twitter_analysis_spark.operators.rangejoin import interval_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "e1"),
         (1, "2024-01-01 12:00:00", "e2"),
         (1, "2024-01-01 09:00:00", "e0"),   # before any right row
         (2, "2024-01-01 10:30:00", "e3")],  # key with no right rows
        "k long, t string, ev string",
    ).withColumn("t", F.to_timestamp("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100),    # same instant as e1
         (1, "2024-01-01 11:00:00", 200)],
        "k long, t string, state long",
    ).withColumn("t", F.to_timestamp("t"))

    out = {r["ev"]: r["state"]
           for r in asof_join(left, right, key="k", left_ts="t",
                              right_ts="t", payload=["state"]).collect()}
    assert out["e0"] is None          # nothing at-or-before
    assert out["e1"] == 100           # inclusive bound: state at t applies
    assert out["e2"] == 200           # latest prior state wins
    assert out["e3"] is None          # key never seen on right


def test_interval_join_bounds(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1),
         (1, "2024-01-01 10:29:59", 2),
         (1, "2024-01-01 10:30:00", 3),      # == end: excluded
         (1, "2024-01-01 09:59:59", 4)],     # < start: excluded
        "k long, t string, id long",
    ).withColumn("t", F.to_timestamp("t"))
    iv = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "2024-01-01 10:30:00", "w1")],
        "k long, s string, e string, win string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))

    got = {r["id"] for r in interval_join(
        ev, iv, key="k", ts="t", start="s", end="e",
        bucket_seconds=600).collect()}
    assert got == {1, 2}              # start inclusive, end exclusive


def test_range_join_plan_has_no_nested_loop(spark, sf_dir):
    from twitter_analysis_spark import catalog

    df = catalog.QUERIES["j7_range_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan    # bucket equi-join, not O(n*m)
    assert "Cartesian" not in plan


def test_interval_overlap_pairs_planted(spark):
    import datetime as dt
    import pyspark.sql.functions as F
    from twitter_analysis_spark.operators.rangejoin import (
        interval_overlap_pairs)

    d = dt.date
    rows = [
        # key k1: a long interval overlapping two others across many
        # grid cells (must still emit each pair exactly ONCE)
        ("k1", 1, d(2024, 1, 1), d(2024, 2, 15)),
        ("k1", 2, d(2024, 1, 20), d(2024, 3, 1)),
        ("k1", 3, d(2024, 2, 15), d(2024, 2, 20)),   # touches #1's end day
        ("k1", 4, d(2024, 6, 1), d(2024, 6, 2)),     # disjoint
        # key k2: same dates as k1 rows but different key -> no cross pair
        ("k2", 5, d(2024, 1, 1), d(2024, 2, 15)),
    ]
    df = spark.createDataFrame(rows, ["k", "rid", "s", "e"])
    got = {(r.rid_1, r.rid_2): r.overlap_days for r in
           interval_overlap_pairs(df, ["k"], ["rid"], "s", "e",
                                  bucket_days=7).collect()}
    assert got == {
        (1, 2): (d(2024, 2, 15) - d(2024, 1, 20)).days + 1,
        (1, 3): 1,                                    # inclusive touch
        (2, 3): (d(2024, 2, 20) - d(2024, 2, 15)).days + 1,
    }


def test_interval_overlap_join_no_nested_loop(spark, sf_dir):
    from twitter_analysis_spark import catalog
    plan = catalog.QUERIES["j12_interval_overlap_join"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_peak_concurrency_planted(spark, tmp_path):
    """Hand-checkable sweep: nested + touching intervals; inclusive
    ends count as overlap; disjoint suppliers don't mix."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    d = dt.datetime
    # supplier 1: [1,10], [3,5], [5,7] -> at day 5 all three open = 3
    # supplier 2: [1,2], [3,4] -> never overlap = 1
    rows = [
        (1, 1, 1, 1, 9.0, 0.0, 0.0, 0.0, "N", "O", d(2024, 1, 1)),
        (2, 1, 1, 2, 2.0, 0.0, 0.0, 0.0, "N", "O", d(2024, 1, 3)),
        (3, 1, 1, 3, 2.0, 0.0, 0.0, 0.0, "N", "O", d(2024, 1, 5)),
        (4, 2, 1, 1, 1.0, 0.0, 0.0, 0.0, "N", "O", d(2024, 1, 1)),
        (5, 2, 1, 2, 1.0, 0.0, 0.0, 0.0, "N", "O", d(2024, 1, 3)),
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_partkey long, "
              "l_linenumber int, l_quantity double, l_extendedprice double, "
              "l_discount double, l_tax double, l_returnflag string, "
              "l_linestatus string, l_shipdate timestamp")
    sf = str(tmp_path / "sweep_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "lineitem.parquet"))
    got = {r.l_suppkey: r.peak_concurrency for r in
           catalog.QUERIES["ts_peak_concurrency"](spark, sf).collect()}
    assert got == {1: 3, 2: 1}


def test_asof_null_contract(spark):
    """The r14 NULL contract (asof.py docstring): un-matchable right
    rows (NULL key/time) are invisible; left rows always survive with
    NULL payload when unmatched; and a matched right row whose payload
    IS NULL overrides an older non-null payload — the struct-wrapped
    propagation, where a bare per-column last(ignorenulls) would skip
    back to the stale value."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "e1"),
         (1, "2024-01-01 12:00:00", "e2"),   # after the NULL-payload row
         (1, None, "enull_t"),               # NULL left time
         (None, "2024-01-01 10:30:00", "enull_k"),  # NULL left key
         (3, "2024-01-01 10:30:00", "e3")],  # only un-matchable right rows
        "k long, t string, ev string",
    ).withColumn("t", F.to_timestamp("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 100),
         (1, "2024-01-01 11:00:00", None),   # payload IS NULL: must win
         (None, "2024-01-01 08:00:00", 777),  # NULL key: un-matchable
         (3, None, 888)],                    # NULL time: un-matchable
        "k long, t string, state long",
    ).withColumn("t", F.to_timestamp("t"))

    rows = asof_join(left, right, key="k", left_ts="t",
                     right_ts="t", payload=["state"]).collect()
    out = {r["ev"]: r["state"] for r in rows}
    assert len(rows) == 5                    # every left row survives
    assert out["e1"] == 100
    assert out["e2"] is None                 # NULL payload overrides 100
    assert out["enull_t"] is None            # NULL time matches nothing
    assert out["enull_k"] is None            # NULL key matches nothing
    assert out["e3"] is None                 # right rows were un-matchable
