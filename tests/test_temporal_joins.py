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
