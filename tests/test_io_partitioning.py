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


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    from twitter_analysis_spark.sources.io import write_bucketed

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8)
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "lineitem_b", ["o_orderkey"], 8)

    o = spark.table("orders_b")
    l = spark.table("lineitem_b")
    # force the co-located path (broadcast would also skip the shuffle,
    # trivially) — the point is a shuffle-free SortMergeJoin
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(l, "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan   # no runtime shuffle
        assert "SelectedBucketsCount: 8 out of 8" in plan
        assert j.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
