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


def test_jsonl_round_trip_nested(spark, tmp_path):
    """Arrays survive a JSONL round trip bit-for-bit with an explicit
    schema (no inference pass), and a planted corrupt line lands in
    the quarantine column instead of failing the read."""
    from twitter_analysis_spark.sources.io import read_jsonl, write_jsonl

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = str(tmp_path / "emb_jsonl")
    write_jsonl(emb, out)
    back = read_jsonl(spark, out,
                      "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    # Spark disallows corrupt-column-only queries over raw JSON; cache
    # the parsed frame first (the documented pattern, tweets_raw.py).
    back = back.cache()
    assert back.where(F.col("_corrupt_record").isNotNull()).count() == 0
    a = sorted((r["vec_id"], tuple(r["embedding"]), r["label"])
               for r in emb.collect())
    b = sorted((r["vec_id"], tuple(r["embedding"]), r["label"])
               for r in back.drop("_corrupt_record").collect())
    assert a == b

    # quarantine path: append one malformed line. Unpersist first —
    # the CacheManager matches re-reads of the same path/schema by
    # canonicalized plan and would serve the pre-corruption snapshot.
    back.unpersist()
    import os
    with open(os.path.join(out, "zz_bad.json"), "w") as f:
        f.write('{"vec_id": 1, "embedding": [broken\n')
    back2 = read_jsonl(spark, out,
                       "vec_id LONG, embedding ARRAY<FLOAT>, label INT").cache()
    assert back2.where(F.col("_corrupt_record").isNotNull()).count() == 1
    assert back2.where(F.col("_corrupt_record").isNull()).count() == emb.count()


def test_csv_round_trip_and_partitioned_prune(spark, tmp_path):
    """Flat columns survive CSV with an explicit schema; a partitioned
    CSV layout partition-prunes exactly like parquet."""
    from twitter_analysis_spark.sources.io import read_csv, write_csv

    orders = (load_table(spark, "/root/testdata/sf0.001", "orders")
              .select("o_orderkey", "o_custkey", "o_totalprice",
                      "o_orderstatus"))
    out = str(tmp_path / "orders_csv")
    write_csv(orders, out, partition_by=["o_orderstatus"])
    schema = ("o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, "
              "o_orderstatus STRING")
    back = read_csv(spark, out, schema)
    assert back.count() == orders.count()
    one = back.where(F.col("o_orderstatus") == "F")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    expect = orders.where(F.col("o_orderstatus") == "F") \
                   .agg(F.sum("o_totalprice")).collect()[0][0]
    got = one.agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(got - expect) < 1e-6
