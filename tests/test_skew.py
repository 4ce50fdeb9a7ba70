"""Skew resilience: hot-key joins and aggregations stay correct (and
the plan machinery the 100 TB path relies on — AQE skew splitting,
two-stage salting — actually engages)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed(spark, n_hot=200_000, n_cold=1_000):
    """One pathological key (0) holding 99.5% of rows + a uniform tail."""
    hot = spark.range(n_hot).select(
        F.lit(0).alias("k"), (F.col("id") % 97).cast("double").alias("v"))
    cold = spark.range(n_cold).select(
        (F.col("id") % 50 + 1).alias("k"),
        (F.col("id") % 89).cast("double").alias("v"))
    return hot.unionByName(cold)


def test_skewed_join_correct(spark):
    facts = _skewed(spark)
    dim = spark.range(51).select(F.col("id").alias("k"),
                                 F.concat(F.lit("d"), F.col("id")).alias("name"))
    joined = facts.join(dim, "k")
    # every fact row finds its dim row exactly once, hot key included
    assert joined.count() == facts.count()
    hot_rows = joined.where(F.col("k") == 0)
    assert hot_rows.count() == 200_000
    assert hot_rows.select("name").distinct().collect()[0]["name"] == "d0"


def test_salted_agg_equals_plain_on_skew(spark):
    """The a8 two-stage salt pattern returns bit-identical sums to the
    single-stage aggregation on a pathologically skewed key."""
    facts = _skewed(spark)
    plain = {r["k"]: (r["n"], r["s"]) for r in
             facts.groupBy("k")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("v").cast("decimal(18,2)")).cast("double")
                  .alias("s")).collect()}
    salted = (
        facts.withColumn("_salt", F.pmod(F.hash("v"), F.lit(16)))
        .groupBy("k", "_salt")
        .agg(F.count(F.lit(1)).alias("_n"),
             F.sum(F.col("v").cast("decimal(18,2)")).alias("_s"))
        .groupBy("k")
        .agg(F.sum("_n").alias("n"), F.sum("_s").cast("double").alias("s"))
    )
    got = {r["k"]: (r["n"], r["s"]) for r in salted.collect()}
    assert got == plain
