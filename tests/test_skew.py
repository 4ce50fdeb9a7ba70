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


def test_salted_join_identical_to_plain(spark):
    """salted_join == plain join on the pathological distribution —
    multiplicities, values, and the hot key's full row set."""
    from twitter_analysis_spark.operators.skew import salted_join

    facts = _skewed(spark).withColumn(
        "rid", F.monotonically_increasing_id())
    dim = spark.range(40).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("name"))
    plain = facts.join(dim, "k")
    salted = salted_join(facts, dim, on="k", row_cols=["rid", "v"],
                         n_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    cols = sorted(plain.columns)
    a = sorted(map(repr, plain.select(*cols).collect()))
    b = sorted(map(repr, salted.select(*cols).collect()))
    assert a == b


def test_salted_join_left_preserves_unmatched(spark):
    from twitter_analysis_spark.operators.skew import salted_join

    facts = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (99, 3.0)], "k long, v double")
    dim = spark.createDataFrame([(0, "zero")], "k long, name string")
    got = salted_join(facts, dim, on="k", row_cols=["v"],
                      n_salts=4, how="left")
    rows = {(r["k"], r["v"], r["name"]) for r in got.collect()}
    assert rows == {(0, 1.0, "zero"), (0, 2.0, "zero"), (99, 3.0, None)}
    assert got.count() == 3  # unmatched row appears exactly once


def test_salted_join_replicates_small_side(spark):
    """The mechanism itself: the small side really fans out n_salts x
    and the physical join is a shuffle join on (key, salt)."""
    from twitter_analysis_spark.operators import skew
    from twitter_analysis_spark.operators.skew import salted_join

    facts = _skewed(spark).withColumn("rid", F.monotonically_increasing_id())
    dim = spark.range(40).select(F.col("id").alias("k"),
                                 F.lit("x").alias("name"))
    small_r = dim.withColumn(
        skew._SALT, F.explode(F.sequence(F.lit(0), F.lit(7))))
    assert small_r.count() == 40 * 8
    plan = salted_join(
        facts, dim, on="k", row_cols=["rid"], n_salts=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # join condition carries the salt key


def test_skew_split_join_identical_to_plain(spark):
    """skew_split_join == plain join on the pathological distribution,
    for both detection modes (threshold scan / precomputed hot set)."""
    from twitter_analysis_spark.operators.skew import skew_split_join

    facts = _skewed(spark).withColumn("rid", F.monotonically_increasing_id())
    dim = spark.range(40).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("name"))
    cols = sorted(facts.join(dim, "k").columns)
    want = sorted(map(repr, facts.join(dim, "k").select(*cols).collect()))
    by_threshold = skew_split_join(facts, dim, on="k", row_cols=["rid"],
                                   n_salts=8, hot_threshold=10_000)
    hot = spark.createDataFrame([(0,)], "k long")
    by_hotset = skew_split_join(facts, dim, on="k", row_cols=["rid"],
                                n_salts=8, hot_keys=hot)
    for got in (by_threshold, by_hotset):
        assert sorted(got.columns) == cols
        assert sorted(map(repr, got.select(*cols).collect())) == want


def test_skew_split_join_left_preserves_unmatched(spark):
    """LEFT semantics survive the split on both branches: a hot key
    missing from the dimension and a cold key missing from it."""
    from twitter_analysis_spark.operators.skew import skew_split_join

    facts = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (0, 3.0), (7, 4.0), (99, 5.0)],
        "k long, v double")
    dim = spark.createDataFrame([(7, "seven")], "k long, name string")
    got = skew_split_join(facts, dim, on="k", row_cols=["v"], n_salts=4,
                          hot_threshold=2, how="left")
    rows = {(r["k"], r["v"], r["name"]) for r in got.collect()}
    assert rows == {(0, 1.0, None), (0, 2.0, None), (0, 3.0, None),
                    (7, 4.0, "seven"), (99, 5.0, None)}
    assert got.count() == 5


def test_skew_split_join_null_keys_fall_cold(spark):
    """NULL join keys take the cold branch where the join's own NULL
    semantics apply: dropped by inner, preserved by left."""
    from twitter_analysis_spark.operators.skew import skew_split_join

    facts = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (0, 3.0), (None, 9.0)], "k long, v double")
    dim = spark.createDataFrame([(0, "zero")], "k long, name string")
    inner = skew_split_join(facts, dim, on="k", row_cols=["v"],
                            n_salts=4, hot_threshold=2)
    assert inner.where(F.col("k").isNull()).count() == 0
    assert inner.count() == 3
    left = skew_split_join(facts, dim, on="k", row_cols=["v"],
                           n_salts=4, hot_threshold=2, how="left")
    assert left.where(F.col("k").isNull()).count() == 1
    assert left.count() == 4


def test_skew_split_join_persists_hot_set_for_cleanup(spark):
    """The hot-key set feeds three consumers (semi probe, anti probe,
    small-slice pruning); it is persisted so the detection scan runs
    once, and the caller-supplied cleanup list receives exactly that
    one frame for release (the dedup.py protocol)."""
    from twitter_analysis_spark.operators.skew import skew_split_join

    facts = _skewed(spark, n_hot=5_000, n_cold=500).withColumn(
        "rid", F.monotonically_increasing_id())
    dim = spark.range(40).select(F.col("id").alias("k"),
                                 F.lit("x").alias("name"))
    cleanup: list = []
    got = skew_split_join(facts, dim, on="k", row_cols=["rid"],
                          n_salts=4, hot_threshold=1_000, cleanup=cleanup)
    assert got.count() == facts.join(dim, "k").count()
    assert len(cleanup) == 1
    assert cleanup[0].is_cached
    # the cached frame must be in the final plan (InMemory scan), or
    # the persist is decorative and the detection lineage re-executes
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "InMemory" in plan
    cleanup[0].unpersist()
    assert not cleanup[0].is_cached


def test_skew_split_join_replicates_only_the_hot_slice(spark):
    """The point of the split: the replicated small side is the HOT
    slice only — the cold branch joins the dimension unreplicated."""
    from twitter_analysis_spark.operators.skew import skew_split_join

    facts = _skewed(spark).withColumn("rid", F.monotonically_increasing_id())
    dim = spark.range(40).select(F.col("id").alias("k"),
                                 F.lit("x").alias("name"))
    plan = skew_split_join(
        facts, dim, on="k", row_cols=["rid"], n_salts=8,
        hot_threshold=10_000,
    )._jdf.queryExecution().executedPlan().toString()
    # exactly one explode (the hot-slice replication) and the salt key
    # confined to that branch
    assert plan.count("explode") == 1
    assert "_salt" in plan
    # detection mis-use fails loudly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        skew_split_join(facts, dim, on="k", row_cols=["rid"])
    with _pytest.raises(ValueError):
        skew_split_join(facts, dim, on="k", row_cols=["rid"],
                        hot_threshold=1,
                        hot_keys=spark.createDataFrame([(0,)], "k long"))
