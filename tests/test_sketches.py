"""Count-Min sketch: one-sided error, mergeability, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_analysis_spark.operators import sketches as SK


def _occ(spark, counts: dict[str, int]):
    rows = [(t,) for t, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "token string")


def test_estimates_never_undercount(spark):
    counts = {f"tok{i}": (i * 7) % 23 + 1 for i in range(200)}
    occ = _occ(spark, counts)
    sk = SK.cms_build(occ, "token", depth=4, width=64)  # force collisions
    qs = spark.createDataFrame([(t,) for t in counts], "token string")
    est = {r["token"]: r["est_cnt"]
           for r in SK.cms_estimate(sk, qs, "token",
                                    depth=4, width=64).collect()}
    n_total = sum(counts.values())
    for t, true in counts.items():
        assert est[t] >= true, t
        # loose 4N/width sanity bound (the 2N/w bound holds w.p.
        # 1 - 2^-depth per query; x2 slack keeps the test stable —
        # and deterministic hashes make it reproducible anyway)
        assert est[t] - true <= 4 * n_total / 64, t


def test_exact_when_sparse(spark):
    # 10 tokens in 512 buckets with the fixed md5 family: no row has a
    # collision (deterministic — verified by this very assertion).
    counts = {c: i + 1 for i, c in enumerate("abcdefghij")}
    occ = _occ(spark, counts)
    sk = SK.cms_build(occ, "token")
    qs = spark.createDataFrame([(t,) for t in counts], "token string")
    est = {r["token"]: r["est_cnt"]
           for r in SK.cms_estimate(sk, qs, "token").collect()}
    assert est == counts


def test_sketch_merges_by_addition(spark):
    counts = {f"w{i}": i + 1 for i in range(50)}
    occ = _occ(spark, counts).withColumn(
        "half", F.monotonically_increasing_id() % 2)
    a = SK.cms_build(occ.where(F.col("half") == 0), "token")
    b = SK.cms_build(occ.where(F.col("half") == 1), "token")
    merged = (a.unionByName(b).groupBy("j", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    whole = SK.cms_build(occ, "token")
    diff = (merged.join(whole, ["j", "bucket"], "full")
            .where(merged["cnt"].eqNullSafe(whole["cnt"]) == False))  # noqa: E712
    assert diff.count() == 0


def test_cell_count_bounded_by_config(spark):
    counts = {f"v{i}": 3 for i in range(1000)}
    sk = SK.cms_build(_occ(spark, counts), "token", depth=4, width=128)
    assert sk.count() <= 4 * 128
    # total mass per row j equals the stream length
    per_row = {r["j"]: r["s"] for r in
               sk.groupBy("j").agg(F.sum("cnt").alias("s")).collect()}
    assert set(per_row.values()) == {3000}
