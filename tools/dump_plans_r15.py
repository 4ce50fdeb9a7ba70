"""Dump per-query `explain("formatted")` plans for the r15
optimization round's touched queries into plans/r15/.

Usage:
  python tools/dump_plans_r15.py <suffix> [out_dir]
where <suffix> is "before" (run from the pre-round worktree) or
"after" (run from the optimized tree). Queries that execute eagerly
during construction (iterative loops ending in a localCheckpoint
leaf) additionally get a `<name>_<suffix>_round.txt` with the plan of
one representative ITERATION body, captured from the operator
internals — the final-result plan alone is a checkpoint-leaf scan and
carries no shape evidence.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TOUCHED = [
    "dedup_clusters_star",
    "graph_assortativity",
    "graph_triangles",
    "graph_bfs_khop",
    "a21_copurchase_pairs",
    "dedup_minhash_lsh",
]


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def star_round_plan(spark):
    """One star-CC round body over a tiny fixed edge set, spelled via
    the live operator's internals (the catalog row's per-round shape)."""
    from pyspark.sql import functions as F

    from twitter_analysis_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id1 long, id2 long")
    e = pairs.select(F.col("id1").alias("u"), F.col("id2").alias("v"))
    e = (e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
         .where(F.col("u") != F.col("v")).distinct())

    # replicate connected_components_star's per-round composition by
    # calling through one loop round with max_iter=1 is not possible
    # without executing; instead rebuild the round body from the same
    # code shape the operator uses (join-based before r15, window-
    # based after — whichever is live in this tree).
    import inspect
    src = inspect.getsource(D.connected_components_star)
    use_window = "F.min(\"v\").over(_w)" in src or "min(\"v\").over" in src
    from pyspark.sql import Window

    if use_window:
        _w = Window.partitionBy("u")

        def _star(d, large):
            d2 = d.withColumn("m", F.least(F.min("v").over(_w), F.col("u")))
            moved = d2.where(F.col("v") > F.col("u")) if large \
                else d2.where(F.col("v") <= F.col("u"))
            out = moved.select(F.col("v").alias("u"), F.col("m").alias("v"))
            if not large:
                out = out.unionByName(d2.select("u", F.col("m").alias("v")))
            return out
    else:
        def _star(d, large):
            mins = (d.groupBy("u").agg(F.min("v").alias("_mn"))
                    .select("u", F.least("_mn", F.col("u")).alias("m")))
            joined = d.join(mins, "u")
            moved = joined.where(F.col("v") > F.col("u")) if large \
                else joined.where(F.col("v") <= F.col("u"))
            out = moved.select(F.col("v").alias("u"), F.col("m").alias("v"))
            if not large:
                out = out.unionByName(joined.select("u", F.col("m").alias("v")))
            return out

    def _sym(d):
        d = d.where(F.col("u") != F.col("v"))
        return (d.unionByName(d.select(F.col("v").alias("u"),
                                       F.col("u").alias("v")))
                .distinct())

    return _sym(_star(_star(e, True), False))


def main() -> None:
    suffix = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    from twitter_analysis_spark import catalog
    from twitter_analysis_spark.session import get_spark

    spark = get_spark(app_name="plans_r15", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "32",
                                  "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    for name in TOUCHED:
        df = catalog.QUERIES[name](spark, SF_DIR)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(fmt(df))
        print("wrote", name)

    with open(os.path.join(out_dir,
                           f"star_cc_round_{suffix}.txt"), "w") as f:
        f.write(fmt(star_round_plan(spark)))
    print("wrote star_cc_round")


if __name__ == "__main__":
    main()
