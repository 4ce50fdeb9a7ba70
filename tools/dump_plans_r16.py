"""Dump per-query `explain("formatted")` plans for the r16
optimization round's touched queries into plans/r16/.

Usage:
  python tools/dump_plans_r16.py <suffix> [out_dir]
run with suffix "before" from the pre-round worktree (b1d2ae5) and
"after" from the optimized tree. graph_pagerank executes eagerly
(per-round localCheckpoint leaves carry no shape), so a representative
ITERATION body is captured as pagerank_round_<suffix>.txt from the
same code shape the live operator uses (observe-literal dangling mass
after r16, aggregate + broadcast crossJoin before).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TOUCHED = [
    "dedup_semantic",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "sim_knn_join",
    "sim_kmeans_ivf",
    "text_dup_spans",
    "text_cut_dup_spans",
]


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def pagerank_round_plan(spark):
    """One pagerank round body over a tiny fixed edge set, spelled via
    the live operator's code shape (observe-literal dangling mass vs
    aggregate + broadcast crossJoin — whichever is live in this tree).
    """
    import inspect

    from pyspark.sql import functions as F

    from twitter_analysis_spark.operators import graph as G

    SCALE = 10 ** 12
    DAMP_NUM, DAMP_DEN = 85, 100
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long")
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node"))).distinct())
    out_deg = edges.groupBy(F.col("src").alias("node")) \
                   .agg(F.count("*").alias("out_deg"))
    nd = nodes.join(out_deg, "node", "left").persist()
    n = 4
    teleport = (15 * SCALE) // (100 * n)
    ranks = nd.select("node", "out_deg",
                      F.lit(SCALE // n).alias("rank_q")).localCheckpoint()
    contrib = (ranks.where(F.col("out_deg").isNotNull())
               .join(edges, ranks["node"] == edges["src"])
               .groupBy(F.col("dst").alias("node"))
               .agg(F.sum(F.expr("rank_q DIV out_deg")).alias("contrib_q")))

    src = inspect.getsource(G.pagerank_exact)
    if "observe" in src:  # r16: dangling mass inlined as a literal
        dang_q = SCALE  # representative literal
        body = (nd.join(contrib, "node", "left")
                .select("node", "out_deg",
                        (F.lit(teleport)
                         + F.expr(f"({DAMP_NUM} * (coalesce(contrib_q, 0L)"
                                  f" + {dang_q} DIV {n})) DIV {DAMP_DEN}"))
                        .alias("rank_q")))
    else:  # r15: aggregate subplan + one-row broadcast crossJoin
        dang = (ranks.where(F.col("out_deg").isNull())
                .agg(F.coalesce(F.sum("rank_q"), F.lit(0)).alias("dang_q")))
        body = (nd.join(contrib, "node", "left")
                .crossJoin(F.broadcast(dang))
                .select("node", "out_deg",
                        (F.lit(teleport)
                         + F.expr(f"({DAMP_NUM} * (coalesce(contrib_q, 0L)"
                                  f" + dang_q DIV {n})) DIV {DAMP_DEN}"))
                        .alias("rank_q")))
    return body


def main() -> None:
    suffix = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    from twitter_analysis_spark import catalog
    from twitter_analysis_spark.session import get_spark

    spark = get_spark(app_name="plans_r16", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "32",
                                  "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[3].split(",") if len(sys.argv) > 3 else TOUCHED
    for name in names:
        df = catalog.QUERIES[name](spark, SF_DIR)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(fmt(df))
        print("wrote", name)

    with open(os.path.join(out_dir,
                           f"pagerank_round_{suffix}.txt"), "w") as f:
        f.write(fmt(pagerank_round_plan(spark)))
    print("wrote pagerank_round")


if __name__ == "__main__":
    main()
