"""Regenerate docs/PLANS.md: formatted physical plans of every
bench.HEADLINE query (plus rows-only extras worth auditing) at
$SPARK_GRAFT_SF_DIR with AQE on — the plan-shape evidence the scale
review reads next to BENCH_r{N}.json.

Run: python tools/gen_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADER = """# PLANS — physical plans of the headline queries (sf0.1, AQE on)

Generated from `df.explain("formatted")` over every `bench.HEADLINE` query
(`python tools/gen_plans.py`).
What to look for, per the scale design rules in README.md: filters and
projections reaching the `FileScan` (PushedFilters / ReadSchema),
dimensions as `BroadcastHashJoin`, top-k as `TakeOrderedAndProject`
(never a global Sort), aggregates split partial/final, and `Exchange`
only where a shuffle is semantically required.
"""

#: Rows-only / non-bench queries whose plans still carry scale signal.
EXTRAS = ["t7_pagination", "f2_nested_hashtag_path"]


def main() -> None:
    import bench
    from twitter_analysis_spark import catalog
    from twitter_analysis_spark.session import get_spark

    spark = get_spark(app_name="plans", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "32",
                                  "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in bench.HEADLINE if n in catalog.QUERIES]
    names += [n for n in EXTRAS if n in catalog.QUERIES]

    out = [HEADER]
    for name in names:
        df = catalog.QUERIES[name](spark, SF_DIR)
        plan = (df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
        out.append(f"\n## {name}\n\n```\n{plan.rstrip()}\n```\n")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "PLANS.md")
    with open(path, "w") as f:
        f.write("".join(out))
    print(f"wrote {path}: {len(names)} plans")


if __name__ == "__main__":
    main()
