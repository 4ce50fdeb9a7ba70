"""Run the in-repo DuckDB-oracle parity check for a subset of rows.

Usage: python tools/parity_subset.py <sf_dir> name1 name2 ...
Prints OK/FAIL per row; exits nonzero on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from tests.parity import compare  # noqa: E402
from twitter_analysis_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    qs, oracles = entry.queries(), entry.oracle_sql()
    spark = get_spark("parity_subset")
    bad = 0
    for n in names:
        try:
            problems = compare(spark, sf_dir, n, qs[n], oracles[n])
        except Exception as e:  # pragma: no cover - diagnostic path
            problems = [f"{n}: EXC {e}"]
        if problems:
            bad += 1
            print(f"FAIL {n}")
            for p in problems:
                print("  ", p[:300])
        else:
            print(f"OK   {n}")
        spark.catalog.clearCache()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
