"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in ``twitter_analysis_spark.catalog``;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from twitter_analysis_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's results_page search pipeline
    (filters → broadcast user join → 3-key sort → top-50); see
    ``catalog.flagship_search``.
    """
    # The driver supplies its own SparkSession; the nanos-timestamp
    # events table needs this reader flag (see sources/io.py).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return catalog.QUERIES["flagship_search"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # Right-size shuffle parallelism for the driver's vanilla
            # session (default 200 tasks/stage dwarfs the sf0.01 data;
            # both are runtime-settable SQL confs).
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in catalog.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return dict(catalog.ORACLES)
