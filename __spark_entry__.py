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

# The round-1 driver sweep recorded rows for exactly the first 50
# registered queries, so registration order decides which queries get
# hard correctness evidence.  Emit the catalog in priority order:
# first the queries with no driver row yet (round-1 indices 50-75),
# then queries whose implementation or oracle changed this round, then
# everything else in registration order.  Python dicts preserve
# insertion order, so this is the order the driver iterates.
_PRIORITY = [
    # -- no CORRECTNESS_r01 row (registered after the 50-query cap) --
    "a10_grouped_distinct", "a11_approx_sketches", "t8_moving_avg",
    "q2_groupwise_argmin", "q5_local_supplier_volume", "j6_asof_join",
    "j7_range_join", "corpus_curation", "c13_json_extract",
    "a12_pivot_matrix", "u3_intersect_except", "t9_cumulative_daily",
    "text_bigram_topk", "text_tfidf_topk", "f11_exists_subquery",
    "f12_scalar_subquery", "c14_array_hof_suite", "a13_grouping_sets",
    "t10_window_suite", "dedup_clusters", "corpus_split_assign",
    "q18_large_orders", "f13_not_in_subquery", "a14_multi_distinct",
    "sim_knn_join", "j8_snapshot_diff",
    # -- changed this round (re-verify) --
    "a4_conditional_counts", "dedup_embedding_cosine",
    "dedup_ngram_jaccard", "dedup_minhash_lsh",
    # -- new/changed in round 3 (t7 bounded; the 4 fixed comparator rows
    # are already listed above) --
    "f2_nested_hashtag_path", "t7_pagination",
]


def _ordered_names() -> list[str]:
    rest = [n for n in catalog.QUERIES if n not in _PRIORITY]
    return [n for n in _PRIORITY if n in catalog.QUERIES] + rest


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

    return {name: wrap(catalog.QUERIES[name]) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {name: catalog.ORACLES[name] for name in _ordered_names()
            if name in catalog.ORACLES}
