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
    # -- round-5 rotation. First: the 9 queries whose implementation
    # or oracle CHANGED this round (new Q4/Q8; decode kernel rewrite;
    # rows-only→oracle conversions incl. the full minhash pipeline
    # oracle; tfidf plan rewrite; shuffle-order bucket rewrite) —
    # these need fresh r5 evidence more than anything else --
    "dedup_minhash_lsh", "dedup_simhash", "sim_ivf_topk",
    "sim_lsh_topk", "mm_decode_features", "q4_order_priority",
    "q8_market_share", "text_tfidf_topk", "corpus_shuffle_order",
    "sim_pq_topk", "q7_volume_shipping", "q17_small_quantity_revenue",
    "q19_disjunctive_revenue", "q16_supplier_count", "q11_important_nations",
    "text_unit_dedup", "text_chunk_windows",
    # -- then the 44 queries whose latest driver evidence is r3 (the
    # r4 sweep covered the other half), stalest-first rotation so no
    # evidence ends the round older than 2 sweeps --
    "f2_nested_hashtag_path", "t7_pagination", "c1_c2_date_format",
    "c10_page_count", "q1_pricing_summary", "q3_top_revenue_orders",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "sim_cosine_topk", "text_token_counts",
    "text_quality_features", "text_lang_id", "text_fingerprint",
    "mm_media_metadata", "w1_tumbling_window_agg", "s9_sessionization",
    "u2_union_results", "a7_percentiles", "f4_absence_filter",
    "t2_top5_sidebar", "a11_approx_sketches", "corpus_curation",
    "c13_json_extract", "a12_pivot_matrix", "c14_array_hof_suite",
    "sim_knn_join", "j8_snapshot_diff", "q6_forecast_revenue",
    "q10_returned_items", "q14_promo_effect", "q22_dormant_customers",
    "text_pii_scrub", "text_decontaminate", "text_repetition_quality",
    "corpus_pack_sequences", "corpus_domain_mix", "sim_kmeans_ivf",
    "corpus_training_set", "q15_top_supplier", "q21_waiting_suppliers",
    "ts_hourly_rollup", "ts_rollup_reagg",
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
