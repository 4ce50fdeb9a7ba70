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

# The driver sweep records rows for EXACTLY the first 50 names
# emitted here (confirmed each round: CORRECTNESS_r0N.json has 50
# entries), so this list is trimmed to 50 — names past index 49 get
# no evidence and belong at the head of the NEXT round's rotation.
# Ordering policy: (1) stalest evidence first, (2) queries whose
# implementation or oracle changed this round, (3) fill with the
# oldest remaining evidence tier. Python dicts preserve insertion
# order, so this is the order the driver iterates.
_PRIORITY = [
    # -- round-8 rotation (round-7 verdict directive 2): clear the
    # last evidence debt. Head: the 26 rows whose latest driver
    # evidence is round 4 (computed from CORRECTNESS_r0{4..7}.json;
    # everything else in the catalog is r5+). All locally green in
    # tests/test_oracle_parity every round since. --
    "u3_intersect_except", "q13_order_distribution", "q18_large_orders",
    "f1_keyword_regex", "f2_array_membership", "f3_equality_filter",
    "f5_point_lookup", "f6_disjunctive_filter", "f7_prefix_filter",
    "f8_date_range", "f9_conjunctive_filter", "f11_exists_subquery",
    "f12_scalar_subquery", "f13_not_in_subquery", "a4_conditional_counts",
    "a6_distinct_cardinality", "a8_salted_skew_agg", "a9_rollup_revenue",
    "a10_grouped_distinct", "a13_grouping_sets", "a14_multi_distinct",
    "c_scalar_suite", "t10_window_suite", "text_bigram_topk",
    "dedup_clusters", "corpus_split_assign",
    # -- changed this round, needs fresh evidence: the r7 red row
    # (oracle rebuilt on version-stable primitives: Horner hex fold,
    # chr(1) sentinel, string-typed fingerprint) --
    "dq_table_fingerprint",
    # -- fill from the r5 tier, ANN/dedup rows first (verdict: their
    # operators were touched by rounds 6-7 perf work) --
    "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_cosine",
    "dedup_exact", "dedup_ngram_jaccard",
    "sim_cosine_topk", "sim_pq_topk", "sim_lsh_topk", "sim_ivf_topk",
    "sim_knn_join",
    # -- then oldest remaining r5 rows in catalog order --
    "q1_pricing_summary", "q3_top_revenue_orders",
    "f2_nested_hashtag_path", "t7_pagination", "c1_c2_date_format",
    "c10_page_count", "u2_union_results", "a7_percentiles",
    "f4_absence_filter", "t2_top5_sidebar", "text_token_counts",
    "text_quality_features",
    # -- slot 50: the one catalog addition this round (verdict
    # directive 7 — the documented-but-unexercised approx-percentile
    # swap); rows-only driver check by design (approx results cannot
    # hash-match an exact oracle), error bound pinned in
    # tests/test_sampling.py --
    "a7_percentiles_approx",
    # -- round-9 rotation head: the r5 rows displaced here
    # (text_lang_id text_fingerprint mm_media_metadata
    # mm_decode_features w1_tumbling_window_agg s9_sessionization
    # c13_json_extract a12_pivot_matrix text_tfidf_topk
    # c14_array_hof_suite j8_snapshot_diff q4/q6/q7/q10/q11/q14/
    # q16/q19/q22 corpus_curation corpus_shuffle_order
    # text_chunk_windows text_unit_dedup text_pii_scrub) — then the
    # r6 tier. --
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
