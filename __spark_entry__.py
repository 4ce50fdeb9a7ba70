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
    # -- round-7 rotation: catalog growth is FROZEN this round (the
    # round-6 verdict's evidence-debt directive), so all 50 slots go
    # to existing rows. First the 30 rows that have NEVER appeared in
    # any CORRECTNESS file (round-6 additions past the 50-slot cap;
    # all oracle-parity-green locally via tests/test_oracle_parity) --
    "j11_fuzzy_blocked_linkage", "text_decontaminate_bloom",
    "corpus_stratified_sample", "corpus_weighted_sample",
    "dq_column_profile", "j12_interval_overlap_join",
    "attribution_multitouch", "dedup_containment",
    "corpus_fixed_k_sample", "ts_rolling_distinct_users",
    "s10_event_paths", "dq_table_fingerprint",
    "ts_trend_slope", "graph_bfs_khop", "text_sentiment_lexicon",
    "ts_winsorized_mean", "mm_audio_stats", "text_keyphrases_rake",
    "ts_changepoint_cusum", "dq_benford_digits",
    "j13_sorted_neighborhood", "ts_peak_concurrency",
    "ts_longest_streak", "ts_mad_robust", "a18_abc_classification",
    "a19_rfm_segments", "a20_gini_concentration",
    "a21_copurchase_pairs", "graph_assortativity",
    "t11_ship_latency_percentiles",
    # -- fill to 50 with 20 of the 43 r4-evidence rows, oldest tier in
    # the catalog. Changed-plan rows first (the round-6 size-gated
    # maybe_broadcast touched flagship/j1/q2/q5 — results identical by
    # construction, plan-pinned in tests/test_plans.py, but the
    # changed plans deserve fresh driver evidence), then the core
    # join/sort/window tier in catalog order --
    "flagship_search", "j1_broadcast_user_join", "q2_groupwise_argmin",
    "q5_local_supplier_volume",
    "p1_projection", "j2_dim_chain_join", "j3_collect_assembly",
    "j4_semi_join", "j5_union_harvest", "j6_asof_join", "j7_range_join",
    "a1_count_star", "a2_top_keywords",
    "t1_topk_multisort", "t6_group_topk", "t8_moving_avg",
    "t9_cumulative_daily",
    # -- changed this round (decimal-accumulation hardening landed in
    # ts_anomaly_zscore; j10 and graph_triangles now release their
    # persisted intermediates via the cleanup contract + eager
    # checkpoint; a20's equivalent change is covered by its
    # never-swept slot above) — changed plans outrank r4 fill per the
    # ordering policy above. They displace u3_intersect_except,
    # q13_order_distribution and q18_large_orders to the round-8
    # head. --
    "ts_anomaly_zscore", "j10_set_similarity_join", "graph_triangles",
    # -- the 26 remaining r4 rows MUST head the round-8 rotation (they
    # will be 3 sweeps old otherwise): u3_intersect_except
    # q13_order_distribution q18_large_orders f1_keyword_regex
    # f2_array_membership f3_equality_filter f5_point_lookup
    # f6_disjunctive_filter f7_prefix_filter f8_date_range
    # f9_conjunctive_filter f11_exists_subquery f12_scalar_subquery
    # f13_not_in_subquery a4_conditional_counts
    # a6_distinct_cardinality a8_salted_skew_agg a9_rollup_revenue
    # a10_grouped_distinct a13_grouping_sets a14_multi_distinct
    # c_scalar_suite t10_window_suite text_bigram_topk dedup_clusters
    # corpus_split_assign -- then fill with the oldest r5 tier
    # (q3_top_revenue_orders q7_volume_shipping q10_returned_items
    # q14_promo_effect q11_important_nations q16_supplier_count
    # q19_disjunctive_revenue text_tfidf_topk ...) --
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
