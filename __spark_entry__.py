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
#: Rows whose implementation or ORACLE changed this round (or are
#: new): they outrank pure evidence age in the rotation — the driver
#: must validate the changed contract before the judge reads it. Kept
#: deliberately tiny (each slot here displaces an age-rotation slot);
#: tests/test_rotation_policy.py enforces both the exemption and the
#: age ordering of everything after it.
_FRESH_HEAD = [
    # oracle converted rows-only -> a11-style tolerance-boolean hash
    # row (round-8 verdict directive 2); r8 evidence predates the
    # conversion
    "a7_percentiles_approx",
]

_PRIORITY = _FRESH_HEAD + [
    # -- round-9 rotation (round-8 verdict directive 1): stalest
    # evidence first, computed from CORRECTNESS_r0{1..8}.json —
    # never-swept rows (age 0), then the 25 r5-evidence rows, then
    # the oldest r6 rows in catalog order, to exactly 50 slots. The
    # generator lives in tests/test_rotation_policy.py::
    # expected_rotation, which asserts THIS list equals its output. --
    # age 0: new this round (round-8 directive 4 — the combined
    # approx-swap row: approx-percentile winsorize/MAD + HLL rolling
    # distinct, tolerance-boolean oracle)
    "ts_robust_approx",
    # r5 tier (25 rows)
    "text_lang_id", "text_fingerprint", "mm_media_metadata",
    "mm_decode_features", "w1_tumbling_window_agg", "s9_sessionization",
    "corpus_curation", "text_chunk_windows", "text_unit_dedup",
    "c13_json_extract", "a12_pivot_matrix", "text_tfidf_topk",
    "c14_array_hof_suite", "j8_snapshot_diff", "q6_forecast_revenue",
    "q10_returned_items", "q14_promo_effect", "q22_dormant_customers",
    "text_pii_scrub", "q4_order_priority", "q7_volume_shipping",
    "q11_important_nations", "q16_supplier_count",
    "q19_disjunctive_revenue", "corpus_shuffle_order",
    # r6 tier head (23 rows; the remaining 24 r6 rows are the
    # round-10 rotation head, then the r7 tier)
    "dedup_incremental", "mm_resize_images", "mm_resample_audio",
    "mm_frame_sample", "a11_approx_sketches", "text_dup_spans",
    "text_cut_dup_spans", "text_unigram_xent", "text_vocab_coverage",
    "text_nb_classifier", "corpus_budget_select", "corpus_report",
    "text_bigram_xent", "text_hash_bow", "corpus_split_leakage",
    "dedup_canonical", "dedup_clusters_star", "text_decontaminate",
    "text_repetition_quality", "corpus_pack_sequences",
    "corpus_domain_mix", "corpus_weighted_repeat", "sim_kmeans_ivf",
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
