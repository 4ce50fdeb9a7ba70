"""Planted-NULL contract pins (null-audit hazard 20, docs/SCALE.md).

The driver's correctness gate runs on null-free testdata, so a NULL-
semantics gap (Spark's NULLS FIRST default vs ANSI NULLS LAST, NULL
join/group keys, three-valued dominance/NOT-IN, kernels raising on
NULL blobs) is invisible there — the r13 full-catalog audit
(artifacts/NULL_AUDIT_r13.json) found 42 such rows. Every row fixed
since then gets a pin HERE: full Spark-vs-DuckDB parity on a
NULL-injected copy of sf0.001 (~2% of cells nulled in every column of
every table, the same deterministic injection tools/null_audit.py
sweeps the whole catalog with). A regression in any fixed row's NULL
contract fails its pin without waiting for the next manual audit.
"""

from __future__ import annotations

import pytest

from parity import compare, inject_nulls

#: Rows whose NULL contract is pinned (fix round noted). Grow this
#: list as audit classes close; tools/null_audit.py remains the
#: full-catalog sweep for rows not yet fixed.
FIXED_ROWS = [
    # r13 class C / ordering fixes
    "j3_collect_assembly",
    "c14_array_hof_suite",
    "t8_moving_avg",
    "cohort_retention",
    # r14 class B: structural NOT-NULL contracts + ordering pins
    "scd2_intervals",
    "funnel_conversion",
    "ts_anomaly_zscore",
    "dq_constraint_report",
    "layout_rank_bucketize",
    "a15_skyline_pareto",
    "j12_interval_overlap_join",
    # r14 class B, out-of-rotation tier (staged in _FRESH_HEAD except
    # q17, whose oracle-only fix is a provable no-op on null-free
    # input — THIS pin is its validation)
    "j6_asof_join",
    "s9_sessionization",
    "corpus_pack_sequences",
    "ts_peak_concurrency",
    "ts_changepoint_cusum",
    "q17_small_quantity_revenue",
    # r14 class A: required-input contracts (IS NOT NULL both sides)
    # + null-total kernels (NULL blob/vector → excluded, never raise)
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "sim_pq_topk",
    "sim_knn_join",
    "sim_kmeans_ivf",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "mm_media_metadata",
    "mm_decode_features",
    "mm_resize_images",
    "mm_resample_audio",
    "mm_frame_sample",
    "mm_image_ahash",
    "mm_audio_stats",
    "text_nb_classifier",
    "text_tfidf_topk",
    "text_unit_dedup",
    # r14 class D (hash keys / sketches over nullable inputs) + t9.
    # t9 and the other window-pinned rows also carry the DuckDB-bug
    # workaround: 1.0.0's window ORDER BY is NONDETERMINISTIC over a
    # NULL-bearing sort key (even with explicit NULLS FIRST) when the
    # window reads an INLINED aggregate CTE — oracles pin Spark's
    # NULLS-FIRST placement with null-free `(k IS NOT NULL),
    # COALESCE(k, const)` keys over MATERIALIZED CTEs instead.
    "t9_cumulative_daily",
    "corpus_shuffle_order",
    "corpus_fixed_k_sample",
    "corpus_domain_mix",
    "corpus_curation",
    "ts_robust_approx",
    # r14 stress pass (1/10 null rate) — two latent rows the 1/50
    # rate had passed by luck
    "corpus_weighted_sample",
    "t10_window_suite",
    # r15 10x-scale pass (full-catalog audit at sf0.1, rate 50 —
    # artifacts/NULL_AUDIT_SF01_r15.json): four rows every sf0.001
    # audit had passed by luck. ANSI NOT-IN three-valued logic
    # (q16), ordered-sequence element contracts (s10), leaderboard
    # identity + NULLS FIRST/LAST tiebreak (streak), and the
    # engines' ULP-divergent percentile interpolations surfacing
    # through FLOOR(x*1e6) once injected NULLs shifted n
    # (winsorized — both sides now spell the interpolation
    # identically from rank-selected elements).
    "q16_supplier_count",
    "s10_event_paths",
    "ts_longest_streak",
    "ts_winsorized_mean",
    # r15 sf0.1 STRESS pass (1/10 rate at 10x scale) — the
    # text_unit_dedup r14 class these sibling rows missed: a NULL id
    # wins Spark's min(struct) first-occurrence and the plain !=
    # flag predicate goes three-valued against it, silently
    # unflagging true duplicates (operator fix: eqNullSafe), while
    # ANSI row_number ranks the NULL id LAST — opposite winners, so
    # the catalog rows exclude NULL ids both sides.
    "text_dup_spans",
    "text_cut_dup_spans",
]


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory) -> str:
    root = str(tmp_path_factory.mktemp("nulldata"))
    inject_nulls(spark, "/root/testdata/sf0.001", root)
    return root


@pytest.mark.parametrize("name", FIXED_ROWS)
def test_row_is_null_total(spark, null_sf_dir, name):
    # catalog.QUERIES directly, NOT __spark_entry__.queries(): the
    # driver-contract wrapper mutates session conf (shuffle.partitions
    # -> 32) as the real driver needs, which would silently defeat the
    # 8-bucket zero-exchange plan pins that run later in this suite.
    from twitter_analysis_spark import catalog

    problems = compare(spark, null_sf_dir, name,
                       catalog.QUERIES[name], catalog.ORACLES[name])
    assert not problems, problems
