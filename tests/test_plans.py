"""Physical-plan regression tests: the scale architecture, asserted.

Correctness tests prove the right rows come back at sf0.01; these prove
the plan SHAPE is the one that survives 100 TB — filters reach the
parquet scan, dimensions broadcast, top-k never global-sorts, grouped
aggregation is partial+final. A regression here means a future edit
silently traded a streaming-friendly plan for a shuffle-everything one,
long before any benchmark would catch it.
"""

from __future__ import annotations

import pytest

from twitter_analysis_spark import catalog


def plan_of(spark, sf_dir, name: str) -> str:
    df = catalog.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filters_push_to_parquet(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "flagship_search")
    assert "PushedFilters: [IsNotNull(event_type)" in plan \
        or "EqualTo(event_type,click)" in plan


def test_projection_prunes_read_schema(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "p1_projection")
    assert "ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>" in plan
    # a pruned scan needs no row filtering at all
    assert "DataFilters: []" in plan


@pytest.mark.parametrize("name", ["flagship_search", "j1_broadcast_user_join",
                                  "j2_dim_chain_join", "q3_top_revenue_orders"])
def test_dimension_joins_broadcast(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan, name
    assert "SortMergeJoin" not in plan, name


@pytest.mark.parametrize("name", ["flagship_search", "t1_topk_multisort",
                                  "t2_top5_sidebar", "q3_top_revenue_orders"])
def test_topk_never_global_sorts(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "TakeOrderedAndProject" in plan, name


@pytest.mark.parametrize("name", ["a2_top_keywords", "q1_pricing_summary",
                                  "a4_conditional_counts"])
def test_aggregation_is_partial_final(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "partial_" in plan, name          # map-side combine present


def test_semi_join_is_semi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j4_semi_join")
    assert "LeftSemi" in plan


def test_anti_join_is_anti(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "f4_absence_filter")
    assert "LeftAnti" in plan


def test_rollup_is_single_expand(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "a9_rollup_revenue")
    assert plan.count("Expand") >= 1
    # one scan of supplier, not one per grouping level
    assert plan.count("supplier.parquet") == 1


def test_sessionization_reuses_exchange(spark, sf_dir):
    # both window passes partition by user_id; the second must reuse
    # the first's shuffle, not add one
    plan = plan_of(spark, sf_dir, "s9_sessionization")
    assert plan.count("Exchange hashpartitioning(user_id") <= 1


def test_pivot_is_one_aggregate_one_scan(spark, sf_dir):
    # Explicit pivot values => no separate distinct-values job; the
    # whole pivot is one partial+final aggregate over a single scan.
    plan = plan_of(spark, sf_dir, "a12_pivot_matrix")
    assert plan.count("FileScan parquet") == 1
    assert "partial_" in plan


def test_cumulative_window_is_partitioned(spark, sf_dir):
    # The running-total window must hash-partition by event_type, never
    # collapse to a single partition (the global-window trap).
    plan = plan_of(spark, sf_dir, "t9_cumulative_daily")
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_bigram_topk_never_global_sorts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "text_bigram_topk")
    assert "TakeOrderedAndProject" in plan


def test_tfidf_doc_filter_pushes_down(spark, sf_dir):
    # The doc_id < 20 scoring subset must reach the tf-side scan as a
    # pushed filter while the df side still scans the full corpus.
    plan = plan_of(spark, sf_dir, "text_tfidf_topk")
    assert "GreaterThan(doc_id,20)" in plan or "LessThan(doc_id,20)" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_grouping_sets_single_scan_expand(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "a13_grouping_sets")
    assert plan.count("FileScan parquet") == 1
    assert "Expand" in plan and "partial_" in plan


def test_window_suite_single_window_pass(spark, sf_dir):
    # All five functions share one window spec -> exactly one Window
    # operator, one sort per partition.
    plan = plan_of(spark, sf_dir, "t10_window_suite")
    assert plan.count("Window") == 1


def test_not_in_is_null_aware_anti(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "f13_not_in_subquery")
    assert "NullAwareAntiJoin" in plan or "LeftAnti" in plan


def test_multi_distinct_is_expand_not_selfjoin(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "a14_multi_distinct")
    assert plan.count("FileScan parquet") == 1
    assert "Expand" in plan and "Join" not in plan


def test_cohort_retention_is_three_exchanges_no_expand(spark, sf_dir):
    # r13 shape: one collect_set aggregate by user, one grid aggregate,
    # one grid window — and NO countDistinct Expand and NO join (the
    # old 5-exchange shape re-shuffled act against cohort and paid the
    # count-DISTINCT expand; cohort_size now lifts off the week-0 grid
    # row via the window).
    plan = plan_of(spark, sf_dir, "cohort_retention")
    assert plan.count("Exchange") <= 3
    assert "Expand" not in plan and "Join" not in plan
    assert plan.count("FileScan parquet") == 1
    # the NULL-contract filters must reach the scan, not a Filter node
    assert "IsNotNull(user_id)" in plan and "IsNotNull(ts)" in plan


def test_embedding_dedup_has_no_cartesian_product(spark, sf_dir):
    """The default embedding near-dup path must be the cell equi-join,
    not the all-pairs cross join (the 100 TB scale-killer)."""
    plan = plan_of(spark, sf_dir, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagination_window_is_bounded_by_topk(spark, sf_dir):
    """The pagination window must run over a TakeOrderedAndProject-
    bounded set (<= page_end rows), never a global sort of the table."""
    plan = plan_of(spark, sf_dir, "t7_pagination")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full-table global sort remains


def test_jaccard_paths_carry_shingle_cap(spark, sf_dir):
    """The pair-explosion guard is part of the executed plan for every
    production Jaccard query: a size filter on the per-shingle posting
    list. Match the specific predicate fragment (size(_docs) <= 256),
    not bare substrings that could survive the filter being dropped.
    These three rows are deliberately kept LAZY (their catalog
    comments say so) so this pin can see the whole shingle pipeline —
    which also makes them the place to assert the self-join never
    degenerates to a cross join (rows that materialize the pairs
    branch eagerly, e.g. the CC-consuming cluster rows, hide it
    behind an RDD leaf; corpus_training_set is lazy too since r12 and
    its cap filter is asserted in its own pipeline pin)."""
    import re

    for name in ("dedup_ngram_jaccard", "corpus_curation", "dedup_minhash_lsh"):
        plan = plan_of(spark, sf_dir, name)
        assert re.search(r"size\(_docs#\d+[^)]*\)[^<>]{0,20}<= 256", plan), name
        # both degenerate-join physical forms: at test scale a broken
        # equi-join key plans as BroadcastNestedLoopJoin (the small
        # side fits the threshold), only past it as CartesianProduct
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q6_filters_reach_scan_and_agg_is_partial(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    assert "PushedFilters" in plan and "l_quantity" in plan.split(
        "PushedFilters", 1)[1].split("]", 1)[0]
    assert "partial_" in plan


def test_q10_broadcasts_customer_and_takes_topk(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q10_returned_items")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q22_anti_join_on_pruned_orders(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q22_dormant_customers")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    # the NOT EXISTS side scans orders WITH the date filter pushed down
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_pii_scrub_is_map_only(spark, sf_dir):
    # redaction must be a pure projection: no Exchange anywhere
    plan = plan_of(spark, sf_dir, "text_pii_scrub")
    assert "Exchange" not in plan
    assert "regexp_replace" in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    # the corpus side must meet the benchmark shingles in a broadcast
    # hash join — never a SortMergeJoin that shuffles the corpus
    plan = plan_of(spark, sf_dir, "text_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the corpus side must NOT shuffle pre-join (array_distinct dedups
    # per row): total shuffles = benchmark distinct + final doc agg
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 2


def test_pack_sequences_windows_per_shard(spark, sf_dir):
    # the running sum partitions by source: no single-partition global
    # window (Exchange SinglePartition feeding a Window)
    plan = plan_of(spark, sf_dir, "corpus_pack_sequences")
    assert "Window" in plan
    import re
    assert not re.search(r"Exchange SinglePartition[^\n]*\n[^\n]*Window", plan)
    assert "hashpartitioning(source" in plan


def test_training_set_pipeline_plan(spark, sf_dir):
    # end-to-end assembly: violator sets anti-joined, benchmark side
    # broadcast, packing windowed per split — and never a cross join.
    # Since r12 the near-dup violator branch is a lazy sub-plan
    # (persist_index=False), so the shingle-cap guard and its
    # non-degenerate self-join are visible and asserted HERE too.
    import re

    plan = plan_of(spark, sf_dir, "corpus_training_set")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(split" in plan
    assert re.search(r"size\(_docs#\d+[^)]*\)[^<>]{0,20}<= 256", plan)


def test_q4_semi_join_on_pruned_orders(spark, sf_dir):
    # The quarter predicate must reach the orders scan BEFORE the
    # EXISTS semi join; the correlated EXISTS must plan as LeftSemi.
    plan = plan_of(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_q8_dims_broadcast_no_cartesian(spark, sf_dir):
    # The 8-table market-share join: every dimension side broadcasts
    # (the only shuffle-eligible join is lineitem-orders), the part
    # filter reaches its scan, and nothing degenerates to a cross
    # join.
    plan = plan_of(spark, sf_dir, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan
    assert "EqualTo(p_type,ECONOMY)" in plan


def test_q17_subquery_decorrelates_to_aggregate_join(spark, sf_dir):
    # The correlated scalar AVG must plan as a per-part aggregate
    # joined back (two lineitem scans, partial+final agg), never a
    # per-row subquery.
    plan = plan_of(spark, sf_dir, "q17_small_quantity_revenue")
    assert "partial_avg" in plan or "partial_" in plan
    assert plan.count("FileScan parquet") >= 2
    assert "EqualTo(p_size,1)" in plan


def test_q19_derives_side_local_filters(spark, sf_dir):
    # The cross-side OR can only evaluate post-join, but Catalyst must
    # derive side-local residuals: brand/size reach the part scan and
    # the quantity envelope reaches the lineitem scan.
    plan = plan_of(spark, sf_dir, "q19_disjunctive_revenue")
    assert "p_brand" in plan.split("Scan parquet")[1] or "In(p_brand" in plan
    assert "l_quantity" in plan
    assert "CartesianProduct" not in plan


def _analyzed(spark, sf_dir, name: str) -> str:
    df = catalog.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().analyzed().toString()


def test_maybe_broadcast_gate(spark, sf_dir, monkeypatch):
    """The broadcast hint on sf-SCALING tables (customer/part) is
    size-gated: present while Catalyst's estimate is small (so the
    sf0.1 plan is unchanged), ABSENT when the estimate exceeds the
    gate — simulating a 100x scale-up — so AQE decides from runtime
    sizes instead of a forced multi-GB build side."""
    # default gate: hint attached, dimension join broadcasts
    assert "ResolvedHint" in _analyzed(spark, sf_dir, "flagship_search")
    assert "BroadcastHashJoin" in plan_of(spark, sf_dir, "flagship_search")
    baseline = {tuple(r) for r in
                catalog.QUERIES["flagship_search"](spark, sf_dir).collect()}

    # simulated 100x: every maybe_broadcast frame exceeds the gate
    monkeypatch.setattr(catalog, "_BROADCAST_GATE_BYTES", 0)
    assert "ResolvedHint" not in _analyzed(spark, sf_dir, "flagship_search")
    scaled = {tuple(r) for r in
              catalog.QUERIES["flagship_search"](spark, sf_dir).collect()}
    assert scaled == baseline  # join strategy never changes results


def test_bounded_dims_keep_unconditional_hint(spark, sf_dir, monkeypatch):
    """nation/region are schema-bounded (25/5 rows at ANY sf): their
    broadcast hints must survive the simulated scale-up while the
    supplier-derived frame in the same query loses its hint."""
    monkeypatch.setattr(catalog, "_BROADCAST_GATE_BYTES", 0)
    # j2 chains supplier -> nation -> region: both dim hints unconditional
    assert _analyzed(spark, sf_dir, "j2_dim_chain_join").count("ResolvedHint") == 2
    # q10 joins customer (sf-scaling): no forced hint left anywhere
    assert "ResolvedHint" not in _analyzed(spark, sf_dir, "q10_returned_items")


def test_q9_part_filter_prunes_fact_before_shuffle(spark, sf_dir):
    # The part-name predicate must reach the part scan so the lineitem
    # slice is pruned through the broadcast join before any shuffle.
    plan = plan_of(spark, sf_dir, "q9_product_profit")
    assert "Contains(p_name,bolt)" in plan
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_q12_window_pushes_and_residual_rides_join(spark, sf_dir):
    # The ship-date window prunes the lineitem scan; the late-ship
    # comparison is a residual on the equi join, never a filter after
    # a wider join; CASE counters collapse map-side.
    plan = plan_of(spark, sf_dir, "q12_shipmode_priority")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan


def test_q20_nested_in_decorrelates(spark, sf_dir):
    # The three-level IN chain must decorrelate: part-name IN and both
    # outer INs become semi joins, and the correlated 0.5*SUM HAVING
    # threshold becomes a per-part aggregate joined back on the
    # grouping key — never a per-row re-scan of lineitem.
    plan = plan_of(spark, sf_dir, "q20_excess_suppliers")
    assert plan.count("LeftSemi") >= 3
    assert "StartsWith(p_name,small)" in plan
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan


def test_dup_spans_no_cartesian_window_keyed_by_doc(spark, sf_dir):
    """Duplicated-span stats: the first-occurrence flag must stay a
    key-equi join (never a cartesian), its aggregate must combine
    map-side, and the coverage window must be partitioned by doc."""
    plan = plan_of(spark, sf_dir, "text_dup_spans")
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan            # min(struct) partial agg
    assert "windowspecdefinition(_doc" in plan


def test_unigram_xent_model_cached_once(spark, sf_dir):
    """The self-trained unigram model is persisted: the scoring join
    and the (N,V) scalar both read InMemoryRelation, so the corpus is
    token-aggregated exactly once at any scale."""
    plan = plan_of(spark, sf_dir, "text_unigram_xent")
    assert "InMemoryTableScan" in plan
    assert "partial_count" in plan


def test_vocab_window_after_topk_cut(spark, sf_dir):
    """The coverage window runs on the k-row TakeOrderedAndProject
    output, never on the full vocabulary."""
    plan = plan_of(spark, sf_dir, "text_vocab_coverage")
    assert "TakeOrderedAndProject" in plan
    i_topk = plan.index("TakeOrderedAndProject")
    i_win = plan.index("Window")
    assert i_win < i_topk               # window is downstream (printed above)


def test_canonical_pick_is_aggregate_not_window(spark, sf_dir):
    """The per-cluster canonical choice must be a max(struct) partial
    aggregate (mega-cluster safe), not a rank window over clusters."""
    plan = plan_of(spark, sf_dir, "dedup_canonical")
    assert "partial_max" in plan
    assert "row_number" not in plan


def test_incremental_dedup_probe_is_key_join(spark, sf_dir):
    """Batch-vs-index probe stays a key-equi left join with partial
    min aggregation for the batch winner; no cartesian anywhere."""
    plan = plan_of(spark, sf_dir, "dedup_incremental")
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan


def test_bpe_encode_is_map_only_replace_chain(spark, sf_dir):
    """The encode half of text_bpe_tokenize is scan -> explode ->
    string replaces; the only exchange is the final top-k aggregate
    (partial+final), and no Python UDF appears anywhere."""
    plan = plan_of(spark, sf_dir, "text_bpe_tokenize")
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "partial_count" in plan
    # top-30 cut must not global-sort the subword table
    assert "TakeOrderedAndProject" in plan


def test_semantic_dedup_pair_join_keyed_by_cell(spark, sf_dir):
    """SemDeDup's in-cell pair search is a key-equi self-join on the
    persisted assignment (InMemoryTableScan reused on both sides),
    never a cartesian; kept-flag attach stays a key join."""
    plan = plan_of(spark, sf_dir, "dedup_semantic")
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 2
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_pmi_pairs_build_map_side(spark, sf_dir):
    # The pair triangle is array transforms + one explode: no UDF, no
    # per-doc join. The count over pairs is a partial+final aggregate.
    plan = plan_of(spark, sf_dir, "text_cooccur_pmi")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate explode" in plan
    assert "partial_count" in plan


def test_zorder_key_stays_in_codegen(spark, sf_dir):
    # Pure bit arithmetic: codegen all the way, no Python, no extra
    # Exchange beyond the final aggregation's. Execute first — AQE
    # only materializes WholeStageCodegen spans in the FINAL plan.
    df = catalog.QUERIES["layout_zorder_key"](spark, sf_dir)
    df.collect()
    # final AQE plan prints codegen spans as "*(n)" stage markers;
    # toString appends the initial plan too, so trim to the final one
    plan = df._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert "*(1)" in plan  # whole-stage codegen stage marker
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_salted_join_is_shuffle_not_broadcast(spark, sf_dir):
    # Salting matters exactly when the dimension CANNOT broadcast (a
    # broadcast join has no reducer skew to begin with). Simulate the
    # big-dim regime by disabling auto-broadcast, as the
    # maybe_broadcast tests simulate 100x scale. Since the r15 upgrade
    # to skew_split_join the pinned shape is the SPLIT: semi/anti
    # branches on an explicitly-broadcast hot-KEY set (bounded by
    # |facts|/threshold — always broadcastable, that broadcast is the
    # point), the hot branch a shuffle join keyed on (key, salt), the
    # cold branch a plain shuffle join; the DIMENSION itself must ride
    # a shuffle join in both branches, never a broadcast.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(spark, sf_dir, "j9_salted_skew_join")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "_salt" in plan
    # two shuffle joins survive: hot (key, salt) + cold (key)
    n_shuffle_joins = plan.count("SortMergeJoin") + \
        plan.count("ShuffledHashJoin")
    assert n_shuffle_joins >= 2
    # the split machinery: hot-membership semi + anti on the facts
    assert "LeftSemi" in plan and "LeftAnti" in plan
    # broadcast appears ONLY as the hot-key-set build side (semi/anti/
    # slice pruning) — never as the dimension join itself: every
    # BroadcastHashJoin in the plan must be a semi/anti membership
    # probe, not the c_mktsegment-producing inner join
    import re
    for m in re.finditer(r"BroadcastHashJoin \[[^\]]*\], \[[^\]]*\], "
                         r"(\w+)", plan):
        assert m.group(1) in ("LeftSemi", "LeftAnti"), plan[:2000]


def test_cms_probe_broadcasts_config_sized_sketch(spark, sf_dir):
    # The sketch side (depth x width cells, a config constant) rides a
    # broadcast join into the probe — never a shuffle of the queries.
    plan = plan_of(spark, sf_dir, "sketch_countmin_topk")
    assert "BroadcastHashJoin" in plan


def test_anomaly_single_window_pass(spark, sf_dir):
    # One Window operator computes all three trailing stats.
    plan = plan_of(spark, sf_dir, "ts_anomaly_zscore")
    assert plan.count("Window") >= 1
    assert plan.count("WindowExec") <= 1 or plan.count(" Window ") <= 1


def test_funnel_has_no_window_or_python(spark, sf_dir):
    # The funnel is pure join+agg — no per-user window/sort machinery.
    plan = plan_of(spark, sf_dir, "funnel_conversion")
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_single_shuffle_for_both_windows(spark, sf_dir):
    # lag-collapse and lead-close share the user-keyed partitioning:
    # exactly one Exchange hashpartitioning(user_id...) in the plan.
    plan = plan_of(spark, sf_dir, "scd2_intervals")
    import re
    exchanges = re.findall(r"Exchange hashpartitioning\(user_id", plan)
    assert len(exchanges) == 1, plan.count("Exchange")


def test_set_similarity_no_cartesian(spark, sf_dir):
    # The PPJoin candidate stage is an equi-join on the prefix shingle
    # plus inequality residuals — never a cartesian/broadcast-NL scan
    # of all pairs, which is the whole point of prefix filtering.
    # Plan is taken from the library operator directly: the catalog row
    # localCheckpoints its result to honor the persist-cleanup
    # contract, which truncates the returned frame's lineage.
    from twitter_analysis_spark.operators import linkage as _lk
    from twitter_analysis_spark.sources.io import load_table

    cleanup: list = []
    df = _lk.set_similarity_join(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        threshold=0.5, n=3, cleanup=cleanup)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for frame in cleanup:
        frame.unpersist()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # rarest-first rank is a per-doc window, not a global one
    assert "hashpartitioning(doc" in plan


def test_fuzzy_linkage_collapses_to_dictionary(spark, sf_dir):
    # The quadratic stage must run on DISTINCT names: a hash-aggregate
    # (vocabulary collapse) feeds the self-join, and the levenshtein
    # verify stays a JVM expression (no Python eval).
    plan = plan_of(spark, sf_dir, "j11_fuzzy_blocked_linkage")
    assert "levenshtein" in plan
    assert "partial_count" in plan       # map-side combine on the collapse
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_skyline_is_window_not_dominance_join(spark, sf_dir):
    # The textbook skyline is a quadratic NOT-EXISTS self-join; the
    # engine plan must instead be agg + two per-brand windows — no
    # join operator of any kind, no single-partition window.
    plan = plan_of(spark, sf_dir, "a15_skyline_pareto")
    assert "Join" not in plan
    assert "Window" in plan
    assert "hashpartitioning(p_brand" in plan
    assert "SinglePartition" not in plan


def test_interval_overlap_equi_join_on_grid(spark, sf_dir):
    # Candidates must meet on an EQUI key ((supp, part, cell)) — the
    # whole point of the grid trick; the inequality parts are
    # residual filters, not the join strategy.
    plan = plan_of(spark, sf_dir, "j12_interval_overlap_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_attribution_single_pid_exchange(spark, sf_dir):
    # All three models come from ONE windowed pass: exactly one
    # pid-keyed exchange (the union formulation costs three), and the
    # click/purchase match is a single join.
    import re
    plan = plan_of(spark, sf_dir, "attribution_multitouch")
    assert len(re.findall(r"Exchange hashpartitioning\(pid", plan)) == 1
    assert plan.count("Join") >= 1
    assert "Union" not in plan


def _scan_output_rows(df) -> int:
    """Sum of `number of output rows` over the plan's scan leaves —
    i.e. rows the parquet reader actually MATERIALIZED after
    row-group (min/max) and page (column-index) pruning. Record-level
    parquet filtering is off by default in Spark, so a scan count far
    below the table count is positive proof that whole row
    groups/pages were skipped at the reader, not filtered upstairs."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "Scan" not in node.nodeName():
            continue
        m = node.metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return total


def test_selective_scan_skips_row_groups(spark, tmp_path):
    """SURVEY §4's min/max-skipping claim, measured (round-7 verdict
    item 4): a selective F5-style point filter and an F8-style range
    filter over a sort-clustered parquet table must materialize far
    fewer rows AT THE SCAN than the table holds — the row-group/page
    stats did the skipping — while an unclustered layout of the same
    rows cannot skip (its every row group spans the full key range).
    This is the physical mechanism behind the F3/F5/F8 catalog rows
    at 100 TB: selective scans touch storage proportional to the
    SELECTED data, but only if the layout clusters the key."""
    import pyspark.sql.functions as F

    n = 200_000
    base = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).alias("v"),
        F.concat(F.lit("pad_"), F.col("id")).alias("pad"))
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    # small row groups => many stats units per file; sorted vs shuffled
    (base.orderBy("k").coalesce(2).write
     .option("parquet.block.size", 64 * 1024)
     .mode("overwrite").parquet(clustered))
    (base.orderBy(F.xxhash64("k")).coalesce(2).write
     .option("parquet.block.size", 64 * 1024)
     .mode("overwrite").parquet(scattered))

    # F8-style range: 1% of the key space
    lo, hi = 10_000, 12_000
    rng = F.col("k").between(lo, hi)
    got = _scan_output_rows(
        spark.read.parquet(clustered).where(rng))
    assert got >= hi - lo + 1          # correctness floor
    assert got < n // 10, got          # >90% of rows never materialized
    # the unclustered twin reads ~everything: stats can't help it
    scat = _scan_output_rows(
        spark.read.parquet(scattered).where(rng))
    assert scat > n // 2, scat
    # and the pushdown is visible in the plan text as well
    plan = (spark.read.parquet(clustered).where(rng)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k," in plan

    # F5-style point lookup: one row group's worth at most
    point = _scan_output_rows(
        spark.read.parquet(clustered).where(F.col("k") == 54_321))
    assert 1 <= point < n // 10, point


def test_incremental_dedup_index_joins_before_any_exchange(spark, tmp_path):
    """incremental_exact_dedup's contract is "heavy work proportional
    to the batch" — which dies if the corpus-sized index is SHUFFLED
    per batch. A direct `batch LEFT JOIN index` does exactly that:
    Spark can only broadcast an outer join's build side, which for a
    left join is the index, so once the index outgrows the broadcast
    threshold the whole index exchanges every batch. The operator
    therefore probes in two steps (index LEFT-SEMI broadcast batch
    keys, then batch LEFT JOIN the hit set), and the pin is
    structural: on the executed plan's INDEX branch, a join must
    appear BEFORE any Exchange — i.e. whatever shuffles afterwards is
    the semi-filtered hit set (batch-sized), never the raw index.
    Thresholds are pinned low so the index cannot be broadcast away
    (which would mask the hazard exactly as it does at test scale)."""
    from pyspark.sql import functions as F

    from twitter_analysis_spark.operators.dedup import (
        incremental_exact_dedup)

    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, str(256 * 1024))
    try:
        ix_path = str(tmp_path / "ix")
        (spark.range(100_000)
         .select(F.xxhash64(F.concat(F.lit("doc"), F.col("id")))
                 .alias("content_key"),
                 F.col("id").alias("holder_id"))
         .write.parquet(ix_path))
        index = spark.read.parquet(ix_path)
        batch = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc"), (F.col("id") * 7).cast("string"))
            .alias("text"))
        res = incremental_exact_dedup(batch, index, "doc_id", "text")
        res.collect()                      # finalize AQE
        plan = res._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # ancestors of the index scan, nearest first
    scan_at = plan.index("FileScan parquet")
    lines = plan[:scan_at].splitlines()
    last = lines[-1]
    indent = len(last) - len(last.lstrip(" :+-*(0123456789)"))
    ancestors = []
    for line in reversed(lines[:-1]):
        stripped = line.lstrip(" :+-")
        this_indent = len(line) - len(stripped)
        if this_indent < indent:
            indent = this_indent
            ancestors.append(stripped)
    first_join = next((i for i, s in enumerate(ancestors)
                       if "Join" in s), None)
    first_exchange = next((i for i, s in enumerate(ancestors)
                           if s.startswith("Exchange")), len(ancestors))
    assert first_join is not None, ancestors
    assert first_join < first_exchange, ancestors


def _ancestors_of_index_scan(plan: str) -> list[str]:
    """Ancestor operator list (nearest first) of the first parquet
    FileScan in an executed-plan string — the tree-walk the
    join-before-exchange pins share."""
    scan_at = plan.index("FileScan parquet")
    lines = plan[:scan_at].splitlines()
    last = lines[-1]
    indent = len(last) - len(last.lstrip(" :+-*(0123456789)"))
    ancestors = []
    for line in reversed(lines[:-1]):
        stripped = line.lstrip(" :+-")
        this_indent = len(line) - len(stripped)
        if this_indent < indent:
            indent = this_indent
            ancestors.append(stripped)
    return ancestors


def test_incremental_dedup_bucketed_index_scan_has_no_exchange(spark):
    """The deploy-scale claim the two-step probe's docstring makes
    (operators/dedup.py:incremental_exact_dedup): bucketing the stored
    index by content_key removes even the index SCAN's exchange. The
    regime that matters is when nothing can broadcast (cluster-scale
    batches): there the plain-parquet index must shuffle into the
    SortMergeJoin, while a bucketed index's scan already satisfies the
    join's distribution. Pinned over the COMPOSED deploy layout — the
    index table partitioned by _batch_id (the replace-by-batch
    streaming layout) AND bucketed by content_key, read exactly the
    way the streaming probe reads it (own batch's partition excluded,
    layout column dropped): the index branch must reach its first Join
    with ZERO Exchange, and the same probe over a plain-parquet index
    must NOT (the negative control that keeps this pin falsifiable)."""
    import pyspark.sql.functions as F

    from twitter_analysis_spark.operators.dedup import (
        incremental_exact_dedup)

    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")              # nothing broadcasts
    idx_df = (spark.range(100_000)
              .select(F.xxhash64(F.concat(F.lit("doc"), F.col("id")))
                      .alias("content_key"),
                      F.col("id").alias("holder_id"),
                      (F.col("id") % 7).alias("_batch_id")))
    batch = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc"), (F.col("id") * 7).cast("string"))
        .alias("text"))
    try:
        (idx_df.write.mode("overwrite")
         .partitionBy("_batch_id")
         .bucketBy(8, "content_key").sortBy("content_key")
         .saveAsTable("dedup_index_bucketed"))
        index = (spark.table("dedup_index_bucketed")
                 .where(F.col("_batch_id") != 999)   # the streaming read
                 .drop("_batch_id"))
        res = incremental_exact_dedup(batch, index, "doc_id", "text")
        res.collect()                      # finalize AQE
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 8 out of 8" in plan
        anc = _ancestors_of_index_scan(plan)
        first_join = next((i for i, s in enumerate(anc) if "Join" in s),
                          None)
        first_ex = next((i for i, s in enumerate(anc)
                         if s.startswith("Exchange")), len(anc))
        assert first_join is not None, anc
        assert first_join < first_ex, anc

        # negative control: plain parquet index in the same no-broadcast
        # regime shuffles before its first join
        import tempfile
        flat = tempfile.mkdtemp(prefix="dedup_idx_flat_")
        idx_df.drop("_batch_id").write.mode("overwrite").parquet(flat)
        res2 = incremental_exact_dedup(
            batch, spark.read.parquet(flat), "doc_id", "text")
        res2.collect()
        plan2 = res2._jdf.queryExecution().executedPlan().toString()
        anc2 = _ancestors_of_index_scan(plan2)
        fj2 = next((i for i, s in enumerate(anc2) if "Join" in s), None)
        fe2 = next((i for i, s in enumerate(anc2)
                    if s.startswith("Exchange")), len(anc2))
        assert fj2 is not None and fe2 < fj2, anc2
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS dedup_index_bucketed")


def test_two_tier_dedup_base_branch_has_no_exchange(spark):
    """The COMPOSED two-tier deploy plan (r11): incremental dedup
    probing [folded bucketed base, parquet delta] as separate tiers.
    The corpus-sized base branch must reach its LeftSemi join with
    ZERO exchange even when nothing can broadcast (scan → filter →
    project → local sort → SMJ; bucket distribution satisfies the
    join), and only the batch-bounded hit sets meet at the Union.
    This is the shape streaming_ingest_dedup(base_index_table=...)
    runs every micro-batch, so a regression here is a per-trigger
    corpus shuffle."""
    import tempfile

    import pyspark.sql.functions as F

    from twitter_analysis_spark.operators.dedup import (
        incremental_exact_dedup)

    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        idx = (spark.range(100_000)
               .select(F.xxhash64(F.concat(F.lit("doc"), F.col("id")))
                       .alias("content_key"),
                       F.col("id").alias("holder_id"),
                       F.concat(F.lit("lin-a_"), (F.col("id") % 7))
                       .alias("_batch_id")))
        (idx.write.mode("overwrite")
         .bucketBy(8, "content_key").sortBy("content_key")
         .saveAsTable("two_tier_plan_base"))
        delta_dir = tempfile.mkdtemp(prefix="two_tier_delta_")
        (spark.range(100_000, 100_500)
         .select(F.xxhash64(F.concat(F.lit("doc"), F.col("id")))
                 .alias("content_key"),
                 F.col("id").alias("holder_id"))
         .write.mode("overwrite").parquet(delta_dir))
        base = (spark.table("two_tier_plan_base")
                .where(F.col("_batch_id") != "zz").drop("_batch_id"))
        delta = spark.read.parquet(delta_dir)
        batch = spark.range(500).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc"), (F.col("id") * 7).cast("string"))
            .alias("text"))
        res = incremental_exact_dedup(batch, [base, delta],
                                      "doc_id", "text")
        res.collect()                      # finalize AQE
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 8 out of 8" in plan
        lines = plan.splitlines()
        scan_i = next(i for i, l in enumerate(lines)
                      if "FileScan parquet" in l
                      and "two_tier_plan_base" in l)
        indent = len(lines[scan_i]) - len(
            lines[scan_i].lstrip(" :+-*(0123456789)"))
        anc = []
        for line in reversed(lines[:scan_i]):
            stripped = line.lstrip(" :+-")
            this_indent = len(line) - len(stripped)
            if this_indent < indent:
                indent = this_indent
                anc.append(stripped)
        fj = next((i for i, s in enumerate(anc) if "Join" in s), None)
        fe = next((i for i, s in enumerate(anc)
                   if s.lstrip("*(0123456789) ").startswith("Exchange")),
                  len(anc))
        assert fj is not None, anc
        assert fj < fe, anc
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS two_tier_plan_base")


def test_pagerank_iteration_edge_side_has_no_exchange(spark):
    """The contract pagerank_exact's loop relies on (r11): an edge
    list persisted pre-partitioned on src satisfies the per-iteration
    contribution join's distribution straight from the cache, so each
    round re-shuffles only the |V|-sized rank table — never the
    |E|-sized edges. Pinned on the exact iteration shape (checkpointed
    ranks joining the cached repartition("src") edges on node == src)
    with broadcast disabled, the regime where a regression would mean
    a full edge shuffle per iteration at cluster scale. The same join
    against the UNPARTITIONED cached edges must show an edge-side
    Exchange (the negative control keeping the pin falsifiable)."""
    import pyspark.sql.functions as F

    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")

    def edge_scan_ancestors(res) -> list[str]:
        res.collect()
        plan = res._jdf.queryExecution().executedPlan().toString()
        scan_at = plan.index("InMemoryTableScan")
        lines = plan[:scan_at].splitlines()
        last = lines[-1]
        indent = len(last) - len(last.lstrip(" :+-*(0123456789)"))
        anc = []
        for line in reversed(lines[:-1]):
            stripped = line.lstrip(" :+-")
            this_indent = len(line) - len(stripped)
            if this_indent < indent:
                indent = this_indent
                anc.append(stripped)
        return anc

    def probe(ed):
        ranks = (spark.range(2000)
                 .select(F.col("id").alias("node"),
                         F.lit(7).alias("out_deg"),
                         (F.col("id") * 3).alias("rank_q"))
                 .localCheckpoint())
        return (ranks.where(F.col("out_deg").isNotNull())
                .join(ed, ranks.node == ed.src)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.expr("rank_q DIV out_deg")).alias("c")))

    edges = spark.range(20000).select(
        (F.col("id") % 2000).alias("src"), (F.col("id") % 149).alias("dst"))
    ed = edges.repartition("src").persist()
    ed_flat = edges.persist()
    try:
        anc = edge_scan_ancestors(probe(ed))
        fj = next((i for i, s in enumerate(anc) if "Join" in s), None)
        fe = next((i for i, s in enumerate(anc)
                   if s.lstrip("*(0123456789) ").startswith("Exchange")),
                  len(anc))
        assert fj is not None, anc
        assert fj < fe, anc
        # negative control: unpartitioned cache -> edge-side Exchange
        anc2 = edge_scan_ancestors(probe(ed_flat))
        fj2 = next((i for i, s in enumerate(anc2) if "Join" in s), None)
        fe2 = next((i for i, s in enumerate(anc2)
                    if s.lstrip("*(0123456789) ").startswith("Exchange")),
                   len(anc2))
        assert fj2 is not None and fe2 < fj2, anc2
    finally:
        ed.unpersist()
        ed_flat.unpersist()
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
