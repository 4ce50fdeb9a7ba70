"""Bench-harness honesty: count()-based timing must not let Catalyst
drop the work a row exists to measure.

With distinct-key propagation, a bare ``count()`` over a join whose
other side is a provably-unique aggregate ELIMINATES THE JOIN — the
round-7 audit found five headline rows timing a fraction of their
pipeline that way. This module pins the contract: every row where the
count-plan loses joins versus the full plan must be routed through
bench.py's FORCE_ALL_COLUMNS hash aggregate (or be checkpoint-
materialized inside its catalog row, as graph_triangles is), so the
class cannot silently return as new queries are added.
"""

from __future__ import annotations

import bench
from twitter_analysis_spark import catalog

#: The rows the round-7 audit caught (join-elimination under count()).
KNOWN_PRUNED = ["funnel_conversion", "dedup_semantic",
                "text_bigram_xent", "sketch_countmin_topk",
                "dedup_incremental", "text_sentiment_lexicon"]


def _joins(df) -> int:
    return df._jdf.queryExecution().optimizedPlan().toString().count("Join")


def _windows(df) -> int:
    return df._jdf.queryExecution().optimizedPlan().toString().count("Window")


def test_known_pruned_rows_are_forced(spark, sf_dir):
    """The audited rows really do lose joins under count() — and each
    is in FORCE_ALL_COLUMNS so bench never times the pruned plan."""
    for name in KNOWN_PRUNED:
        df = catalog.QUERIES[name](spark, sf_dir)
        assert _joins(df.groupBy().count()) < _joins(df), name
        assert name in bench.FORCE_ALL_COLUMNS, name


def test_headline_count_plans_keep_their_joins_and_windows(spark, sf_dir):
    """Sweep every non-forced headline row: its count() plan must keep
    every join AND window of the full plan. A new query that fails
    here needs a FORCE_ALL_COLUMNS entry (or in-row materialization)
    before its bench number means anything."""
    extra = bench._extra_queries()
    offenders = []
    for name in bench.HEADLINE:
        if name in bench.FORCE_ALL_COLUMNS:
            continue
        fn = extra.get(name) or catalog.QUERIES.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        cnt = df.groupBy().count()
        if _joins(cnt) < _joins(df) or _windows(cnt) < _windows(df):
            offenders.append(name)
        spark.catalog.clearCache()
    assert offenders == [], offenders
