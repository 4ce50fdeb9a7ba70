"""global_shuffle_order invariants: balanced shards, content-stable
placement, and a dense 0..N-1 position space."""

from __future__ import annotations

from collections import Counter

from twitter_analysis_spark.operators.sampling import global_shuffle_order
from twitter_analysis_spark.sources.io import load_table


def _placements(df):
    return {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in df.collect()}


def test_shards_balanced_and_dense(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cleanup: list = []
    out = global_shuffle_order(docs, "doc_id", seed=42, n_shards=8,
                               cleanup=cleanup)
    rows = out.collect()
    n = docs.count()
    assert len(rows) == n
    sizes = Counter(r["shard"] for r in rows)
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # positions within each shard are dense 0..size-1 (a valid global
    # round-robin order), no gaps or duplicates
    for shard, size in sizes.items():
        got = sorted(r["shard_pos"] for r in rows if r["shard"] == shard)
        assert got == list(range(size))
    for df in cleanup:
        df.unpersist()


def test_placement_partitioning_invariant(spark, sf_dir):
    """The (shard, pos) assignment is a pure function of (id, seed):
    identical under different input partitionings and partition
    counts — the property an RNG-based shuffle does NOT have."""
    docs = load_table(spark, sf_dir, "documents")
    a = _placements(global_shuffle_order(docs, "doc_id", seed=7, n_parts=8))
    b = _placements(global_shuffle_order(docs.repartition(3), "doc_id",
                                         seed=7, n_parts=5))
    assert a == b


def test_unpersist_before_materialize_is_safe(spark, sf_dir):
    """The persist contract: bucket offsets are derived from row
    CONTENT (md5-prefix buckets), not from a sampled physical
    partitioning, so unpersisting the internal frame before the result
    is ever materialized must still yield the correct placement."""
    docs = load_table(spark, sf_dir, "documents")
    truth = _placements(global_shuffle_order(docs, "doc_id", seed=11))

    cleanup: list = []
    out = global_shuffle_order(docs, "doc_id", seed=11, cleanup=cleanup)
    for df in cleanup:
        df.unpersist(blocking=True)            # BEFORE any materialization
    assert _placements(out) == truth


def test_seed_changes_order(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = _placements(global_shuffle_order(docs, "doc_id", seed=1))
    b = _placements(global_shuffle_order(docs, "doc_id", seed=2))
    assert a != b


def test_null_ids_have_no_placement(spark):
    """r14 NULL contract: a shuffle placement is a pure function of
    the id, so NULL-id rows are excluded and the surviving order is
    exactly the order of the same frame without them."""
    from pyspark.sql import functions as F

    base = spark.range(20).select(F.col("id").alias("doc_id"))
    with_nulls = base.unionByName(
        spark.createDataFrame([(None,), (None,)], "doc_id long"))
    a = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in global_shuffle_order(base, "doc_id", seed=7).collect()}
    b = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in global_shuffle_order(with_nulls, "doc_id",
                                       seed=7).collect()}
    assert a == b                    # NULLs excluded, placements stable
    assert None not in b
