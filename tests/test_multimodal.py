"""Multimodal plumbing: Arrow-batch kernels must preserve row identity,
produce the declared schema, and honor their size/cardinality
invariants (the decode internals are stubs; the plumbing is the
product)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_analysis_spark.operators import multimodal as M


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    return M.media_table(docs)


def test_extract_features_schema_and_identity(spark, sf_dir):
    media = _media(spark, sf_dir)
    feats = M.extract_features(media)
    assert [f.name for f in feats.schema.fields] == \
        [f.name for f in M.FEATURE_SCHEMA.fields]
    assert feats.count() == media.count()          # 1:1, no drops
    # checksum is deterministic: same input → same output across runs
    a = {r["doc_id"]: r["checksum"] for r in feats.collect()}
    b = {r["doc_id"]: r["checksum"] for r in M.extract_features(media).collect()}
    assert a == b


def test_frame_sample_bounds(spark, sf_dir):
    media = _media(spark, sf_dir)
    frames = M.frame_sample(media, every_n_bytes=64)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert per_doc, "no video rows sampled"
    for r in per_doc:
        assert 1 <= r["count"] <= 16               # bounded fan-out
    assert frames.where(F.col("byte_offset") % 64 != 0).count() == 0


def test_resize_fixed_stride(spark, sf_dir):
    media = _media(spark, sf_dir)
    out = M.resize(media, target_bytes=128)
    assert out.count() == media.count()
    lens = out.select(F.length("content").alias("n")).distinct().collect()
    assert [r["n"] for r in lens] == [128]         # exact stride invariant
