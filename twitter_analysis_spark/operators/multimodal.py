"""Multimodal column plumbing: opaque binary media + typed metadata.

Design: media lives in a ``binary`` column next to a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
row-at-a-time Python. The decode kernels themselves are STUBBED —
image/audio libs aren't in this container — behind ``_decode_bytes``:
the Spark-side schema, partitioning, UDF signature and batch shape are
real and tested; swapping in PIL/ffmpeg later touches one function.

At 100 TB the media table is partitioned by ``media_type`` and bucketed
by id; ``mapInPandas`` keeps per-task memory at
``spark.sql.execution.arrow.maxRecordsPerBatch`` granularity, so giant
blobs stream batch-by-batch instead of materializing a partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

#: Output schema of the feature-extraction stage.
FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
])


def media_table(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from the documents corpus:
    content = utf-8 bytes of the text (an opaque stand-in blob),
    media_type cycled by id, metadata struct with fake-but-typed fields.
    """
    c = F.col(text_col)
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col),
        mt.alias("media_type"),
        F.encode(c, "UTF-8").alias("content"),
        F.struct(
            F.length(c).cast("long").alias("n_bytes"),
            (F.col(id_col) % 1920 + 1).cast("int").alias("width"),
            (F.col(id_col) % 1080 + 1).cast("int").alias("height"),
            (F.col(id_col) % 300 / 10.0).alias("duration_s"),
        ).alias("meta"),
    )


def _decode_bytes(media_type: str, blob: bytes) -> dict:
    """STUB decode kernel. Real image/audio decoding would go here
    (PIL / soundfile / pyav); this container has none of them, so we
    return deterministic fake features derived from the bytes. The
    contract (bytes in, feature dict out) is what the real kernel must
    honor."""
    try:
        import PIL.Image  # noqa: F401  (not present in this container)
        raise NotImplementedError("real decode path not wired yet")
    except ImportError:
        pass
    import hashlib
    digest = hashlib.sha1(blob).hexdigest()
    n = len(blob)
    return {
        "n_bytes": n,
        "checksum": digest[:16],
        "width": (n * 7) % 1920 + 1 if media_type == "image" else 0,
        "height": (n * 13) % 1080 + 1 if media_type == "image" else 0,
        "duration_s": round((n % 3000) / 10.0, 1)
        if media_type in ("audio", "video") else 0.0,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each task receives pandas batches (bytes already
    Arrow-transferred, zero-copy where possible), applies the decode
    kernel vectorized-per-batch, and emits the typed feature schema.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_bytes(mt, blob)
                for mt, blob in zip(pdf["media_type"], pdf["content"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return media.select("doc_id", "media_type", "content").mapInPandas(
        run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing for video rows: emit one row per sampled
    "frame" (stub: every Nth byte offset stands in for a decoded frame
    timestamp). Demonstrates the explode-shaped (1→many) media stage
    with bounded output per input row."""
    n_frames = F.least(
        (F.length("content") / every_n_bytes).cast("int") + 1, F.lit(16))
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
    )


def resize(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Resize plumbing: normalize every blob to ``target_bytes``
    (stub kernel: truncate or zero-pad — a real deployment swaps in
    PIL/ffmpeg scaling; the Arrow batch path, output schema, and
    size-invariant it must guarantee stay identical).

    The post-condition the pipeline relies on: every output blob is
    exactly ``target_bytes`` long, so downstream batch tensors have a
    fixed row stride.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                bytes(b)[:target_bytes].ljust(target_bytes, b"\0")
                for b in pdf["content"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "content": resized,
            })

    return media.select("doc_id", "media_type", "content").mapInPandas(
        run, schema="doc_id long, media_type string, content binary")
