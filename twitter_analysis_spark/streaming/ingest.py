"""Streaming deduplicating ingestion: drop-dir → curated corpus.

The continuous form of the daily-ingest pattern
(operators/dedup.py:incremental_exact_dedup): JSONL documents landing
in a drop directory are appended to a curated parquet corpus, each
micro-batch deduped against a PERSISTENT content index — the corpus
itself is never rescanned, so per-trigger cost is proportional to the
batch at any corpus size.

Per micro-batch (inside ``foreachBatch``):

1. classify every batch row new / dup_in_batch / dup_of_corpus
   against the on-disk index;
2. append the 'new' rows to the corpus;
3. append their content keys to the index — a PURE append, because
   'new' is by definition "key absent from the index", so merged keys
   can never collide with existing ones (the invariant
   tests/test_dedup_similarity.py::
   test_incremental_dedup_index_merge_roundtrip pins);
4. stamp a batch-id marker file LAST. Parquet appends are not
   transactional, so a crash between 2 and 4 can leave a torn batch;
   on restart the marker check skips finished batches (dedup of
   re-delivered input), and because the index append happens after the
   corpus append, a torn batch re-runs with the OLD index and simply
   re-classifies — re-appended 'new' rows are possible only for the
   crashed batch and are cleaned by the next
   ``maintenance.upsert_by_key`` compaction, which is the documented
   recovery for every non-transactional sink in this repo.

At 100 TB the index is the only corpus-sized artifact touched per
trigger, and only through a key-partitioned join; store it bucketed by
``content_key`` (sources/io.py:write_bucketed) so the probe join
co-locates without a shuffle of the batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import content_index, incremental_exact_dedup

#: content_key dtype per hash family (xxhash64 → 8-byte long,
#: md5/text → string).
_KEY_TYPE = {"xxhash64": "LONG", "md5": "STRING", "text": "STRING"}


def _empty_index(spark: SparkSession, hash_fn: str) -> DataFrame:
    return spark.createDataFrame(
        [], f"content_key {_KEY_TYPE[hash_fn]}, holder_id LONG")


def streaming_ingest_dedup(spark: SparkSession, drop_dir: str,
                           corpus_path: str, index_path: str,
                           schema: str = "doc_id LONG, text STRING",
                           hash_fn: str = "xxhash64",
                           checkpoint: str | None = None):
    """Drain ``drop_dir`` (availableNow) into the corpus at
    ``corpus_path``, maintaining the content index at ``index_path``.
    Returns the finished streaming query.

    Batch-id markers are scoped to the CHECKPOINT: batch ids only mean
    "same batch" within one checkpoint lineage (a fresh checkpoint
    restarts at 0 while the file source re-reads nothing or
    everything depending on its own tracking), so reuse one checkpoint
    for the lifetime of an ingest pipeline — which is also what makes
    the file source skip already-ingested drop files across drains.
    """
    marker_dir = (os.path.join(checkpoint, "__ingest_batches")
                  if checkpoint else f"{index_path}__batches")
    os.makedirs(marker_dir, exist_ok=True)

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(drop_dir)
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch_{batch_id}")
        if os.path.exists(marker):            # re-delivered after crash
            return
        index = (spark.read.parquet(index_path)
                 if os.path.exists(index_path)
                 else _empty_index(spark, hash_fn))
        res = incremental_exact_dedup(batch_df, index, "doc_id", "text",
                                      hash_fn=hash_fn)
        new_ids = res.where(F.col("status") == "new").select("doc_id")
        new_docs = batch_df.join(new_ids, "doc_id", "left_semi").persist()
        new_docs.write.mode("append").parquet(corpus_path)
        (content_index(new_docs, "doc_id", "text", hash_fn=hash_fn)
         .write.mode("append").parquet(index_path))
        new_docs.unpersist()
        open(marker, "w").close()             # commit point, written last

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q
