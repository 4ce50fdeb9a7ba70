"""Continuously-maintained Count-Min sketch over a document stream.

The batch CM sketch (operators/sketches.py) is mergeable by cell-wise
addition — which makes its streaming maintenance the textbook
bounded-state pipeline: whatever the token cardinality of the corpus,
the persisted state is AT MOST depth x width cells (a config
constant), and each micro-batch costs one batch-sized build plus a
merge against that constant-size table. Compare the exact alternative
(a token->count table): state grows with the vocabulary, and every
trigger rewrites a corpus-sized artifact.

Per micro-batch (inside ``foreachBatch``):

1. build the batch's sketch (one partial-aggregated pass);
2. cell-wise SUM with the persisted sketch;
3. write the merged sketch AND its last-applied batch id to a temp
   dir, then atomically swap both in as one unit
   (sources/maintenance._swap_in — the sketch table is overwritten,
   not appended: its size must stay bounded).

The batch id travels INSIDE the swapped directory (an
underscore-prefixed sidecar file, invisible to Spark's parquet
reader), so the "applied" fact commits in the same rename as the
cells it describes. A marker written after the swap would leave a
crash window in which the merge landed but the marker didn't: on
redelivery the batch would be summed in again, and a double-added CM
sketch is unrepairable (cells are sums — every estimate the batch
touched inflates forever). With the id in the artifact, a
re-delivered batch sees stored_id >= batch_id and is skipped.

Estimates stay one-sided (>= truth) through any number of merges; the
stream == batch identity is pinned in tests cell-for-cell.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import tokens
from ..operators.sketches import DEFAULT_DEPTH, DEFAULT_WIDTH, cms_build
from ..sources.maintenance import _swap_in


def streaming_sketch_ingest(spark: SparkSession, drop_dir: str,
                            sketch_path: str,
                            schema: str = "doc_id LONG, text STRING",
                            depth: int = DEFAULT_DEPTH,
                            width: int = DEFAULT_WIDTH,
                            checkpoint: str | None = None):
    """Drain ``drop_dir`` (availableNow), maintaining the token CM
    sketch at ``sketch_path``. Returns the finished streaming query.

    Idempotence contract: the last-applied batch id is stored inside
    the atomically-swapped sketch directory (``_last_batch_id``), so
    a batch re-delivered after a crash — batch ids are monotone
    within a checkpoint lineage — is skipped, never double-counted,
    with no window between "cells merged" and "batch recorded"."""
    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(drop_dir)
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )

    def stored_batch_id() -> int | None:
        p = os.path.join(sketch_path, "_last_batch_id")
        if os.path.exists(p):
            with open(p) as fh:
                return int(fh.read().strip())
        return None

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        stored = stored_batch_id()
        if stored is not None and stored >= batch_id:
            return                            # re-delivered after crash
        occ = batch_df.select(
            F.explode(tokens(F.col("text"))).alias("token"))
        batch_sketch = cms_build(occ, "token", depth, width)
        if os.path.exists(sketch_path):
            merged = (spark.read.parquet(sketch_path)
                      .unionByName(batch_sketch)
                      .groupBy("j", "bucket")
                      .agg(F.sum("cnt").cast("bigint").alias("cnt")))
        else:
            merged = batch_sketch.select(
                "j", "bucket", F.col("cnt").cast("bigint").alias("cnt"))
        tmp = f"{sketch_path}__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        # The id rides in the SAME directory rename as the cells:
        # underscore-prefixed files are hidden from Spark's reader.
        with open(os.path.join(tmp, "_last_batch_id"), "w") as fh:
            fh.write(str(batch_id))
        _swap_in(tmp, sketch_path)            # commit point

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q
