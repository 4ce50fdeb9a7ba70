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
3. write the merged sketch to a temp dir and atomically swap it in
   (sources/maintenance._swap_in — the sketch table is overwritten,
   not appended: its size must stay bounded);
4. stamp the batch-id marker LAST, so a re-delivered batch after a
   crash is skipped rather than double-counted — CM cells are sums,
   and double-adding a batch inflates every estimate it touched.

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
    sketch at ``sketch_path``. Returns the finished streaming query."""
    marker_dir = (os.path.join(checkpoint, "__sketch_batches")
                  if checkpoint else f"{sketch_path}__batches")
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
        _swap_in(tmp, sketch_path)
        open(marker, "w").close()             # commit point, written last

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q
