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

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsmeta
from ..operators.dedup import tokens
from ..operators.sketches import DEFAULT_DEPTH, DEFAULT_WIDTH, cms_build
from ..sources.maintenance import _swap_in
from .ingest import read_checkpoint_lineage


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
    with no window between "cells merged" and "batch recorded".

    Batch ids are only monotone WITHIN one checkpoint lineage: after
    checkpoint loss they restart at 0, and a redelivered batch 0 can
    carry old files AND files that arrived since the crash — skipping
    it by id comparison would silently drop the new data (violating
    the sketch's one-sided estimate >= truth guarantee from below).
    So the swapped artifact also records the lineage it belongs to
    (``_run_id`` — the streaming checkpoint's query id, which a lost
    checkpoint cannot reproduce). On lineage mismatch the stored id
    is meaningless and the sketch is REBUILT from scratch from the
    redelivered drop (availableNow re-sends every file the new
    lineage hasn't seen, i.e. all of them), trading a transient
    undercount of any files deleted from the drop dir for never
    dropping new data and never double-counting — the only sound
    choice when the applied-set record is gone.

    The INVERSE loss — artifact deleted while the checkpoint
    survives — is unrecoverable by rebuild: the live lineage has
    already committed batches whose files availableNow will never
    re-send, so a quiet rebuild would permanently undercount every
    token those files carried. The lineage machinery detects exactly
    this (the checkpoint has commits but the artifact does not carry
    this lineage's run id) and the drain REFUSES loudly instead of
    rebuilding from the partial redelivery; remediation is to delete
    the checkpoint too (forcing full redelivery + clean rebuild) or
    restore the artifact from a replica."""
    # Resolve the artifact path through the explicit scheme gate at
    # ENTRY: the sidecar files inside it are read/written with
    # builtin open(), so a file: URI must unwrap to the local path
    # Spark resolves, and a remote-store URI must fail HERE,
    # synchronously and typed — not as STREAM_FAILED from the first
    # micro-batch (the other pipelines' _validate_entry_paths
    # contract).
    sketch_path = fsmeta.local_path(sketch_path)

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(drop_dir)
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )

    def stored_batch_id() -> int | None:
        p = os.path.join(sketch_path, "_last_batch_id")
        if fsmeta.exists(p):
            with open(p) as fh:
                return int(fh.read().strip())
        return None

    def stored_run_id() -> str | None:
        p = os.path.join(sketch_path, "_run_id")
        if fsmeta.exists(p):
            with open(p) as fh:
                return fh.read().strip()
        return None

    # Lineage identity for the batch-id skip guard: the checkpoint's
    # query id (checkpoint/metadata, written by Spark at query start
    # and stable for the checkpoint's whole life). A lost/recreated
    # checkpoint gets a fresh query id, which is exactly the signal
    # that stored batch ids can no longer be compared. Without a
    # checkpoint every drain is its own lineage (availableNow
    # re-sends everything, so rebuild-per-drain is the correct
    # semantics there, not a pessimisation).
    fallback_run = f"no-ckpt-{uuid.uuid4()}"
    run_cache: dict[str, str] = {}

    def current_run_id() -> str:
        if "id" in run_cache:
            return run_cache["id"]
        rid = fallback_run
        if checkpoint:
            # Same fail-loudly contract as ingest.py:_batch_token:
            # with a live checkpoint the metadata file exists at the
            # checkpoint's real location by the time this is reached
            # (post-start inside foreachBatch; pre-start only behind
            # the has-commits short-circuit, i.e. an ESTABLISHED
            # checkpoint) — a miss means the path as passed here does
            # not resolve to the location Spark uses, and silently
            # minting a per-drain run id would flip the lineage guard
            # into rebuild-per-drain (transient undercounts) or a
            # spurious artifact-loss refusal one drain later.
            # the shared lineage read: scheme-gated resolution,
            # explanatory refusals on missing/unparseable metadata
            rid = read_checkpoint_lineage(checkpoint)
        run_cache["id"] = rid
        return rid

    # Artifact-loss guard (the inverse of checkpoint loss): if this
    # checkpoint lineage has already committed batches, their files
    # will never be redelivered — so an artifact that does not carry
    # this lineage's run id (deleted, or clobbered by a foreign copy)
    # cannot be healed by the rebuild branch below: it would quietly
    # reconstruct the sketch from only the NOT-yet-seen files and
    # undercount forever (estimate < truth, the one failure mode a CM
    # sketch promises away). Refuse loudly before draining anything.
    # A fresh checkpoint has no commits yet, so legitimate
    # checkpoint-loss recovery (old artifact + new lineage) still
    # reaches the rebuild branch untouched.
    def _lineage_has_commits() -> bool:
        if not checkpoint:
            return False
        commits = os.path.join(checkpoint, "commits")
        return (fsmeta.isdir(commits)
                and any(not f.startswith(".")
                        for f in fsmeta.listdir(commits)))

    if _lineage_has_commits() and stored_run_id() != current_run_id():
        raise RuntimeError(
            f"sketch artifact at {sketch_path!r} does not carry the live "
            f"checkpoint lineage's run id ({current_run_id()!r}, stored: "
            f"{stored_run_id()!r}) but the lineage has committed batches "
            "whose files will not be redelivered — rebuilding now would "
            "permanently undercount. Delete the checkpoint as well to "
            "force full redelivery and a clean rebuild, or restore the "
            "artifact from a replica.")

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        same_lineage = stored_run_id() == current_run_id()
        stored = stored_batch_id()
        if same_lineage and stored is not None and stored >= batch_id:
            return                            # re-delivered after crash
        occ = batch_df.select(
            F.explode(tokens(F.col("text"))).alias("token"))
        batch_sketch = cms_build(occ, "token", depth, width)
        if fsmeta.exists(sketch_path) and same_lineage:
            merged = (spark.read.parquet(sketch_path)
                      .unionByName(batch_sketch)
                      .groupBy("j", "bucket")
                      .agg(F.sum("cnt").cast("bigint").alias("cnt")))
        else:
            # New lineage (checkpoint lost, or first build): the old
            # artifact's applied-set is unknowable — rebuild from the
            # redelivered drop instead of merging into it.
            merged = batch_sketch.select(
                "j", "bucket", F.col("cnt").cast("bigint").alias("cnt"))
        tmp = f"{sketch_path}__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        # The id + lineage ride in the SAME directory rename as the
        # cells: underscore-prefixed files are hidden from Spark's
        # reader, and a marker written after the swap would leave a
        # crash window in which cells landed but the marker didn't.
        with open(os.path.join(tmp, "_last_batch_id"), "w") as fh:
            fh.write(str(batch_id))
        with open(os.path.join(tmp, "_run_id"), "w") as fh:
            fh.write(current_run_id())
        _swap_in(tmp, sketch_path)            # commit point

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q
