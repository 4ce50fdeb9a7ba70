"""Streaming deduplicating ingestion: drop-dir → curated corpus.

The continuous form of the daily-ingest pattern
(operators/dedup.py:incremental_exact_dedup): JSONL documents landing
in a drop directory are written to a curated parquet corpus, each
micro-batch deduped against a PERSISTENT content index — the corpus
itself is never rescanned, so per-trigger cost is proportional to the
batch at any corpus size.

Every sink in this module is REPLACE-BY-BATCH: outputs are
Hive-partitioned by ``_batch_id`` — whose value is the
LINEAGE-SCOPED token ``<checkpoint query id>_<batch id>``, see
:func:`_batch_token` — and each micro-batch writes its own partition
via dynamic partition overwrite, while state reads EXCLUDE the
writing batch's own partition. That pair makes the per-batch work a
pure function of (batch input, state from OTHER batches), so a
replayed batch — whatever it managed to write before a crash —
overwrites its own partitions with the identical recomputation
instead of appending duplicates; and because the token is scoped to
the checkpoint lineage, a LOST checkpoint (fresh lineage, batch ids
restarting at 0) can never overwrite an old lineage's partitions —
its redeliveries are absorbed by the index/identity guards instead.
The one compose these two devices cannot heal alone is a batch torn
AT THE MOMENT of checkpoint loss (its replay would have overwritten
the partial partition, but the new lineage never addresses it):
:func:`reconcile_replace_by_batch` drops exactly those
corpus-without-index partitions before the re-drain. Concretely, per
micro-batch (inside ``foreachBatch``):

1. classify every batch row new / dup_in_batch / dup_of_corpus
   against the on-disk index, READ WITHOUT the current batch's own
   partition (deterministic under replay);
2. overwrite the corpus' ``_batch_id=N`` partition with the 'new'
   rows;
3. overwrite the index's ``_batch_id=N`` partition with their content
   keys — key sets stay disjoint across partitions because 'new'
   means "key absent from the rest of the index" (the invariant
   tests/test_dedup_similarity.py::
   test_incremental_dedup_index_merge_roundtrip pins);
4. stamp a batch-id marker file LAST — purely a recompute-skip fast
   path for re-delivered finished batches, NOT a correctness device:
   a crash at ANY point between 1 and 4 (including the once-feared
   window between the corpus and index writes) re-runs the batch into
   byte-identical partitions with ZERO duplicates and no compaction
   needed (tests/test_streaming.py::
   test_streaming_ingest_dedup_torn_batch_zero_duplicates).

At 100 TB the index is the only corpus-sized artifact touched per
trigger, and only through a key-partitioned join; at deploy scale,
periodically fold the accumulated ``_batch_id`` partitions into a
catalog table bucketed by ``content_key`` with ``_batch_id`` kept as
a sorted data column (``maintenance.fold_index_bucketed`` — the
two-tier form, see ``streaming_ingest_dedup(base_index_table=...)``)
— the probe then reaches its first join with ZERO exchange on the
index branch even when nothing can broadcast, pinned by
tests/test_plans.py
::test_incremental_dedup_bucketed_index_scan_has_no_exchange and by
tests/test_maintenance.py's drain-fold-drain roundtrip over this
module's self-excluded read shape. Replace-by-batch leaves one
parquet file generation per trigger (like any appending writer) —
``maintenance.compact_parquet(partition_by=["_batch_id"])`` is the
steady-state file-count maintenance, now purely a PERFORMANCE chore
rather than a correctness healer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsmeta
from ..operators.dedup import (content_index, incremental_exact_dedup,
                               released)

#: content_key dtype per hash family (xxhash64 → 8-byte long,
#: md5/text → string).
_KEY_TYPE = {"xxhash64": "LONG", "md5": "STRING", "text": "STRING"}


def _empty_index(spark: SparkSession, hash_fn: str) -> DataFrame:
    return spark.createDataFrame(
        [], f"content_key {_KEY_TYPE[hash_fn]}, holder_id LONG")


def _check_batch_layout(path: str) -> None:
    """Refuse to mix layouts: flat parquet files at the table ROOT —
    a table written by the pre-replace-by-batch versions of this
    module, or a half-done migration that wrote ``_batch_id=...``
    dirs next to the legacy files — would make partition discovery
    fail opaquely (or silently corrupt under a partitioned dynamic
    overwrite). Name the one-time migration instead. Checked
    unconditionally, so the mixed case raises here too, not inside
    Spark's 'conflicting directory structures' error."""
    if not fsmeta.isdir(path):
        return
    entries = fsmeta.listdir(path)
    if any(e.endswith(".parquet") for e in entries):
        raise ValueError(
            f"{path!r} holds parquet files at the table root (a "
            "pre-replace-by-batch layout, or a half-done migration "
            "mixing flat files with _batch_id partitions); a one-time "
            "migration into a FRESH directory is required — e.g. "
            "spark.read.parquet(path).withColumn('_batch_id', "
            "F.lit('migrated_0')).write.partitionBy('_batch_id')"
            ".parquet(new_path)")
    batch_vals = [e[len("_batch_id="):] for e in entries
                  if e.startswith("_batch_id=")]
    if batch_vals and all(
            v.lstrip("-").isdigit() for v in batch_vals):
        # a table written by the bare-numeric-token generation of this
        # module: partition inference reads _batch_id back as INT, so
        # comparing it with a string lineage token either crashes
        # (ANSI cast error) or — worse, ANSI off — null-filters every
        # old partition out of the index read, silently re-ingesting
        # duplicates. (Lineage tokens always contain '-' and '_', so
        # a current-generation table can never trip this.)
        raise ValueError(
            f"{path!r} carries bare numeric _batch_id partitions (the "
            "pre-lineage-token generation); a one-time migration is "
            "required — rewrite with string tokens, e.g. "
            "spark.read.parquet(path).withColumn('_batch_id', "
            "F.concat(F.lit('migrated-0_'), F.col('_batch_id')))"
            ".write.partitionBy('_batch_id').parquet(new_path)")


def _validate_entry_paths(sinks: tuple, checkpoint: str | None) -> None:
    """Entry-time validation for a pipeline's driver-side paths:
    remote-store URIs and stale sink layouts fail HERE, synchronously,
    with the typed error — not wrapped in STREAM_FAILED /
    FOREACH_BATCH_USER_FUNCTION_ERROR from the first micro-batch. The
    same sink checks still run per batch inside the write/read
    helpers; the checkpoint gets the fsmeta scheme guard only (its
    internal layout belongs to Spark)."""
    for p in sinks:
        _check_batch_layout(p)
    if checkpoint is not None:
        fsmeta.local_path(checkpoint)   # the explicit scheme gate


def _has_batches(path: str) -> bool:
    return fsmeta.isdir(path) and any(
        e.startswith("_batch_id=") for e in fsmeta.listdir(path))


def _batch_token(checkpoint: str | None, batch_id: int,
                 cache: dict) -> str:
    """LINEAGE-SCOPED batch identity for the replace-by-batch sinks:
    ``<lineage>_<batch_id>``, where the lineage is the checkpoint's
    query id (``checkpoint/metadata``, written by Spark at query
    start and stable for the checkpoint's whole life — the same
    device as sketch_ingest.py's run-id guard). Batch ids are only
    monotone WITHIN one checkpoint lineage: a lost checkpoint
    restarts them at 0, so a bare numeric partition key would make
    post-loss drains dynamic-OVERWRITE the old lineage's partitions —
    batch 1 of the new lineage silently deleting batch 1 of the old:
    data destruction, strictly worse than the duplicates the replay
    contract tolerates. Scoping the partition value by lineage makes
    cross-lineage collisions impossible: old-lineage partitions are
    never excluded from reads and never overwritten, and the
    index/identity guards absorb the redelivered docs exactly as the
    checkpoint-loss tests pin. Without a checkpoint every drain is
    its own lineage (availableNow re-sends everything and a temp
    checkpoint restarts ids anyway), which also keeps the marker
    fast-path from silently skipping a fresh drain's batch 0.

    With a LIVE checkpoint there is no fallback: Spark writes
    ``<checkpoint>/metadata`` at query start, before the first
    ``foreachBatch`` call, so by the time this runs the file exists
    at the checkpoint's real location. If it is missing or
    unparseable AT THE RESOLVED PATH (``file:`` URIs unwrap through
    ``fsmeta.local_path`` to the same local path Spark resolves;
    remote-store URIs raise the typed refusal there), minting a
    one-off lineage would stamp this drain's partitions with tokens
    the real lineage's replay never addresses — exactly the
    stranded-partitions hazard the token exists to prevent — so the
    drain fails loudly instead."""
    if "lineage" not in cache:
        if checkpoint:
            cache["lineage"] = read_checkpoint_lineage(checkpoint)
        else:
            import uuid
            cache["lineage"] = f"nockpt-{uuid.uuid4().hex}"
    return f"{cache['lineage']}_{int(batch_id)}"


def read_checkpoint_lineage(checkpoint: str) -> str:
    """The ONE checkpoint-lineage read (query id from
    ``<checkpoint>/metadata``) shared by the replace-by-batch token
    and sketch_ingest's run-id guard. Resolves the path through the
    explicit scheme gate — a ``file:`` URI unwraps to the same local
    path Spark resolves it to (so the builtin ``open`` works), a
    remote-store URI raises the typed refusal instead of a misleading
    metadata-not-found error. The operator's ORIGINAL form stays in
    the error messages. Raises RuntimeError when the metadata is
    missing or unparseable at the resolved path: Spark wrote (and can
    read) that file at query start, so either case means we are not
    looking where Spark is — and minting a fallback identity for a
    live checkpoint is the stranded-state hazard the callers exist
    to prevent."""
    import json

    meta = os.path.join(fsmeta.local_path(checkpoint), "metadata")
    if not fsmeta.exists(meta):
        raise RuntimeError(
            f"streaming checkpoint metadata not found at {meta!r} "
            f"although the query is running with checkpointLocation="
            f"{checkpoint!r}. Spark writes it at query start, so the "
            "checkpoint path as passed here does not resolve to the "
            "location Spark is using (relative path? wrong mount?). "
            "Refusing to mint a one-off identity for a live "
            "checkpoint — its state would be stranded where the "
            "lineage's replay never addresses it.")
    try:
        with open(meta) as fh:
            return str(json.load(fh)["id"])
    except (ValueError, KeyError, TypeError) as exc:
        raise RuntimeError(
            f"streaming checkpoint metadata at {meta!r} is not Spark "
            f"query metadata ({exc!r}); the checkpoint path as passed "
            "here does not resolve to the location Spark is using. "
            "Refusing to mint a one-off identity for a live "
            "checkpoint.") from exc



def _batch_token_lenient(checkpoint: str | None, batch_id: int,
                         cache: dict) -> str | None:
    """:func:`_batch_token` for pipelines whose ONLY token consumer
    is the recompute-skip marker (rollup/alerts): those sinks write
    no token-scoped partitions, so an unresolvable checkpoint path
    costs an OPTIMIZATION, not stranded data — return ``None``
    (markers DISABLED for the drain, batches recompute idempotently)
    with one logged warning instead of failing the drain. Returning
    None rather than minting a throwaway lineage matters: a fallback
    token would still create and stamp never-matching marker files
    at the LITERAL unresolvable path every drain — unbounded orphan
    accumulation. OSError degrades here
    too (a metadata file the driver cannot read is the same
    marker-only non-hazard), where the strict form deliberately
    propagates it. Pipelines that stamp the token into sink
    partitions must keep using the strict form."""
    try:
        return _batch_token(checkpoint, batch_id, cache)
    except (RuntimeError, OSError) as exc:
        # (fsmeta.UnsupportedFilesystemError subclasses RuntimeError,
        # so a remote-store checkpoint URI degrades here too)
        if not cache.get("warned"):
            import logging
            logging.getLogger(__name__).warning(
                "checkpoint metadata unresolvable; recompute-skip "
                "markers are disabled for this drain (batches "
                "recompute idempotently): %s", exc)
            cache["warned"] = True
        return None


def _marker(checkpoint: str | None, subdir: str, token) -> str | None:
    """Recompute-skip marker path for a batch, or None without a
    checkpoint — markers are checkpoint-scoped: without one every
    drain is its own lineage (see :func:`_batch_token`), a marker
    could never match, and a persistent fallback dir would only
    accumulate orphan files (and, pre-token, silently swallowed fresh
    drains' batch 0). Creates the marker dir on first use. The ONE
    place marker scoping lives — all five pipelines share it."""
    if not checkpoint or token is None:
        # token None = the lenient form degraded (markers disabled
        # for the drain). Guarded HERE, not at call sites: a caller
        # passing the degraded token straight through would name
        # every batch's marker 'batch_None' — batch 0 stamps it and
        # every later batch of every drain silently skips, the exact
        # swallowed-batch class this module documents.
        return None
    # reached only with a resolvable token, so the checkpoint already
    # passed _batch_token's scheme gate; unwrap file: forms the same
    # way so the marker tree lands where the metadata was read
    d = os.path.join(fsmeta.local_path(checkpoint), subdir)
    fsmeta.makedirs(d)
    return os.path.join(d, f"batch_{token}")


def _replace_batch_partition(df: DataFrame, path: str,
                             token: str) -> None:
    """The replace-by-batch sink: write ``df`` as the table's
    ``_batch_id=token`` partition via dynamic partition overwrite.
    Idempotent per (checkpoint lineage, batch_id): a replayed batch
    replaces exactly its own partition; other batches' — and other
    lineages' — partitions are never touched. An empty ``df``
    overwrites nothing (dynamic mode only replaces partitions present
    in the output) — correct, because the only way a replay computes
    empty is state that already reflects the batch."""
    _check_batch_layout(path)
    (df.withColumn("_batch_id", F.lit(token))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("_batch_id")
     .parquet(path))


def _read_excluding_batch(spark: SparkSession, path: str, token: str,
                          empty: DataFrame) -> DataFrame:
    """Read a replace-by-batch table WITHOUT the current batch's own
    partition — the other half of replay idempotency: a torn batch's
    partial first-attempt writes are invisible to its re-run, so the
    re-run classifies against exactly the pre-batch state. The
    ``!=`` on the partition column prunes at listing time (one
    directory skipped, never scanned). Other lineages' partitions
    never match the token, so they are always visible — which is what
    lets the index absorb checkpoint-loss redeliveries."""
    _check_batch_layout(path)         # flat/mixed layout raises here
    if not _has_batches(path):
        return empty
    return (spark.read.parquet(path)
            .where(F.col("_batch_id") != token)
            .drop("_batch_id"))


def _read_batched(spark: SparkSession, path: str,
                  empty: DataFrame) -> DataFrame:
    """Read a replace-by-batch table whole (all batches), hiding the
    layout column."""
    _check_batch_layout(path)
    if not _has_batches(path):
        return empty
    return spark.read.parquet(path).drop("_batch_id")


def _batch_dirs(path: str) -> dict[str, str]:
    """Map each ``_batch_id`` token of a replace-by-batch table to its
    partition directory (driver-side listing)."""
    from urllib.parse import unquote
    if not fsmeta.isdir(path):
        return {}
    return {unquote(e[len("_batch_id="):]): os.path.join(path, e)
            for e in fsmeta.listdir(path) if e.startswith("_batch_id=")}


def reconcile_replace_by_batch(data_path: str, index_path: str,
                               drop_tokens: list[str] | None = None,
                               *, spark: SparkSession | None = None,
                               base_index_table: str | None = None
                               ) -> list[str]:
    """Drop TORN batch partitions after checkpoint loss: removes every
    ``_batch_id`` partition of ``data_path`` (corpus) that has no
    matching partition in ``index_path``, plus any explicitly named
    ``drop_tokens`` (removed from BOTH sides) — returning the dropped
    tokens. Run this BEFORE re-draining with a fresh checkpoint;
    failures to remove raise rather than report the token as dropped,
    and a drop_tokens entry naming NO partition on either side is
    warned about and excluded from the return (healthy when the
    in-flight batch crashed before its first write, or on a retry
    after a successful reconcile — check the return value to catch a
    mistyped token).

    Why it exists: within a checkpoint lineage a torn batch (crash
    between the corpus and index writes) heals by replay — the re-run
    overwrites its own partition (the pinned torn-batch tests). But if
    the CHECKPOINT IS LOST before that replay happens, the re-drain
    runs under a new lineage that never addresses the old lineage's
    partitions, so the torn partition's docs — absent from the index —
    classify 'new' again and land in the new lineage's partition: a
    permanent duplicate. A corpus partition with NO index partition is
    structurally torn (the index write always follows the corpus
    write, and every nonempty corpus write is followed by a nonempty
    index write — exact keys per doc; near-dup band rows or the
    shingle-less sentinel), and checkpoint loss means the whole drop
    redelivers, so dropping it loses nothing the re-drain will not
    restore. Driver cost: two directory listings.

    SCOPE: structural detection covers missing-partition tears only. A
    crash in the MIDDLE of an index partition's job commit can leave
    that partition present but partial — indistinguishable from a
    complete one by layout. If the crash window makes that plausible,
    pass the in-flight batch's token via ``drop_tokens`` (it is the
    lineage's highest batch id; the marker dir under the old
    checkpoint — if salvaged — names every COMPLETED token) and both
    sides' partitions for it are removed, restoring the
    drop-then-redeliver invariant. Do NOT run this while an ingest
    query is live (its in-flight batch naturally has the
    corpus-but-no-index shape).

    TWO-TIER DEPLOYMENTS: after ``maintenance.fold_index_bucketed``
    moved index partitions into a bucketed base table, their corpus
    partitions at ``data_path`` have no matching partition at
    ``index_path`` — which is exactly this function's torn-batch
    signature, so running it base-blind would DELETE every folded
    batch's corpus data. Pass the base via ``base_index_table``
    (with ``spark``) and its partition tokens count as indexed. A
    base-blind call cannot be detected from the paths alone, so the
    discipline sits with the caller: pass ``base_index_table`` here
    exactly when the ingest pipeline runs with one. A ``drop_tokens``
    entry naming a FOLDED token refuses loudly — its index keys live
    inside the bucketed table where a partition-level drop cannot
    reach, and deleting only the corpus side would leave dangling
    index keys that silently suppress the docs' re-ingestion."""
    if base_index_table == "":
        # '' is ambiguous between "no base, on purpose" and "config
        # key came through empty by mistake" — and here the mistaken
        # reading is PERMANENT data loss (base-blind reconcile
        # deletes every folded batch's corpus partition, whose drop
        # files are long gone). Refuse; base-blind is spelled None.
        raise ValueError(
            "reconcile_replace_by_batch: base_index_table='' is "
            "ambiguous — pass None to reconcile base-blind (no fold "
            "has ever run), or the real base table name. An empty "
            "string usually means an unset config key, and running "
            "base-blind by accident on a two-tier deployment deletes "
            "every folded batch's corpus data.")
    if base_index_table is not None:
        if spark is None:
            raise ValueError(
                "reconcile_replace_by_batch: base_index_table requires "
                "the spark session to list the base table's partitions")
        if not spark.catalog.tableExists(base_index_table):
            raise ValueError(
                f"reconcile_replace_by_batch: base_index_table="
                f"{base_index_table!r} does not exist in the catalog. "
                "If no fold has run yet, reconcile base-blind (omit "
                "the argument); a mistyped name here would count zero "
                "base tokens and delete every folded batch's corpus "
                "partition as 'torn'.")
        base_tokens = {
            r["_batch_id"]
            for r in spark.table(base_index_table)
            .select("_batch_id").distinct().collect()}
    else:
        base_tokens = set()
    # ALL refusals precede ANY deletion: a refused call must leave
    # both tables untouched, or the raised error discards the return
    # value that records what was already dropped and the retry's
    # matching-nothing warnings misread as never-dropped.
    for token in sorted(set(drop_tokens or ())):
        if token in base_tokens:
            raise ValueError(
                f"reconcile_replace_by_batch: drop_tokens entry "
                f"{token!r} was folded into {base_index_table!r}; its "
                "index keys cannot be removed partition-wise. If the "
                "partition really is torn inside the base, heal with "
                "maintenance.upsert_by_key(..., full_rewrite=True) "
                "after re-draining, or rebuild the base from the "
                "delta history. Nothing was dropped by this call.")
    data = _batch_dirs(data_path)
    index = _batch_dirs(index_path)
    dropped = sorted(set(data) - set(index) - base_tokens)
    for token in dropped:
        fsmeta.rmtree(data[token])        # failures raise, loudly
    for token in sorted(set(drop_tokens or ())):
        # a token matching NEITHER side is excluded from the returned
        # dropped list and warned about, but NOT an error: it is
        # indistinguishable between "already reconciled", "the
        # in-flight batch crashed before its first write" (both
        # healthy — the docstring's runbook passes such tokens on
        # purpose) and a typo — which the caller catches by checking
        # the return value, keeping the reconcile itself retryable.
        if token not in data and token not in index:
            import logging
            logging.getLogger(__name__).warning(
                "reconcile_replace_by_batch: drop_tokens entry %r "
                "names no partition of %r or %r (already reconciled, "
                "never written, or mistyped — tokens look like "
                "'<lineage>_<batch id>'; known: %s); nothing dropped "
                "for it", token, data_path, index_path,
                sorted(set(data) | set(index))[:10])
            continue
        for side in (data, index):
            if token in side and fsmeta.isdir(side[token]):
                fsmeta.rmtree(side[token])
        if token not in dropped:
            dropped.append(token)
    return sorted(dropped)


def streaming_ingest_dedup(spark: SparkSession, drop_dir: str,
                           corpus_path: str, index_path: str,
                           schema: str = "doc_id LONG, text STRING",
                           hash_fn: str = "xxhash64",
                           checkpoint: str | None = None,
                           base_index_table: str | None = None):
    """Drain ``drop_dir`` (availableNow) into the corpus at
    ``corpus_path``, maintaining the content index at ``index_path``.
    Returns the finished streaming query.

    Corpus and index are replace-by-batch sinks (module docstring):
    both are partitioned by ``_batch_id``, each batch overwrites only
    its own partition, and the index is read WITHOUT the writing
    batch's partition — so a crash anywhere in the batch (including
    between the corpus and index writes) re-runs into byte-identical
    partitions with zero duplicates and no compaction.

    Batch ids only mean "same batch" within one checkpoint lineage (a
    fresh checkpoint restarts at 0 while the file source re-reads
    nothing or everything depending on its own tracking), so both the
    markers and the sink partitions carry the lineage-scoped token
    (:func:`_batch_token`); reuse one checkpoint for the lifetime of
    an ingest pipeline — which is also what makes the file source
    skip already-ingested drop files across drains. Even full
    CHECKPOINT LOSS converges duplicate-free here: the whole drop
    redelivers as batch 0 of a NEW lineage, every redelivered doc's
    key is visible in the old lineage's index partitions (a new
    lineage excludes nothing of the old), so everything classifies
    dup_of_corpus and the corpus is physically untouched — with ONE
    caveat: a batch torn at the very moment of the loss left corpus
    rows with no index keys, which the new lineage would re-ingest as
    duplicates; run :func:`reconcile_replace_by_batch` before the
    re-drain to drop those torn partitions (their docs redeliver).

    ``base_index_table`` is the deploy-scale two-tier form: after
    ``maintenance.fold_index_bucketed`` compacts accumulated
    ``_batch_id`` partitions into a catalog table bucketed by
    ``content_key`` (tokens kept as a data column), pass that table
    name here and the per-batch classification probes BOTH tiers —
    the bucketed base on its own exchange-free plan branch and the
    (now small) parquet delta at ``index_path`` as before. The base
    is read with the same own-token exclusion as the delta: its rows
    carry the original lineage tokens, so current batches never
    collide, and a torn batch that got folded mid-crash-window stays
    invisible to its own replay. When running two-tier, pass the
    table to ``reconcile_replace_by_batch`` as well. A
    ``base_index_table`` that does not exist refuses UP FRONT, before
    the stream starts: the table is created by the first fold, so
    wire the argument in only after that fold has run — a silent
    single-tier fallback here would be worse than the refusal (a
    mistyped table name would quietly skip the tier holding most of
    the corpus keys and re-ingest every duplicate).
    """
    if base_index_table == "":
        raise ValueError(
            "streaming_ingest_dedup: base_index_table='' is ambiguous "
            "— pass None for single-tier, or the real base table "
            "name. An empty string usually means an unset config "
            "key, and silently running single-tier would re-ingest "
            "every document whose key the base holds.")
    if base_index_table and not spark.catalog.tableExists(base_index_table):
        raise ValueError(
            f"streaming_ingest_dedup: base_index_table="
            f"{base_index_table!r} does not exist in the catalog. It "
            "is created by maintenance.fold_index_bucketed — run the "
            "first fold before wiring the two-tier argument in, and "
            "check the spelling: silently probing without this tier "
            "would re-ingest every document whose key it holds.")

    _validate_entry_paths((corpus_path, index_path), checkpoint)

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(drop_dir)
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )

    lineage_cache: dict = {}

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        token = _batch_token(checkpoint, batch_id, lineage_cache)
        marker = _marker(checkpoint, "__ingest_batches", token)
        if marker and fsmeta.exists(marker):  # re-delivered after crash
            return
        # exclude our own partition: a torn first attempt's partial
        # index write must not poison the re-run's classification
        index = _read_excluding_batch(spark, index_path, token,
                                      _empty_index(spark, hash_fn))
        if base_index_table:
            base = (spark.table(base_index_table)
                    .where(F.col("_batch_id") != token)
                    .drop("_batch_id"))
            index = [base, index]
        res = incremental_exact_dedup(batch_df, index, "doc_id", "text",
                                      hash_fn=hash_fn)
        new_ids = res.where(F.col("status") == "new").select("doc_id")
        new_docs = batch_df.join(new_ids, "doc_id", "left_semi").persist()
        _replace_batch_partition(new_docs, corpus_path, token)
        _replace_batch_partition(
            content_index(new_docs, "doc_id", "text", hash_fn=hash_fn),
            index_path, token)
        new_docs.unpersist()
        if marker:
            fsmeta.touch(marker)              # recompute-skip fast path

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q


def _empty_band_index(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "band INT, bh LONG, doc LONG")


def streaming_ingest_neardup(spark: SparkSession, drop_dir: str,
                             corpus_path: str, band_index_path: str,
                             schema: str = "doc_id LONG, text STRING",
                             n: int = 3, num_hashes: int = 32,
                             bands: int = 8, threshold: float = 0.5,
                             checkpoint: str | None = None):
    """NEAR-duplicate streaming ingestion: the MinHash+LSH analogue of
    :func:`streaming_ingest_dedup`. The persistent artifact is a BAND
    INDEX (band, bh, doc) — ``bands`` rows per corpus document, plus
    one id-keyed sentinel row each (the replay identity anchor, see
    banded_of; cap-pruned shingle-less docs carry only it) — so a
    micro-batch probes the corpus with one key-equi join on
    (band, bh), never a corpus rescan.

    Per batch: signature + band keys for the batch docs; candidates =
    band collisions against the index (read WITHOUT the batch's own
    partition, see below) PLUS intra-batch collisions; candidates are
    verified with EXACT n-gram Jaccard, the corpus side of the
    verification reading only the candidate partner docs (a key
    semi-join into the corpus — bucketed by doc_id at deploy scale, a
    pruned read). Batch docs drop when a verified pair ties them to
    the corpus or to a lower-id batch doc (first copy survives);
    duplicate CHAINS resolve across triggers the same one-pass way
    each trigger. Survivors replace the corpus' ``_batch_id``
    partition and their band rows the index's — the replace-by-batch
    contract of :func:`streaming_ingest_dedup`: a torn batch (crash
    anywhere between the two writes and the marker) re-runs into
    byte-identical partitions with zero duplicates and no compaction.

    doc_ids are assumed globally unique across drops (they key both
    the corpus and the index). Signatures use the xxhash64 family and
    band keys; the hot-bucket cap is inherited from the banded
    self-join defaults — a mega-bucket in the INDEX costs the probe
    join, so the cap applies to the index side too at deploy scale.

    CLEAN checkpoint-loss replay (markers die with the checkpoint;
    the whole drop redelivers as batch 0 of a NEW lineage) converges
    duplicate-free through the identity guard: every redelivered
    doc's index rows live in the OLD lineage's partitions, which a
    new lineage's self-excluded read keeps visible, and each replayed
    doc collides AT LEAST with its own id-keyed sentinel row — which,
    unlike the real band hashes, does not depend on the hot-shingle
    cap's dataset-relative pruning context (stored rows are computed
    over a batch's survivors; the replay probes with the whole drop,
    so a shingle can be capped in one context and not the other and
    every real band hash can shift). The ``bdoc == pdoc`` candidates
    therefore always name the replayed ids — dropped without
    verification, at zero extra index contact, corpus physically
    untouched. Scope of that guarantee: it is an IDENTITY guarantee
    (no redelivered doc is ever ingested twice). Docs the original
    run verify-DROPPED have no index rows at all, so their replay is
    re-classified from scratch under the replay's cap context — they
    carry the same probabilistic LSH/cap recall as a fresh run, i.e.
    a previously-eliminated near-dup pair can re-enter if its bands
    no longer collide in the new context (the documented cap
    trade-off, not a replay defect). Same single torn-batch caveat as
    :func:`streaming_ingest_dedup`: a batch torn at the moment of the
    loss (corpus partition without its band-index partition) needs
    :func:`reconcile_replace_by_batch` before the re-drain.
    """
    from ..operators.dedup import (_signatures_from, doc_shingle_pairs,
                                   ngram_jaccard_pairs)

    r = num_hashes // bands
    assert num_hashes % bands == 0

    def banded_of(df: DataFrame) -> DataFrame:
        ds = doc_shingle_pairs(df, "doc_id", "text", n)
        sigs = _signatures_from(ds, num_hashes)
        banded = sigs.select(
            "doc",
            F.explode(F.array([
                F.struct(F.lit(b).alias("band"),
                         F.xxhash64(*[F.col("sig")[b * r + i]
                                      for i in range(r)]).alias("bh"))
                for b in range(bands)
            ])).alias("bk"),
        ).select("doc", "bk.band", "bk.bh")
        # EVERY doc gets one SENTINEL row (band -1, bh = hash of its
        # own id) in addition to its band rows. The sentinel is the
        # identity guard's context-INDEPENDENT anchor: real band
        # hashes are functions of the hot-shingle DF cap, which is
        # dataset-relative — the stored rows are computed over the
        # batch's SURVIVORS and a checkpoint-loss replay probes with
        # the whole redelivered drop, so a shingle can be capped in
        # one context and not the other and a doc's min-hashes can
        # shift in every band, silencing the bdoc == pdoc guard and
        # re-ingesting the doc as a permanent duplicate. The sentinel
        # depends only on the doc id, so a replayed doc ALWAYS meets
        # its own stored sentinel. It can never collide with another
        # doc (the bh is id-unique), so it creates no candidate
        # pairs; it also guarantees a nonempty index partition for
        # every nonempty corpus partition — the structural invariant
        # reconcile_replace_by_batch keys on — including docs whose
        # every shingle is cap-pruned (boilerplate shared by >256
        # docs; short docs are NOT that case — word_shingles folds
        # them into one whole-doc shingle). Cost: one extra index row
        # per doc next to `bands` real ones.
        sentinel = df.select(F.col("doc_id").alias("doc"),
                             F.lit(-1).alias("band"),
                             F.xxhash64(F.col("doc_id")).alias("bh"))
        return banded.unionByName(sentinel)

    _validate_entry_paths((corpus_path, band_index_path), checkpoint)

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(drop_dir)
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )

    lineage_cache: dict = {}

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        token = _batch_token(checkpoint, batch_id, lineage_cache)
        marker = _marker(checkpoint, "__ingest_batches", token)
        if marker and fsmeta.exists(marker):  # re-delivered after crash
            return
        # Every per-batch persist registers in `held` (the
        # dedup.released() contract) and is dropped on exit: a failed
        # verify job or batch write must not leak five cached frames
        # per retry in a long-lived session.
        with released() as held:
            def hold(df):
                df = df.persist()
                held.append(df)
                return df

            batch_df = hold(batch_df)
            banded = hold(banded_of(batch_df))
            index = _read_excluding_batch(spark, band_index_path, token,
                                          _empty_band_index(spark))

            # candidate pairs, normalized to (batch doc, partner doc).
            # The early .distinct() on each branch is deliberate: a pair
            # colliding in k <= 8 bands arrives k times, and cand feeds
            # THREE consumers (partners, dropped, replayed) — deduping
            # once at the source keeps the k-fold inflation out of all
            # three (a round-8 A/B of removing these was inconclusive
            # under box drift; the dedup-at-source shape is kept on the
            # fan-out argument).
            vs_corpus = (
                banded.alias("b")
                .join(index.alias("i"), ["band", "bh"])
                .select(F.col("b.doc").alias("bdoc"),
                        F.col("i.doc").alias("pdoc"))
                .distinct())
            in_batch = (
                banded.alias("l").join(banded.alias("r"), ["band", "bh"])
                .where(F.col("l.doc") > F.col("r.doc"))
                .select(F.col("l.doc").alias("bdoc"),
                        F.col("r.doc").alias("pdoc"))
                .distinct())
            cand = hold(vs_corpus.unionByName(in_batch))

            # exact-Jaccard verify over batch docs + candidate partners
            # only (uncapped shingle sets: band collision is the recall
            # device, the verify is the truth)
            partners = cand.select(F.col("pdoc").alias("doc_id")).distinct()
            # partner ids come from the (self-excluded) index, so they
            # never name the current batch's own partial first-attempt
            # rows; reading the corpus whole is therefore replay-safe
            corpus_part = (
                _read_batched(spark, corpus_path, batch_df.limit(0))
                .select("doc_id", "text")
                .join(partners, "doc_id", "left_semi"))
            vdocs = batch_df.select("doc_id", "text").unionByName(
                corpus_part.select("doc_id", "text"))
            # The public pairs operator, uncapped (band collision is the
            # recall device, the verify is the truth). Its internal
            # shingle-index persist matters here: the index's expensive
            # subtree is the corpus-partner read (semi-joined corpus
            # scan), which the three verify branches would otherwise each
            # re-run — the drain's only partner-proportional term,
            # tripled. At sf0.1 the drains are fixed stage overhead and
            # the sweep could not separate this from box drift (same
            # verdict as the banded-recompute A/B note below); kept on
            # the structural argument — at deploy scale the partner read
            # is the term that grows. Its output is NOT pre-filtered to
            # candidate pairs (r13): `dropped` semi-joins cand against
            # it on (id1, id2) anyway, so a verified pair outside cand
            # can never match — the old pair_keys distinct + semi-join
            # were two pure-overhead exchanges per drain.
            verified = ngram_jaccard_pairs(vdocs, "doc_id", "text", n=n,
                                           threshold=threshold,
                                           max_shingle_df=None,
                                           cleanup=held)
            dropped = (
                cand.select("bdoc",
                            F.least("bdoc", "pdoc").alias("id1"),
                            F.greatest("bdoc", "pdoc").alias("id2"))
                .join(verified.select("id1", "id2"), ["id1", "id2"],
                      "left_semi")
                .select(F.col("bdoc").alias("doc_id")))
            # Replay identity guard: after CHECKPOINT LOSS the whole drop
            # redelivers as batch 0 of a NEW lineage with the markers
            # gone, and the verify path would re-append every replayed
            # doc (pair generation is id1 < id2, so a doc never
            # Jaccard-matches itself). But a replayed doc X's index rows
            # live in the OLD lineage's partitions — which the new
            # lineage's self-excluded read keeps visible — so X collides
            # with its own rows in every band and the bdoc == pdoc
            # candidates already name exactly the replayed ids — doc_ids
            # are globally unique by this function's contract, same id =
            # same doc, drop without verification. Zero extra index
            # contact: the probe join already ran. (Within a lineage, a
            # TORN batch's own partial rows are instead invisible to its
            # re-run and get overwritten — replace-by-batch.)
            replayed = (cand.where(F.col("bdoc") == F.col("pdoc"))
                        .select(F.col("bdoc").alias("doc_id")))

            # ONE anti-join against the union (r13 — was two chained
            # anti-joins); no distinct on either branch — anti-join
            # semantics ignore duplicate right-side keys.
            new_docs = hold(batch_df
                            .join(dropped.unionByName(replayed),
                                  "doc_id", "left_anti"))
            _replace_batch_partition(new_docs, corpus_path, token)
            # Recomputing the survivors' band rows looks wasteful next to
            # a semi-join against the persisted `banded`; a round-8 A/B
            # could not separate the variants from box noise (drain cost
            # at sf0.1 is fixed stage overhead either way, and the box
            # drifts ~1.3x within an hour). Kept as the recompute: one
            # fewer exchange pair, and the map-side shingle+hash is
            # batch-proportional. Revisit with cluster-scale batches
            # where signature CPU could dominate exchange overhead.
            _replace_batch_partition(banded_of(new_docs), band_index_path,
                                     token)
            if marker:
                fsmeta.touch(marker)              # recompute-skip fast path

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q


def streaming_ingest_decontaminate(spark: SparkSession, drop_dir: str,
                                   benchmark: DataFrame, corpus_path: str,
                                   quarantine_path: str,
                                   schema: str = "doc_id LONG, text STRING",
                                   n: int = 4,
                                   checkpoint: str | None = None):
    """Decontaminating ingestion: drain ``drop_dir`` (availableNow),
    appending benchmark-clean documents to ``corpus_path`` and routing
    contaminated ones (any shared word ``n``-gram with ``benchmark``)
    to ``quarantine_path`` with their distinct-hit counts.

    The Bloom filter over the benchmark shingles is built ONCE, before
    the stream starts (operators/curation.py:
    build_decontamination_filter) — the few-KiB words list is
    captured by the ``foreachBatch`` closure and baked into every
    micro-batch plan as a literal, and the exact-verify shingle set is
    persisted across batches; per-trigger cost is proportional to the
    batch, never to the benchmark. Crash contract: both sinks are
    replace-by-batch (:func:`_replace_batch_partition`), so a TORN
    batch — crash between the quarantine and corpus writes, or before
    the marker — re-runs into byte-identical partitions with zero
    duplicates and no compaction. Unlike the indexed pipelines this
    one keeps NO identity artifact, so CHECKPOINT LOSS (whole drop
    redelivered as batch 0 of a NEW lineage) duplicates every
    previously-ingested doc — the old lineage's partitions survive
    and the replay lands the same docs again under the new token; the
    documented healer is ``maintenance.upsert_by_key(key,
    full_rewrite=True, partition_by=["_batch_id"])``, and the
    clean/quarantine routing is deterministic so no doc changes side
    on replay (both halves pinned in tests). Compose after
    ``streaming_ingest_dedup`` when duplicates must never be visible
    between compactions.
    """
    from ..operators.curation import (build_decontamination_filter,
                                      decontaminate_probe)


    # validate BEFORE the benchmark filter build: a bad sink path
    # must not cost a full Spark job nor strand the persisted
    # benchmark shingles
    _validate_entry_paths((corpus_path, quarantine_path), checkpoint)

    bench_sh, words = build_decontamination_filter(benchmark, "text", n)
    bench_sh = bench_sh.persist()
    bench_sh.count()                       # materialize once, up front

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(drop_dir)
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )

    lineage_cache: dict = {}

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        token = _batch_token(checkpoint, batch_id, lineage_cache)
        marker = _marker(checkpoint, "__decon_batches", token)
        if marker and fsmeta.exists(marker):  # re-delivered after crash
            return
        with released() as held:
            batch = batch_df.persist()
            held.append(batch)
            hits = decontaminate_probe(batch, bench_sh, words,
                                       "doc_id", "text", n).persist()
            held.append(hits)
            _replace_batch_partition(batch.join(hits, "doc_id"),
                                     quarantine_path, token)
            _replace_batch_partition(
                batch.join(hits.select("doc_id"), "doc_id",
                           "left_anti"),
                corpus_path, token)
            if marker:
                fsmeta.touch(marker)          # recompute-skip fast path

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    try:
        q = writer.start()
        q.awaitTermination()
    finally:
        # a failed drain must not strand the materialized benchmark
        # shingles in executor storage for the session
        bench_sh.unpersist()
    return q
