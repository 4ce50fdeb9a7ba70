"""Table maintenance: compaction and incremental upsert.

The operational half of a 100 TB lake the reference never had to face:

- ``compact_parquet``: streaming/incremental writers leave thousands of
  KB-scale files; scan cost is then dominated by file-open overhead and
  the driver's file listing. Compaction rewrites a table into
  size-targeted files, optionally sorted within partitions so parquet
  row-group min/max statistics become selective (poor-man's
  clustering — the same reason warehouses Z-order).
- ``upsert_by_key``: append-with-dedup for snapshot tables (new capture
  arrives, re-delivered records must not duplicate). Without a
  table-format layer (Delta/Iceberg) the portable primitive is
  read-union-dedup-rewrite with a deterministic winner; the full
  rewrite goes through a temp dir so a crash mid-rewrite never
  truncates the table. ``partition_by`` is the scale form: the merge
  reads and rewrites ONLY the partitions the updates touch (dynamic
  partition overwrite), with the partition-stable-key contract every
  partition-scoped MERGE carries — and a WEAKER crash contract than
  the full rewrite (documented on ``upsert_by_key``).
"""

from __future__ import annotations

import logging
import math
import os
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .. import fsmeta

_log = logging.getLogger(__name__)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in fsmeta.walk(path):
        total += sum(fsmeta.getsize(os.path.join(root, f))
                     for f in files if not f.startswith(("_", ".")))
    return total


def _swap_in(tmp: str, path: str) -> None:
    """Crash-safe table swap: move the live table aside, move the new
    one in, only then delete the old. No step deletes data before the
    replacement is live, so a crash at any point leaves a recoverable
    state: before the first rename the old table is live; between the
    renames both directories still exist on disk (``path`` is briefly
    absent — restore by renaming ``__old`` back); after the second the
    new table is live and the worst case is a leaked ``__old`` dir.
    The previous rmtree-then-rename ordering lost the table outright if
    the process died between the two calls. Atomicity of each step is
    the fsmeta module's stated local/HDFS rename assumption — on
    object stores use a transactional table format instead.
    """
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    had_existing = fsmeta.exists(path)
    if had_existing:
        fsmeta.rename(path, old)
    try:
        fsmeta.rename(tmp, path)
    except BaseException:
        if had_existing:
            fsmeta.rename(old, path)
        raise
    if had_existing:
        fsmeta.rmtree(old)


#: Hive's directory name for a null partition value.
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _hive_str(c: str, cast_to: str | None = None):
    """The Hive string form of a partition column value — nulls map to
    the ``__HIVE_DEFAULT_PARTITION__`` directory name. The ONE place
    this module spells the partition-string contract (compaction's
    kmap match and upsert's tuple key both build on it).
    ``cast_to`` first round-trips the value through another type
    (``try_cast``: uncastable → null → the Hive null sentinel) — the
    probe upsert_by_key uses to detect type-form skew."""
    col = F.col(c)
    if cast_to is not None:
        col = col.try_cast(cast_to)
    return F.coalesce(col.cast("string"), F.lit(_HIVE_NULL))


def _walk_partitions(path: str, partition_by: list[str]):
    """Yield ``(values, leaf_dirpath)`` for every leaf of a Hive
    layout (values are the unquoted dir-name strings in partition_by
    order) — ONE driver-side walk, bounded by the partition count;
    the single place the layout-walking logic lives."""
    from urllib.parse import unquote

    def walk(dirpath: str, depth: int, values: list[str]):
        if depth == len(partition_by):
            yield values, dirpath
            return
        prefix = f"{partition_by[depth]}="
        for entry in sorted(fsmeta.listdir(dirpath)):
            sub = os.path.join(dirpath, entry)
            if fsmeta.isdir(sub) and entry.startswith(prefix):
                yield from walk(sub, depth + 1,
                                values + [unquote(entry[len(prefix):])])

    yield from walk(path, 0, [])


def _partition_value_tuples(path: str,
                            partition_by: list[str]) -> list[list[str]]:
    """Leaf partition value tuples — the walk without file stats."""
    return [values for values, _ in _walk_partitions(path, partition_by)]


def _partition_file_plan(path: str, partition_by: list[str],
                         target_bytes: int) -> list[tuple[list[str], int]]:
    """Walk the existing Hive layout and size each leaf partition:
    returns ``[(partition values in partition_by order, ceil(bytes /
    target))]``. Driver-side cost is one directory listing plus file
    stats — bounded by the partition/file count, never the row count
    — and needs no Spark scan because the bytes are already laid out
    by partition."""
    return [(values, max(1, math.ceil(_dir_bytes(d) / target_bytes)))
            for values, d in _walk_partitions(path, partition_by)]


def compact_parquet(spark: SparkSession, path: str,
                    target_file_mb: float = 128,
                    sort_within_by: list[str] | None = None,
                    partition_by: list[str] | None = None) -> int:
    """Rewrite ``path`` into ~ceil(bytes / target)-sized files; returns
    the shuffle-task count of the rewrite. ``sort_within_by`` clusters
    rows inside each file so min/max row-group stats prune reads on
    those columns.

    ``partition_by`` preserves a Hive-partitioned layout (e.g. the
    incremental lake's ``event_date=...`` directories) — without it a
    plain rewrite of a partitioned table would flatten the layout and
    silently break downstream partition pruning
    (rollup.prune_to_dates). The file-size target holds PER PARTITION:
    each leaf directory's byte size is read off the existing layout
    (one driver-side listing, bounded by partition count) and its rows
    are salted across ceil(part_bytes / target) shuffle buckets via a
    broadcast (partition → bucket count) map. A plain
    ``repartition(n, *partition_by)`` would instead hash EVERY row of
    a partition value into one task — a hot date holding 100× the
    target compacts through a single straggler task and comes out as
    one oversized file, reintroducing exactly the skew the target was
    meant to bound. Appending writers leave one file generation per
    drain; steady state is "compact every N drains", and this is the
    call that does it."""
    target_bytes = max(1, int(target_file_mb * (1 << 20)))
    n_files = max(1, math.ceil(_dir_bytes(path) / target_bytes))
    df = spark.read.parquet(path)
    plan = _partition_file_plan(path, partition_by,
                                target_bytes) if partition_by else []
    obs = None
    if plan:
        kmap = spark.createDataFrame(
            [(*vals, k) for vals, k in plan],
            [f"_pv_{c}" for c in partition_by] + ["_k"])
        cond = None
        for c in partition_by:
            # match on the Hive string form; null values live in the
            # __HIVE_DEFAULT_PARTITION__ directory
            eq = _hive_str(c) == F.col(f"_pv_{c}")
            cond = eq if cond is None else (cond & eq)
        # deterministic salt from the non-partition columns: same rows
        # → same bucket → same file assignment across runs. Left join
        # + coalesce(_k, 1) covers rows whose partition the listing
        # missed (racing writer): they compact as one bucket.
        data_cols = [c for c in df.columns if c not in set(partition_by)]
        salt = (F.pmod(F.xxhash64(*data_cols), F.coalesce("_k", F.lit(1)))
                if data_cols else F.lit(0))
        n_files = max(1, sum(k for _, k in plan))
        # The kmap matches on the Hive string form of each partition
        # value; a type whose cast('string') differs from its
        # directory form would miss the map and fall to one bucket —
        # an acceptable degradation (the rows still compact, just
        # unsized), but not a silent one: count the misses through the
        # write (a zero-cost CollectMetrics node, no extra job) and
        # warn after it lands.
        obs = Observation("compact_kmap")
        out = (df.join(F.broadcast(kmap), cond, "left")
               .observe(obs, F.sum(F.when(F.col("_k").isNull(), 1)
                                   .otherwise(0)).alias("unmatched"))
               .withColumn("_salt", salt)
               .drop("_k", *[f"_pv_{c}" for c in partition_by])
               .repartition(n_files, *partition_by, "_salt")
               .drop("_salt"))
    elif partition_by:
        # partition_by requested but no matching layout on disk yet
        # (first compaction of a flat table): plain per-value shuffle.
        out = df.repartition(n_files, *partition_by)
    else:
        out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    if obs is not None:
        unmatched = obs.get.get("unmatched") or 0
        if unmatched:
            _log.warning(
                "compact_parquet(%s): %d rows missed the partition "
                "size map (cast-to-string form != directory form?) "
                "and compacted as one bucket per partition value",
                path, unmatched)
    _swap_in(tmp, path)
    return n_files


def _winner_per_key(current: DataFrame, updates: DataFrame,
                    key: str, order_by: str | None) -> DataFrame:
    """One row per key: highest ``order_by`` wins, ties go to the
    update; with no ``order_by``, updates replace current outright.
    Remaining ties (duplicate keys WITHIN one side — e.g. the
    cross-partition duplicates ``full_rewrite=True`` heals) resolve
    by a stable hash of the row's remaining columns, so the winner
    is DETERMINISTIC across runs: byte-identical copies tie the hash
    harmlessly (any pick is the same row), while differing copies
    (say, different ``_batch_id`` values deciding which partition
    the survivor lands in) always resolve the same way instead of
    by shuffle order. Map-typed columns are excluded from the hash
    (Spark's xxhash64 rejects them); rows differing ONLY in a map
    column remain arbitrarily ordered — the documented residue."""
    merged = (current.withColumn("_src", F.lit(0))
              .unionByName(updates.withColumn("_src", F.lit(1))))
    if order_by:
        rank_cols = [F.desc(order_by), F.desc("_src")]
    else:
        rank_cols = [F.desc("_src")]
    tie_cols = [c for c, t in merged.dtypes
                if c != "_src" and "map<" not in t]
    if tie_cols:
        rank_cols.append(F.desc(F.xxhash64(*tie_cols)))
    from pyspark.sql import Window
    w = Window.partitionBy(key).orderBy(*rank_cols)
    return (merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_src"))


def upsert_by_key(spark: SparkSession, path: str, updates: DataFrame,
                  key: str, order_by: str | None = None,
                  partition_by: list[str] | None = None,
                  full_rewrite: bool = False) -> None:
    """Merge ``updates`` into the parquet table at ``path``: one row per
    ``key`` survives. Winner = highest ``order_by`` value (ties: the
    update); with no ``order_by``, updates simply replace existing rows
    with the same key.

    Without ``partition_by`` this is a full read-union-dedup-rewrite
    through the crash-safe swap — corpus-sized work, fine for snapshot
    tables, wrong as the steady-state merge of a 100 TB lake.

    ``partition_by`` is the scale path: the table is (and stays)
    Hive-partitioned on those columns, the touched partition values
    are read off the UPDATES (one bounded distinct — batch-sized, not
    corpus-sized), the current side is partition-PRUNED to exactly
    those values, and Spark's dynamic partition overwrite replaces
    only those directories — per-merge cost is updates + touched
    partitions, never the table. REQUIREMENT: the partition columns
    must be stable per key (a key never moves between partition
    values). A moved key's old row lives in an untouched partition
    this merge never reads, so it would survive as a duplicate —
    exactly why every partition-scoped MERGE (Hive, Delta, Iceberg
    with partition predicates) carries the same contract. Keys that
    can move need the full rewrite.

    CRASH CONTRACT of the partition path — weaker than the full
    rewrite's, by the nature of dynamic partition overwrite on plain
    parquet: the full rewrite stages into a temp dir and swaps
    (``_swap_in``) so every crash window leaves a recoverable table,
    but dynamic overwrite commits IN PLACE per partition, and a crash
    mid job-commit can leave a touched partition with its old files
    already deleted and its new ones not yet visible — that
    partition's pre-existing rows are then unrecoverable from the
    updates alone. Recovery is re-running the merge from a retained
    updates batch PLUS a backup/snapshot of the table (which a 100 TB
    lake keeps anyway); a per-partition stage+rename would need a
    partition-level swap protocol that plain parquet directories
    cannot express atomically across partitions. Callers who cannot
    tolerate the window should use the full rewrite (no
    ``partition_by``) or a transactional table format.

    ``full_rewrite=True`` forces the corpus-sized
    read-union-dedup-rewrite through the crash-safe swap while keeping
    ``partition_by`` as the OUTPUT layout only. This is the healer
    form for CROSS-partition duplicates — e.g. a replace-by-batch sink
    after checkpoint loss, where a doc's replayed copy lands in a
    different ``_batch_id`` partition than its original: the key is
    not partition-stable there, so the partition-scoped merge must not
    be used, but the healed table still needs its partitioned layout
    for subsequent drains."""
    if partition_by and fsmeta.exists(path) and not full_rewrite:
        current = spark.read.parquet(path)
        # Touched-partition predicate, kept FLAT: one tuple-key
        # expression (Hive string form of the partition columns,
        # concat-joined) probed with .isin over the updates' distinct
        # tuples, instead of an Or-chain of per-tuple conjunctions —
        # a many-partition batch would otherwise build an Or tree
        # whose depth equals the tuple count. A separator collision
        # (chr(1) inside a value) can only ADD a partition to the
        # read set, never drop one, and an extra partition rewrites
        # to identical contents.
        sep = chr(1)
        cur_types = dict(current.select(*partition_by).dtypes)

        def tuple_key(df: DataFrame, via: dict | None = None):
            return F.concat_ws(sep, *[
                _hive_str(c, via[c] if via else None)
                for c in partition_by])

        # TYPE-FORM SKEW GUARD: the current side's partition types
        # come from directory-name inference (month=01 written from a
        # string column reads back as int 1), so an updates value
        # whose string form does not survive a round-trip through the
        # table's read type would (a) string-form-MISS the predicate
        # below — dynamic overwrite would then replace the partition
        # with updates-only rows, DELETING its pre-existing ones —
        # and (b) union-coerce into differently-named directories on
        # the write. Both are silent corruption, so every touched
        # tuple is checked (batch-bounded: it rides the collect the
        # predicate needs anyway) and a mismatch refuses loudly.
        # Canonical forms ('2024-01-01' strings against an inferred
        # date column) round-trip identically and pass untouched.
        pairs = (updates
                 .select(tuple_key(updates).alias("_raw"),
                         tuple_key(updates, cur_types).alias("_canon"))
                 .distinct().collect())
        if not pairs:                         # empty updates: no-op,
            return                            # before any guard work
        skewed = sorted({r["_raw"] for r in pairs
                         if r["_raw"] != r["_canon"]})
        if skewed:
            shown = [t.replace(sep, "/") for t in skewed[:5]]
            raise ValueError(
                f"upsert_by_key(partition_by={partition_by}): "
                f"updates carry partition values whose string form "
                f"does not survive the table's read types "
                f"{cur_types} (directory-name type inference) — "
                f"e.g. {shown}; merging across this skew would "
                "silently corrupt the partition layout (missed "
                "partitions overwritten with updates-only rows, "
                "winners written into differently-named dirs). Cast "
                "the updates to the table's read schema first, or "
                "disable partitionColumnTypeInference and use string "
                "partition columns.")
        touched = [r["_raw"] for r in pairs]
        # And every TOUCHED partition's directory name must be
        # canonical for the inferred read types: a directory like
        # month=01 reads back as int 1, whose write form is month=1 —
        # a partition-scoped overwrite would read its rows (the
        # predicate evaluates on the inferred VALUE, which matches)
        # but write the winners into a NEW month=1 directory beside
        # it, splitting the partition. The check is driver-bounded:
        # one directory-name walk (∝ partition count, no file stats,
        # no table scan — the 'updates + touched partitions' cost
        # contract holds), round-tripped through the read types on a
        # partition-count-sized LOCAL frame. Dirs aliasing a touched
        # tuple under a non-canonical name refuse loudly; untouched
        # non-canonical dirs are harmless (never read, never written).
        dir_tuples = _partition_value_tuples(path, partition_by)
        if dir_tuples:
            local = spark.createDataFrame(
                [tuple(v) for v in dir_tuples],
                ", ".join(f"{c} string" for c in partition_by))
            dir_pairs = (local.select(
                tuple_key(local).alias("_dir"),
                tuple_key(local, cur_types).alias("_canon"))
                .collect())
            touched_set = set(touched)
            aliased = sorted({r["_dir"] for r in dir_pairs
                              if r["_canon"] in touched_set
                              and r["_dir"] != r["_canon"]})
            if aliased:
                shown = [t.replace(sep, "/") for t in aliased[:5]]
                raise ValueError(
                    f"upsert_by_key(partition_by={partition_by}): "
                    f"the table at {path!r} has partition directories "
                    f"whose names are not canonical for their "
                    f"inferred read types {cur_types} and that alias "
                    f"partitions this merge touches — e.g. {shown}; "
                    "dynamic partition overwrite would write winners "
                    "into new differently-named directories beside "
                    "them, splitting those partitions. Use "
                    "full_rewrite=True (rewrites the layout "
                    "canonically through the crash-safe swap) or "
                    "disable partitionColumnTypeInference and keep "
                    "string partition columns.")
        winner = _winner_per_key(
            current.where(tuple_key(current).isin(touched)),
            updates, key, order_by)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        try:
            (winner.write.mode("overwrite")
             .partitionBy(*partition_by).parquet(path))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           prev)
        return
    if fsmeta.exists(path):
        current = spark.read.parquet(path)
    else:
        current = updates.limit(0)
    winner = _winner_per_key(current, updates, key, order_by)
    tmp = f"{path}__upsert_{uuid.uuid4().hex[:8]}"
    writer = winner.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    _swap_in(tmp, path)


def fold_index_bucketed(spark: SparkSession, index_path: str,
                        table: str, key_col: str = "content_key",
                        n_buckets: int = 8) -> list[str]:
    """Fold the accumulated ``_batch_id`` delta partitions of a
    replace-by-batch index (streaming/ingest.py) into the catalog
    table ``table``, bucketed AND sorted by ``key_col`` — the
    deploy-scale layout under which the incremental-dedup probe
    reaches its first join with ZERO exchange on the index branch
    even when nothing can broadcast (the device tests/test_plans.py::
    test_incremental_dedup_bucketed_index_scan_has_no_exchange pins).
    Returns the folded tokens; their directories are removed from
    ``index_path``, which afterwards holds only the batches newer
    than the fold. Steady state is the TWO-TIER index: pass ``table``
    to ``streaming_ingest_dedup(base_index_table=...)`` so each batch
    probes the bucketed base and the small parquet delta on separate
    plan branches — and pass it to ``reconcile_replace_by_batch`` too
    (folded corpus partitions would otherwise match its torn-batch
    signature).

    LAYOUT DECISION: ``_batch_id`` is carried into the base VERBATIM
    but as a plain DATA column, not a partition column. The ingest's
    own-token exclusion is a ``!=`` predicate either way (it prunes
    at most one partition, so partitioning buys nothing physical),
    while a PARTITIONED managed table cannot be atomically renamed:
    the catalog rename moves the directory but leaves per-partition
    metadata locations stale (observed on Spark's session catalog;
    Hive metastores have the same per-partition-location pitfall), so
    every swap would open a window in which the live base silently
    reads EMPTY — for a dedup index that means quietly re-ingesting
    every duplicate, the exact corruption class this module exists to
    prevent. Unpartitioned bucketed tables rename metadata-clean.

    CRASH CONTRACT (the ``_swap_in`` shape, expressed in catalog
    renames because bucket metadata lives in the catalog, not the
    files): the merged table is staged under ``<table>__folding``,
    the live table moves aside to ``<table>__prefold``, the staging
    renames in, the backup drops, and ONLY THEN are the folded delta
    directories deleted — no step destroys the only copy of
    anything. Torn windows heal at the next call's entry:
    live-missing-with-backup restores the backup; live-plus-backup
    drops the stale backup; already-folded-but-undeleted deltas are
    detected against the base's token set (skipping the rewrite) and
    their directories removed — the brief base∩delta overlap is
    absorbed by the probe's min-holder union. Fold cost is one
    base+delta rewrite (the same class as any compaction); the token
    scan it needs reads one dictionary-encoded column. Do NOT run
    while an ingest query is live (its in-flight batch's partition
    would fold mid-write); the catalog/dir renames carry fsmeta.py's
    local/HDFS assumption — on object stores use a transactional
    table format.
    """
    staging, backup = f"{table}__folding", f"{table}__prefold"
    cat = spark.catalog
    if not cat.tableExists(table) and cat.tableExists(backup):
        # torn previous fold (crashed between the two renames):
        # restore the pre-fold table before computing anything, or
        # the rewrite below would silently drop its rows
        spark.sql(f"ALTER TABLE {backup} RENAME TO {table}")
    if cat.tableExists(table) and cat.tableExists(backup):
        spark.sql(f"DROP TABLE {backup}")     # completed fold's leak
    if not fsmeta.isdir(index_path):
        return []
    # the ONE layout gate (flat pre-replace-by-batch files at the
    # root AND bare-numeric pre-lineage tokens both refuse with the
    # named migration — a silent [] here would read as "two-tier
    # active" while no base was ever created)
    from ..streaming.ingest import _check_batch_layout
    _check_batch_layout(index_path)
    tok_dirs = {v[0]: d for v, d in
                _walk_partitions(index_path, ["_batch_id"])}
    tokens = sorted(tok_dirs)
    if not tokens:
        return []
    # Visible-file census over EVERY token dir — fresh AND the
    # already-folded leftovers of a crashed retry — because the
    # cleanup pass at the end deletes them all: a refusal that
    # only covered fresh dirs would let the deletion loop rmtree
    # a stale partition's foreign file without a word. Checked once
    # at entry — files appearing DURING the fold are out of scope,
    # like all concurrent writes (the do-not-run-while-live
    # contract). Hidden
    # components (._*/_temporary task dirs of a crashed write)
    # are pruned: their uncommitted part files neither count as
    # data (Spark's own read ignores them — a dir holding ONLY a
    # _temporary remnant must stay "empty" or the merge wedges on
    # it forever) nor feed the schema probe stale retried-task
    # footers. Data parked UNDER a hidden path is deliberately
    # out of scope: hidden = writer-owned by Spark convention,
    # and every reader here ignores it.
    def _visible_files(d: str) -> tuple[list[str], list[str]]:
        files: list[str] = []
        stray: list[str] = []
        for root, dirs, fs in fsmeta.walk(d):
            dirs[:] = [x for x in dirs
                       if not x.startswith((".", "_"))]
            for f in fs:
                if f.startswith((".", "_")):
                    continue
                (files if f.endswith(".parquet")
                 else stray).append(os.path.join(root, f))
        return files, stray

    parquet_files: dict[str, list[str]] = {}
    for t in tokens:
        files, stray = _visible_files(tok_dirs[t])
        if stray:
            # a VISIBLE non-parquet file is not a torn remnant:
            # treating the dir as empty would rmtree real data
            # below, and the merged read would choke on it anyway
            raise ValueError(
                f"fold_index_bucketed: partition "
                f"{tok_dirs[t]!r} holds non-parquet visible "
                f"files (e.g. {stray[:3]}); refusing to fold or "
                "delete it — remove the foreign files or migrate "
                "the partition first. No partition data was folded "
                "or deleted by this call (entry-time healing may "
                "have already tidied a prior fold's catalog "
                "backup).")
        parquet_files[t] = files
    have: set[str] = set()
    if cat.tableExists(table):
        have = {r["_batch_id"] for r in
                spark.table(table).select("_batch_id")
                .distinct().collect()}        # token-count-bounded
    fresh = sorted(set(tokens) - have)
    if fresh:
        # SCHEMA-DRIFT refusal, next to its cause. Left alone, drift
        # either dies at the union as an opaque AnalysisException or
        # — worse — folds "successfully" with NULL-padded columns: a
        # NULLed content_key never matches a probe join, so every doc
        # those index rows covered silently re-ingests as a duplicate.
        # Verification is per FILE, not per merged footer: any merged
        # view is blind to a column DROPPED by a newer writer (the
        # union equals the old schema — reproduced: a mixed
        # old+new-generation dir folds a NULL key straight into the
        # base), so every parquet file of every fresh partition must
        # carry the SAME (name, type) schema — which also makes a
        # first fold over heterogeneous deltas refuse instead of
        # minting a NULL-padded base; then that uniform schema must
        # match the base's (names AND types — content_key switching
        # hash families is a type drift names alone pass), and
        # key_col must be one of the columns. Driver cost: one footer
        # read per file — FILE-count-bounded, the same class as the
        # compaction size walk, fine for a maintenance op. A fresh
        # dir holding NO parquet files (torn write remnant) is
        # tolerated as empty: it contributes no rows and its dir is
        # still deleted below, restoring the torn-batch signature
        # for reconcile instead of wedging every subsequent fold.
        def _schema_key(fields, exclude=frozenset()) -> tuple:
            return tuple(sorted((f.name, f.dataType.simpleString())
                                for f in fields if f.name not in exclude))

        by_schema: dict[tuple, list[str]] = {}
        readable: list[str] = []
        for t in fresh:
            if not parquet_files[t]:
                continue                      # torn empty remnant
            readable.append(t)
            for fp in parquet_files[t]:
                key = _schema_key(spark.read.parquet(fp).schema.fields)
                toks = by_schema.setdefault(key, [])
                if not toks or toks[-1] != t:
                    toks.append(t)
        if len(by_schema) > 1:
            # each value list is sorted-unique by construction
            # (fresh is sorted; per-token files are consecutive)
            shapes = {" ".join(f"{n}:{ty}" for n, ty in k):
                      v[:3] for k, v in by_schema.items()}
            raise ValueError(
                f"fold_index_bucketed: the fresh partitions at "
                f"{index_path!r} disagree on file schema "
                f"(schema -> example partitions: {shapes}); "
                "fold refuses to merge across index schema drift — "
                "migrate the old-layout partitions (or files) to the "
                "current schema first, or fold the two generations "
                "separately (a fresh table NAME does not help: the "
                "disagreement is among the delta files themselves).")
    else:
        readable = []
    if readable:
        delta_schema = next(iter(by_schema))
        if key_col not in {n for n, _ in delta_schema}:
            raise ValueError(
                f"fold_index_bucketed: key_col={key_col!r} is not a "
                f"column of the index at {index_path!r} "
                f"(columns: {[n for n, _ in delta_schema]}); the base "
                "must be bucketed by a real index column or every "
                "probe would shuffle.")
        if cat.tableExists(table):
            base_schema = _schema_key(
                spark.table(table).schema.fields, {"_batch_id"})
            if delta_schema != base_schema:
                raise ValueError(
                    f"fold_index_bucketed: the delta at {index_path!r} "
                    f"({[f'{n}:{t}' for n, t in delta_schema]}) does "
                    f"not match the base table {table!r} "
                    f"({[f'{n}:{t}' for n, t in base_schema]}); fold "
                    "refuses to merge across index schema drift — "
                    "migrate one side first (or fold into a fresh "
                    "table name).")
        # read ONLY the fresh dirs (basePath keeps _batch_id as a
        # partition column): a stale already-folded-but-undeleted
        # partition with a drifted footer must not wedge the merge or
        # mis-project the fresh rows; per-file uniformity above makes
        # the merged read exact
        new_rows = (spark.read.option("mergeSchema", "true")
                    .option("basePath", index_path)
                    .parquet(*[tok_dirs[t] for t in readable])
                    .select(*[n for n, _ in delta_schema], "_batch_id"))
        contents = (spark.table(table).unionByName(new_rows)
                    if cat.tableExists(table) else new_rows)
        spark.sql(f"DROP TABLE IF EXISTS {staging}")
        (contents.write.mode("overwrite")
         .bucketBy(n_buckets, key_col).sortBy(key_col)
         .saveAsTable(staging))
        if cat.tableExists(table):
            spark.sql(f"ALTER TABLE {table} RENAME TO {backup}")
        try:
            spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
        except BaseException:
            if cat.tableExists(backup):
                spark.sql(f"ALTER TABLE {backup} RENAME TO {table}")
            raise
        spark.sql(f"DROP TABLE IF EXISTS {backup}")
    # only after the base is live: remove the folded delta partitions
    # (including any left by a crashed earlier retry); failures raise
    for t in tokens:
        if fsmeta.isdir(tok_dirs[t]):
            fsmeta.rmtree(tok_dirs[t])
    return tokens
