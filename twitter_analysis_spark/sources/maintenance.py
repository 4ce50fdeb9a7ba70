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
  read-union-dedup-rewrite with a deterministic winner; the write goes
  through a temp dir so a crash mid-rewrite never truncates the table.
  At scale you'd scope the rewrite to affected partitions — the
  winner-selection semantics here are exactly what that merge runs
  per partition.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
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
    the process died between the two calls.
    """
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    had_existing = os.path.exists(path)
    if had_existing:
        os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        if had_existing:
            os.rename(old, path)
        raise
    if had_existing:
        shutil.rmtree(old)


def compact_parquet(spark: SparkSession, path: str,
                    target_file_mb: int = 128,
                    sort_within_by: list[str] | None = None,
                    partition_by: list[str] | None = None) -> int:
    """Rewrite ``path`` into ceil(bytes / target) files; returns the
    task count of the rewrite. ``sort_within_by`` clusters rows inside
    each file so min/max row-group stats prune reads on those columns.

    ``partition_by`` preserves a Hive-partitioned layout (e.g. the
    incremental lake's ``event_date=...`` directories): rows are
    shuffled BY the partition columns so each rewrite task holds whole
    partitions and writes one file per directory it owns — without it
    a plain rewrite of a partitioned table would flatten the layout
    and silently break downstream partition pruning
    (rollup.prune_to_dates). Appending writers leave one file
    generation per drain; steady state is "compact every N drains",
    and this is the call that does it."""
    n_files = max(1, math.ceil(_dir_bytes(path) / (target_file_mb << 20)))
    df = spark.read.parquet(path)
    if partition_by:
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
    _swap_in(tmp, path)
    return n_files


def upsert_by_key(spark: SparkSession, path: str, updates: DataFrame,
                  key: str, order_by: str | None = None) -> None:
    """Merge ``updates`` into the parquet table at ``path``: one row per
    ``key`` survives. Winner = highest ``order_by`` value (ties: the
    update); with no ``order_by``, updates simply replace existing rows
    with the same key."""
    if os.path.exists(path):
        current = spark.read.parquet(path).withColumn("_src", F.lit(0))
    else:
        current = updates.limit(0).withColumn("_src", F.lit(0))
    merged = current.unionByName(updates.withColumn("_src", F.lit(1)))
    if order_by:
        rank_cols = [F.desc(order_by), F.desc("_src")]
    else:
        rank_cols = [F.desc("_src")]
    from pyspark.sql import Window
    w = Window.partitionBy(key).orderBy(*rank_cols)
    winner = (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    tmp = f"{path}__upsert_{uuid.uuid4().hex[:8]}"
    winner.write.mode("overwrite").parquet(tmp)
    _swap_in(tmp, path)
