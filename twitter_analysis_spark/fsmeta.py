"""Filesystem-METADATA shim: the ONE place the engine touches
directory-level state outside Spark jobs.

Three subsystems keep small driver-side state next to their Spark
tables — the maintenance swap protocol (sources/maintenance.py:
``_swap_in`` and the Hive-layout walks), the streaming batch markers
and ``_batch_id`` layout checks (streaming/ingest.py), and the memo
root walk (plans/memo.py). All of their list/exists/rename/mkdir
calls route through this module so the environment assumption lives
in exactly one docstring:

ASSUMPTION (stated once, here): ``rename`` is an ATOMIC, instant
metadata operation. True on any POSIX filesystem, on HDFS, and on
DBFS-backed local mounts — which is what the sandbox and any
local/HDFS deploy give you. OBJECT STORES (S3/GCS/ABFS) have no
atomic directory rename: a "rename" is a copy-then-delete that can
be observed half-done, so every protocol built on this module — the
crash-safe table swap, the marker-commits-last batch contract, the
torn-ledger quarantine — is local/HDFS-shaped AS WRITTEN. At deploy
scale on object storage, either back these paths with a rename-capable
layer, or (the steer every affected docstring already gives) put the
tables behind a transactional format (Delta/Iceberg) whose commit
protocol replaces the rename-based one entirely; this shim is the
single seam to swap in such an implementation.

Scope is deliberately metadata-only: parquet/json data reads and
writes go through Spark (whose Hadoop FS layer handles remote
stores); tiny driver-side FILE content I/O (the memo ledger, the
checkpoint metadata read) stays with builtin ``open`` — content I/O
is not where the atomicity assumption bites.
"""

from __future__ import annotations

import os
import shutil


def listdir(path: str) -> list[str]:
    return os.listdir(path)


def exists(path: str) -> bool:
    return os.path.exists(path)


def isdir(path: str) -> bool:
    return os.path.isdir(path)


def makedirs(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def rename(src: str, dst: str) -> None:
    """Atomic move (see the module docstring's POSIX/HDFS assumption);
    fails if ``dst`` exists and is a non-empty directory."""
    os.rename(src, dst)


def replace_file(src: str, dst: str) -> None:
    """Atomic FILE replace (``dst`` may exist) — the write-temp-then-
    replace step of every torn-write-safe small-file protocol here."""
    os.replace(src, dst)


def rmtree(path: str, ignore_errors: bool = False) -> None:
    shutil.rmtree(path, ignore_errors=ignore_errors)


def touch(path: str) -> None:
    """Create an empty marker file (truncates if present — markers
    are content-free; their existence is the bit)."""
    open(path, "w").close()


def walk(path: str):
    return os.walk(path)


def getsize(path: str) -> int:
    return os.path.getsize(path)
