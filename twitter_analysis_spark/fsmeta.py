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

Every entry point refuses remote-store URIs loudly (see ``_local``):
the OS API answers ``s3://...`` with FileNotFoundError, which the
crash protocols upstream would misread as "no batches yet" /
"marker absent" — silent data hazards, where a typed refusal at the
seam is a config error caught on the first call.
"""

from __future__ import annotations

import os
import re
import shutil

#: Object-store schemes where the rename assumption is FALSE — the
#: protocols built on this module are unsound there, not merely
#: unimplemented, so the refusal message steers to a transactional
#: table format rather than to "mount it".
_OBJECT_STORE_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs",
     "oss", "cos", "swift"})

#: Two chars minimum: a single-letter "scheme" is a Windows drive
#: path (C:/data), which must pass through as a local path, not be
#: refused as a remote URI (standard URI-vs-drive disambiguation).
_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]+):(?=/)")


class UnsupportedFilesystemError(RuntimeError):
    """A remote-store URI reached the local-metadata seam."""


def _local(path: str) -> str:
    """Resolve ``path`` to an OS path, refusing remote URIs LOUDLY.

    ``os.listdir("s3://bucket/k")`` raises FileNotFoundError — a lie
    (the data exists; the local API just can't see it) that would read
    as "no batches yet" or "marker absent" to the crash protocols
    upstream. ``file:`` URIs (both the ``file:///p`` RFC form and
    Hadoop's ``file:/p``) are unwrapped to their OS path; every other
    scheme raises, with the message split by WHY it can't work:
    object stores lack the atomic rename the protocols require (use a
    transactional format), while rename-capable remote filesystems
    (hdfs:, dbfs:, ...) merely need this seam re-implemented over
    their client or the store mounted as a local path.
    """
    m = _SCHEME_RE.match(path)
    if m is None:
        return path
    scheme = m.group(1).lower()
    if scheme == "file":
        rest = path[m.end():]
        if rest.startswith("//"):
            # RFC 8089 authority: file://HOST/p names a path on HOST.
            # Only the local host (empty or "localhost") unwraps;
            # silently stripping a real host would turn file://nas/p
            # into the WRONG local path /nas/p — the exact
            # marker-misread hazard this guard exists to stop.
            auth, sep, tail = rest[2:].partition("/")
            if auth.lower() not in ("", "localhost"):
                raise UnsupportedFilesystemError(
                    f"fsmeta got the file: URI {path!r} naming a "
                    "remote host: a path on another host is not "
                    "reachable through the local OS API. Mount it "
                    "locally, or use an empty/localhost authority "
                    "for local paths.")
            if tail.startswith("/"):
                # A //-leading path: either the four-slash UNC
                # spelling (file:////HOST/p, RFC 8089 appendix — a
                # remote host hiding in an empty authority) or a
                # deliberate double slash, whose meaning POSIX leaves
                # implementation-defined. Neither resolves to a
                # well-defined local path.
                raise UnsupportedFilesystemError(
                    f"fsmeta got the file: URI {path!r} whose path "
                    "begins with '//': that is the UNC remote-host "
                    "spelling (not reachable through the local OS "
                    "API), and a literal leading '//' is "
                    "implementation-defined to POSIX. Use a single "
                    "leading slash for local paths.")
            rest = "/" + tail
        return rest or "/"
    if scheme in _OBJECT_STORE_SCHEMES:
        raise UnsupportedFilesystemError(
            f"fsmeta got the object-store URI {path!r}: '{scheme}:' "
            "has no atomic directory rename, so the crash-safe swap / "
            "marker protocols are unsound there no matter how this "
            "seam is implemented. Put the table behind a "
            "transactional format (Delta/Iceberg) instead.")
    raise UnsupportedFilesystemError(
        f"fsmeta got the remote URI {path!r}: this seam is "
        "implemented over the local OS API. Mount the store as a "
        "local path, or swap this module's implementation for one "
        f"backed by the '{scheme}:' filesystem client (the rename "
        "assumption itself holds on rename-capable remote FSes).")


def local_path(path: str) -> str:
    """PUBLIC scheme gate: resolve ``path`` to the OS path the local
    API will use, raising the typed refusal on remote-store URIs and
    unwrapping ``file:`` forms. For callers that hand the path to
    builtin ``open``/``os`` functions themselves (the streaming
    token/marker helpers) — routing through this is the EXPLICIT
    validation contract; relying on another fsmeta call's incidental
    raise would silently stop validating if this module's
    implementation were swapped for a remote-capable one."""
    return _local(path)


def listdir(path: str) -> list[str]:
    return os.listdir(_local(path))


def exists(path: str) -> bool:
    return os.path.exists(_local(path))


def isdir(path: str) -> bool:
    return os.path.isdir(_local(path))


def makedirs(path: str) -> None:
    os.makedirs(_local(path), exist_ok=True)


def rename(src: str, dst: str) -> None:
    """Atomic move (see the module docstring's POSIX/HDFS assumption);
    fails if ``dst`` exists and is a non-empty directory."""
    os.rename(_local(src), _local(dst))


def replace_file(src: str, dst: str) -> None:
    """Atomic FILE replace (``dst`` may exist) — the write-temp-then-
    replace step of every torn-write-safe small-file protocol here."""
    os.replace(_local(src), _local(dst))


def rmtree(path: str, ignore_errors: bool = False) -> None:
    shutil.rmtree(_local(path), ignore_errors=ignore_errors)


def touch(path: str) -> None:
    """Create an empty marker file (truncates if present — markers
    are content-free; their existence is the bit)."""
    open(_local(path), "w").close()


def walk(path: str):
    return os.walk(_local(path))


def getsize(path: str) -> int:
    return os.path.getsize(_local(path))
