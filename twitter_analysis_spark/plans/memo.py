"""Query-result memoization layer (K1-K6, SURVEY.md §2.11).

The reference's signature component: an LRU OrderedDict per entity
class with TTL, write-through persistence into MongoDB, restore-on-boot
and warm-up with the corpus' top keywords (cache.py:49-125,220-254).

Engine redesign (the sane version of cache.py's semantics, per
SURVEY.md §7): results live as Parquet under a memo root, keyed by a
fingerprint of the *normalized query parameters*; a tiny JSON ledger
holds the LRU/TTL bookkeeping. Differences from the reference, on
purpose:
- no caching of misses under a None key (cache.py:119-124 caches and
  immediately evicts even on nonsense inputs);
- eviction only on insert, not on every lookup;
- TTL is a real parameter instead of hardcoded ``inf``.

The ledger is driver-side metadata (a few KB); results themselves are
distributed Parquet — at 100 TB the memo root sits on object storage
and the ledger in any small KV/metastore. ``spark.catalog`` caching of
hot entries stays orthogonal.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .. import fsmeta


def fingerprint(params: dict) -> str:
    """K1 key: md5 of the canonicalized parameter dict (sorted keys,
    normalized lists) — the engine analogue of the reference's
    positional cache keys (cache.py:92-102)."""
    canon = json.dumps(params, sort_keys=True, default=str,
                       separators=(",", ":"))
    return hashlib.md5(canon.encode()).hexdigest()


class QueryMemo:
    """Materialized-result memo with LRU + TTL bookkeeping."""

    def __init__(self, spark: SparkSession, root: str,
                 max_entries: int = 100, ttl_seconds: float = float("inf")):
        self.spark = spark
        self.root = root
        self.max_entries = max_entries          # K6 (cache.py:49,252)
        self.ttl_seconds = ttl_seconds          # K2 (cache.py:55,87-90)
        fsmeta.makedirs(root)
        self._ledger_path = os.path.join(root, "ledger.json")
        self._ledger: dict[str, dict] = {}
        self._restore()                         # K5 (cache.py:62-67)

    # -- persistence ----------------------------------------------------
    def _restore(self) -> None:
        """K5 restore-on-boot, crash-tolerant: a torn ledger write must
        not take the whole memo down (the ledger is bookkeeping; the
        results are the data), so an unparseable ledger restores as
        empty. Result dirs the ledger does not know about — leaked by
        a crash between materialize and persist — are swept here:
        their params are unrecoverable, so they could never be hit
        again and would otherwise leak forever. (Single-owner
        assumption as documented above: the sweep would race a
        concurrent writer's in-flight dir.)

        The sweep is deliberately narrow: it only touches directories
        whose name is a 32-hex md5 fingerprint (the only names this
        class ever creates), so pointing ``root`` at a directory that
        already holds other data cannot delete it. And when the ledger
        EXISTS but fails to parse (torn write), the sweep is skipped
        entirely — with the bookkeeping gone every result dir would
        look unowned, and rm-rf'ing all still-valid cached results on
        the strength of a corrupt 2 KB JSON is the wrong trade. Those
        dirs are unreachable until recomputed over (same fingerprint
        → overwritten in place), so the leak is bounded and converges.
        The corrupt ledger itself is QUARANTINED (renamed to
        ``ledger.json.corrupt``, replacing any earlier quarantine) so
        operators can inspect or hand-repair it — and so its bytes
        survive the rebuild: the memo restarts empty, the next
        ``_persist`` writes a fresh authoritative ledger, and the boot
        AFTER that sweeps the now-unowned result dirs. The skip
        therefore DEFERS the deletion of the orphaned results by one
        boot rather than avoiding it — deliberate: what it protects
        against is deleting on the strength of a torn read, not
        keeping unreachable parquet forever."""
        ledger_corrupt = False
        if fsmeta.exists(self._ledger_path):
            try:
                with open(self._ledger_path) as f:
                    self._ledger = json.load(f)
            except ValueError:
                self._ledger = {}
                ledger_corrupt = True
        if ledger_corrupt:
            fsmeta.replace_file(self._ledger_path,
                                self._ledger_path + ".corrupt")
            return
        for entry in fsmeta.listdir(self.root):
            p = os.path.join(self.root, entry)
            if (fsmeta.isdir(p) and entry not in self._ledger
                    and re.fullmatch(r"[0-9a-f]{32}", entry)):
                fsmeta.rmtree(p, ignore_errors=True)

    def _persist(self) -> None:                 # K3 (cache.py:125)
        # atomic replace: the same no-torn-state discipline as
        # sources.maintenance._swap_in — a crash mid-write must leave
        # the previous ledger generation readable, never a truncated
        # JSON that breaks restore-on-boot.
        tmp = f"{self._ledger_path}.tmp"
        with open(tmp, "w") as f:
            json.dump(self._ledger, f)
        fsmeta.replace_file(tmp, self._ledger_path)

    # -- core -----------------------------------------------------------
    def _path(self, fp: str) -> str:
        return os.path.join(self.root, fp)

    def lookup(self, params: dict) -> DataFrame | None:
        """Cache hit → DataFrame over the materialized Parquet; touches
        LRU recency (cache.py:88 move_to_end)."""
        fp = fingerprint(params)
        entry = self._ledger.get(fp)
        if entry is None:
            return None
        if time.time() - entry["created"] > self.ttl_seconds:
            self.evict(fp)
            return None
        entry["last_used"] = time.time()
        self._persist()
        return self.spark.read.parquet(self._path(fp))

    def get_or_compute(self, params: dict,
                       builder: Callable[[], DataFrame]) -> DataFrame:
        """The search_cache flow (cache.py:82-125): hit → memoized
        result; miss → run the builder, materialize, insert with LRU
        eviction, write-through persist."""
        cached = self.lookup(params)
        if cached is not None:
            return cached
        df = builder()
        fp = fingerprint(params)
        df.write.mode("overwrite").parquet(self._path(fp))
        now = time.time()
        self._ledger[fp] = {"params": params, "created": now,
                            "last_used": now}
        while len(self._ledger) > self.max_entries:   # K1 eviction
            oldest = min(self._ledger, key=lambda k: self._ledger[k]["last_used"])
            self.evict(oldest)
        self._persist()
        return self.spark.read.parquet(self._path(fp))

    def evict(self, fp: str) -> None:
        self._ledger.pop(fp, None)
        fsmeta.rmtree(self._path(fp), ignore_errors=True)
        self._persist()

    def warm(self, keyword_df: DataFrame,
             builder: Callable[[str], DataFrame], k: int = 10) -> list[str]:
        """K4 warm-up (cache.py:220-254): take the top-k corpus
        keywords (an A2 result DataFrame with columns tok/cnt) and
        materialize one search per keyword."""
        kws = [r["tok"] for r in keyword_df.limit(k).collect()]
        for kw in kws:
            self.get_or_compute({"entity": "tweet", "keyword": kw},
                                lambda kw=kw: builder(kw))
        return kws

    def stats(self) -> dict:
        return {"entries": len(self._ledger),
                "max_entries": self.max_entries}
