"""Shared test-side utilities (plain module, imported like parity.py —
conftest.py is for fixtures, not importable helpers)."""

from __future__ import annotations

def collect_with_cleanup(fn, *args, **kw):
    """Call an operator that persists internal frames behind a
    ``cleanup`` list (ngram_jaccard_pairs, minhash_lsh_pairs, ...),
    collect its result, and ALWAYS release the persisted frames —
    tests share one session-scoped Spark, so the operators' documented
    no-cleanup cache accumulation is not acceptable here. try/finally:
    a raising collect() must not strand the caches either."""
    cl: list = []
    try:
        return fn(*args, cleanup=cl, **kw).collect()
    finally:
        for f in cl:
            f.unpersist()
