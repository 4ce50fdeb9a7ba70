"""Memo layer (K1-K6) behavior tests."""

from __future__ import annotations

import time

from twitter_analysis_spark.plans.memo import QueryMemo, fingerprint


def _builder_factory(spark, calls, n=5):
    def build():
        calls.append(1)
        return spark.range(n)
    return build


def test_fingerprint_canonical():
    assert fingerprint({"a": 1, "b": [2, 3]}) == fingerprint({"b": [2, 3], "a": 1})
    assert fingerprint({"a": 1}) != fingerprint({"a": 2})


def test_hit_skips_recompute(spark, tmp_path):
    memo = QueryMemo(spark, str(tmp_path / "memo"))
    calls: list = []
    b = _builder_factory(spark, calls)
    assert memo.get_or_compute({"q": 1}, b).count() == 5
    assert memo.get_or_compute({"q": 1}, b).count() == 5
    assert len(calls) == 1                       # K1 memoization


def test_lru_eviction(spark, tmp_path):
    memo = QueryMemo(spark, str(tmp_path / "memo"), max_entries=2)
    calls: list = []
    for i in range(3):
        memo.get_or_compute({"q": i}, _builder_factory(spark, calls))
        time.sleep(0.01)
    assert memo.stats()["entries"] == 2          # K6 bound
    memo.get_or_compute({"q": 0}, _builder_factory(spark, calls))
    assert len(calls) == 4                       # q=0 was evicted (oldest)


def test_ttl_expiry(spark, tmp_path):
    memo = QueryMemo(spark, str(tmp_path / "memo"), ttl_seconds=0.05)
    calls: list = []
    memo.get_or_compute({"q": 1}, _builder_factory(spark, calls))
    time.sleep(0.1)
    memo.get_or_compute({"q": 1}, _builder_factory(spark, calls))
    assert len(calls) == 2                       # K2 TTL recompute


def test_restore_on_boot(spark, tmp_path):
    root = str(tmp_path / "memo")
    calls: list = []
    QueryMemo(spark, root).get_or_compute({"q": 9}, _builder_factory(spark, calls))
    memo2 = QueryMemo(spark, root)               # K5 restore
    assert memo2.lookup({"q": 9}) is not None
    assert len(calls) == 1


def test_warm(spark, tmp_path, twitter_fixture):
    from twitter_analysis_spark.operators import search
    memo = QueryMemo(spark, str(tmp_path / "memo"))
    tweets_df = twitter_fixture["tweets_df"]
    kw_df = search.top_keywords(tweets_df, k=3)
    kws = memo.warm(kw_df, lambda kw: search.search_tweets(
        tweets_df, keyword=kw, limit=50), k=3)
    assert len(kws) == 3 and memo.stats()["entries"] == 3   # K4
    for kw in kws:
        assert memo.lookup({"entity": "tweet", "keyword": kw}) is not None


def test_torn_ledger_and_orphan_dirs_recover_on_boot(spark, tmp_path):
    """Crash-window contracts for the memo's bookkeeping: (a) a torn
    ledger write (truncated JSON) must restore as an EMPTY memo, not
    raise at construction; (b) a result dir leaked by a crash between
    materialize and persist (its params unrecoverable, so it can
    never be hit) is swept at boot — but ONLY dirs named like the
    fingerprints this class creates (32-hex), so pointing root at a
    directory holding foreign data never deletes it; (c) when the
    ledger itself is the corrupt artifact, the sweep is SKIPPED —
    every result dir would look unowned, and deleting all still-valid
    results over a torn 2 KB JSON is the wrong trade; (d) the persist
    path is an atomic replace, so no .tmp generation survives."""
    import os

    root = str(tmp_path / "memo")
    calls: list = []
    memo = QueryMemo(spark, root)
    memo.get_or_compute({"q": 1}, _builder_factory(spark, calls))
    assert not os.path.exists(os.path.join(root, "ledger.json.tmp"))

    # orphan: a fingerprint-shaped dir the ledger doesn't know about
    # is swept; a FOREIGN dir (name not 32-hex) is never touched
    orphan = os.path.join(root, "deadbeef" * 4)
    foreign = os.path.join(root, "precious_user_data")
    os.makedirs(orphan)
    os.makedirs(foreign)
    with open(os.path.join(foreign, "keep.txt"), "w") as f:
        f.write("do not delete")
    memo2 = QueryMemo(spark, root)
    assert not os.path.exists(orphan)
    assert os.path.exists(os.path.join(foreign, "keep.txt"))
    assert memo2.lookup({"q": 1}) is not None    # real entry survives

    # torn ledger: truncated JSON -> empty restore, no raise — and NO
    # sweep: the still-valid result dir is preserved on disk (it is
    # unreachable until recomputed over, which overwrites in place).
    # The corrupt bytes are QUARANTINED to ledger.json.corrupt for
    # operator inspection; the deletion of orphaned result dirs is
    # thereby deferred one boot, not avoided (docstring contract).
    fp = fingerprint({"q": 1})
    with open(os.path.join(root, "ledger.json"), "w") as f:
        f.write('{"trunc')
    memo3 = QueryMemo(spark, root)
    assert memo3.stats()["entries"] == 0
    assert memo3.lookup({"q": 1}) is None
    assert os.path.isdir(os.path.join(root, fp))
    assert not os.path.exists(os.path.join(root, "ledger.json"))
    with open(os.path.join(root, "ledger.json.corrupt")) as f:
        assert f.read() == '{"trunc'             # bytes preserved
    # recompute over the preserved dir converges back to a clean memo
    memo3.get_or_compute({"q": 1}, _builder_factory(spark, calls))
    assert memo3.lookup({"q": 1}).count() == 5
    assert os.path.exists(os.path.join(foreign, "keep.txt"))
    # the boot AFTER the rebuild sweeps dirs the fresh ledger does not
    # own — the documented one-boot deferral running to completion
    orphan2 = os.path.join(root, "cafebabe" * 4)
    os.makedirs(orphan2)
    QueryMemo(spark, root)
    assert not os.path.exists(orphan2)
    # a second quarantine replaces the first (no .corrupt pile-up)
    with open(os.path.join(root, "ledger.json"), "w") as f:
        f.write('[also bad')
    QueryMemo(spark, root)
    with open(os.path.join(root, "ledger.json.corrupt")) as f:
        assert f.read() == '[also bad'
