"""The filesystem-metadata shim (fsmeta.py) and the contracts built
on it this round: every driver-side directory protocol routes through
the ONE module that states the local/HDFS rename assumption, the
streaming lineage token fails loudly on checkpoint path-resolution
divergence instead of stranding partitions, and the upsert winner is
deterministic under within-side duplicate keys."""

from __future__ import annotations

import os

import pytest

from twitter_analysis_spark import fsmeta


def test_fsmeta_primitives(tmp_path):
    root = str(tmp_path / "r")
    fsmeta.makedirs(root)
    fsmeta.makedirs(root)                      # exist_ok semantics
    assert fsmeta.isdir(root) and fsmeta.exists(root)
    fsmeta.touch(os.path.join(root, "m"))
    assert fsmeta.listdir(root) == ["m"]
    fsmeta.rename(root, str(tmp_path / "r2"))
    assert not fsmeta.exists(root)
    assert fsmeta.exists(str(tmp_path / "r2" / "m"))
    # replace_file overwrites an existing destination atomically
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for p, content in ((a, "new"), (b, "old")):
        with open(p, "w") as f:
            f.write(content)
    fsmeta.replace_file(a, b)
    with open(b) as f:
        assert f.read() == "new"
    fsmeta.rmtree(str(tmp_path / "r2"))
    assert not fsmeta.exists(str(tmp_path / "r2"))
    with pytest.raises(FileNotFoundError):
        fsmeta.rmtree(str(tmp_path / "nope"))  # loud by default
    fsmeta.rmtree(str(tmp_path / "nope"), ignore_errors=True)


def test_fsmeta_refuses_remote_uris_loudly(tmp_path):
    """An object-store or remote-FS URI reaching the local seam must
    raise the typed refusal — NOT FileNotFoundError, which the crash
    protocols upstream read as 'no batches yet' / 'marker absent'.
    ``file:`` URIs (RFC triple-slash and Hadoop single-slash forms)
    unwrap to their OS path instead. rmtree must refuse even with
    ignore_errors=True: that flag forgives missing paths, not a
    delete silently no-op'ing against a bucket that still holds the
    data."""
    for uri in ("s3://bucket/key", "s3a://b/k", "gs://b/k",
                "abfss://c@a.dfs.core.windows.net/k"):
        with pytest.raises(fsmeta.UnsupportedFilesystemError,
                           match="transactional format"):
            fsmeta.listdir(uri)
    for uri in ("hdfs://nn:8020/tmp/x", "dbfs:/mnt/x"):
        with pytest.raises(fsmeta.UnsupportedFilesystemError,
                           match="Mount the store"):
            fsmeta.exists(uri)
    with pytest.raises(fsmeta.UnsupportedFilesystemError):
        fsmeta.rmtree("s3://bucket/key", ignore_errors=True)
    with pytest.raises(fsmeta.UnsupportedFilesystemError):
        fsmeta.rename(str(tmp_path / "a"), "s3://bucket/b")
    # file: URIs unwrap — RFC triple-slash, Hadoop single-slash, and
    # the RFC-8089 localhost-authority form all name the same dir
    d = tmp_path / "sub"
    d.mkdir()
    fsmeta.touch(str(d / "m"))
    assert fsmeta.listdir(f"file://{d}") == ["m"]
    assert fsmeta.listdir(f"file:{d}") == ["m"]
    assert fsmeta.listdir(f"file://localhost{d}") == ["m"]
    assert fsmeta.listdir(f"file://LOCALHOST{d}") == ["m"]   # hosts are ci
    assert fsmeta.exists(f"file://{d}/m") and fsmeta.isdir(f"file:{d}")
    # a REMOTE host must refuse, not silently unwrap to the wrong
    # local path (/nas/data would read as "marker absent") — in the
    # plain-authority form, the four-slash UNC spelling, and the
    # //-leading-path form (each with its accurate diagnostic)
    with pytest.raises(fsmeta.UnsupportedFilesystemError,
                       match="remote host"):
        fsmeta.exists("file://nas/data/marker")
    for uri in ("file:////nas/data/marker", "file://localhost//mnt/x"):
        with pytest.raises(fsmeta.UnsupportedFilesystemError,
                           match="begins with"):
            fsmeta.exists(uri)
    # a plain relative path with a colon later on is NOT a scheme
    assert not fsmeta.exists(str(tmp_path / "x:y"))
    # a single-letter "scheme" is a Windows drive path — local, not
    # a remote URI (False here on POSIX, but no refusal)
    assert not fsmeta.exists("C:/Users/data")


def test_swap_in_routes_through_fsmeta(tmp_path, monkeypatch):
    """The crash-safe table swap must perform its renames through the
    shim — the seam a deploy on object storage swaps out. Pinned by
    counting fsmeta.rename calls during a live swap (2: aside + in)."""
    from twitter_analysis_spark.sources import maintenance

    calls: list[tuple[str, str]] = []
    real = fsmeta.rename

    def counting(src, dst):
        calls.append((src, dst))
        real(src, dst)

    monkeypatch.setattr(maintenance.fsmeta, "rename", counting)
    live, tmp = str(tmp_path / "live"), str(tmp_path / "tmp")
    for d in (live, tmp):
        os.makedirs(d)
        with open(os.path.join(d, "part"), "w") as f:
            f.write(d)
    maintenance._swap_in(tmp, live)
    assert len(calls) == 2
    with open(os.path.join(live, "part")) as f:
        assert f.read() == tmp                 # new table is live
    assert not any(e.startswith("live__old") for e in os.listdir(tmp_path))


def test_batch_token_refuses_unresolvable_checkpoint(tmp_path):
    """A live checkpoint whose metadata is missing or unparseable AT
    THE LITERAL PATH must fail the drain loudly — minting a one-off
    lineage would strand the drain's partitions where the real
    lineage's replay never overwrites them (the round-10 ADVICE
    finding). No checkpoint still mints a per-drain lineage."""
    import json

    from twitter_analysis_spark.streaming.ingest import _batch_token

    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    with pytest.raises(RuntimeError, match="metadata not found"):
        _batch_token(ckpt, 0, {})
    # unparseable metadata content = reading a DIFFERENT file than
    # Spark's (Spark wrote and read it fine) -> same loud refusal
    with open(os.path.join(ckpt, "metadata"), "w") as f:
        f.write("not json")
    with pytest.raises(RuntimeError, match="not Spark query metadata"):
        _batch_token(ckpt, 0, {})
    # the healthy path: lineage-scoped token, cached per drain
    with open(os.path.join(ckpt, "metadata"), "w") as f:
        json.dump({"id": "q-123"}, f)
    cache: dict = {}
    assert _batch_token(ckpt, 0, cache) == "q-123_0"
    assert _batch_token(ckpt, 7, cache) == "q-123_7"
    # no checkpoint: per-drain nockpt lineage (documented semantics)
    c2: dict = {}
    t = _batch_token(None, 0, c2)
    assert t.startswith("nockpt-") and t.endswith("_0")


def test_winner_per_key_deterministic_tiebreak(spark):
    """Duplicate keys WITHIN one side (the cross-partition-dup case
    full_rewrite=True heals) must resolve to the SAME winner every
    run — ordered by a stable row hash, not shuffle order. Pinned by
    merging a current side that holds two differing copies of one key
    under every shuffle-partition setting and asserting the survivor
    is identical."""
    from twitter_analysis_spark.sources.maintenance import _winner_per_key

    current = spark.createDataFrame(
        [(1, "copyA", "b1"), (1, "copyB", "b2"), (2, "only", "b1")],
        "k INT, payload STRING, _batch_id STRING")
    updates = spark.createDataFrame([], "k INT, payload STRING, _batch_id STRING")
    winners = []
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows = {r["k"]: (r["payload"], r["_batch_id"])
                    for r in _winner_per_key(current, updates, "k",
                                             None).collect()}
            winners.append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert winners[0] == winners[1] == winners[2]
    assert winners[0][2] == ("only", "b1")
    assert winners[0][1][0] in ("copyA", "copyB")   # exactly one survives


def test_rollup_markers_are_lineage_scoped(spark, tmp_path):
    """The rollup ingest's recompute-skip markers must carry the
    lineage-scoped token (not the bare numeric batch id) — the
    round-10 ADVICE finding: bare ids silently re-open the
    swallowed-batch-0 bug if marker storage is ever relocated."""
    import json as _json

    from twitter_analysis_spark.streaming.rollup_ingest import (
        streaming_rollup_ingest)

    drop = tmp_path / "drop"
    drop.mkdir()
    rows = [{"event_id": i, "ts": "2024-03-01T00:00:05",
             "user_id": 1, "event_type": "view", "value": 1.0}
            for i in range(4)]
    with open(drop / "a.jsonl", "w") as f:
        f.write("\n".join(_json.dumps(r) for r in rows))
    ckpt = str(tmp_path / "ckpt")
    streaming_rollup_ingest(
        spark, str(drop), str(tmp_path / "lake"),
        str(tmp_path / "idx"), str(tmp_path / "rollup"),
        checkpoint=ckpt)
    with open(os.path.join(ckpt, "metadata")) as f:
        lineage = str(_json.load(f)["id"])
    markers = os.listdir(os.path.join(ckpt, "__rollup_batches"))
    assert markers, "drain stamped no marker"
    assert all(m.startswith(f"batch_{lineage}_") for m in markers), markers


def test_batch_token_lenient_degrades_instead_of_failing(tmp_path, caplog):
    """Marker-only pipelines (rollup/alerts) degrade to
    markers-DISABLED (None; batches recompute idempotently) instead
    of failing the drain when the checkpoint path is unresolvable —
    not to a throwaway lineage, which would stamp never-matching
    marker files at the literal path forever. One warning per drain,
    not per batch; OSError on the metadata read degrades too; a
    resolvable path still yields the REAL lineage token."""
    import json
    import logging

    from twitter_analysis_spark.streaming.ingest import (
        _batch_token_lenient)

    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)                          # no metadata file
    cache: dict = {}
    with caplog.at_level(logging.WARNING):
        assert _batch_token_lenient(ckpt, 0, cache) is None
        assert _batch_token_lenient(ckpt, 1, cache) is None
    warns = [r for r in caplog.records if "markers are disabled" in r.message]
    assert len(warns) == 1                     # once per drain
    # OSError slice of the same hazard class (metadata is a DIR)
    os.makedirs(os.path.join(ckpt, "metadata"))
    assert _batch_token_lenient(ckpt, 0, {}) is None

    ckpt2 = str(tmp_path / "ckpt2")
    os.makedirs(ckpt2)
    with open(os.path.join(ckpt2, "metadata"), "w") as f:
        json.dump({"id": "q-7"}, f)
    assert _batch_token_lenient(ckpt2, 2, {}) == "q-7_2"


def test_streaming_entry_refuses_object_store_paths(spark, tmp_path):
    """Integration slice of the seam: a pipeline pointed at an
    object-store URI must die with the typed refusal SYNCHRONOUSLY
    at entry (before any stream start or benchmark job) — not
    wrapped in STREAM_FAILED from the first micro-batch, and never
    as a FileNotFoundError-shaped 'no batches yet' misread deep
    inside the crash protocols. Covers all three pipelines, the
    checkpoint argument, and the stale-layout ValueError (which must
    also surface synchronously)."""
    from twitter_analysis_spark.streaming.ingest import (
        streaming_ingest_decontaminate, streaming_ingest_dedup,
        streaming_ingest_neardup)

    drop = tmp_path / "drop"
    drop.mkdir()
    with open(drop / "a.jsonl", "w") as f:
        f.write('{"doc_id": 1, "text": "x"}\n')
    ok = dict(index_path=str(tmp_path / "idx"),
              checkpoint=str(tmp_path / "ckpt"))
    with pytest.raises(fsmeta.UnsupportedFilesystemError,
                       match="transactional format"):
        streaming_ingest_dedup(spark, str(drop),
                               corpus_path="s3://bucket/corpus", **ok)
    with pytest.raises(fsmeta.UnsupportedFilesystemError):
        streaming_ingest_dedup(spark, str(drop),
                               corpus_path=str(tmp_path / "c"),
                               index_path=str(tmp_path / "idx"),
                               checkpoint="s3://bucket/ckpt")
    with pytest.raises(fsmeta.UnsupportedFilesystemError):
        streaming_ingest_neardup(
            spark, str(drop), corpus_path=str(tmp_path / "c"),
            band_index_path="gs://bucket/bands",
            checkpoint=str(tmp_path / "ckpt2"))
    # decontaminate validates BEFORE building the benchmark filter —
    # a bad sink must not cost a benchmark job or strand its persist
    n_cached_before = len(
        spark.sparkContext._jsc.getPersistentRDDs())
    bench = spark.createDataFrame([(1, "benchmark text")],
                                  "doc_id LONG, text STRING")
    with pytest.raises(fsmeta.UnsupportedFilesystemError):
        streaming_ingest_decontaminate(
            spark, str(drop), bench,
            corpus_path="abfss://c@a.dfs.core.windows.net/corpus",
            quarantine_path=str(tmp_path / "q"),
            checkpoint=str(tmp_path / "ckpt3"))
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) \
        == n_cached_before
    # stale sink layout (flat parquet at the root) also raises at
    # entry, before the stream starts
    legacy = tmp_path / "legacy"
    legacy.mkdir()
    (legacy / "part-0000.parquet").touch()
    with pytest.raises(ValueError, match="one-time migration"):
        streaming_ingest_dedup(spark, str(drop),
                               corpus_path=str(legacy), **ok)
    # a file: URI checkpoint WORKS end-to-end: the token helper
    # resolves it through the scheme gate to the same local path
    # Spark uses, so the lineage read no longer dies as a wrapped
    # FileNotFoundError at batch 0
    streaming_ingest_dedup(
        spark, str(drop),
        corpus_path=str(tmp_path / "c2"),
        index_path=str(tmp_path / "idx2"),
        checkpoint=f"file://{tmp_path}/ckpt_uri")
    import os as _os
    assert _os.path.isdir(str(tmp_path / "ckpt_uri" / "__ingest_batches"))
    out = spark.read.parquet(str(tmp_path / "c2"))
    assert out.count() == 1
