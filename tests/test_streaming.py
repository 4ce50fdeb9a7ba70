"""Structured Streaming: windowed keyword counts over a drop dir must
agree with the equivalent batch aggregation over the same files."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from twitter_analysis_spark.functions.dates import parse_twitter_ts
from twitter_analysis_spark.functions.text import extract_keywords_col
from twitter_analysis_spark.sources.io import load_table
from twitter_analysis_spark.sources.tweets_raw import read_raw_stream
from twitter_analysis_spark.streaming import streaming_keyword_counts
from twitter_analysis_spark.streaming.keyword_counts import run_available_now


def test_stream_equals_batch(spark, twitter_fixture, tmp_path):
    # split the capture into two "arriving" files
    drop = tmp_path / "drop"
    drop.mkdir()
    with open(twitter_fixture["raw_path"]) as f:
        lines = f.read().splitlines()
    half = len(lines) // 2
    (drop / "part1.jsonl").write_text("\n".join(lines[:half]) + "\n")
    (drop / "part2.jsonl").write_text("\n".join(lines[half:]) + "\n")

    result = streaming_keyword_counts(spark, str(drop), window="60 minutes")
    q = run_available_now(result, "kw_test")
    got = spark.sql(
        "SELECT tok, sum(cnt) AS cnt FROM kw_test GROUP BY tok")

    batch = (
        read_raw_stream(spark, str(drop))
        .select(parse_twitter_ts(F.col("created_at")).alias("ts"),
                F.explode(extract_keywords_col(F.col("text"))).alias("tok"))
        .where(F.col("ts").isNotNull())
        .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    )
    got_map = {r["tok"]: r["cnt"] for r in got.collect()}
    batch_map = {r["tok"]: r["cnt"] for r in batch.collect()}
    assert got_map == batch_map
    q.stop()


def test_windows_are_aligned(spark, twitter_fixture, tmp_path):
    drop = tmp_path / "drop2"
    drop.mkdir()
    shutil.copy(twitter_fixture["raw_path"], os.path.join(drop, "all.jsonl"))
    result = streaming_keyword_counts(spark, str(drop), window="10 minutes")
    q = run_available_now(result, "kw_win")
    rows = spark.sql("SELECT DISTINCT window_start, window_end FROM kw_win").collect()
    assert rows, "stream produced no windows"
    for r in rows:
        delta = r["window_end"] - r["window_start"]
        assert delta.total_seconds() == 600
        assert r["window_start"].minute % 10 == 0
    q.stop()


def _events_dropdir(spark, tmp_path, n_users=20):
    """Write a slice of the sf0.001 events table as JSON drop files."""
    drop = tmp_path / "events_drop"
    drop.mkdir()
    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id") < n_users)
        .select("event_id", F.date_format(
            "ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"), "user_id")
    )
    rows = ev.collect()
    half = len(rows) // 2
    import json
    for name, chunk in (("a.jsonl", rows[:half]), ("b.jsonl", rows[half:])):
        with open(drop / name, "w") as f:
            for r in chunk:
                f.write(json.dumps({"event_id": r["event_id"], "ts": r["ts"],
                                    "user_id": r["user_id"]}) + "\n")
    return str(drop), ev.count()


def test_streaming_sessions_builtin_matches_batch(spark, tmp_path):
    from twitter_analysis_spark.streaming import sessionize as S

    drop, n_events = _events_dropdir(spark, tmp_path)
    out = S.streaming_sessions(S.read_event_stream(spark, drop),
                               gap="30 minutes")
    q = (out.writeStream.format("memory").queryName("sess_b")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT * FROM sess_b")

    # batch truth: lag-gap sessionization over the same events
    batch = (
        spark.read.json(drop, schema=S.EVENT_SCHEMA)
        .selectExpr("user_id", "ts", "event_id")
    )
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    sess = (
        batch.withColumn("prev", F.lag("ts").over(w))
        .withColumn("new_s", F.when(
            F.col("prev").isNull()
            | ((F.unix_micros("ts") - F.unix_micros("prev")) > gap_us), 1)
            .otherwise(0))
        .withColumn("sid", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("event_id").alias("first_event_id"))
    )
    # append mode only emits watermark-finalized sessions: every emitted
    # session must exist in the batch truth with identical composition.
    got_rows = {(r["user_id"], r["first_event_id"]): r["n_events"]
                for r in got.collect()}
    truth = {(r["user_id"], r["first_event_id"]): r["n_events"]
             for r in sess.collect()}
    assert got_rows, "no sessions finalized by the stream"
    for key, n in got_rows.items():
        assert truth.get(key) == n, (key, n, truth.get(key))
    q.stop()


def test_streaming_sessions_custom_stateful(spark, tmp_path):
    from twitter_analysis_spark.streaming import sessionize as S

    drop, _ = _events_dropdir(spark, tmp_path)
    out = S.streaming_sessions_custom(S.read_event_stream(spark, drop))
    q = (out.writeStream.format("memory").queryName("sess_c")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT * FROM sess_c").collect()
    assert got, "custom stateful sessionizer emitted nothing"
    for r in got:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
        assert r["last_event_id"] >= 0
    # emitted (user, first_event) pairs must agree with the builtin's
    # finalized sessions on event counts
    builtin = {(r["user_id"], r["first_event_id"]): r["n_events"]
               for r in spark.sql("SELECT * FROM sess_b").collect()} \
        if "sess_b" in [t.name for t in spark.catalog.listTables()] else {}
    for r in got:
        key = (r["user_id"], r["first_event_id"])
        if key in builtin:
            assert builtin[key] == r["n_events"]
    q.stop()


def test_streaming_dedup(spark, tmp_path):
    from twitter_analysis_spark.streaming import sessionize as S
    import json as _json

    drop = tmp_path / "dup_drop"
    drop.mkdir()
    rows = [{"event_id": i, "ts": f"2024-01-01T00:{i:02d}:00.000Z",
             "user_id": 1} for i in range(10)]
    # replay simulation: 6 keys re-delivered, half with a perturbed
    # timestamp — key-only dedup (dropDuplicatesWithinWatermark) must
    # suppress them all; the old [key, ts] dedup missed the perturbed ones
    replay = [dict(r) for r in rows[:6]]
    for r in replay[:3]:
        r["ts"] = r["ts"].replace(":00.000Z", ":07.000Z")
    (drop / "a.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows) + "\n")
    (drop / "b.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in replay) + "\n")

    out = S.streaming_dedup(S.read_event_stream(spark, str(drop)))
    q = (out.writeStream.format("memory").queryName("dedup_s")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT event_id, ts FROM dedup_s").collect()
    assert len(got) == 10                      # all replayed rows suppressed
    assert len({r["event_id"] for r in got}) == 10
    q.stop()


def test_streaming_cache_refresh(spark, twitter_fixture, tmp_path):
    import shutil as _sh

    from twitter_analysis_spark.operators import search
    from twitter_analysis_spark.plans.memo import QueryMemo
    from twitter_analysis_spark.streaming.refresh import streaming_cache_refresh

    drop = tmp_path / "refresh_drop"
    drop.mkdir()
    _sh.copy(twitter_fixture["raw_path"], str(drop / "capture.jsonl"))

    memo = QueryMemo(spark, str(tmp_path / "memo_root"))
    tweets_df = twitter_fixture["tweets_df"]
    q = streaming_cache_refresh(
        spark, str(drop), memo,
        lambda kw: search.search_tweets(tweets_df, keyword=kw, limit=50),
        k=3)
    q.stop()
    assert memo.stats()["entries"] == 3
    # warmed entries are hits through the normal lookup path
    hits = [memo.lookup({"entity": "tweet", "keyword": kw})
            for kw in [e["params"]["keyword"]
                       for e in memo._ledger.values()]]
    assert all(h is not None for h in hits)


def test_stream_stream_attribution_join(spark, tmp_path):
    """Watermarked interval self-join: stream results == batch truth."""
    import json as _json

    from twitter_analysis_spark.streaming import joins as SJ

    drop = tmp_path / "typed_drop"
    drop.mkdir()
    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .where(F.col("user_id") < 40)
        .select("event_id", F.date_format(
            "ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
            "user_id", "event_type", "value")
    )
    rows = [r.asDict() for r in ev.collect()]
    half = len(rows) // 2
    for name, chunk in (("a.jsonl", rows[:half]), ("b.jsonl", rows[half:])):
        with open(drop / name, "w") as f:
            for r in chunk:
                f.write(_json.dumps(r) + "\n")

    out = SJ.attribution_join(
        SJ.read_typed_event_stream(spark, str(drop)), horizon="12 hours")
    q = (out.writeStream.format("memory").queryName("attr_j")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["cause_event_id"], r["effect_event_id"])
           for r in spark.sql("SELECT * FROM attr_j").collect()}

    batch = spark.read.json(str(drop), schema=SJ.TYPED_EVENT_SCHEMA)
    v = batch.where(F.col("event_type") == "view") \
        .select(F.col("event_id").alias("v_id"), F.col("ts").alias("v_ts"),
                "user_id")
    c = batch.where(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts"),
                F.col("user_id").alias("c_uid"))
    truth = {(r["v_id"], r["c_id"]) for r in v.join(
        c, (v["user_id"] == c["c_uid"]) & (c["c_ts"] >= v["v_ts"])
        & (c["c_ts"] <= v["v_ts"] + F.expr("INTERVAL 12 hours")),
        "inner").collect()}
    assert truth, "fixture produced no view->click pairs"
    assert got == truth
    q.stop()


def test_streaming_ingest_dedup(spark, tmp_path):
    """Two drained drops: duplicates within a drop, across drops, and
    against the growing corpus are all suppressed; the final corpus +
    index equal a from-scratch batch build over the unique texts."""
    import json
    import os

    from twitter_analysis_spark.streaming.ingest import streaming_ingest_dedup
    from twitter_analysis_spark.operators.dedup import content_index

    drop = tmp_path / "ingest_drop"
    drop.mkdir()
    corpus = str(tmp_path / "ingest_corpus")
    index = str(tmp_path / "ingest_index")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    write_drop("d1.json", [(1, "alpha"), (2, "alpha"), (3, "beta")])
    streaming_ingest_dedup(spark, str(drop), corpus, index,
                           checkpoint=str(tmp_path / "ckpt"))
    got1 = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(corpus).collect()}
    assert got1 == {1: "alpha", 3: "beta"}

    # second drop: dup-of-corpus (alpha), new (gamma), in-drop dup pair
    write_drop("d2.json", [(10, "alpha"), (11, "gamma"), (12, "gamma")])
    streaming_ingest_dedup(spark, str(drop), corpus, index,
                           checkpoint=str(tmp_path / "ckpt"))
    got2 = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(corpus).collect()}
    assert got2 == {1: "alpha", 3: "beta", 11: "gamma"}

    # index equals a from-scratch build over the final corpus
    # (modulo the _batch_id layout column of the replace-by-batch sink)
    built = content_index(spark.read.parquet(corpus), "doc_id", "text")
    assert sorted(map(tuple, spark.read.parquet(index)
                      .select("content_key", "holder_id").collect())) == \
        sorted(map(tuple, built.collect()))

    # crash-recovery guard: marker files exist, re-drain is a no-op
    markers = os.listdir(str(tmp_path / "ckpt" / "__ingest_batches"))
    assert markers
    streaming_ingest_dedup(spark, str(drop), corpus, index,
                           checkpoint=str(tmp_path / "ckpt"))
    assert {r["doc_id"] for r in spark.read.parquet(corpus).collect()} == \
        {1, 3, 11}


def test_streaming_ingest_neardup(spark, tmp_path):
    """Near-duplicate ingestion: exact copies AND high-Jaccard
    variants are suppressed within a drop, across drops, and against
    the corpus; genuinely novel texts land. The band index stays
    bands-rows-per-corpus-doc."""
    import json

    from twitter_analysis_spark.streaming.ingest import (
        streaming_ingest_neardup)

    drop = tmp_path / "nd_drop"
    drop.mkdir()
    corpus = str(tmp_path / "nd_corpus")
    index = str(tmp_path / "nd_index")

    base = ("the quick brown fox jumps over the lazy dog "
            "while the cat sleeps by the warm fire every evening")
    near = base.replace("warm fire", "cozy stove")   # high-Jaccard variant
    novel = ("completely different subject matter about spark "
             "physical plans shuffles partitions and codegen stages")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    # in-drop: 2 is an exact dup of 1, 3 a near-dup of 1, 4 novel
    # bands=16 (r=2): recall for the J=0.62 planted variant is
    # 1-(1-J^2)^16 > 0.999 — the default 8x4 banding is tuned for
    # J>=0.7 and would miss it half the time.
    kw = dict(num_hashes=32, bands=16, threshold=0.5)
    write_drop("d1.json", [(1, base), (2, base), (3, near), (4, novel)])
    streaming_ingest_neardup(spark, str(drop), corpus, index,
                             checkpoint=str(tmp_path / "nd_ckpt"), **kw)
    got1 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got1 == {1, 4}

    # across drops: 10 near-dups the corpus, 11 is new
    write_drop("d2.json", [(10, base.replace("lazy", "idle")),
                           (11, "unrelated short text entirely its own")])
    streaming_ingest_neardup(spark, str(drop), corpus, index,
                             checkpoint=str(tmp_path / "nd_ckpt"), **kw)
    got2 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got2 == {1, 4, 11}

    # band index: `bands` rows per surviving corpus doc, plus the
    # one id-keyed sentinel (the replay identity anchor)
    idx = spark.read.parquet(index)
    per_doc = {r["doc"]: r["n"] for r in
               idx.groupBy("doc").count().withColumnRenamed(
                   "count", "n").collect()}
    assert per_doc == {1: 17, 4: 17, 11: 17}
    assert idx.where("band = -1").count() == 3

    # re-drain is a no-op (markers)
    streaming_ingest_neardup(spark, str(drop), corpus, index,
                             checkpoint=str(tmp_path / "nd_ckpt"), **kw)
    assert {r["doc_id"] for r in
            spark.read.parquet(corpus).collect()} == {1, 4, 11}


def test_streaming_rollup_ingest(spark, tmp_path):
    """Streamed rollup maintenance: after each drain the stored rollup
    equals a from-scratch batch rollup of the (deduped) lake; replayed
    events never double-count; re-drain is a no-op."""
    import json

    from twitter_analysis_spark.operators.rollup import rollup
    from twitter_analysis_spark.streaming.rollup_ingest import (
        streaming_rollup_ingest)

    drop = tmp_path / "ev_drop"
    drop.mkdir()
    lake = str(tmp_path / "ev_lake")
    index = str(tmp_path / "ev_index")
    roll = str(tmp_path / "ev_rollup")
    ckpt = str(tmp_path / "ev_ckpt")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for eid, ts, etype, val in rows:
                f.write(json.dumps({
                    "event_id": eid, "ts": ts, "user_id": eid % 5,
                    "event_type": etype, "value": val}) + "\n")

    def stored():
        df = spark.read.parquet(roll)
        return sorted(
            (str(r["bucket_ts"]), r["event_type"], r["n_events"],
             str(r["sum_value_dec"]))
            for r in df.collect())

    def batch_truth():
        lk = spark.read.parquet(lake).dropDuplicates(["event_id"])
        return sorted(
            (str(r["bucket_ts"]), r["event_type"], r["n_events"],
             str(r["sum_value_dec"]))
            for r in rollup(lk, "hour").collect())

    write_drop("d1.json", [
        (1, "2024-03-01 10:05:00", "click", 1.5),
        (2, "2024-03-01 10:55:00", "click", 2.0),
        (3, "2024-03-01 11:05:00", "view", 4.0),
        (4, "2024-03-02 09:00:00", "click", 8.0),
    ])
    streaming_rollup_ingest(spark, str(drop), lake, index, roll,
                            grain="hour", checkpoint=ckpt)
    assert stored() == batch_truth()
    first = stored()
    # 10:00 bucket merged the two clicks
    assert ("2024-03-01 10:00:00", "click", 2, "3.50") in first

    # Second drop: late data for an EXISTING hour, a replayed event_id
    # (7 carries the same id-space as nothing; 2 is a true replay), and
    # a brand-new date.
    write_drop("d2.json", [
        (2, "2024-03-01 10:55:00", "click", 2.0),   # replayed id
        (7, "2024-03-01 10:20:00", "click", 10.0),  # late arrival
        (8, "2024-03-05 00:30:00", "error", 1.0),   # new date
    ])
    streaming_rollup_ingest(spark, str(drop), lake, index, roll,
                            grain="hour", checkpoint=ckpt)
    got = stored()
    assert got == batch_truth()
    assert ("2024-03-01 10:00:00", "click", 3, "13.50") in got
    assert ("2024-03-05 00:00:00", "error", 1, "1.00") in got
    # untouched date survived the partial refresh
    assert ("2024-03-02 09:00:00", "click", 1, "8.00") in got

    # re-drain: markers make it a no-op
    streaming_rollup_ingest(spark, str(drop), lake, index, roll,
                            grain="hour", checkpoint=ckpt)
    assert stored() == got


def test_streaming_rollup_index_contact_is_date_scoped(spark, tmp_path):
    """The dedup index must be event_date-partitioned so the per-batch
    anti-join reads only the touched dates' partitions — a flat
    id-only index makes index contact corpus-proportional, the exact
    cost the pipeline's docstring promises away. Pin the layout AND
    that a drain touching only a new date leaves the old date's index
    partition byte-identical (names, sizes, mtimes) — i.e. provably
    not rewritten. The replay guard must still fire through the
    pruned read (same id, same ts, redelivered)."""
    import json

    from twitter_analysis_spark.streaming.rollup_ingest import (
        streaming_rollup_ingest)

    drop = tmp_path / "ix_drop"
    drop.mkdir()
    lake = str(tmp_path / "ix_lake")
    index = str(tmp_path / "ix_index")
    roll = str(tmp_path / "ix_rollup")
    ckpt = str(tmp_path / "ix_ckpt")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for eid, ts in rows:
                f.write(json.dumps({
                    "event_id": eid, "ts": ts, "user_id": eid % 5,
                    "event_type": "click", "value": 1.0}) + "\n")

    def part_state(day):
        pdir = os.path.join(index, f"event_date={day}")
        return {(f, os.path.getsize(os.path.join(pdir, f)),
                 os.path.getmtime(os.path.join(pdir, f)))
                for f in os.listdir(pdir) if f.endswith(".parquet")}

    write_drop("d1.json", [(1, "2024-03-01 10:05:00"),
                           (2, "2024-03-01 11:00:00")])
    streaming_rollup_ingest(spark, str(drop), lake, index, roll,
                            grain="hour", checkpoint=ckpt)
    assert os.path.isdir(os.path.join(index, "event_date=2024-03-01"))
    s1 = part_state("2024-03-01")

    # drain 2: a new date plus a replay of id 1 (same ts)
    write_drop("d2.json", [(1, "2024-03-01 10:05:00"),
                           (3, "2024-03-02 09:00:00")])
    streaming_rollup_ingest(spark, str(drop), lake, index, roll,
                            grain="hour", checkpoint=ckpt)
    # replay dropped: the lake holds each id once
    ids = sorted(r["event_id"] for r in
                 spark.read.parquet(lake).collect())
    assert ids == [1, 2, 3]
    # the replayed id extended ONLY its own date's partition; e.g. a
    # full-index rewrite (or flat layout) would fail one of these
    assert os.path.isdir(os.path.join(index, "event_date=2024-03-02"))
    assert part_state("2024-03-01") >= s1
    idx = spark.read.parquet(index)
    assert sorted(idx.columns) == ["event_date", "event_id"]
    assert idx.count() == 3


def test_streaming_anomaly_alerts(spark, tmp_path):
    """A spike arriving in a later drop raises exactly one alert;
    replays and re-drains never re-alert."""
    import json

    from twitter_analysis_spark.streaming.rollup_ingest import (
        streaming_anomaly_alerts)

    drop = tmp_path / "al_drop"
    drop.mkdir()
    paths = {k: str(tmp_path / f"al_{k}")
             for k in ("lake", "index", "rollup", "alerts", "ckpt")}

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for eid, ts, etype in rows:
                f.write(json.dumps({
                    "event_id": eid, "ts": ts, "user_id": eid % 5,
                    "event_type": etype, "value": 1.0}) + "\n")

    def run():
        streaming_anomaly_alerts(
            spark, str(drop), paths["lake"], paths["index"],
            paths["rollup"], paths["alerts"], checkpoint=paths["ckpt"])

    # Drop 1: 8 quiet days, counts alternating 9/11 (variance > 0).
    rows, eid = [], 0
    for day in range(1, 9):
        for _ in range(9 if day % 2 else 11):
            rows.append((eid, f"2024-03-{day:02d} 10:00:00", "click"))
            eid += 1
    write_drop("d1.json", rows)
    run()
    import os
    assert (not os.path.exists(paths["alerts"])
            or spark.read.parquet(paths["alerts"]).count() == 0)

    # Drop 2: a 100-event spike on day 9.
    rows = [(eid + i, "2024-03-09 11:00:00", "click") for i in range(100)]
    write_drop("d2.json", rows)
    run()
    alerts = spark.read.parquet(paths["alerts"]).collect()
    assert len(alerts) == 1
    a = alerts[0]
    assert (a["event_type"], str(a["d"]), a["n"]) == \
        ("click", "2024-03-09", 100)
    assert a["zscore"] > 2

    # Re-drain: the alert set must not grow.
    run()
    assert spark.read.parquet(paths["alerts"]).count() == 1

    # Checkpoint LOSS: the full drop redelivers as batch 0 — the
    # rollup absorbs it via the event-id index, and the (type, day)
    # anti-join against the persistent alerts table (keyed on content,
    # not batch ids) must keep the alert set fixed. Completes the
    # replay-contract matrix: every persistent-artifact pipeline is
    # checkpoint-loss safe (indexed / identity-guarded / lineage-
    # rebuilt) or documents compaction as its healer.
    shutil.rmtree(paths["ckpt"])
    run()
    assert spark.read.parquet(paths["alerts"]).count() == 1
    assert spark.read.parquet(paths["lake"]) \
        .select("event_id").distinct().count() == \
        spark.read.parquet(paths["lake"]).count()


def test_streaming_ingest_decontaminate(spark, tmp_path):
    """Contaminated docs (sharing a word 4-gram with the benchmark) go
    to quarantine with hit counts; clean docs reach the corpus; the
    split equals the batch decontaminate truth; re-drain is a no-op."""
    import json

    from twitter_analysis_spark.operators.curation import decontaminate
    from twitter_analysis_spark.streaming.ingest import (
        streaming_ingest_decontaminate)

    bench_rows = [(900, "the quick brown fox jumps over the dog")]
    benchmark = spark.createDataFrame(bench_rows, ["doc_id", "text"])

    drop = tmp_path / "decon_drop"
    drop.mkdir()
    corpus = str(tmp_path / "decon_corpus")
    quarantine = str(tmp_path / "decon_quarantine")
    docs = [
        (1, "the quick brown fox jumps high today"),   # shares a 4-gram
        (2, "completely unrelated clean document text here"),
        (3, "quick brown fox jumps over the dog now"),  # shares several
    ]
    with open(drop / "d1.json", "w") as f:
        for doc_id, text in docs:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    streaming_ingest_decontaminate(
        spark, str(drop), benchmark, corpus, quarantine,
        checkpoint=str(tmp_path / "decon_ckpt"))

    truth = {r["doc_id"]: r["n_hits"] for r in decontaminate(
        spark.createDataFrame(docs, ["doc_id", "text"]), benchmark,
        "doc_id", "text", n=4).collect()}
    assert truth                                  # planted contamination real
    got_q = {r["doc_id"]: r["n_hits"]
             for r in spark.read.parquet(quarantine).collect()}
    assert got_q == truth
    got_c = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got_c == {d for d, _ in docs} - set(truth)

    # replay: marker suppresses the re-delivered batch
    streaming_ingest_decontaminate(
        spark, str(drop), benchmark, corpus, quarantine,
        checkpoint=str(tmp_path / "decon_ckpt"))
    assert {r["doc_id"] for r in spark.read.parquet(corpus).collect()} \
        == got_c
    assert len(spark.read.parquet(quarantine).collect()) == len(truth)


def test_streaming_sketch_ingest(spark, tmp_path):
    """Two drained drops: the maintained sketch equals a from-scratch
    batch build over the union, cell for cell; estimates stay
    one-sided; a re-drain (marker) is a no-op."""
    import json

    from twitter_analysis_spark.operators.sketches import (
        cms_build, cms_estimate)
    from twitter_analysis_spark.operators.dedup import tokens
    from twitter_analysis_spark.streaming.sketch_ingest import (
        streaming_sketch_ingest)
    import pyspark.sql.functions as F

    drop = tmp_path / "sk_drop"
    drop.mkdir()
    sk_path = str(tmp_path / "sk_sketch")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    d1 = [(1, "spark spark table"), (2, "table scan")]
    d2 = [(3, "spark join join join")]
    write_drop("d1.json", d1)
    streaming_sketch_ingest(spark, str(drop), sk_path,
                            checkpoint=str(tmp_path / "sk_ckpt"))
    write_drop("d2.json", d2)
    streaming_sketch_ingest(spark, str(drop), sk_path,
                            checkpoint=str(tmp_path / "sk_ckpt"))

    all_docs = spark.createDataFrame(d1 + d2, ["doc_id", "text"])
    want = sorted(map(tuple, cms_build(
        all_docs.select(F.explode(tokens(F.col("text"))).alias("token")),
        "token").collect()))
    got = sorted(map(tuple, spark.read.parquet(sk_path).collect()))
    assert got == want

    # estimates over the maintained sketch: >= truth, exact for these
    # collision-free small counts
    q = spark.createDataFrame([("spark",), ("join",), ("absent",)], ["token"])
    est = {r.token: r.est_cnt for r in cms_estimate(
        spark.read.parquet(sk_path), q, "token").collect()}
    assert est["spark"] == 3 and est["join"] == 3 and est["absent"] == 0

    # replay: no double counting
    streaming_sketch_ingest(spark, str(drop), sk_path,
                            checkpoint=str(tmp_path / "sk_ckpt"))
    assert sorted(map(tuple,
                      spark.read.parquet(sk_path).collect())) == want


def test_streaming_sketch_redelivery_after_crash(spark, tmp_path):
    """The last-applied batch id commits in the SAME atomic swap as the
    sketch cells, so a batch re-delivered with an id the sketch has
    already absorbed is skipped — even when the checkpoint that would
    normally suppress the redelivery is gone (the crash-window case:
    merge landed, downstream marker didn't)."""
    import json

    from twitter_analysis_spark.streaming.sketch_ingest import (
        streaming_sketch_ingest)

    drop = tmp_path / "sk_drop"
    drop.mkdir()
    sk_path = str(tmp_path / "sk_sketch")
    with open(drop / "d1.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "spark spark table"}) + "\n")

    streaming_sketch_ingest(spark, str(drop), sk_path,
                            checkpoint=str(tmp_path / "sk_ckpt"))
    want = sorted(map(tuple, spark.read.parquet(sk_path).collect()))
    assert os.path.exists(os.path.join(sk_path, "_last_batch_id"))

    # Simulate the worst redelivery: lose the checkpoint entirely so the
    # drain re-sends the whole drop as batch 0 again. The id stored in
    # the swapped artifact (0 >= 0) must suppress the double-add.
    shutil.rmtree(tmp_path / "sk_ckpt")
    streaming_sketch_ingest(spark, str(drop), sk_path,
                            checkpoint=str(tmp_path / "sk_ckpt"))
    assert sorted(map(tuple, spark.read.parquet(sk_path).collect())) == want


def test_streaming_sketch_checkpoint_loss_with_new_data(spark, tmp_path):
    """Checkpoint loss restarts batch ids at 0, so the redelivered
    batch 0 can contain BOTH the old files and files that arrived
    after the crash. A bare `stored >= batch_id` skip would drop the
    new file silently (estimate < truth — the one failure mode a CM
    sketch promises away); the lineage-aware guard must instead
    detect the new run id and rebuild from the full drop."""
    import json

    from twitter_analysis_spark.operators.sketches import cms_build
    from twitter_analysis_spark.operators.dedup import tokens
    from twitter_analysis_spark.streaming.sketch_ingest import (
        streaming_sketch_ingest)
    import pyspark.sql.functions as F

    drop = tmp_path / "sk_drop"
    drop.mkdir()
    sk_path = str(tmp_path / "sk_sketch")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    d1 = [(1, "spark spark table"), (2, "table scan")]
    d2 = [(3, "fresh fresh data")]
    write_drop("d1.json", d1)
    streaming_sketch_ingest(spark, str(drop), sk_path,
                            checkpoint=str(tmp_path / "sk_ckpt"))

    # crash: checkpoint gone; new data lands BEFORE the re-drain, so
    # the new lineage's batch 0 = d1 + d2 under one already-seen id.
    shutil.rmtree(tmp_path / "sk_ckpt")
    write_drop("d2.json", d2)
    streaming_sketch_ingest(spark, str(drop), sk_path,
                            checkpoint=str(tmp_path / "sk_ckpt"))

    all_docs = spark.createDataFrame(d1 + d2, ["doc_id", "text"])
    want = sorted(map(tuple, cms_build(
        all_docs.select(F.explode(tokens(F.col("text"))).alias("token")),
        "token").collect()))
    assert sorted(map(tuple,
                      spark.read.parquet(sk_path).collect())) == want

    # and a further same-lineage drain of yet another file MERGES
    # (no rebuild regression in the normal path)
    d3 = [(4, "spark merge")]
    write_drop("d3.json", d3)
    streaming_sketch_ingest(spark, str(drop), sk_path,
                            checkpoint=str(tmp_path / "sk_ckpt"))
    all_docs = spark.createDataFrame(d1 + d2 + d3, ["doc_id", "text"])
    want = sorted(map(tuple, cms_build(
        all_docs.select(F.explode(tokens(F.col("text"))).alias("token")),
        "token").collect()))
    assert sorted(map(tuple,
                      spark.read.parquet(sk_path).collect())) == want


def test_streaming_sketch_artifact_loss_with_live_checkpoint(spark, tmp_path):
    """The INVERSE of checkpoint loss: the artifact is deleted while
    the checkpoint survives. The live lineage has already committed
    batches whose files availableNow will never re-send, so a quiet
    rebuild would permanently undercount — the drain must refuse
    loudly (round-8 ADVICE: stored_run_id() is None while the
    checkpoint metadata+commits exist is exactly the signal).
    Remediation (delete the checkpoint too) must then recover the
    full-drop rebuild."""
    import json

    import pytest

    from twitter_analysis_spark.operators.sketches import cms_build
    from twitter_analysis_spark.operators.dedup import tokens
    from twitter_analysis_spark.streaming.sketch_ingest import (
        streaming_sketch_ingest)
    import pyspark.sql.functions as F

    drop = tmp_path / "sk_drop"
    drop.mkdir()
    sk_path = str(tmp_path / "sk_sketch")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    d1 = [(1, "spark spark table"), (2, "table scan")]
    d2 = [(3, "fresh fresh data")]
    write_drop("d1.json", d1)
    streaming_sketch_ingest(spark, str(drop), sk_path,
                            checkpoint=str(tmp_path / "sk_ckpt"))

    # artifact lost, checkpoint intact; new data lands before re-drain
    shutil.rmtree(sk_path)
    write_drop("d2.json", d2)
    with pytest.raises(RuntimeError, match="undercount"):
        streaming_sketch_ingest(spark, str(drop), sk_path,
                                checkpoint=str(tmp_path / "sk_ckpt"))
    # the refusal must not have drained anything: a retry still raises
    # (nothing was committed under the live lineage)
    with pytest.raises(RuntimeError, match="undercount"):
        streaming_sketch_ingest(spark, str(drop), sk_path,
                                checkpoint=str(tmp_path / "sk_ckpt"))

    # documented remediation: drop the checkpoint too -> full
    # redelivery -> clean rebuild equals the from-scratch sketch
    shutil.rmtree(tmp_path / "sk_ckpt")
    streaming_sketch_ingest(spark, str(drop), sk_path,
                            checkpoint=str(tmp_path / "sk_ckpt"))
    all_docs = spark.createDataFrame(d1 + d2, ["doc_id", "text"])
    want = sorted(map(tuple, cms_build(
        all_docs.select(F.explode(tokens(F.col("text"))).alias("token")),
        "token").collect()))
    assert sorted(map(tuple,
                      spark.read.parquet(sk_path).collect())) == want


def test_streaming_rollup_survives_checkpoint_loss(spark, tmp_path):
    """Losing the checkpoint (and with it the batch markers) re-delivers
    the whole drop as batch 0 — the event-id index must absorb the
    replay: no lake duplicates reach the rollup, and the stored rollup
    still equals the from-scratch truth. This is the append-pipeline
    counterpart of the sketch test above: sums would be unrepairable,
    appends are guarded by the persistent index instead."""
    import json

    from twitter_analysis_spark.operators.rollup import rollup
    from twitter_analysis_spark.streaming.rollup_ingest import (
        streaming_rollup_ingest)

    drop = tmp_path / "cl_drop"
    drop.mkdir()
    lake = str(tmp_path / "cl_lake")
    index = str(tmp_path / "cl_index")
    roll = str(tmp_path / "cl_rollup")

    with open(drop / "d1.json", "w") as f:
        for eid, ts in [(1, "2024-03-01 10:05:00"),
                        (2, "2024-03-01 11:00:00"),
                        (3, "2024-03-02 09:00:00")]:
            f.write(json.dumps({"event_id": eid, "ts": ts,
                                "user_id": eid, "event_type": "click",
                                "value": 1.0}) + "\n")

    streaming_rollup_ingest(spark, str(drop), lake, index, roll,
                            grain="hour",
                            checkpoint=str(tmp_path / "cl_ckpt"))
    want = sorted(map(tuple, spark.read.parquet(roll).collect()))

    shutil.rmtree(tmp_path / "cl_ckpt")
    streaming_rollup_ingest(spark, str(drop), lake, index, roll,
                            grain="hour",
                            checkpoint=str(tmp_path / "cl_ckpt"))
    assert sorted(map(tuple, spark.read.parquet(roll).collect())) == want
    # and the truth recomputed from the (deduped) lake agrees
    truth = sorted(map(tuple, rollup(
        spark.read.parquet(lake).dropDuplicates(["event_id"]),
        "hour").collect()))
    stored = sorted(
        tuple(r) for r in spark.read.parquet(roll)
        .select(*[f.name for f in rollup(
            spark.read.parquet(lake).dropDuplicates(["event_id"]),
            "hour").schema.fields]).collect())
    assert stored == truth


def test_streaming_ingest_dedup_survives_checkpoint_loss(spark, tmp_path):
    """Checkpoint loss re-delivers the whole drop as batch 0 of a NEW
    lineage. The sink partitions are lineage-scoped tokens, so the new
    lineage excludes NOTHING of the old one's index: every redelivered
    doc classifies dup_of_corpus and the corpus converges to the same
    unique set without markers — and without ever overwriting an old
    lineage's partitions (a bare numeric _batch_id would have made
    later post-loss drains dynamic-overwrite old data away)."""
    import json

    from twitter_analysis_spark.streaming.ingest import (
        streaming_ingest_dedup)

    drop = tmp_path / "cl2_drop"
    drop.mkdir()
    corpus = str(tmp_path / "cl2_corpus")
    index = str(tmp_path / "cl2_index")
    with open(drop / "d1.json", "w") as f:
        for i, t in [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")]:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    streaming_ingest_dedup(spark, str(drop), corpus, index,
                           checkpoint=str(tmp_path / "cl2_ckpt"))
    want = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert len(want) == 2      # in-batch exact dup collapsed

    shutil.rmtree(tmp_path / "cl2_ckpt")
    streaming_ingest_dedup(spark, str(drop), corpus, index,
                           checkpoint=str(tmp_path / "cl2_ckpt"))
    got = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert got == want


def test_streaming_ingest_neardup_survives_checkpoint_loss(spark, tmp_path):
    """Near-dup twin of the dedup checkpoint-loss contract. With the
    markers gone, the whole drop redelivers as batch 0 of a NEW
    lineage, whose self-excluded read keeps every OLD-lineage index
    partition visible — so each replayed doc self-collides in every
    band and drops via the bdoc == pdoc identity guard. The corpus
    and band index stay duplicate-free, a genuinely NEW doc arriving
    with the replay still ingests, and a near-dup of a corpus doc
    still drops."""
    import json

    from twitter_analysis_spark.streaming.ingest import (
        streaming_ingest_neardup)

    drop = tmp_path / "cl3_drop"
    drop.mkdir()
    corpus = str(tmp_path / "cl3_corpus")
    index = str(tmp_path / "cl3_index")
    texts = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "completely different content about spark streaming state",
    }
    with open(drop / "d1.json", "w") as f:
        for i, t in texts.items():
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    streaming_ingest_neardup(spark, str(drop), corpus, index,
                             threshold=0.5,
                             checkpoint=str(tmp_path / "cl3_ckpt"))
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1, 2]
    idx1 = sorted(map(tuple, spark.read.parquet(index).collect()))

    # checkpoint lost; a new file arrives carrying a NEW doc and a
    # NEAR-dup of doc 1 before the re-drain
    shutil.rmtree(tmp_path / "cl3_ckpt")
    with open(drop / "d2.json", "w") as f:
        f.write(json.dumps({
            "doc_id": 10,
            "text": "fresh unrelated document on lineage guards"}) + "\n")
        f.write(json.dumps({
            "doc_id": 11,
            "text": "the quick brown fox jumps over the lazy dog "
                    "tomorrow"}) + "\n")
    streaming_ingest_neardup(spark, str(drop), corpus, index,
                             threshold=0.5,
                             checkpoint=str(tmp_path / "cl3_ckpt"))

    got = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    # replayed 1,2 absorbed; 10 ingested; 11 dropped as near-dup of 1
    assert got == [1, 2, 10]
    # the index gained exactly doc 10's band rows, no replay rows
    idx2 = sorted(map(tuple, spark.read.parquet(index).collect()))
    docs_in_idx2 = sorted({r[0] for r in idx2})
    assert docs_in_idx2 == [1, 2, 10]
    assert [r for r in idx2 if r[0] in (1, 2)] \
        == [r for r in idx1 if r[0] in (1, 2)]


def test_streaming_decontaminate_checkpoint_loss_contract(spark, tmp_path):
    """The decon pipeline's documented recovery is DIFFERENT from the
    indexed pipelines: it keeps no identity artifact, so after
    checkpoint loss the whole drop redelivers as batch 0 of a NEW
    lineage and EVERY previously-ingested doc duplicates — the old
    lineage's partitions survive (lineage-scoped tokens never
    collide, so nothing is overwritten/destroyed) and the replay
    lands the same docs again under the new token. The duplicates are
    healed by upsert_by_key's full-rewrite form, which keeps the
    _batch_id output layout so draining can continue; the
    clean/quarantine ROUTING stays deterministic (no doc changes side
    on replay). This test pins all of that."""
    import json
    import os

    from twitter_analysis_spark.sources.maintenance import upsert_by_key
    from twitter_analysis_spark.streaming.ingest import (
        streaming_ingest_decontaminate)

    drop = tmp_path / "cl4_drop"
    drop.mkdir()
    corpus = str(tmp_path / "cl4_corpus")
    quarantine = str(tmp_path / "cl4_quar")
    bench = spark.createDataFrame(
        [(100, "leaked benchmark question about spark internals ok")],
        ["doc_id", "text"])
    with open(drop / "d1.json", "w") as f:
        f.write(json.dumps({
            "doc_id": 1,
            "text": "clean document with entirely original words"}) + "\n")
        f.write(json.dumps({
            "doc_id": 2,
            "text": "contains the leaked benchmark question about "
                    "spark internals ok"}) + "\n")

    streaming_ingest_decontaminate(
        spark, str(drop), bench, corpus, quarantine,
        checkpoint=str(tmp_path / "cl4_ckpt"))
    assert [r["doc_id"] for r in spark.read.parquet(corpus).collect()] == [1]
    assert [r["doc_id"] for r in
            spark.read.parquet(quarantine).collect()] == [2]

    # a SECOND drain ingests doc 3 as batch 1
    with open(drop / "d2.json", "w") as f:
        f.write(json.dumps({
            "doc_id": 3,
            "text": "another clean later document of fresh words"}) + "\n")
    streaming_ingest_decontaminate(
        spark, str(drop), bench, corpus, quarantine,
        checkpoint=str(tmp_path / "cl4_ckpt"))
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1, 3]

    # checkpoint loss: the whole drop replays as batch 0 of a NEW
    # lineage; the old lineage's partitions survive untouched, so
    # docs 1 and 3 both duplicate. Routing unchanged: doc 2 never
    # reaches the corpus.
    shutil.rmtree(tmp_path / "cl4_ckpt")
    streaming_ingest_decontaminate(
        spark, str(drop), bench, corpus, quarantine,
        checkpoint=str(tmp_path / "cl4_ckpt"))
    corpus_ids = sorted(r["doc_id"] for r in
                        spark.read.parquet(corpus).collect())
    assert corpus_ids == [1, 1, 3, 3]
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(quarantine).collect()) == [2, 2]

    # the documented healer: full-rewrite key compaction collapses the
    # cross-partition replays while preserving the _batch_id layout
    upsert_by_key(spark, corpus,
                  spark.read.parquet(corpus).dropDuplicates(["doc_id"]),
                  key="doc_id", partition_by=["_batch_id"],
                  full_rewrite=True)
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1, 3]
    assert any(e.startswith("_batch_id=") for e in os.listdir(corpus))


def test_streaming_rollup_legacy_flat_index_names_the_fix(spark, tmp_path):
    """A pre-date-partitioning index (flat event_id-only layout) must
    fail the first drain with an error that NAMES the one-time
    reindex, not an opaque unresolved-column AnalysisException from
    the event_date prune (ADVICE r9). The guard fires before any
    write, so the lake/rollup stay untouched."""
    import json
    import os

    import pytest

    from twitter_analysis_spark.streaming.rollup_ingest import (
        streaming_rollup_ingest)

    drop = tmp_path / "legacy_drop"
    drop.mkdir()
    lake = str(tmp_path / "legacy_lake")
    index = str(tmp_path / "legacy_index")
    roll = str(tmp_path / "legacy_rollup")

    # a legacy index: event_id only, no event_date partition column
    spark.createDataFrame([(1,), (2,)], "event_id long") \
        .write.parquet(index)
    with open(drop / "d1.json", "w") as f:
        f.write(json.dumps({
            "event_id": 3, "ts": "2024-03-01 10:05:00", "user_id": 1,
            "event_type": "click", "value": 1.0}) + "\n")

    with pytest.raises(Exception, match="one-time reindex"):
        streaming_rollup_ingest(spark, str(drop), lake, index, roll,
                                grain="hour",
                                checkpoint=str(tmp_path / "legacy_ckpt"))
    assert not os.path.exists(lake)
    assert not os.path.exists(roll)


def test_streaming_ingest_dedup_torn_batch_zero_duplicates(
        spark, tmp_path, monkeypatch):
    """Kill the pipeline BETWEEN the corpus write and the index write
    (the once-documented torn-batch window) and restart: the corpus
    must come back duplicate-free WITHOUT any compaction, because the
    re-run classifies against the index read minus its own partition
    and OVERWRITES its own corpus partition instead of appending
    (round-9 verdict directive 2 — the healer caveat is gone)."""
    import json

    import pytest

    from twitter_analysis_spark.operators.dedup import content_index
    from twitter_analysis_spark.streaming import ingest as ing

    drop = tmp_path / "torn_drop"
    drop.mkdir()
    corpus = str(tmp_path / "torn_corpus")
    index = str(tmp_path / "torn_index")
    ckpt = str(tmp_path / "torn_ckpt")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id,
                                    "text": text}) + "\n")

    # batch 0 lands cleanly
    write_drop("d1.json", [(1, "alpha"), (2, "beta")])
    ing.streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=ckpt)

    # batch 1: crash AFTER the corpus write, BEFORE the index write
    write_drop("d2.json", [(10, "alpha"),        # dup of corpus
                           (11, "gamma"), (12, "gamma")])  # in-batch dup
    real = ing._replace_batch_partition

    def crash_before_index(df, path, token):
        if path == index and int(token.rsplit("_", 1)[1]) > 0:
            raise RuntimeError("simulated crash between corpus "
                               "and index writes")
        real(df, path, token)

    monkeypatch.setattr(ing, "_replace_batch_partition",
                        crash_before_index)
    with pytest.raises(Exception, match="simulated crash"):
        ing.streaming_ingest_dedup(spark, str(drop), corpus, index,
                                   checkpoint=ckpt)
    monkeypatch.setattr(ing, "_replace_batch_partition", real)

    # torn state on disk: the corpus already holds batch 1's rows,
    # the index does not, and no marker was written
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1, 2, 11]
    assert sorted(r["holder_id"] for r in
                  spark.read.parquet(index).collect()) == [1, 2]

    # restart with the SAME checkpoint: batch 1 redelivers, re-runs,
    # and replaces its own partition — ZERO duplicates, no compaction
    ing.streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=ckpt)
    got = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 11]
    built = content_index(spark.read.parquet(corpus), "doc_id", "text")
    assert sorted(map(tuple, spark.read.parquet(index)
                      .select("content_key", "holder_id").collect())) == \
        sorted(map(tuple, built.collect()))
    # and a further clean drain still works on the healed-by-replay state
    write_drop("d3.json", [(20, "delta"), (21, "alpha")])
    ing.streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=ckpt)
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1, 2, 11, 20]


def test_streaming_ingest_neardup_torn_batch_zero_duplicates(
        spark, tmp_path, monkeypatch):
    """Near-dup twin of the torn-batch closure: crash between the
    corpus write and the band-index write, restart, and require the
    corpus duplicate-free with the band index equal to bands rows per
    surviving doc — without compaction."""
    import json

    import pytest

    from twitter_analysis_spark.streaming import ingest as ing

    drop = tmp_path / "tornnd_drop"
    drop.mkdir()
    corpus = str(tmp_path / "tornnd_corpus")
    index = str(tmp_path / "tornnd_index")
    ckpt = str(tmp_path / "tornnd_ckpt")
    kw = dict(num_hashes=32, bands=16, threshold=0.5)

    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat sleeps by the warm fire every single evening")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id,
                                    "text": text}) + "\n")

    write_drop("d1.json", [(1, base)])
    ing.streaming_ingest_neardup(spark, str(drop), corpus, index,
                                 checkpoint=ckpt, **kw)

    # batch 1: a near-dup of corpus doc 1 plus a novel doc; crash
    # after the corpus write, before the band-index write
    write_drop("d2.json", [
        (10, base.replace("lazy", "idle")),
        (11, "novel text about catalyst plans and shuffle exchanges "
             "in distributed execution engines")])
    real = ing._replace_batch_partition

    def crash_before_index(df, path, token):
        if path == index and int(token.rsplit("_", 1)[1]) > 0:
            raise RuntimeError("simulated crash between corpus "
                               "and band-index writes")
        real(df, path, token)

    monkeypatch.setattr(ing, "_replace_batch_partition",
                        crash_before_index)
    with pytest.raises(Exception, match="simulated crash"):
        ing.streaming_ingest_neardup(spark, str(drop), corpus, index,
                                     checkpoint=ckpt, **kw)
    monkeypatch.setattr(ing, "_replace_batch_partition", real)

    # torn: corpus holds batch 1's survivor, index doesn't know it
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1, 11]
    assert sorted({r["doc"] for r in
                   spark.read.parquet(index).collect()}) == [1]

    # restart: replace-by-batch re-runs batch 1 into identical
    # partitions — zero duplicates, index consistent, no compaction
    ing.streaming_ingest_neardup(spark, str(drop), corpus, index,
                                 checkpoint=ckpt, **kw)
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1, 11]
    per_doc = {r["doc"]: r["n"] for r in
               spark.read.parquet(index).groupBy("doc").count()
               .withColumnRenamed("count", "n").collect()}
    assert per_doc == {1: 17, 11: 17}      # bands + 1 sentinel


def test_streaming_ingest_post_checkpoint_loss_drains_never_destroy(
        spark, tmp_path):
    """The lineage-scoping regression pin (round-10 review finding):
    with a bare numeric _batch_id partition key, a post-checkpoint-
    loss drain numbered batch 1 would dynamic-OVERWRITE the OLD
    lineage's batch-1 partition — silently deleting its corpus rows
    and index keys (data destruction, strictly worse than the
    duplicates the replay contract tolerates). With lineage-scoped
    tokens the collision is impossible: old docs survive every
    post-loss drain, replays classify dup_of_corpus, and new docs
    keep ingesting."""
    import json

    from twitter_analysis_spark.streaming.ingest import (
        streaming_ingest_dedup)

    drop = tmp_path / "lin_drop"
    drop.mkdir()
    corpus = str(tmp_path / "lin_corpus")
    index = str(tmp_path / "lin_index")
    ckpt = str(tmp_path / "lin_ckpt")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id,
                                    "text": text}) + "\n")

    # old lineage: batch 0 = doc 1, batch 1 = doc 2 (two drains)
    write_drop("d1.json", [(1, "alpha")])
    streaming_ingest_dedup(spark, str(drop), corpus, index,
                           checkpoint=ckpt)
    write_drop("d2.json", [(2, "beta")])
    streaming_ingest_dedup(spark, str(drop), corpus, index,
                           checkpoint=ckpt)
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1, 2]

    # checkpoint lost: replay drain (new lineage batch 0), then a
    # further drain that is batch 1 OF THE NEW LINEAGE — the numeric
    # id that would have collided with old-lineage doc 2's partition
    shutil.rmtree(tmp_path / "lin_ckpt")
    streaming_ingest_dedup(spark, str(drop), corpus, index,
                           checkpoint=ckpt)
    write_drop("d3.json", [(3, "gamma")])
    streaming_ingest_dedup(spark, str(drop), corpus, index,
                           checkpoint=ckpt)

    got = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2, 3]          # doc 2 NOT destroyed, no dups
    assert sorted(r["holder_id"] for r in
                  spark.read.parquet(index).collect()) == [1, 2, 3]


def test_streaming_ingest_torn_batch_plus_checkpoint_loss_reconciles(
        spark, tmp_path, monkeypatch):
    """The one compose replace-by-batch cannot heal alone: a batch
    torn between the corpus and index writes whose checkpoint is THEN
    lost. The new lineage never addresses the old partition, and the
    torn docs (absent from the index) would re-ingest as permanent
    duplicates. reconcile_replace_by_batch drops exactly the
    corpus-without-index partitions before the re-drain, after which
    the replay restores the docs once."""
    import json

    import pytest

    from twitter_analysis_spark.streaming import ingest as ing

    drop = tmp_path / "tcl_drop"
    drop.mkdir()
    corpus = str(tmp_path / "tcl_corpus")
    index = str(tmp_path / "tcl_index")
    ckpt = str(tmp_path / "tcl_ckpt")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id,
                                    "text": text}) + "\n")

    write_drop("d1.json", [(1, "alpha")])
    ing.streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=ckpt)

    # batch 1 tears between the corpus and index writes
    write_drop("d2.json", [(2, "beta")])
    real = ing._replace_batch_partition

    def crash_before_index(df, path, token):
        if path == index and int(token.rsplit("_", 1)[1]) > 0:
            raise RuntimeError("simulated crash")
        real(df, path, token)

    monkeypatch.setattr(ing, "_replace_batch_partition",
                        crash_before_index)
    with pytest.raises(Exception, match="simulated crash"):
        ing.streaming_ingest_dedup(spark, str(drop), corpus, index,
                                   checkpoint=ckpt)
    monkeypatch.setattr(ing, "_replace_batch_partition", real)

    # ... and the checkpoint is lost before the healing replay
    shutil.rmtree(tmp_path / "tcl_ckpt")

    # reconcile drops exactly the torn partition (corpus, no index)
    dropped = ing.reconcile_replace_by_batch(corpus, index)
    assert len(dropped) == 1 and dropped[0].endswith("_1")
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1]

    # re-drain under the new lineage: doc 2 redelivers and lands ONCE
    ing.streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=ckpt)
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1, 2]
    assert sorted(r["holder_id"] for r in
                  spark.read.parquet(index).collect()) == [1, 2]


def test_streaming_ingest_numeric_batch_layout_names_migration(
        spark, tmp_path):
    """A table from the bare-numeric-_batch_id generation must refuse
    with a named migration, not crash in an ANSI cast (or, ANSI off,
    silently null-filter the whole index out of the probe and
    re-ingest duplicates)."""
    import json

    import pytest

    from twitter_analysis_spark.streaming.ingest import (
        streaming_ingest_dedup)

    drop = tmp_path / "num_drop"
    drop.mkdir()
    corpus = str(tmp_path / "num_corpus")
    index = str(tmp_path / "num_index")
    # legacy-generation index: numeric _batch_id partitions
    spark.createDataFrame([(111, 1, 0), (222, 2, 1)],
                          "content_key long, holder_id long, _batch_id int") \
        .write.partitionBy("_batch_id").parquet(index)
    with open(drop / "d1.json", "w") as f:
        f.write(json.dumps({"doc_id": 3, "text": "gamma"}) + "\n")

    with pytest.raises(Exception, match="pre-lineage-token"):
        streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=str(tmp_path / "num_ckpt"))


def test_streaming_ingest_dedup_without_checkpoint(spark, tmp_path):
    """checkpoint=None: every drain is its own lineage and re-reads
    the whole drop (temp checkpoint), the index absorbs the replays,
    NEW files still ingest (the old persistent-marker fallback
    silently skipped them as 'batch 0 already done'), and no marker
    dir accumulates orphan files."""
    import json
    import os

    from twitter_analysis_spark.streaming.ingest import (
        streaming_ingest_dedup)

    drop = tmp_path / "nc_drop"
    drop.mkdir()
    corpus = str(tmp_path / "nc_corpus")
    index = str(tmp_path / "nc_index")

    with open(drop / "d1.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "alpha"}) + "\n")
    streaming_ingest_dedup(spark, str(drop), corpus, index)
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1]

    with open(drop / "d2.json", "w") as f:
        f.write(json.dumps({"doc_id": 2, "text": "beta"}) + "\n")
        f.write(json.dumps({"doc_id": 3, "text": "alpha"}) + "\n")
    streaming_ingest_dedup(spark, str(drop), corpus, index)
    got = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert got == [1, 2]                    # new doc in, replays absorbed
    assert not os.path.exists(f"{index}__batches")


def test_streaming_ingest_neardup_shingleless_docs_fully_covered(
        spark, tmp_path):
    """A doc ALL of whose shingles are pruned by the hot-shingle DF
    cap (shared by >256 docs — boilerplate) carries no band rows,
    which would leave it with NO index presence: its batch's index
    partition could come out empty (faking the torn corpus-without-
    index signature reconcile deletes on) and a checkpoint-loss
    replay would re-ingest it. (Short docs do NOT trigger this —
    word_shingles folds them into one whole-doc shingle.) The
    sentinel band row (-1, hash(doc_id)) closes both holes: reconcile
    drops nothing for a completed capped batch, and the replay
    self-collides."""
    import json

    from twitter_analysis_spark.streaming import ingest as ing

    drop = tmp_path / "sl_drop"
    drop.mkdir()
    corpus = str(tmp_path / "sl_corpus")
    index = str(tmp_path / "sl_index")
    ckpt = str(tmp_path / "sl_ckpt")

    n_docs = 260                       # > DEFAULT_MAX_SHINGLE_DF (256)
    with open(drop / "d1.json", "w") as f:
        for i in range(1, n_docs + 1):
            f.write(json.dumps({"doc_id": i,
                                "text": "boilerplate gm"}) + "\n")
    ing.streaming_ingest_neardup(spark, str(drop), corpus, index,
                                 checkpoint=ckpt)
    # the cap prunes the shared shingle, so no candidates form and
    # all docs ingest (the documented hot-shingle trade-off) — but
    # each MUST carry its sentinel row in the index
    assert spark.read.parquet(corpus).count() == n_docs
    idx = spark.read.parquet(index)
    assert idx.count() == n_docs
    assert {r["band"] for r in idx.collect()} == {-1}   # sentinels

    # a completed capped batch is NOT torn: reconcile drops nothing
    assert ing.reconcile_replace_by_batch(corpus, index) == []
    assert spark.read.parquet(corpus).count() == n_docs

    # checkpoint loss: the replay self-collides on the sentinels and
    # the corpus stays duplicate-free
    shutil.rmtree(tmp_path / "sl_ckpt")
    ing.streaming_ingest_neardup(spark, str(drop), corpus, index,
                                 checkpoint=ckpt)
    assert spark.read.parquet(corpus).count() == n_docs


def test_reconcile_drop_tokens_and_no_checkpoint_neardup_markers(
        spark, tmp_path):
    """Two small contracts: (a) reconcile_replace_by_batch's
    drop_tokens force-removes a named batch from BOTH sides (the
    manual path for a partition present-but-partial after a mid-
    commit crash, which layout inspection cannot detect); (b) the
    neardup pipeline without a checkpoint creates no persistent
    marker dir (same as the dedup pipeline)."""
    import json
    import os

    from twitter_analysis_spark.streaming import ingest as ing

    drop = tmp_path / "dt_drop"
    drop.mkdir()
    corpus = str(tmp_path / "dt_corpus")
    index = str(tmp_path / "dt_index")

    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat naps by the fire")
    with open(drop / "d1.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": base}) + "\n")
    ing.streaming_ingest_neardup(spark, str(drop), corpus, index)
    assert not os.path.exists(f"{index}__batches")      # (b)

    # (a): force-drop the completed batch from both sides
    from twitter_analysis_spark.streaming.ingest import _batch_dirs
    tokens = list(_batch_dirs(corpus))
    assert len(tokens) == 1
    dropped = ing.reconcile_replace_by_batch(corpus, index,
                                             drop_tokens=tokens)
    assert dropped == tokens
    assert _batch_dirs(corpus) == {} and _batch_dirs(index) == {}

    # a token naming NO partition on either side is EXCLUDED from the
    # return (and warned about) rather than reported dropped or
    # raised: the state is healthy both on a retry after success and
    # when the in-flight batch crashed before its first write — the
    # caller catches a typo by checking the return value
    assert ing.reconcile_replace_by_batch(corpus, index,
                                          drop_tokens=tokens) == []


def test_streaming_ingest_dedup_crash_after_index_before_marker(
        spark, tmp_path, monkeypatch):
    """The other half of the torn window: both writes landed but the
    marker did not. The re-run reads the index MINUS its own
    partition, so it re-classifies identically (its own first-attempt
    keys are invisible, not poison), overwrites both partitions with
    byte-identical content, and stamps the marker — zero duplicates,
    zero losses, no compaction."""
    import json

    import pytest

    from twitter_analysis_spark.operators.dedup import content_index
    from twitter_analysis_spark.streaming import ingest as ing

    drop = tmp_path / "aim_drop"
    drop.mkdir()
    corpus = str(tmp_path / "aim_corpus")
    index = str(tmp_path / "aim_index")
    ckpt = str(tmp_path / "aim_ckpt")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id,
                                    "text": text}) + "\n")

    write_drop("d1.json", [(1, "alpha")])
    ing.streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=ckpt)

    write_drop("d2.json", [(10, "alpha"), (11, "gamma")])
    real = ing._replace_batch_partition

    def crash_after_index(df, path, token):
        real(df, path, token)                 # the write COMPLETES
        if path == index and int(token.rsplit("_", 1)[1]) > 0:
            raise RuntimeError("simulated crash after index write")

    monkeypatch.setattr(ing, "_replace_batch_partition",
                        crash_after_index)
    with pytest.raises(Exception, match="simulated crash"):
        ing.streaming_ingest_dedup(spark, str(drop), corpus, index,
                                   checkpoint=ckpt)
    monkeypatch.setattr(ing, "_replace_batch_partition", real)

    # both writes landed; only the marker is missing
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1, 11]
    assert sorted(r["holder_id"] for r in
                  spark.read.parquet(index).collect()) == [1, 11]

    # restart: the redelivered batch re-runs into identical partitions
    ing.streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=ckpt)
    assert sorted(r["doc_id"] for r in
                  spark.read.parquet(corpus).collect()) == [1, 11]
    built = content_index(spark.read.parquet(corpus), "doc_id", "text")
    assert sorted(map(tuple, spark.read.parquet(index)
                      .select("content_key", "holder_id").collect())) == \
        sorted(map(tuple, built.collect()))
