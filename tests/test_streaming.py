"""Structured Streaming: windowed keyword counts over a drop dir must
agree with the equivalent batch aggregation over the same files."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from twitter_analysis_spark.functions.dates import parse_twitter_ts
from twitter_analysis_spark.functions.text import extract_keywords_col
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
