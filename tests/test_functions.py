"""Scalar function tests (C1-C3 date handling, tokenizer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_analysis_spark.functions.dates import (
    format_tweet_date, parse_twitter_ts, parse_ui_date)
from twitter_analysis_spark.functions.text import extract_keywords_col, tokenize


def test_twitter_date_roundtrip(spark):
    df = spark.createDataFrame(
        [("Sun Apr 12 18:47:53 +0000 2020",), ("garbage",), (None,)],
        ["created_at"])
    out = df.select(
        parse_twitter_ts(F.col("created_at")).alias("ts"),
        format_tweet_date(F.col("created_at")).alias("disp"),
    ).collect()
    assert str(out[0]["ts"]) == "2020-04-12 18:47:53"
    assert out[0]["disp"] == "04/12/2020 06:47 PM"      # app.py:34 format
    assert out[1]["ts"] is None
    assert out[1]["disp"] == "Invalid date format"      # app.py:36-37 fallback
    assert out[2]["disp"] == "Invalid date format"


def test_ui_date(spark):
    df = spark.createDataFrame([("04/15/2020",), ("2020-04-15",)], ["d"])
    out = df.select(parse_ui_date(F.col("d")).alias("d")).collect()
    assert str(out[0]["d"]) == "2020-04-15" and out[1]["d"] is None


def test_tokenizer_and_stopwords(spark):
    df = spark.createDataFrame([("The QUICK-brown fox, the fox!",)], ["t"])
    toks = df.select(tokenize(F.col("t")).alias("x")).first()["x"]
    assert toks == ["the", "quick", "brown", "fox", "the", "fox"]
    kept = df.select(extract_keywords_col(F.col("t")).alias("x")).first()["x"]
    assert kept == ["quick", "brown", "fox", "fox"]
