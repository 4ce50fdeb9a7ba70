"""Search-API tests against a pure-Python oracle over the fixture dicts.

Every builder in operators/search.py is checked against the same
computation done with plain Python over the in-memory fixture — an
engine-independent second implementation, like the driver's DuckDB
oracle but for the nested-tweet semantics SQL can't easily express."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from twitter_analysis_spark.functions.text import STOPWORDS
from twitter_analysis_spark.operators import search


def _kw_match(t: dict, kw: str) -> bool:
    return re.search("(?i)" + re.escape(kw), t["text"]) is not None


def _tags(t: dict) -> set[str]:
    return {h["text"] for h in t["entities"]["hashtags"]}


def test_keyword_search_matches_python_oracle(spark, twitter_fixture):
    tweets_df, tweets = twitter_fixture["tweets_df"], twitter_fixture["tweets"]
    got = search.search_tweets(tweets_df, keyword="corona", limit=10**6)
    expect = [t for t in tweets if _kw_match(t, "corona")]
    assert got.count() == len(expect)
    assert {r["id_str"] for r in got.select("id_str").collect()} \
        == {t["id_str"] for t in expect}


def test_hashtag_and_lang_filters(spark, twitter_fixture):
    tweets_df, tweets = twitter_fixture["tweets_df"], twitter_fixture["tweets"]
    got = search.search_tweets(tweets_df, hashtags=["covid", "#vote"],
                               lang="en", limit=10**6)
    expect = [t for t in tweets
              if (_tags(t) & {"covid", "vote"}) and t["lang"] == "en"]
    assert got.count() == len(expect)


def test_keyword_or_hashtag_combined(spark, twitter_fixture):
    """The fixed F6 semantics: keyword OR hashtag, not overwrite."""
    tweets_df, tweets = twitter_fixture["tweets_df"], twitter_fixture["tweets"]
    got = search.search_tweets(tweets_df, keyword="virus",
                               hashtags=["covid"], limit=10**6)
    expect = [t for t in tweets
              if _kw_match(t, "virus") or ("covid" in _tags(t))]
    assert got.count() == len(expect)


def test_date_range_applied(spark, twitter_fixture):
    """F8 — the parameter the reference collects but never uses."""
    tweets_df = twitter_fixture["tweets_df"]
    narrow = search.search_tweets(tweets_df, date_start="2020-04-10 00:00:00",
                                  date_end="2020-04-12 23:59:59", limit=10**6)
    n_narrow, n_all = narrow.count(), tweets_df.count()
    assert 0 < n_narrow < n_all


def test_sort_and_limit_top50(spark, twitter_fixture):
    tweets_df, tweets = twitter_fixture["tweets_df"], twitter_fixture["tweets"]
    got = search.search_tweets(tweets_df, limit=50).collect()
    assert len(got) == 50
    keys = [(r["favorite_count"], r["retweet_count"]) for r in got]
    assert keys == sorted(keys, reverse=True)
    # the global top favorite_count must be present
    assert max(t["favorite_count"] for t in tweets) == got[0]["favorite_count"]


def test_author_join(spark, twitter_fixture):
    got = search.search_tweets(twitter_fixture["tweets_df"],
                               twitter_fixture["users_df"], limit=50)
    rows = got.collect()
    users = {u["id"]: u for u in twitter_fixture["users"]}
    for r in rows:
        assert r["author_screen_name"] == users[r["user_id"]]["screen_name"]


def test_tweets_for_user_or_semantics(spark, twitter_fixture):
    tweets_df, tweets = twitter_fixture["tweets_df"], twitter_fixture["tweets"]
    uid = tweets[7]["user_id"]
    got = search.tweets_for_user(tweets_df, uid, keyword="lorem",
                                 hashtags=["ai"], limit=10**6)
    expect = [t for t in tweets if t["user_id"] == uid
              and (_kw_match(t, "lorem") or "ai" in _tags(t))]
    assert got.count() == len(expect)


def test_user_lookup_and_sidebars(spark, twitter_fixture):
    users_df, users = twitter_fixture["users_df"], twitter_fixture["users"]
    row = search.user_by_screen_name(users_df, "user42").first()
    assert row["id"] == "1042"
    top5 = search.top_users_by_followers(users_df, 5).collect()
    expect = sorted(users, key=lambda u: -u["followers_count"])[:5]
    assert [r["screen_name"] for r in top5] == [u["screen_name"] for u in expect]


def test_top_retweeters_capped(spark, twitter_fixture):
    tweets_df = twitter_fixture["tweets_df"]
    got = search.top_retweeters(tweets_df, per_tweet=30)
    per_group = got.groupBy("og_id").count()
    assert per_group.agg(F.max("count")).first()[0] == 30  # the 37-rt tweet
    # group sizes == min(len(retweets), 30)
    t7 = twitter_fixture["tweets"][7]
    n7 = got.where(F.col("og_id") == t7["id_str"]).count()
    assert n7 == 30 and len(t7["retweets"]) == 37


def test_pagination(spark, twitter_fixture):
    tweets_df = twitter_fixture["tweets_df"]
    base = search.search_tweets(tweets_df, limit=50)
    p0 = search.paginate(base, [F.desc("favorite_count"), F.asc("id_str")], 0)
    p1 = search.paginate(base, [F.desc("favorite_count"), F.asc("id_str")], 1)
    ids0 = {r["id_str"] for r in p0.select("id_str").collect()}
    ids1 = {r["id_str"] for r in p1.select("id_str").collect()}
    assert len(ids0) == 10 and len(ids1) == 10 and not ids0 & ids1


def test_top_keywords_vs_counter(spark, twitter_fixture):
    tweets_df, tweets = twitter_fixture["tweets_df"], twitter_fixture["tweets"]
    got = search.top_keywords(tweets_df, k=10).collect()
    c: Counter = Counter()
    for t in tweets:
        toks = [w for w in re.split(r"[^a-z0-9]+", t["text"].lower()) if w]
        c.update(w for w in toks if w not in STOPWORDS)
    # same counts under deterministic (cnt desc, tok asc) ordering
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["tok"], r["cnt"]) for r in got] == expect
