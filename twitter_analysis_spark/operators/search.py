"""Parameterized tweet-search API (the reference's query surface).

Mirrors the three entry points of SURVEY.md §3 — results_page search
(app.py:106-191), user_info_page (app.py:262-342), and the sidebar
top-k lists — as DataFrame builders over the curated ``tweets`` /
``users`` tables. Each builder returns an unexecuted DataFrame, so the
memo layer (plans.memo) can fingerprint the parameters and Catalyst
sees the whole pipeline (filters push into the scan, the user join
broadcasts, top-k becomes TakeOrderedAndProject).

Deliberate fixes over the reference, documented per SURVEY.md §7:
- the date-range parameters are actually applied (app.py:113-114
  collects them but no query ever uses them);
- keyword OR hashtag branches combine (cache.py:183-185 overwrites the
  first ``$or`` with the second).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dates import parse_twitter_ts
from ..functions.text import STOPWORDS, extract_keywords_col


def _created_ts(tweets: DataFrame):
    if "created_at_ts" in tweets.columns:
        return F.col("created_at_ts")
    return parse_twitter_ts(F.col("created_at"))


def _keyword_pred(keyword: str):
    # F1: {"text": {"$regex": kw, "$options": "i"}} (cache.py:144-145).
    # The reference passes the raw keyword as a regex; we escape it so a
    # user typing "c++" doesn't get a cryptic error, keeping the
    # case-insensitive-substring semantics.
    import re
    return F.col("text").rlike("(?i)" + re.escape(keyword))


def _hashtag_pred(hashtags: list[str]):
    # F2: {"entities.hashtags.text": {"$in": [...]}} (cache.py:146-149).
    # Struct-array field extraction gives array<string>; arrays_overlap
    # == Mongo's implicit any-element-matches.
    return F.arrays_overlap(
        F.col("entities.hashtags.text"),
        F.array(*[F.lit(h.lstrip("#")) for h in hashtags]),
    )


def search_tweets(tweets: DataFrame, users: DataFrame | None = None,
                  keyword: str | None = None,
                  hashtags: list[str] | None = None,
                  lang: str | None = None,
                  date_start: str | None = None,
                  date_end: str | None = None,
                  limit: int = 50) -> DataFrame:
    """results_page search (app.py:106-191 / query_mongodb_tweet,
    cache.py:142-159): conjunctive filters → 3-key sort (T1) → top-50
    (T3) → author broadcast join (J1)."""
    df = tweets
    preds = []
    if keyword:
        preds.append(_keyword_pred(keyword))
    if hashtags:
        preds.append(_hashtag_pred(hashtags))
    if lang:
        preds.append(F.col("lang") == lang)                      # F3
    if preds:
        # keyword/hashtag are OR'd (the fixed F6 semantics); lang ANDs.
        kw_ht = preds[0]
        if keyword and hashtags:
            kw_ht = preds[0] | preds[1]
            rest = preds[2:]
        else:
            rest = preds[1:]
        cond = kw_ht
        for p in rest:
            cond = cond & p
        df = df.where(cond)
    ts = _created_ts(tweets)
    if date_start:
        df = df.where(ts >= F.lit(date_start).cast("timestamp"))  # F8 (fixed)
    if date_end:
        df = df.where(ts <= F.lit(date_end).cast("timestamp"))
    out = (
        df.orderBy(F.desc("favorite_count"), F.desc("retweet_count"),
                   ts.desc())                                     # T1
        .limit(limit)                                             # T3
    )
    if users is not None:
        out = join_authors(out, users)                            # J1
    return out


def join_authors(tweets: DataFrame, users: DataFrame,
                 prefix: str = "author_") -> DataFrame:
    """J1: enrich with author columns via ONE broadcast hash join
    (replaces the reference's per-row cache→MySQL lookups,
    app.py:204-205 → cache.py:104-110,164-170)."""
    u = users.select(
        F.col("id").alias("__uid"),
        F.col("name").alias(f"{prefix}name"),
        F.col("screen_name").alias(f"{prefix}screen_name"),
        F.col("verified").alias(f"{prefix}verified"),
        F.col("followers_count").alias(f"{prefix}followers_count"),
    )
    return (tweets.join(F.broadcast(u),
                        tweets.user_id == F.col("__uid"), "left")
            .drop("__uid"))


def user_by_screen_name(users: DataFrame, screen_name: str) -> DataFrame:
    """J2/F5: user-info point lookup (cache.py:172-178)."""
    return users.where(F.col("screen_name") == screen_name)


def tweets_for_user(tweets: DataFrame, user_id: str,
                    keyword: str | None = None,
                    hashtags: list[str] | None = None,
                    lang: str | None = None,
                    limit: int = 50) -> DataFrame:
    """tweets_for_users (cache.py:180-190): user_id equality + optional
    (keyword OR hashtag) + lang, T2 sort. The keyword/hashtag branches
    are OR-combined — fixing the reference's overwritten ``$or``."""
    df = tweets.where(F.col("user_id") == user_id)
    or_parts = []
    if keyword:
        or_parts.append(_keyword_pred(keyword))
    if hashtags:
        or_parts.append(_hashtag_pred(hashtags))
    if or_parts:
        cond = or_parts[0]
        for p in or_parts[1:]:
            cond = cond | p
        df = df.where(cond)
    if lang:
        df = df.where(F.col("lang") == lang)
    return (df.orderBy(F.desc("retweet_count"), F.desc("favorite_count"))  # T2
            .limit(limit))


def top_users_by_followers(users: DataFrame, k: int = 5) -> DataFrame:
    """T4 sidebar: SELECT screen_name, name, followers_count ORDER BY
    followers_count DESC LIMIT 5 (app.py:156-158)."""
    return (users.select("screen_name", "name", "followers_count")
            .orderBy(F.desc("followers_count"), F.asc("screen_name"))
            .limit(k))


def top_tweets_by_favorites(tweets: DataFrame, k: int = 5) -> DataFrame:
    """T4 sidebar: originals by favorite_count (app.py:170-171)."""
    return (tweets.select("id_str", "text", "favorite_count")
            .orderBy(F.desc("favorite_count"), F.asc("id_str"))
            .limit(k))


def top_retweeters(tweets: DataFrame, per_tweet: int = 30) -> DataFrame:
    """T6: ≤30 retweeters per tweet (loop-break at app.py:245-247) as a
    window row_number over the exploded retweets array."""
    rt = tweets.select(
        F.col("id_str").alias("og_id"),
        F.explode("retweets").alias("rt"),
    ).select(
        "og_id",
        F.col("rt.id_str").alias("rt_id"),
        F.col("rt.user_id").alias("rt_user_id"),
        F.col("rt.favorite_count").alias("rt_favorite_count"),
    )
    w = Window.partitionBy("og_id").orderBy(
        F.desc("rt_favorite_count"), F.asc("rt_id"))
    return (rt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= per_tweet))


def paginate(df: DataFrame, sort_cols: list, page: int,
             page_size: int = 10) -> DataFrame:
    """T7: page slice (app.py:146-148,200-202).

    Rows 1..page_end of the sort are exactly orderBy().limit(page_end)
    — a TakeOrderedAndProject (per-partition top-k, tiny merge on one
    reducer, never a global sort). The unpartitioned row_number window
    then runs over at most page_end rows, so its single-partition
    execution is a constant-size step at any corpus scale, instead of
    the all-rows-to-one-task sort a bare global window would be.
    """
    start = page * page_size + 1
    page_end = start + page_size - 1
    bounded = df.orderBy(*sort_cols).limit(page_end)
    w = Window.orderBy(*sort_cols)
    return (bounded.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") >= start)
            .drop("__rn"))


def top_keywords(tweets: DataFrame, k: int = 10,
                 stopwords: tuple[str, ...] = STOPWORDS) -> DataFrame:
    """A2: the cache-warming top-k corpus keywords (cache.py:220-240):
    explode(tokens - stopwords) → hash count → TakeOrdered."""
    return (
        tweets.select(F.explode(extract_keywords_col(F.col("text"),
                                                     stopwords)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(k)
    )
