"""Raw capture → curated tables ETL (reference: DataProcessing.ipynb).

The reference runs three row-at-a-time passes over the file (originals,
retweet assembly, users — cells 16/34) with in-memory dicts for dedup
and random-access joins. Here the whole load is two declarative Spark
jobs over one scan:

- ``build_tweets``: RT classification (F7) → hoist ``retweeted_status``
  (cell16:17-19) → project tweet_fields (P1) → dedup by id (A3) →
  retweet-array assembly (J3: groupBy + collect_list + left join).
- ``build_users``: harvest user / retweeted_status.user /
  quoted_status.user (U1, cell34:1-9) → unionByName → dedup by id_str
  → typed casts (bool→int stays bool here; Twitter date → timestamp,
  cell33:10-11).

Scale: the only shuffles are the dedup hash-aggregates and the
groupBy(og_id) assembly — both partial-aggregated map-side and
spill-safe, replacing dicts that would OOM at 100 TB. The scan itself
is a schema-projected JSON read; at scale the capture would be
re-encoded to Parquet once and all downstream reads become columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import parse_twitter_ts
from ..sources.tweets_raw import read_raw_stream

#: Scalar fields copied into the curated document
#: (tweet_fields, DataProcessing.ipynb:cell16:1-2).
TWEET_FIELDS = ["id_str", "created_at", "favorite_count", "lang",
                "quote_count", "reply_count", "retweet_count", "entities"]

def _is_rt():
    return F.col("text").startswith("RT")   # the defining rule, cell16:17


def _project_status(prefix: str) -> list:
    """Project one nesting level to the curated tweet columns
    (cell16:25-31: _id/text/user_id + tweet_fields)."""
    p = (prefix + ".") if prefix else ""
    return [
        F.col(f"{p}id_str").alias("_id"),
        F.col(f"{p}id_str").alias("id_str"),
        F.col(f"{p}user.id_str").alias("user_id"),
        F.col(f"{p}text").alias("text"),
        *[F.col(f"{p}{f}").alias(f) for f in TWEET_FIELDS if f != "id_str"],
        F.col(f"{p}is_quote_status").alias("is_quote_status"),
    ]


def build_tweets(raw: DataFrame) -> DataFrame:
    """Curated originals with nested ``retweets`` arrays (cells 16-18)."""
    # Pass-1 equivalent: originals = non-RT lines + hoisted
    # retweeted_status of RT lines (an RT line without retweeted_status
    # is the reference's exception path -> dropped).
    rt_lines = raw.where(_is_rt() & F.col("retweeted_status").isNotNull())
    og_direct = raw.where(~_is_rt()).select(
        *_project_status(""),
        F.col("quoted_status").alias("quoted_status"),
    )
    og_hoisted = rt_lines.select(
        *_project_status("retweeted_status"),
        F.col("retweeted_status.quoted_status").alias("quoted_status"),
    )
    originals = og_direct.unionByName(og_hoisted).dropDuplicates(["id_str"])

    # Pass-2 equivalent (cell16:60-102): assemble each original's
    # retweets array with one groupBy+collect_list instead of a second
    # file pass + random-access dict.
    rts = rt_lines.select(
        F.col("retweeted_status.id_str").alias("og_id"),
        F.struct(
            F.col("id_str").alias("_id"),
            F.col("id_str").alias("id_str"),
            F.col("user.id_str").alias("user_id"),
            F.col("text").alias("text"),
            F.col("created_at").alias("created_at"),
            F.col("favorite_count").alias("favorite_count"),
            F.col("lang").alias("lang"),
            F.col("quote_count").alias("quote_count"),
            F.col("reply_count").alias("reply_count"),
            F.col("retweet_count").alias("retweet_count"),
            F.col("entities").alias("entities"),
        ).alias("rt"),
    )
    rt_arrays = (
        rts.groupBy("og_id")
        # Deterministic array order (the reference's order is file order,
        # which is not reproducible under parallelism): sort by retweet id.
        .agg(F.array_sort(F.collect_list("rt")).alias("retweets"))
    )
    return (
        originals.join(rt_arrays,
                       originals.id_str == rt_arrays.og_id, "left")
        .drop("og_id")
        .withColumn("retweets", F.coalesce(
            "retweets", F.array().cast(rt_arrays.schema["retweets"].dataType)))
        .withColumn("created_at_ts", parse_twitter_ts(F.col("created_at")))
    )


def build_users(raw: DataFrame) -> DataFrame:
    """users_info from all three nesting levels (cell34), one pass."""
    def level(prefix: str) -> DataFrame:
        p = (prefix + ".") if prefix else ""
        return raw.where(F.col(f"{p}user").isNotNull()).select(
            F.col(f"{p}user.id_str").alias("id"),
            F.col(f"{p}user.name").alias("name"),
            F.col(f"{p}user.screen_name").alias("screen_name"),
            F.col(f"{p}user.location").alias("location"),
            F.col(f"{p}user.description").alias("description"),
            F.col(f"{p}user.verified").alias("verified"),
            F.col(f"{p}user.followers_count").cast("int").alias("followers_count"),
            F.col(f"{p}user.friends_count").cast("int").alias("friends_count"),
            # '%a %b %d %H:%M:%S %z %Y' -> DATETIME (cell33:11)
            parse_twitter_ts(F.col(f"{p}user.created_at")).alias("created_at"),
        )
    return (
        level("")
        .unionByName(level("retweeted_status"))
        .unionByName(level("quoted_status"))
        .dropDuplicates(["id"])
    )


def run_etl(spark: SparkSession, raw_path: str, out_dir: str) -> dict[str, int]:
    """Full load job: scan once, write curated tweets + users Parquet.

    Returns the golden counts (the reference's printed invariants,
    cells 17/26/35)."""
    raw = read_raw_stream(spark, raw_path)
    tweets = build_tweets(raw)
    users = build_users(raw)
    tweets.write.mode("overwrite").parquet(f"{out_dir}/tweets.parquet")
    users.write.mode("overwrite").parquet(f"{out_dir}/users.parquet")
    return {
        "n_tweets": spark.read.parquet(f"{out_dir}/tweets.parquet").count(),
        "n_users": spark.read.parquet(f"{out_dir}/users.parquet").count(),
    }
