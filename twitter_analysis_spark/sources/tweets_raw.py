"""Raw Twitter stream-capture reader (operator S1, SURVEY.md §2.1).

The reference reads the capture line-by-line with ``json.loads`` in a
try/except, silently skipping ~18.5k malformed/non-status lines
(DataProcessing.ipynb:cell16:11-14,52-53). Spark equivalent: a
line-delimited JSON scan with an explicit schema and PERMISSIVE mode —
malformed lines land in a corrupt-record column and are filtered, valid
non-status lines (delete/limit events) simply parse with null ``id_str``
and are filtered by the same predicate. One distributed scan, no
driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _entities_type() -> T.StructType:
    # Shape per DataProcessing.ipynb cell 10 / cell 19 outputs.
    return T.StructType([
        T.StructField("hashtags", T.ArrayType(T.StructType([
            T.StructField("text", T.StringType()),
            T.StructField("indices", T.ArrayType(T.IntegerType())),
        ]))),
        T.StructField("symbols", T.ArrayType(T.StructType([
            T.StructField("text", T.StringType()),
        ]))),
        T.StructField("urls", T.ArrayType(T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("expanded_url", T.StringType()),
            T.StructField("display_url", T.StringType()),
            T.StructField("indices", T.ArrayType(T.IntegerType())),
        ]))),
        T.StructField("user_mentions", T.ArrayType(T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("id_str", T.StringType()),
            T.StructField("indices", T.ArrayType(T.IntegerType())),
            T.StructField("name", T.StringType()),
            T.StructField("screen_name", T.StringType()),
        ]))),
    ])


def _user_type() -> T.StructType:
    # users_info columns (DataProcessing.ipynb:cell32:1-15) + raw extras.
    return T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("id_str", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("screen_name", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("verified", T.BooleanType()),
        T.StructField("followers_count", T.LongType()),
        T.StructField("friends_count", T.LongType()),
        T.StructField("created_at", T.StringType()),
    ])


def _status_fields(nested: bool) -> list[T.StructField]:
    """Scalar status fields (tweet_fields list, cell16:1-2) + user +
    entities; ``nested`` adds retweeted_status/quoted_status one level
    down (Twitter nests at most: retweet -> original -> quoted)."""
    fields = [
        T.StructField("created_at", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("id_str", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("timestamp_ms", T.StringType()),
        T.StructField("favorite_count", T.LongType()),
        T.StructField("retweet_count", T.LongType()),
        T.StructField("quote_count", T.LongType()),
        T.StructField("reply_count", T.LongType()),
        T.StructField("is_quote_status", T.BooleanType()),
        T.StructField("entities", _entities_type()),
        T.StructField("user", _user_type()),
    ]
    if nested:
        inner = T.StructType(_status_fields(nested=False))
        fields += [
            T.StructField("quoted_status", inner),
            T.StructField("retweeted_status", T.StructType(
                _status_fields(nested=False)
                + [T.StructField("quoted_status", inner)])),
        ]
    return fields


def raw_status_schema() -> T.StructType:
    schema = T.StructType(_status_fields(nested=True))
    return schema.add(T.StructField("_corrupt_record", T.StringType()))


def read_raw_stream(spark: SparkSession, path: str) -> DataFrame:
    """Scan the raw capture; keep only parseable status lines.

    PERMISSIVE + corrupt-record column reproduces the reference's
    skip-bad-lines try/except; non-status control events (delete/limit)
    parse but have null id_str and are dropped by the same filter.
    """
    df = spark.read.json(
        path,
        schema=raw_status_schema(),
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    return df.where(F.col("_corrupt_record").isNull()
                    & F.col("id_str").isNotNull()).drop("_corrupt_record")
