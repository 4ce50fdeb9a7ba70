"""Watermarked stream-stream interval join (attribution).

The reference never correlates two live feeds — its only "join" is the
N+1 user lookup over a static store (app.py:204-205) and the batch
retweet assembly (DataProcessing.ipynb:cell16:60-102). This module adds
the streaming capability those patterns grow into at scale: joining two
unbounded event streams on a key *within a time bound*, e.g. attribute
each click to the view that preceded it.

Why the time bound is load-bearing: a stream-stream join must buffer
both sides in the state store until a match can be ruled out. The
watermark plus the `click_ts BETWEEN view_ts AND view_ts + horizon`
range condition give Spark exactly that bound — view state older than
(watermark - horizon) is evicted, so state is O(events within the
horizon), not O(stream history). Without the range condition Spark
(correctly) refuses to run an append-mode stream-stream join, because
state would be unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType, TimestampType)

#: Typed event feed (the sf* ``events`` shape, minus free-form props).
TYPED_EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])


def read_typed_event_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TYPED_EVENT_SCHEMA).json(drop_dir)
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    )


def attribution_join(events: DataFrame, horizon: str = "12 hours",
                     watermark: str = "1 hour",
                     cause: str = "view", effect: str = "click") -> DataFrame:
    """Join each `effect` event to every `cause` event by the same user
    within ``horizon`` before it.

    Both sides are carved from the same source stream (a supported
    streaming self-join); each carries its own watermark so either side
    being late bounds the other side's state retention.
    """
    causes = (
        events.where(F.col("event_type") == cause)
        .select(F.col("event_id").alias("cause_event_id"),
                F.col("ts").alias("cause_ts"),
                "user_id")
        .withWatermark("cause_ts", watermark)
    )
    effects = (
        events.where(F.col("event_type") == effect)
        .select(F.col("event_id").alias("effect_event_id"),
                F.col("ts").alias("effect_ts"),
                F.col("user_id").alias("effect_user_id"),
                "value")
        .withWatermark("effect_ts", watermark)
    )
    cond = (
        (causes["user_id"] == effects["effect_user_id"])
        & (effects["effect_ts"] >= causes["cause_ts"])
        & (effects["effect_ts"] <= causes["cause_ts"]
           + F.expr(f"INTERVAL {horizon}"))
    )
    return (
        causes.join(effects, cond, "inner")
        .select("user_id", "cause_event_id", "cause_ts",
                "effect_event_id", "effect_ts", "value")
    )
