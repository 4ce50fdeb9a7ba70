"""Structured Streaming over the tweet capture (SURVEY.md §2.9).

The reference has no real streaming — its "Twitter stream" is a static
file processed in a batch loop, and its refresh hook is an unscheduled
cron stub (cache.py:242-245). This module is the Spark-native upgrade:
``readStream`` over a JSON drop-directory with the same raw schema,
event-time tumbling-window keyword counts with a watermark for late
data. The same query graph the batch A2 aggregation uses, lifted to a
stream — which is exactly the Structured Streaming promise.

Run modes:
- continuous: ``writeStream.outputMode("append")`` to Parquet/console;
- tests/backfill: ``trigger(availableNow=True)`` drains the directory
  as one incremental batch and stops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import parse_twitter_ts
from ..functions.text import STOPWORDS, extract_keywords_col
from ..sources.tweets_raw import raw_status_schema


def streaming_keyword_counts(spark: SparkSession, drop_dir: str,
                             window: str = "10 minutes",
                             watermark: str = "30 minutes",
                             stopwords: tuple[str, ...] = STOPWORDS,
                             ) -> DataFrame:
    """Event-time windowed keyword counts over a raw-capture drop dir.

    Watermark bounds state: windows older than (max event time -
    watermark) are finalized and their state dropped, so the stateful
    aggregation holds O(active windows × distinct tokens), not the
    whole history — the difference between a stream job that runs for
    months and one that OOMs.
    """
    raw = (
        spark.readStream
        .schema(raw_status_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(drop_dir)
        .where(F.col("_corrupt_record").isNull()
               & F.col("id_str").isNotNull())
    )
    toks = (
        raw.select(
            parse_twitter_ts(F.col("created_at")).alias("event_ts"),
            F.explode(extract_keywords_col(F.col("text"),
                                           stopwords)).alias("tok"),
        )
        .where(F.col("event_ts").isNotNull())
        .withWatermark("event_ts", watermark)
    )
    return (
        toks.groupBy(F.window("event_ts", window).alias("win"), F.col("tok"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"), "tok", "cnt")
    )


def run_available_now(result: DataFrame, query_name: str = "kw_counts"):
    """Drain whatever is in the drop dir as one incremental batch into
    an in-memory sink (complete mode: windowed counts are re-emitted
    per trigger) and stop — the test/backfill harness."""
    q = (
        result.writeStream
        .format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
