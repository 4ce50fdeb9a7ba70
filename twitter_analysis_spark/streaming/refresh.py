"""Streaming cache refresh: the reference's dead cron hook, made real.

cache.py:242-245 sketches a periodic cache_maintenance() that was never
scheduled (the schedule/asyncio imports are commented out at
cache.py:9-10). The Spark-native version: a Structured Streaming job
over the capture drop-dir whose every trigger recomputes the corpus'
top keywords and re-warms the query memo (K4) through ``foreachBatch``
— continuous refresh with exactly-once batch semantics per trigger,
instead of a cron process poking Mongo.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..plans.memo import QueryMemo
from .keyword_counts import streaming_keyword_counts


def streaming_cache_refresh(spark: SparkSession, drop_dir: str,
                            memo: QueryMemo, search_builder,
                            k: int = 10,
                            window: str = "60 minutes"):
    """Warm ``memo`` with searches for the stream's top-k keywords.

    ``search_builder(keyword) -> DataFrame`` builds the search to
    materialize per keyword (the same builder the online path uses, so
    warmed entries are byte-identical to organic ones). Runs with
    ``availableNow`` — drain what's in the directory, refresh, stop;
    schedule it, or drop the trigger for a continuously-running
    refresher.
    """
    counts = streaming_keyword_counts(spark, drop_dir, window=window)

    def refresh(batch_df, batch_id: int) -> None:
        top = (
            batch_df.groupBy("tok").agg(F.sum("cnt").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("tok"))
            .limit(k)
        )
        memo.warm(top, search_builder, k=k)

    q = (
        counts.writeStream
        .foreachBatch(refresh)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
