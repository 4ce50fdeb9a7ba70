"""Range (interval-containment) join via time-bucket equi-join.

Spark has no native range join; the naive formulation
``events JOIN intervals ON key AND start <= ts AND ts < end`` plans as
BroadcastNestedLoopJoin — O(|events| × |intervals|) per key and a
non-starter at scale. The standard fix, implemented here as a
composition of built-ins:

1. quantize time into fixed buckets of ``bucket_seconds``;
2. events join on (key, bucket) — each event has exactly one bucket,
   each interval explodes to the (few) buckets it overlaps, so the
   equi-join shuffle carries |events| + |intervals| × avg_buckets rows;
3. the exact containment predicate filters inside the matched bucket.

Cost collapses from quadratic to one hash shuffle; bucket width trades
replication of intervals (wider = fewer copies) against join fanout
(narrower = fewer false bucket matches). Pick it near the typical
interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(events: DataFrame, intervals: DataFrame, key: str,
                  ts: str = "ts", start: str = "start", end: str = "end",
                  bucket_seconds: int = 1800) -> DataFrame:
    """Rows of ``events`` matched to every interval of the same key
    containing them (start inclusive, end exclusive)."""
    b = F.lit(bucket_seconds).cast("long")
    ev = events.withColumn(
        "_b", (F.unix_timestamp(F.col(ts).cast("timestamp")) / b)
        .cast("long"))
    iv = intervals.withColumn(
        "_b",
        F.explode(F.sequence(
            (F.unix_timestamp(F.col(start).cast("timestamp")) / b).cast("long"),
            # end is exclusive: the last overlapped bucket holds end - 1s
            ((F.unix_timestamp(F.col(end).cast("timestamp")) - 1) / b)
            .cast("long"),
        )),
    )
    return (
        ev.join(iv, [key, "_b"])
        .where((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_b")
    )
