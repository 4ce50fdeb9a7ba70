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


def interval_overlap_pairs(df: DataFrame, keys: list[str],
                           id_cols: list[str], start: str, end: str,
                           bucket_days: int = 7) -> DataFrame:
    """Self-join: pairs of same-key rows whose [start, end] DATE
    intervals overlap (inclusive ends), with the overlap length.

    Interval-interval overlap is the case even :func:`interval_join`
    cannot express (both sides are ranges, neither is a point); the
    naive plan is again a nested-loop. Grid trick, extended: each
    interval explodes to every ``bucket_days`` grid cell it covers,
    candidates equi-join on (keys..., cell), and the pair is emitted
    ONLY from the cell containing ``greatest(start_a, start_b)`` —
    two overlapping intervals both cover that day (overlap means
    ``max(starts) <= min(ends)``), and it lies in exactly one cell, so
    every overlapping pair appears exactly once with NO distinct and
    no post-hoc dedup shuffle. Ordering ``struct(id_cols...)`` keeps
    one orientation per pair. Shuffle volume: rows × avg buckets per
    interval — pick ``bucket_days`` near the typical interval length.
    """
    day0 = F.to_date(F.lit("1970-01-01"))
    s_day = F.datediff(F.col(start), day0)
    e_day = F.datediff(F.col(end), day0)
    iv = df.select(
        *keys, *id_cols, F.col(start).alias("_s"), F.col(end).alias("_e"),
        F.explode(F.sequence(F.floor(s_day / bucket_days),
                             F.floor(e_day / bucket_days))).alias("_bk"))
    a, b = iv.alias("a"), iv.alias("b")
    ida = F.struct(*[F.col(f"a.{c}") for c in id_cols])
    idb = F.struct(*[F.col(f"b.{c}") for c in id_cols])
    sa, ea = F.col("a._s"), F.col("a._e")
    sb, eb = F.col("b._s"), F.col("b._e")
    assign_cell = F.floor(
        F.datediff(F.greatest(sa, sb), day0) / bucket_days)
    cond = F.lit(True)
    for c in keys:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cond = (cond & (F.col("a._bk") == F.col("b._bk")) & (ida < idb)
            & (sa <= eb) & (sb <= ea)
            & (F.col("a._bk") == assign_cell))
    overlap = F.datediff(F.least(ea, eb), F.greatest(sa, sb)) + 1
    return a.join(b, cond).select(
        *[F.col(f"a.{c}").alias(c) for c in keys],
        *[F.col(f"a.{c}").alias(f"{c}_1") for c in id_cols],
        *[F.col(f"b.{c}").alias(f"{c}_2") for c in id_cols],
        overlap.alias("overlap_days"))
