"""As-of (point-in-time) join — a temporal operator Spark lacks natively.

``asof_join(left, right)``: for every left row, attach the most recent
right row with the same key whose time is <= the left row's time. The
workhorse of feature backfills ("customer's latest order state when the
event happened") and PIT-correct training-data assembly.

Implementation is a *composition of built-in operators*, per the
engine's custom-operator policy (no UDF needed):

1. tag both sides and union them on (key, time) — right rows carry
   their payload, left rows carry null payload;
2. one window pass per key ordered by (time, tag): ``last_value(...
   ignorenulls)`` propagates the latest right payload forward onto each
   left row;
3. filter back to left rows.

Cost model: ONE shuffle of |left| + |right| rows on the key (the same
partitioning both the window and any later per-key work reuse), versus
the naive range-join (|left| × |right| per key, quadratic on hot keys).
This is the standard log-processing formulation and it scales: at
100 TB both inputs stream through the exchange once, and skewed keys
split under AQE.

Tie semantics: right rows sort BEFORE left rows at the same timestamp
(a state change at time t is visible to an event at time t), matching
DuckDB's ASOF ``left.ts >= right.ts`` inclusive bound, which the oracle
uses. Right-side duplicates per (key, time) must be pre-deduplicated by
the caller if a deterministic winner is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              payload: list[str]) -> DataFrame:
    """Left as-of join: all left columns + latest ``payload`` columns
    from ``right`` as of each left row's ``left_ts`` (inclusive)."""
    lcols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}")
          for c in payload],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_p_{c}") for c in payload],
    )
    # right rows (tag 0) sort before left rows (tag 1) at equal _t:
    # inclusive as-of bound.
    w = (Window.partitionBy("_k").orderBy(F.asc("_t"), F.asc("_is_left"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = l.unionByName(r)
    for c in payload:
        merged = merged.withColumn(
            f"_p_{c}", F.last(f"_p_{c}", ignorenulls=True).over(w))
    return (
        merged.where(F.col("_is_left") == 1)
        .select(*lcols, *[F.col(f"_p_{c}").alias(c) for c in payload])
    )
