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

NULL contract (total, ANSI-ASOF-identical — r14, null-audit class B):

- right rows with a NULL key or NULL time are UN-MATCHABLE under the
  ASOF inequality (``left.ts >= NULL`` is never true; NULL keys never
  equal) and are dropped up front — the union-window plan would
  otherwise group NULL keys together and sort NULL times first, making
  such rows visible to every left row;
- left rows ALWAYS survive (left-join semantics): NULL key/time left
  rows simply get a NULL payload;
- the payload travels as ONE struct so "no right row yet" (NULL
  struct, skipped by ``last(ignorenulls)``) stays distinct from "the
  matched right row's payload IS NULL" (non-null struct with NULL
  fields, propagated) — a bare per-column ``last(ignorenulls)`` would
  skip past a NULL payload to an OLDER right row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              payload: list[str]) -> DataFrame:
    """Left as-of join: all left columns + latest ``payload`` columns
    from ``right`` as of each left row's ``left_ts`` (inclusive)."""
    lcols = left.columns
    pay_t = StructType([StructField(c, right.schema[c].dataType)
                        for c in payload])
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(pay_t).alias("_pay"),
    )
    r = (right
         .where(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
         .select(
             F.col(key).alias("_k"),
             F.col(right_ts).alias("_t"),
             F.lit(0).alias("_is_left"),
             *[F.lit(None).cast(left.schema[c].dataType).alias(c)
               for c in lcols],
             F.struct(*payload).alias("_pay"),
         ))
    # right rows (tag 0) sort before left rows (tag 1) at equal _t:
    # inclusive as-of bound.
    w = (Window.partitionBy("_k").orderBy(F.asc("_t"), F.asc("_is_left"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = (l.unionByName(r)
              .withColumn("_pay", F.last("_pay", ignorenulls=True).over(w)))
    return (
        merged.where(F.col("_is_left") == 1)
        .select(*lcols, *[F.col("_pay")[c].alias(c) for c in payload])
    )
