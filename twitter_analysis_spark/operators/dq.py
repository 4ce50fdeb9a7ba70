"""Data-quality analyzers (Deequ-shaped).

The declarative CONSTRAINT gate lives in catalog.dq_constraint_report
(one multi-aggregate pass per table + a referential left-anti count);
this module holds the reusable STATS profiler it pairs with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame,
                   cols: list[tuple[str, bool]]) -> DataFrame:
    """Single-scan column profile: one output row per profiled column
    with (column_name, n_rows, n_nonnull, n_distinct, min_value,
    max_value, sum_value).

    ``cols`` is [(name, numeric)]: numeric columns also get an
    exact-integer sum (NULL otherwise). The several exact
    count-distincts rewrite into ONE Expand (Spark's multi-distinct
    machinery): map-side rows multiply by #profiled-columns+1, but the
    table is scanned once and there is one shuffle round — for very
    wide tables, batch columns per call to bound the Expand factor.
    min/max run on the native type (numeric semantics preserved), then
    cast to string so a single unpivoted schema fits every column; the
    stack() unpivot is projection-only over the one aggregated row.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, numeric in cols:
        aggs += [F.count(c).alias(f"nn_{c}"),
                 F.countDistinct(c).alias(f"nd_{c}"),
                 F.min(c).cast("string").alias(f"mn_{c}"),
                 F.max(c).cast("string").alias(f"mx_{c}")]
        if numeric:
            aggs.append(F.sum(c).cast("bigint").alias(f"s_{c}"))
    prof = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', n_rows, nn_{c}, nd_{c}, mn_{c}, mx_{c}, "
        + (f"s_{c}" if numeric else "CAST(NULL AS BIGINT)")
        for c, numeric in cols)
    return prof.selectExpr(
        f"stack({len(cols)}, {stacked}) AS "
        "(column_name, n_rows, n_nonnull, n_distinct, min_value, "
        "max_value, sum_value)")


def table_fingerprint(df: DataFrame, cols: list[str],
                      table_name: str) -> DataFrame:
    """Order- and partitioning-independent content checksum:
    one row (table_name, n_rows, fingerprint) where fingerprint =
    SUM over rows of a 60-bit md5-derived row hash, as DECIMAL(38,0).

    Addition is commutative, so the checksum is invariant under
    re-partitioning, re-ordering, compaction, and engine choice
    (md5 + decimal sum are portable) — the cheap way to answer "is
    this 100 TB copy byte-equal to that one?" without a sorted
    compare: one scan, one map-side-combined aggregate, 16 bytes of
    state. NULLs hash distinctly from empty strings via a sentinel;
    columns join with an unlikely separator. A multiset-sum checksum
    cannot see swaps that preserve the sum (adversarial collisions) —
    it is a drift tripwire, not a cryptographic commitment.
    """
    parts: list = []
    for c in cols:
        # \x01 sentinel, not \x00: a NUL byte inside a VARCHAR is
        # mishandled by some engine builds (DuckDB versions differ on
        # NUL-in-string semantics), and the sentinel only needs to be
        # a byte that cannot appear in a cast-to-string value.
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x01null")))
    row_hash = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 15),
        16, 10).cast("bigint")
    return df.agg(
        F.lit(table_name).alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_hash.cast("decimal(38,0)")).alias("fingerprint"))
