"""Mergeable frequency sketches: Count-Min over a token stream.

The rollup tier already keeps HLL sketches for distinct counts
(operators/rollup.py); this adds the frequency side — Count-Min
(Cormode & Muthukrishnan 2005), the sketch that answers "how often
does term t occur?" in O(depth) cells regardless of corpus size. Why
it fits Spark exactly:

- **Building it is one partial aggregate.** Every (row j, bucket)
  cell is a SUM of occurrence counts, so map-side combine does most
  of the work and the shuffle carries at most ``depth x width`` rows
  per partition. No holistic state, no driver presence.
- **It is mergeable by addition**: sketches of two corpus halves (or
  of yesterday and today) sum cell-wise into the sketch of the union
  — the property that makes it a rollup-friendly column, verified in
  tests.
- **Estimates are deterministic**: the hash family is the portable
  md5 construction used across this repo (dedup.py), so the DuckDB
  oracle rebuilds the sketch bit-for-bit and the catalog row is a
  full hash-match, not a tolerance check. Estimation error is
  one-sided (est >= truth, overcount <= 2N/width with prob
  1 - 2^-depth) — also pinned in tests.

At 100 TB the sketch (depth x width cells) replaces a vocabulary-sized
exact count table wherever an upper-bounded frequency suffices:
stopword discovery, hot-key detection before a join (feeding
skew.salted_join's salt choice), or per-shard term stats merged
corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 512


def cms_bucket(token: Column, j: int, width: int) -> Column:
    """Row-j bucket of a token: first 8 md5 hex digits of 'j#token',
    mod width. Portable: DuckDB spells the identical expression."""
    return (F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}#"), token)),
                               1, 8), 16, 10)
            .cast("long") % width)


def cms_build(occurrences: DataFrame, token_col: str,
              depth: int = DEFAULT_DEPTH,
              width: int = DEFAULT_WIDTH) -> DataFrame:
    """Count-Min sketch of a token occurrence stream.

    ``occurrences``: one row per token occurrence. Returns
    (j, bucket, cnt) with exactly the non-zero cells; absent cells are
    zero. One aggregate; the pre-shuffle explode costs ``depth`` rows
    per occurrence but they combine map-side into <= depth x width
    cells per task.
    """
    tok = F.col(token_col)
    rows = occurrences.select(
        F.explode(F.array([
            F.struct(F.lit(j).alias("j"),
                     cms_bucket(tok, j, width).alias("bucket"))
            for j in range(depth)
        ])).alias("c"))
    return (rows.select("c.j", "c.bucket")
            .groupBy("j", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(sketch: DataFrame, queries: DataFrame, token_col: str,
                 depth: int = DEFAULT_DEPTH,
                 width: int = DEFAULT_WIDTH) -> DataFrame:
    """Point estimates for each query token: min over the depth cells.

    The sketch side is depth x width rows at most — broadcastable at
    any corpus size (its size is a config constant, not data-driven),
    so the probe is a map-side join however large the query set is.
    Missing cells read as 0 (the token never hashed there).
    """
    tok = F.col(token_col)
    probes = queries.select(
        token_col,
        F.explode(F.array([
            F.struct(F.lit(j).alias("j"),
                     cms_bucket(tok, j, width).alias("bucket"))
            for j in range(depth)
        ])).alias("c")) \
        .select(token_col, "c.j", "c.bucket")
    return (probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
            .groupBy(token_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("bigint").alias("est_cnt")))
