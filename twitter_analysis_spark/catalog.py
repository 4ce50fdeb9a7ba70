"""Query catalog: every implemented operator as a named (Spark, oracle) pair.

Each entry maps one operator from SURVEY.md §2 onto the driver's
TPC-H-ish tables (TESTDATA.md). ``QUERIES[name]`` is a callable
``(spark, sf_dir) -> DataFrame`` built with the DataFrame API;
``ORACLES[name]`` is the equivalent ANSI SQL that DuckDB runs on the
same parquet files. The driver hash-compares the two at sf0.01, so the
two sides must agree on column NAMES, types, and exact values.

Cross-engine determinism rules used throughout (the hard-won part):

- **Money/measure aggregates go through DECIMAL.** ``SUM(double)`` is
  order-dependent in the last bits (Spark partial aggregation vs DuckDB
  single-node fold), so any double aggregate would hash-mismatch.
  Casting each operand to DECIMAL(18,2) first makes the sum exact and
  engine-independent; the final result is cast back to DOUBLE (the
  nearest-double conversion of an exact decimal is identical in both
  engines).
- **Averages = exact decimal sum / count, divided as doubles.** Both
  engines then perform one IEEE division on bit-identical inputs.
- **Event timestamps are truncated to seconds** when they appear in
  output: the parquet stores nanosecond precision, Spark holds at most
  microseconds (see sources/io.py), DuckDB keeps nanos.
- **Every ORDER BY ends with a unique key** so LIMIT/top-k/pagination
  results are set-deterministic across engines.
- **Window row_number() is cast to BIGINT** (Spark emits INT, DuckDB
  BIGINT).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.io import load_table

#: Committed Twitter-shaped fixture (tests/fixtures/gen_tweets.py,
#: materialized once — nested entities struct with an array-of-struct
#: hashtags field). Gives the TRUE nested-path F2 semantics a driver
#: oracle row; the TPC-H-ish tables have no struct-array column.
FIXTURE_TWEETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "data", "tweets.parquet")

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: Planner-estimate gate for :func:`maybe_broadcast`. Catalyst's
#: estimates are conservative without CBO (filters keep the child's
#: size, joins multiply), so anything under this bound is provably
#: small enough for an executor build side; tests shrink it to 0 to
#: simulate a 100x scale-up.
_BROADCAST_GATE_BYTES = 64 << 20


def maybe_broadcast(df: DataFrame) -> DataFrame:
    """Size-gated broadcast hint for frames that SCALE with data volume.

    An unconditional ``F.broadcast`` overrides
    ``spark.sql.autoBroadcastJoinThreshold`` *and* AQE's runtime size
    check — a hint that is harmless at sf0.1 (customer = 15k rows)
    forces a multi-GB build side into every executor (and the driver)
    at sf100. This helper consults Catalyst's own size estimate for
    the optimized subplan and attaches the hint only when the estimate
    fits well under executor memory; otherwise it returns the frame
    UNHINTED so ``autoBroadcastJoinThreshold`` / AQE decide the join
    strategy from *runtime* sizes. Because the static estimate never
    shrinks through filters/aggregates, the failure mode is benign:
    an over-estimate merely defers a still-small frame to AQE, which
    re-broadcasts it at runtime; an under-estimate (forced OOM) cannot
    happen.

    Use plain ``F.broadcast`` only for frames whose size is bounded by
    a schema constant regardless of scale factor: nation (25 rows),
    region (5), and one-row scalar aggregates.
    """
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # Connect / stats unavailable -> defer to AQE
        return df
    return F.broadcast(df) if est <= _BROADCAST_GATE_BYTES else df


# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Extension suite 1: deduplication (operators/dedup.py)
# ---------------------------------------------------------------------------

from .operators import dedup as _dedup          # noqa: E402
from .operators import multimodal as _mm        # noqa: E402
from .operators import similarity as _sim       # noqa: E402
from .operators import textstats as _ts         # noqa: E402

#: Tokenizer the oracles share with operators.dedup.tokens().
_TOKS_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
#: 3-word shingle list, mirroring operators.dedup.word_shingles(n=3).
_SHINGLES_SQL = """
    CASE WHEN len(tk) >= 3
      THEN [array_to_string(tk[i:i+2], ' ') for i in generate_series(1, len(tk)-2)]
      ELSE [array_to_string(tk, ' ')] END
"""

#: Capped distinct (doc, shingle) inverted index — mirrors
#: operators.dedup.doc_shingle_pairs with DEFAULT_MAX_SHINGLE_DF, the
#: pair-explosion guard every production Jaccard path applies (the cap
#: must appear on BOTH engines or set sizes / intersections diverge).
#: Expects a ``toks(doc_id, tk)`` CTE in scope.
_SH_CAPPED_SQL = f"""
      SELECT doc, shingle FROM (
        SELECT doc, shingle,
               count(*) OVER (PARTITION BY shingle) AS shingle_df
        FROM (SELECT DISTINCT doc_id AS doc,
                     unnest({_SHINGLES_SQL}) AS shingle FROM toks))
      WHERE shingle_df <= {_dedup.DEFAULT_MAX_SHINGLE_DF}
"""




# ---------------------------------------------------------------------------
# Query registration: importing each tier module runs its @register
# calls. Import order preserves the monolith's QUERIES/ORACLES
# insertion order exactly (the driver iterates it).
# ---------------------------------------------------------------------------

from . import catalog_core  # noqa: E402,F401
from . import catalog_dedup_sim  # noqa: E402,F401
from . import catalog_text_corpus  # noqa: E402,F401
from . import catalog_tpch  # noqa: E402,F401
from . import catalog_rollup_graph  # noqa: E402,F401
from . import catalog_sampling_ts_dq  # noqa: E402,F401

# Non-registered helpers tests reach through the facade.
from .catalog_dedup_sim import a11_sketch_detail  # noqa: E402,F401
