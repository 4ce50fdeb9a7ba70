"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a catalog query through Spark and its oracle SQL through DuckDB on
the same parquet tables, then compares row count, column names, and an
order-insensitive multiset of normalized values. Keeping this in-repo
means every operator is verified the same way the driver will verify it
before we ever commit it.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from twitter_analysis_spark.sources.io import TESTDATA_TABLES


def _norm(v):
    """Normalize one cell so Spark and DuckDB representations compare equal."""
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def inject_nulls(spark, src: str, dst: str, rate: int = 50,
                 tables=TESTDATA_TABLES) -> None:
    """Write a NULL-injected copy of a testdata dir (hazard-20 probe).

    Deterministically NULLs ~1/rate of the cells in EVERY column of
    every table. Each cell's fate is a pure function of the SOURCE
    row's string form and its own column index — all replacement
    expressions are built against the original frame in one select, so
    nulling column i never perturbs columns i+1… . Shared by
    tools/null_audit.py (full-catalog sweep) and
    tests/test_null_contracts.py (the per-row planted-NULL pins).
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    from twitter_analysis_spark.sources.io import load_table

    for t in tables:
        df = load_table(spark, src, t)
        row_str = F.concat_ws("\x00", *[
            F.col(x).cast("string") for x in df.columns])
        out = df.select(*[
            F.when(F.pmod(F.xxhash64(row_str, F.lit(i)),
                          F.lit(rate)) == 0,
                   F.lit(None)).otherwise(F.col(c)).alias(c)
            for i, c in enumerate(df.columns)])
        tmp_dir = os.path.join(dst, f"_{t}_dir")
        out.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
        part = next(f for f in os.listdir(tmp_dir)
                    if f.endswith(".parquet"))
        # the oracle layer expects FLAT <table>.parquet files like the
        # real testdata, not spark output directories
        shutil.move(os.path.join(tmp_dir, part),
                    os.path.join(dst, f"{t}.parquet"))
        shutil.rmtree(tmp_dir)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare(spark, sf_dir: str, name: str, query_fn, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    sdf = query_fn(spark, sf_dir)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    con = duck_connection(sf_dir)
    res = con.execute(oracle)
    dcols = [d[0].lower() for d in res.description]
    drows = [tuple(_norm(v) for v in row) for row in res.fetchall()]

    problems: list[str] = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"{name}: columns differ spark={scols} duck={dcols}")
        return problems
    # Driver sorts columns by name before hashing — do the same.
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    # repr-keyed sort: total order even with NULLs / mixed types in a
    # column (plain tuple comparison raises on None < str).
    sset = sorted((tuple(r[i] for i in sidx) for r in srows), key=repr)
    dset = sorted((tuple(r[i] for i in didx) for r in drows), key=repr)
    if len(sset) != len(dset):
        problems.append(f"{name}: row count spark={len(sset)} duck={len(dset)}")
    if sset != dset:
        diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
        only_s = [r for r in sset[:2000] if r not in set(dset)][:3]
        problems.append(
            f"{name}: value mismatch; first pair diffs={diffs!r} spark-only={only_s!r}")
    return problems
