"""Compaction and upsert maintenance ops: data-identical, layout-better."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from twitter_analysis_spark.sources.maintenance import (
    compact_parquet, upsert_by_key,
)


def _parquet_files(path: str) -> list[str]:
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_compact_reduces_files_preserves_data(spark, tmp_path):
    path = str(tmp_path / "frag")
    src = spark.range(50_000).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    # fragmented write: 64 tiny files
    src.repartition(64).write.parquet(path)
    assert len(_parquet_files(path)) == 64
    before = {(r["id"], r["k"]) for r in spark.read.parquet(path).collect()}

    n = compact_parquet(spark, path, target_file_mb=128, sort_within_by=["k"])
    assert n == 1 and len(_parquet_files(path)) == 1
    after = {(r["id"], r["k"]) for r in spark.read.parquet(path).collect()}
    assert after == before


def test_upsert_by_key(spark, tmp_path):
    path = str(tmp_path / "snap")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k long, v string, ver long")
    v1.write.parquet(path)

    updates = spark.createDataFrame(
        [(2, "b2", 20),          # newer version replaces
         (3, "c_old", 5),        # OLDER version must lose
         (4, "d", 20)],          # new key inserts
        "k long, v string, ver long")
    upsert_by_key(spark, path, updates, key="k", order_by="ver")

    got = {r["k"]: (r["v"], r["ver"])
           for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 10), 4: ("d", 20)}
    # replay of the same updates is idempotent
    upsert_by_key(spark, path, updates, key="k", order_by="ver")
    again = {r["k"]: (r["v"], r["ver"])
             for r in spark.read.parquet(path).collect()}
    assert again == got


def test_swap_crash_never_loses_table(spark, tmp_path, monkeypatch):
    """A crash at any point of the table swap leaves the data
    recoverable: the old table is moved aside, never deleted, until the
    new one is live."""
    import shutil

    from twitter_analysis_spark.sources import maintenance as m

    path = str(tmp_path / "snap")
    v1 = spark.createDataFrame([(1, "a")], "k long, v string")
    v1.write.parquet(path)
    updates = spark.createDataFrame([(2, "b")], "k long, v string")

    # Crash while moving the new table in: the original must be restored.
    real_rename = os.rename

    def crash_on_tmp_move(src, dst):
        if dst == path and "__upsert_" in src:
            raise OSError("simulated crash")
        real_rename(src, dst)

    monkeypatch.setattr(m.os, "rename", crash_on_tmp_move)
    try:
        upsert_by_key(spark, path, updates, key="k")
    except OSError:
        pass
    monkeypatch.setattr(m.os, "rename", real_rename)
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {1}

    # Crash during old-table cleanup: the NEW table is already live and
    # complete; only a stray __old dir leaks.
    def crash_rmtree(p, *a, **kw):
        raise OSError("simulated crash")

    monkeypatch.setattr(m.shutil, "rmtree", crash_rmtree)
    try:
        upsert_by_key(spark, path, updates, key="k")
    except OSError:
        pass
    monkeypatch.setattr(m.shutil, "rmtree", shutil.rmtree)
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {1, 2}
