"""Focused pins for the r16 optimization-round internals changes.

Covers:
- similarity.dot / l2norm unrolled kernels: bit-identical to the
  higher-order-function folds they replace (including off-width,
  NULL, and NaN inputs) — the whole point of the unroll is that NO
  result anywhere changes;
- dedup.eager_barrier: SPARK_GRAFT_CHECKPOINT_DIR flips the minhash
  barriers from localCheckpoint (executor-local) to a reliable
  checkpoint() (VERDICT r15 item 7);
- session.get_spark: an ambient SPARK_GRAFT_EXTRA_CONF must not
  override the caller's explicit extra_conf, and malformed JSON names
  the env var (r15 ADVICE).
"""

from __future__ import annotations

import math
import os
import struct

import pytest
from pyspark.sql import functions as F

from twitter_analysis_spark.operators import dedup, similarity as sim


def _bits(x):
    if x is None:
        return None
    return struct.pack("<d", x)


def _vec(seed: int, dim: int) -> list[float]:
    # deterministic, irrational-ish components so FP order matters
    return [math.sin(seed * 31 + i) * 10 ** ((i % 7) - 3)
            for i in range(dim)]


def test_unrolled_kernels_bit_identical(spark):
    dim = sim.UNROLL_DIM or 64
    rows = [
        (1, _vec(1, dim), _vec(2, dim)),          # standard width
        (2, _vec(3, dim - 1), _vec(4, dim - 1)),  # off width -> fold path
        (3, _vec(5, 3), _vec(6, 3)),              # tiny
        (4, None, _vec(7, dim)),                  # NULL operand
        (5, [float("nan")] * dim, _vec(8, dim)),  # NaN propagates same
        (6, [], []),                              # empty arrays
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>")
    out = df.select(
        "id",
        sim.dot(F.col("a"), F.col("b")).alias("d_new"),
        sim._dot_fold(F.col("a"), F.col("b")).alias("d_old"),
        sim.l2norm(F.col("a")).alias("n_new"),
        F.sqrt(sim._sumsq_fold(F.col("a"))).alias("n_old"),
    ).collect()
    for r in out:
        assert _bits(r.d_new) == _bits(r.d_old) or (
            r.d_new is not None and r.d_old is not None
            and math.isnan(r.d_new) and math.isnan(r.d_old)), r
        assert _bits(r.n_new) == _bits(r.n_old) or (
            r.n_new is not None and r.n_old is not None
            and math.isnan(r.n_new) and math.isnan(r.n_old)), r


def test_unrolled_kernel_plan_has_no_hof(spark):
    """At the standard width the hot branch must be plain codegen'd
    expressions; the interpreted fold survives only as the off-width
    fallback branch."""
    dim = sim.UNROLL_DIM
    if dim is None:
        pytest.skip("unroll disabled")
    df = spark.createDataFrame([(1, _vec(1, dim), _vec(2, dim))],
                               "id long, a array<double>, b array<double>")
    plan = df.select(sim.dot(F.col("a"), F.col("b")).alias("d")) \
             ._jdf.queryExecution().executedPlan().toString()
    # the unrolled branch compiles to element_at chains, and the WHEN
    # guard keeps exactly one aggregate() fallback per kernel
    assert "element_at" in plan


def test_eager_barrier_env_gate(spark, tmp_path, monkeypatch):
    df = spark.range(10).toDF("x")

    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    local = dedup.eager_barrier(df)
    assert local.rdd.getNumPartitions() >= 1
    assert "LogicalRDD" in local._jdf.queryExecution().logical().toString()

    ckdir = str(tmp_path / "ck")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    reliable = dedup.eager_barrier(spark.range(10).toDF("x"))
    assert reliable.count() == 10
    # reliable checkpoint writes RDD blocks under the configured dir
    found = []
    for root, _dirs, files in os.walk(ckdir):
        found.extend(files)
    assert found, "reliable checkpoint() wrote nothing under the env dir"


def test_env_conf_does_not_override_explicit(monkeypatch):
    from twitter_analysis_spark import session as sess

    monkeypatch.setenv("SPARK_GRAFT_EXTRA_CONF",
                       '{"spark.sql.shuffle.partitions": "7"}')
    # getOrCreate returns the live session; conf application order is
    # what we pin, via the builder's options rather than a new JVM.
    with pytest.warns(UserWarning, match="caller wins"):
        sp = sess.get_spark(
            "conf_order_test",
            extra_conf={"spark.sql.shuffle.partitions": "8"})
    # session already exists (tests fixture) -> builder applies conf
    # onto it; explicit caller value must win over the env JSON
    assert sp.conf.get("spark.sql.shuffle.partitions") == "8"


def test_env_conf_bad_json_names_the_var(monkeypatch):
    from twitter_analysis_spark import session as sess

    monkeypatch.setenv("SPARK_GRAFT_EXTRA_CONF", "{not json")
    with pytest.raises(ValueError, match="SPARK_GRAFT_EXTRA_CONF"):
        sess.get_spark("conf_bad_json_test")
