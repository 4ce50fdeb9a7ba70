"""Skew-resilient equi-join via key salting.

``a8_salted_skew_agg`` (catalog.py) handles skewed AGGREGATION; this
module handles the join half of the problem. When one join key carries
a disproportionate share of the fact rows (the celebrity-user problem
in the reference's domain — app.py:150-152 sorts by follower count
precisely because such hubs exist), a plain shuffle join hashes every
row of the hot key onto ONE reducer: the stage runs at the speed of
its slowest task and can spill or die at 100 TB no matter how many
executors exist.

The classic pre-plan remedy: replicate the dimension side across
``n_salts`` salt values and scatter the fact side across the same salt
space with a per-row hash, so the hot key's rows spread over
``n_salts`` reducers. Cost: the dimension side is duplicated
``n_salts`` times (choose salts ~ skew factor, not thousands), and the
join key widens by one int. The result is provably identical to the
unsalted join — every fact row meets exactly one replica of each
matching dimension row — which the catalog row proves against a plain
SQL join oracle.

When to prefer AQE instead: ``spark.sql.adaptive.skewJoin`` splits
oversized SORT-MERGE partitions at runtime and needs no code change —
use it when skew is occasional and unknown. Salting is the portable,
plan-shape-stable answer when the skew is structural and known (power
-law user activity), works for broadcast-ineligible dimension sides,
and composes with bucketing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Internal salt column; dropped before returning.
_SALT = "_salt"


def salted_join(big: DataFrame, small: DataFrame,
                on: str | Sequence[str],
                row_cols: Sequence[str],
                n_salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join ``big`` with ``small`` spreading hot keys over salts.

    ``on``: equi-join column name(s), present in BOTH frames.
    ``row_cols``: columns of ``big`` whose hash scatters its rows
    across the salt space — any deterministic per-row discriminator
    (a primary key is ideal; a coarse one merely spreads less).
    ``how``: 'inner' or 'left' (the salted rewrite is identity-
    preserving for both: the small side is replicated to EVERY salt,
    so a big row finds its matches — or its absence — within its own
    salt slice).

    Result column set and multiplicities equal the unsalted
    ``big.join(small, on, how)`` exactly.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on_cols = [on] if isinstance(on, str) else list(on)
    scatter: Column = F.pmod(
        F.xxhash64(*[F.col(c) for c in row_cols]), F.lit(n_salts))
    big_s = big.withColumn(_SALT, scatter)
    small_r = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return big_s.join(small_r, on_cols + [_SALT], how).drop(_SALT)


def skew_split_join(big: DataFrame, small: DataFrame,
                    on: str | Sequence[str],
                    row_cols: Sequence[str],
                    n_salts: int = 16,
                    hot_threshold: int | None = None,
                    hot_keys: DataFrame | None = None,
                    how: str = "inner",
                    cleanup: list | None = None) -> DataFrame:
    """Hot-key split join: salt ONLY the keys that need it.

    ``salted_join`` replicates the WHOLE small side ``n_salts`` times —
    the right trade when most keys are hot, but at 100 TB a power-law
    distribution usually has a handful of hot keys atop a long cold
    tail, and 16x-ing a billion-row dimension to fix three celebrity
    keys pays 16x the dimension shuffle for nothing. The production
    split (what AQE's skew-join approximates at runtime, made explicit
    and plan-stable here):

    1. detect hot keys — one aggregate over ``big`` (map-side partial
       combine collapses it to one row per key per partition, so the
       detection never itself suffers the skew it measures), keeping
       keys with more than ``hot_threshold`` rows. Pass precomputed
       ``hot_keys`` (any DataFrame with the join columns) to skip the
       scan — at deploy scale these come from table statistics;
    2. big rows with a hot key take the salted path against ONLY the
       matching slice of ``small`` (replicated ``n_salts`` times —
       a few rows, broadcast-cheap);
    3. everything else joins plain, unsalted and unreplicated;
    4. union. Result == ``big.join(small, on, how)`` exactly: the two
       branches partition ``big`` by hot-key membership, and NULL-key
       rows fall to the cold branch where the join's own NULL
       semantics apply unchanged.

    The hot-key frame feeds THREE consumers (big's semi and anti
    probes, small's slice pruning), and Spark plans a tree — without
    a persist the detection lineage (a full fact-table scan at deploy
    scale) would execute once PER consumer (observed: j9's pre-fix
    plan scanned events 8x). It is therefore persisted here; pass
    ``cleanup`` (the dedup.py pattern) to ``unpersist()`` it after the
    result materializes — without it, repeated calls in a long-lived
    session accumulate cached storage (bench clears via
    ``spark.catalog.clearCache()``). The hot SET itself is tiny by
    construction (≤ |big|/threshold keys).

    Measured (artifacts/BENCH_SKEW_r15.json, planted 30%/90% hot key):
    the full-replication salted join ties or wins plain locally; the
    split keeps that win while shrinking the replicated volume from
    |small| x n_salts to |hot slice| x n_salts.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_split_join supports inner/left, got {how!r}")
    if (hot_threshold is None) == (hot_keys is None):
        raise ValueError("pass exactly one of hot_threshold / hot_keys")
    on_cols = [on] if isinstance(on, str) else list(on)
    if hot_keys is None:
        hot_keys = (big.groupBy(*on_cols)
                    .agg(F.count(F.lit(1)).alias("_n"))
                    .where(F.col("_n") > hot_threshold)
                    .select(*on_cols))
    hot_set = hot_keys.select(*on_cols).persist()
    if cleanup is not None:
        cleanup.append(hot_set)
    hot = F.broadcast(hot_set)
    big_hot = big.join(hot, on_cols, "left_semi")
    big_cold = big.join(hot, on_cols, "left_anti")
    small_hot = small.join(hot, on_cols, "left_semi")
    salted = salted_join(big_hot, small_hot, on=on_cols,
                         row_cols=row_cols, n_salts=n_salts, how=how)
    plain = big_cold.join(small, on_cols, how)
    return salted.unionByName(plain)
