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
