"""Broadcast Bloom-filter prefilters for semi-join-shaped operators.

The decontamination semi-join (operators/curation.py:decontaminate)
ships every corpus document's shingles into a join against the
benchmark set. At 100 TB the join itself is already broadcast, but the
corpus side still *explodes* every shingle of every document into the
probe. A Bloom filter over the benchmark shingles — built once, a few
KB, shipped as a plan literal — lets the scan drop clean shingles (and
whole clean documents) BEFORE the explode ever reaches the join, while
the exact join afterwards removes the false positives, so the final
answer is bit-identical to the exact operator: Bloom filters have no
false negatives.

Everything is Catalyst expressions: the k hash probes are ``xxhash64``
(JVM, codegen), the bit test is ``element_at`` + ``bitwiseAND``
against two literal arrays (the filter words and a 64-entry bit-mask
table — Spark's ``shiftleft`` wrapper only takes literal shift
amounts, so masks are table-looked-up instead of shifted). The filter
build is one explode + hash-agg over the SMALL side, then a driver
collect bounded by ``m_bits/64`` words (8 KiB at the default m=2^16)
— never by data volume.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default filter size: 2^16 bits = 8 KiB = 1024 longs. With k=3
#: hashes, n inserted keys give FP rate ~(1 - e^{-kn/m})^k — under 1%
#: up to n ≈ 5k keys; size m to ~10 bits/key for big benchmark sets.
DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 3


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k independent bit positions for a value: xxhash64 seeded by a
    probe-index literal column, folded into [0, m_bits)."""
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
            for i in range(k)]


def bloom_build(keys: DataFrame, key_col: str,
                m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                ) -> list[int]:
    """Build the filter: a dense list of ``m_bits/64`` Python ints.

    One explode (k positions per key) + one hash-aggregate
    (``bit_or`` of single-bit words, partial map-side), then a collect
    bounded by the filter size — the words list is the broadcastable
    artifact callers bake into probe plans as a literal. Callers need
    NOT dedup ``keys`` first: ``bit_or`` is idempotent, so duplicate
    keys cost only partial-aggregate work, never an extra shuffle.
    """
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k)))
        .alias("pos"))
    rows = (
        pos.select((F.col("pos") / 64).cast("int").alias("w"),
                   F.expr("shiftleft(cast(1 as bigint), "
                          "cast(pos % 64 as int))").alias("bit"))
        .groupBy("w").agg(F.expr("bit_or(bit)").alias("word"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_might_contain(col: Column, words: list[int],
                        m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
                        ) -> Column:
    """Pure-expression membership probe: AND over k bit tests.

    ``words`` and the bit-mask table enter the plan as array literals;
    each test is element_at + bitwiseAND. Use it as a plain WHERE
    predicate on an exploded/flat column — there it runs inside
    whole-stage codegen. Do NOT bury it in a higher-order-function
    lambda (array filter): Spark evaluates HOF lambdas in interpreted
    mode per element, which measured ~4x slower than the codegen'd
    post-explode filter on the decontamination row.
    """
    words_lit = F.lit(words)
    # masks[b+1] == 1<<b as a signed 64-bit long (bit 63 is negative).
    masks_lit = F.lit([(1 << b) - (1 << 64 if b == 63 else 0)
                       for b in range(64)])
    tests = []
    for pos in _positions(col, m_bits, k):
        word = F.element_at(words_lit, (pos / 64).cast("int") + 1)
        mask = F.element_at(masks_lit, (pos % 64).cast("int") + 1)
        tests.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda x, y: x & y, tests)
