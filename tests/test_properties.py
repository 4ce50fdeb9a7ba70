"""Property-based tests (hypothesis) for the text-operator kernels.

The catalog's oracle checks pin behavior on the fixed corpus; these pin
the algebraic invariants on arbitrary inputs — the contract that makes
the dedup/similarity math trustworthy on data we haven't seen.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from twitter_analysis_spark.operators import dedup as D

WORDS = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=6),
    min_size=0, max_size=12,
)


@pytest.fixture(scope="module")
def sc_spark(spark):
    return spark


@given(words=WORDS)
@settings(max_examples=30, deadline=None)
def test_shingle_count_invariant(sc_spark, words):
    """len(shingles) == max(1, n_tokens - n + 1) for n=3 (with the
    degenerate short-doc fallback of one joined shingle)."""
    text = " ".join(words)
    df = sc_spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = (
        df.select(D.tokens(F.col("text")).alias("_tk"))
        .select(F.size(F.col("_tk")).alias("n"),
                F.size(D.word_shingles(F.col("_tk"), 3)).alias("s"))
        .first()
    )
    expect = max(1, row["n"] - 2) if row["n"] > 0 else 1
    assert row["s"] == expect


@given(a=WORDS, b=WORDS)
@settings(max_examples=15, deadline=None)
def test_jaccard_symmetric_and_bounded(sc_spark, a, b):
    """jaccard(a,b) == jaccard(b,a), in [0,1]; ==1 for identical
    non-empty docs."""
    ta, tb = " ".join(a) or "x", " ".join(b) or "y"
    df = sc_spark.createDataFrame(
        [(1, ta), (2, tb), (3, ta)], "doc_id long, text string")
    pairs = {(r["id1"], r["id2"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(
                 df, "doc_id", "text", n=3, threshold=0.0).collect()}
    # identical docs 1 and 3 must pair with jaccard 1.0
    assert pairs.get((1, 3)) == pytest.approx(1.0)
    for v in pairs.values():
        assert 0.0 <= v <= 1.0
