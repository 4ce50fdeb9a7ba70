"""Property-based tests (hypothesis) for the text-operator kernels.

The catalog's oracle checks pin behavior on the fixed corpus; these pin
the algebraic invariants on arbitrary inputs — the contract that makes
the dedup/similarity math trustworthy on data we haven't seen.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from helpers import collect_with_cleanup

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


_COHORT_EVENTS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 4)),      # user_id
        st.one_of(st.none(), st.integers(0, 40)),     # day offset
    ),
    min_size=0, max_size=25,
)


@given(evs=_COHORT_EVENTS)
@settings(max_examples=10, deadline=None)
def test_cohort_retention_matches_oracle_on_null_bearing_logs(
        sc_spark, evs):
    """Pin the r13 join→aggregate rewrite against its DuckDB oracle on
    arbitrary event logs INCLUDING null user_id / null ts — the exact
    class the round-13 review experiment caught (a JOIN drops NULL
    keys; a groupBy keeps them; the contract must be total on both
    sides)."""
    import tempfile
    from datetime import datetime, timedelta

    import duckdb

    from twitter_analysis_spark import catalog

    rows = [
        (i,
         (datetime(2024, 1, 1, 10) + timedelta(days=d))
         if d is not None else None,
         u, "view", 0.0)
        for i, (u, d) in enumerate(evs)
    ]
    df = sc_spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    with tempfile.TemporaryDirectory() as sf:
        df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
        got = sorted(
            (str(r["cohort_date"]), r["week_offset"], r["n_active"],
             r["cohort_size"], round(r["retention"], 9))
            for r in catalog.QUERIES["cohort_retention"](
                sc_spark, sf).collect())
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet/*.parquet')")
        want = sorted(
            (str(d), w, n, s, round(rt, 9))
            for d, w, n, s, rt in con.execute(
                catalog.ORACLES["cohort_retention"]).fetchall())
        con.close()
    assert got == want


@given(a=WORDS, b=WORDS)
@settings(max_examples=15, deadline=None)
def test_jaccard_symmetric_and_bounded(sc_spark, a, b):
    """jaccard(a,b) == jaccard(b,a), in [0,1]; ==1 for identical
    non-empty docs."""
    ta, tb = " ".join(a) or "x", " ".join(b) or "y"
    df = sc_spark.createDataFrame(
        [(1, ta), (2, tb), (3, ta)], "doc_id long, text string")
    pairs = {(r["id1"], r["id2"]): r["jaccard"]
             for r in collect_with_cleanup(
                 D.ngram_jaccard_pairs, df, "doc_id", "text",
                 n=3, threshold=0.0)}
    # identical docs 1 and 3 must pair with jaccard 1.0
    assert pairs.get((1, 3)) == pytest.approx(1.0)
    for v in pairs.values():
        assert 0.0 <= v <= 1.0


@given(docs=st.lists(WORDS, min_size=1, max_size=5))
@settings(max_examples=15, deadline=None)
def test_dup_spans_coverage_bounds(sc_spark, docs):
    """Duplicated-span invariants on arbitrary corpora: coverage never
    exceeds the doc's token count, a window flag implies >= window
    covered tokens, and a corpus of all-distinct single docs has zero
    coverage."""
    from twitter_analysis_spark.operators.curation import duplicated_spans

    rows = [(i, " ".join(ws) or "x") for i, ws in enumerate(docs)]
    df = sc_spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_spans(df, "doc_id", "text", window=3).collect()
    assert len(out) == len(rows)
    for r in out:
        assert 0 <= r["n_dup_tokens"] <= r["n_tok"]
        if r["n_dup_windows"] > 0:
            k = r["n_dup_windows"]
            # tightest merge: one contiguous run covers k + (w-1);
            # loosest: fully disjoint windows cover w*k (capped by doc)
            assert k - 1 + 3 <= r["n_dup_tokens"] <= min(r["n_tok"], 3 * k)
        else:
            assert r["n_dup_tokens"] == 0


@given(ws=st.lists(st.floats(min_value=0.0, max_value=4.0,
                             allow_nan=False), min_size=1, max_size=6))
@settings(max_examples=15, deadline=None)
def test_weighted_repeat_floor_ceil(sc_spark, ws):
    """Every row's multiplicity is floor(w) or ceil(w) of its own
    weight, exact for integer weights."""
    import math

    from pyspark.sql import functions as F
    from twitter_analysis_spark.operators.sampling import weighted_repeat

    rows = [(i, float(w)) for i, w in enumerate(ws)]
    df = sc_spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_repeat(df, "doc_id", F.col("w")).collect()
    counts: dict[int, int] = {}
    for r in out:
        counts[r["doc_id"]] = counts.get(r["doc_id"], 0) + 1
    for i, w in rows:
        got = counts.get(i, 0)
        assert got in (math.floor(w), math.ceil(w)), (w, got)


@given(vals=st.lists(st.integers(min_value=-1000, max_value=1000),
                     min_size=1, max_size=60),
       n_parts=st.integers(min_value=1, max_value=9))
@settings(max_examples=15, deadline=None)
def test_ranked_cumsum_two_phase_invariants(sc_spark, vals, n_parts):
    """On ANY frame and band count, the two-phase rank is a permutation
    of 1..n consistent with the order key, and the running sum at rank
    n equals the total — the invariants that make the a18/a20 gate
    safe regardless of where band boundaries fall."""
    from twitter_analysis_spark.operators.layout import ranked_cumsum

    rows = [(i, v) for i, v in enumerate(vals)]
    df = sc_spark.createDataFrame(rows, "id long, v long").repartition(3)
    got = ranked_cumsum(
        df, [F.asc("v"), F.desc("id")],
        value_col=F.col("v").cast("decimal(38,0)"),
        n_parts=n_parts, strategy="two_phase").collect()
    n = len(vals)
    ranks = sorted(r["rank"] for r in got)
    assert ranks == list(range(1, n + 1))
    ordered = sorted(got, key=lambda r: r["rank"])
    key = [(r["v"], -r["id"]) for r in ordered]
    assert key == sorted(key)
    assert int(ordered[-1]["cum"]) == sum(vals)
    running = 0
    for r in ordered:
        running += r["v"]
        assert int(r["cum"]) == running


@given(
    batch=st.lists(st.tuples(st.integers(0, 40),
                             st.text(alphabet="xy", min_size=1,
                                     max_size=3)),
                   min_size=1, max_size=15, unique_by=lambda t: t[0]),
    index=st.lists(st.tuples(st.text(alphabet="xy", min_size=1,
                                     max_size=3),
                             st.integers(100, 140)),
                   min_size=0, max_size=8,
                   unique_by=lambda t: t[0]),
)
@settings(max_examples=20, deadline=None)
def test_incremental_dedup_status_algebra(sc_spark, batch, index):
    """On ANY (batch, index) pair the classification is a partition of
    the batch obeying the daily-ingest contract: content present in
    the index is 'dup_of_corpus' pointing at the corpus holder;
    otherwise the batch's lowest id per content is the unique 'new'
    row and every later copy is 'dup_in_batch' pointing at it — the
    invariants the streaming ingest's replay math builds on, here on
    inputs the fixture corpus never exercises (hash_fn='text' keys
    the raw content so the expected sets are computable exactly)."""
    bdf = sc_spark.createDataFrame(batch, "doc_id long, text string")
    idf = sc_spark.createDataFrame(
        [(t, h) for t, h in index], "content_key string, holder_id long")
    got = {r["doc_id"]: (r["status"], r["dup_of"])
           for r in D.incremental_exact_dedup(
               bdf, idf, "doc_id", "text", hash_fn="text").collect()}
    assert set(got) == {i for i, _ in batch}

    corpus = dict(index)
    first = {}
    for i, t in sorted(batch):
        first.setdefault(t, i)
    for i, t in batch:
        status, dup_of = got[i]
        if t in corpus:
            assert (status, dup_of) == ("dup_of_corpus", corpus[t]), (i, t)
        elif first[t] != i:
            assert (status, dup_of) == ("dup_in_batch", first[t]), (i, t)
        else:
            assert (status, dup_of) == ("new", None), (i, t)


@given(edges=st.lists(st.tuples(st.integers(0, 14), st.integers(0, 14)),
                      min_size=1, max_size=25))
@settings(max_examples=10, deadline=None)
def test_star_cc_matches_union_find(sc_spark, edges):
    """connected_components_star equals a driver-side union-find on ANY
    edge list (duplicate edges, both orientations, arbitrary shapes):
    every PAIRED node appears exactly once, labeled by its component's
    minimum — the ground-truth check behind using the O(log n) star
    variant interchangeably with min-label propagation. Self-loops
    carry no linkage and are dropped on all four paths checked here
    (the dedup pair generators never emit id1 == id2; both operators
    filter them in their edge builds). local_threshold=0 forces the
    DISTRIBUTED loops; the default-threshold calls pin the size
    gate's local path against the same ground truth."""
    df = sc_spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r["node"]: r["cluster"]
           for r in D.connected_components_star(
               df, local_threshold=0).collect()}

    edges = [(u, v) for u, v in edges if u != v]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp: dict[int, list[int]] = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    expect = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            expect[x] = m
    assert got == expect

    # the size-gated LOCAL paths (default threshold) AND the
    # distributed min-label loop must all agree with the same ground
    # truth — four paths, one contract
    if edges:
        gated_star = {r["node"]: r["cluster"]
                      for r in D.connected_components_star(df).collect()}
        gated_min = {r["node"]: r["cluster"]
                     for r in D.connected_components(df).collect()}
        dist_min = {r["node"]: r["cluster"]
                    for r in D.connected_components(
                        df, local_threshold=0).collect()}
        assert gated_star == expect
        assert gated_min == expect
        assert dist_min == expect
