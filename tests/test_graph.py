"""PageRank semantics: hand-checkable graphs, a pure-Python replay of
the exact-integer spec, dangling redistribution, and mass bounds."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from twitter_analysis_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs], "src long, dst long")


def _ranks(spark, pairs, iters):
    df = G.pagerank_exact(_edges(spark, pairs), iters=iters)
    return {r["node"]: r["rank_q"] for r in df.collect()}


def _python_pagerank(pairs, iters):
    """Pure-Python replay of the operator's integer iteration spec."""
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    n = len(nodes)
    out = {}
    for s, _ in pairs:
        out[s] = out.get(s, 0) + 1
    rank = {v: G.SCALE // n for v in nodes}
    tele = (15 * G.SCALE) // (100 * n)
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        for s, d in pairs:
            contrib[d] += rank[s] // out[s]
        dang = sum(rank[v] for v in nodes if v not in out)
        rank = {v: tele + (85 * (contrib[v] + dang // n)) // 100
                for v in nodes}
    return rank


def test_cycle_is_uniform(spark):
    # 3-cycle: perfect symmetry, every node keeps mass/3 every round.
    got = _ranks(spark, [(0, 1), (1, 2), (2, 0)], iters=4)
    assert len(set(got.values())) == 1
    assert abs(got[0] - G.SCALE // 3) <= 4  # floor loss only


def test_hub_outranks_spokes(spark):
    # All spokes point at the hub; hub points back at one spoke.
    pairs = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)]
    got = _ranks(spark, pairs, iters=5)
    assert got[0] == max(got.values())
    # Spoke 1 receives the hub's whole mass; spokes 2-4 only teleport.
    assert got[1] > got[2] == got[3] == got[4]


def test_matches_python_replay(spark):
    # Irregular graph with a dangling node (5 has no out-edges).
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 5), (4, 5),
             (2, 4)]
    got = _ranks(spark, pairs, iters=6)
    assert got == _python_pagerank(pairs, iters=6)


def test_dangling_mass_redistributes(spark):
    # 0 -> 1 -> (sink). Without redistribution the sink would hoard
    # mass; with it, node 0 still receives a share above bare teleport.
    pairs = [(0, 1), (1, 2)]
    got = _ranks(spark, pairs, iters=3)
    tele = (15 * G.SCALE) // (100 * 3)
    assert got[0] > tele  # got a slice of the dangling pool
    assert got == _python_pagerank(pairs, iters=3)


@pytest.mark.parametrize("iters", [1, 4])
def test_mass_conserved_up_to_floor_loss(spark, iters):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 0)]
    got = _ranks(spark, pairs, iters=iters)
    total = sum(got.values())
    n = len(got)
    # Each iteration loses < 1 unit per floor op: per-node contrib
    # divisions (<= |E|), the dang share, damping, and teleport.
    max_loss = (iters + 1) * (len(pairs) + 2 * n + 2)
    assert G.SCALE - max_loss <= total <= G.SCALE


def test_interaction_edges_extraction(spark):
    events = spark.createDataFrame(
        [(1, '{"k": 7}'), (1, '{"k": 7}'),    # parallel edge collapses
         (2, '{"k": 2}'),                      # self-loop dropped
         (3, '{"k": 160}'),                    # 160 % 150 == 10
         (4, None), (5, '{"x": 1}')],          # no k -> dropped
        "user_id long, props string")
    got = {(r["src"], r["dst"])
           for r in G.interaction_edges(events).collect()}
    assert got == {(1, 7), (3, 10)}


def test_partitioning_invariance(spark):
    # The exact-integer spec is order- and partitioning-independent.
    pairs = [(i % 7, (i * 3 + 1) % 7) for i in range(30)
             if i % 7 != (i * 3 + 1) % 7]
    e = _edges(spark, sorted(set(pairs)))
    a = {r["node"]: r["rank_q"]
         for r in G.pagerank_exact(e.repartition(1), iters=4).collect()}
    b = {r["node"]: r["rank_q"]
         for r in G.pagerank_exact(e.repartition(13), iters=4).collect()}
    assert a == b


def _tri(spark, pairs):
    df = G.triangle_counts(_edges(spark, pairs))
    return {r["node"]: r["n_triangles"] for r in df.collect()}


def _python_triangles(pairs):
    """Brute-force truth: count triangles per node via set closure."""
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = sorted({v for e in und for v in e})
    nbr = {v: set() for v in nodes}
    for a, b in und:
        nbr[a].add(b)
        nbr[b].add(a)
    out = {v: 0 for v in nodes}
    from itertools import combinations
    for a, b, c in combinations(nodes, 3):
        if b in nbr[a] and c in nbr[a] and c in nbr[b]:
            out[a] += 1
            out[b] += 1
            out[c] += 1
    return out


def test_triangles_k4(spark):
    # K4: every node sits in C(3,2) = 3 triangles.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tri(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_none_on_chain(spark):
    got = _tri(spark, [(0, 1), (1, 2), (2, 3)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}


def test_triangles_direction_and_parallel_invariant(spark):
    # Reversed duplicates and parallel edges must not inflate counts.
    base = [(0, 1), (1, 2), (2, 0)]
    noisy = base + [(1, 0), (2, 1), (0, 2), (0, 1), (2, 0)]
    assert _tri(spark, noisy) == {0: 1, 1: 1, 2: 1}


def test_triangles_match_bruteforce(spark):
    # Irregular graph incl. a hub (pseudo power-law) — exercises the
    # degree orientation's tie-breaks.
    pairs = [(0, i) for i in range(1, 8)] + \
            [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (1, 3), (9, 10)]
    assert _tri(spark, pairs) == _python_triangles(pairs)


def test_bfs_khop_planted(spark):
    from twitter_analysis_spark.operators.graph import bfs_khop
    # chain 0-1-2-3-4-5 plus shortcut 0-3 (min-depth wins) and an
    # edge INTO 0 (undirected view reaches it); 9 isolated elsewhere
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 3), (7, 0), (8, 9)],
        ["src", "dst"])
    got = {r.node: r.depth for r in bfs_khop(edges, 0, 3).collect()}
    assert got == {0: 0, 1: 1, 3: 1, 7: 1, 2: 2, 4: 2, 5: 3}
    # 8, 9 unreachable; 5 reachable only at hop 3 via the shortcut


def test_bfs_khop_isolated_source(spark):
    from twitter_analysis_spark.operators.graph import bfs_khop
    edges = spark.createDataFrame([(5, 6)], ["src", "dst"])
    got = {r.node: r.depth for r in bfs_khop(edges, 0, 2).collect()}
    assert got == {0: 0}


def test_assortativity_star_is_negative(spark, tmp_path):
    """A star graph is maximally disassortative (hub degree n meets
    leaf degree 1 on every edge): r == -1 exactly."""
    import json
    import os
    import datetime as dt
    from twitter_analysis_spark import catalog

    # hub = bucket 0; leaves = users 201..205 -> edges (leaf, 0)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 200 + i, "click", 0.0, json.dumps({"k": 150 * i}))
            for i in range(1, 6)]   # k%150 == 0 for all -> hub node 0
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    sf = str(tmp_path / "assort_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    r = catalog.QUERIES["graph_assortativity"](spark, sf).first()
    assert r.n_edge_ends == 10
    assert abs(r.assortativity + 1.0) < 1e-12


def test_triangles_bare_call_leaves_no_cached_frames(spark):
    """cleanup=None (the library-caller default) must not leak the
    two internal persists for the session (round-7 advice): the
    operator checkpoints its small per-node result and releases
    `oriented` and `tri` itself. localCheckpoint RDDs are reclaimed
    by GC, not unpersist — so assert the STORAGE-level persists are
    gone by diffing against the pre-call cache set."""
    import gc

    sc = spark.sparkContext
    spark.catalog.clearCache()
    gc.collect()
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {r["node"]: r["n_triangles"]
           for r in G.triangle_counts(_edges(spark, k4)).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    # the only new entries may be the localCheckpoint of the result
    # itself (released on GC); no *storage-level persisted* operator
    # internals may remain. Persisted frames register with storage
    # level MEMORY_AND_DISK; localCheckpoints use MEMORY_AND_DISK too,
    # so distinguish by count: the call adds at most ONE new cached
    # RDD (the checkpointed result), never the two internals.
    assert len(after - before) <= 1, after - before
