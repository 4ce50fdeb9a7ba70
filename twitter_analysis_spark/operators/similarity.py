"""Similarity search over embedding columns (array<float>).

Two tiers, per the standard ANN playbook:

- ``cosine_topk``: exact brute-force top-k — one scan, a codegen'd
  fold for the dot product, TakeOrderedAndProject for the top-k. The
  correctness baseline, and perfectly serviceable when the query set
  is small (each query is one scan of the corpus).
- ``random_hyperplane_lsh`` + ``lsh_topk``: the scale path. Sign-bit
  LSH buckets the corpus once (a cheap narrow table, bucketable /
  partitionable on disk); each query probes only its own bucket and
  multi-probe neighbors (Hamming-1 flips), turning a 100 TB scan into
  a few-partition lookup at some recall cost.

No Python UDFs anywhere: dot products are Catalyst ``zip_with`` +
``aggregate`` folds in double precision (sequential, deterministic
across engines — this matters for the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine against a constant query vector.

    The query vector is inlined as a literal array, so the plan is a
    single projection + filter-free scan ending in
    TakeOrderedAndProject — no shuffle, no crossJoin, trivially
    parallel over corpus partitions.
    """
    q = F.array([F.lit(float(x)) for x in query_vec])
    return (
        emb.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def random_hyperplane_lsh(emb: DataFrame, planes: list[list[float]],
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Assign each vector a sign-bit LSH bucket from fixed hyperplanes.

    ``planes`` must be generated once (deterministically seeded) and
    shared between indexing and querying. With p planes the corpus
    splits into ≤2^p buckets; cosine-similar vectors collide with
    probability 1 - θ/π per plane.
    """
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        pv = F.array([F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(F.col(vec_col), pv) >= 0,
                                 F.lit(1 << i)).otherwise(F.lit(0))
    return emb.select(F.col(id_col), F.col(vec_col),
                      bucket.cast("int").alias("bucket"))


def _hamming1_buckets(bucket: int, num_planes: int) -> list[int]:
    return [bucket] + [bucket ^ (1 << i) for i in range(num_planes)]


def lsh_topk(emb: DataFrame, planes: list[list[float]],
             query_vec: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket (plus Hamming-1
    neighbors when ``multiprobe``), then exact cosine within it.

    At scale the bucketed table is precomputed and partitioned by
    ``bucket``, so this is a partition-pruned read of ~(1+p)/2^p of the
    corpus instead of a full scan.
    """
    qb = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) >= 0:
            qb |= 1 << i
    probe = _hamming1_buckets(qb, len(planes)) if multiprobe else [qb]
    bucketed = random_hyperplane_lsh(emb, planes, id_col, vec_col)
    q = F.array([F.lit(float(x)) for x in query_vec])
    return (
        bucketed.where(F.col("bucket").isin(probe))
        .select(F.col(id_col),
                F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def fixed_planes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (shared index/query side).

    A tiny xorshift-style generator — no numpy dependency at call sites
    that only need plan construction, and bit-reproducible everywhere.
    """
    planes = []
    state = seed & 0xFFFFFFFFFFFFFFFF or 1
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse-quantize the corpus into nlist cells,
# probe only the nprobe cells nearest the query. The second scale path
# next to sign-bit LSH: cells adapt to the data distribution (centroids
# come from the corpus itself), so probe sets are better balanced than
# fixed hyperplane buckets under skew.
# ---------------------------------------------------------------------------

def ivf_centroids(emb: DataFrame, nlist: int = 8,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Pick nlist deterministic seed centroids from the corpus.

    Stand-in for a k-means fit (one k-means|| pass at index-build time
    on a real deployment): the lowest-id vectors are a deterministic,
    reproducible sample — good enough to define cells, and the oracle-
    facing recall tests measure the quality that actually matters.
    Driver-side collect is nlist rows (bounded, tiny).
    """
    rows = (emb.select(id_col, vec_col).orderBy(F.asc(id_col))
            .limit(nlist).collect())
    return [(i, [float(x) for x in r[1]]) for i, r in enumerate(rows)]


def ivf_assign(emb: DataFrame, centroids: list[tuple[int, list[float]]],
               id_col: str = "vec_id",
               vec_col: str = "embedding",
               with_cos: bool = False) -> DataFrame:
    """Assign every vector to its max-cosine centroid cell.

    The centroid set is a small constant inlined into the plan (same
    trick as the LSH planes): the argmax is an array_sort over an
    nlist-length struct array, all JVM-side codegen, no shuffle. At
    100 TB the output is written bucketed/partitioned BY cell so a
    probe is a partition-pruned read.

    ``with_cos`` additionally emits ``cell_cos``, the cosine to the
    winning centroid — what cluster-radius pruning needs (see
    dedup.embedding_near_dup_pairs). It is deliberately UNROUNDED:
    radius bounds derive an acos from it, and near cos≈1 the acos error
    of a rounded cosine inflates by d(acos)≈sqrt(2·δ) — a 5e-10
    rounding error becomes ~3e-5 rad, enough to under-estimate a cell
    radius past the pruning slack and (exactness-breaking) drop a true
    pair. Round only user-facing outputs, never pruning inputs.
    """
    scored = F.array(*[
        F.struct(
            cosine(F.col(vec_col), F.array([F.lit(x) for x in cvec]))
            .alias("cos"),
            F.lit(cid).alias("cell"),
        )
        for cid, cvec in centroids
    ])
    # sort_array on structs orders by first field; last element = max.
    best = F.sort_array(scored)[len(centroids) - 1]
    cols = [F.col(id_col), F.col(vec_col), best["cell"].alias("cell")]
    if with_cos:
        cols.append(best["cos"].alias("cell_cos"))
    return emb.select(*cols)


def ivf_topk(emb: DataFrame, centroids: list[tuple[int, list[float]]],
             query_vec: list[float], k: int = 10, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: exact cosine inside the nprobe cells whose
    centroids are nearest the query."""

    def pycos(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        da = sum(x * x for x in a) ** 0.5
        db = sum(x * x for x in b) ** 0.5
        return num / (da * db) if da and db else 0.0

    probe = [cid for cid, _ in sorted(
        centroids, key=lambda c: -pycos(c[1], query_vec))[:nprobe]]
    q = F.array([F.lit(float(x)) for x in query_vec])
    return (
        ivf_assign(emb, centroids, id_col, vec_col)
        .where(F.col("cell").isin(probe))
        .select(F.col(id_col),
                F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_vectorized(emb: DataFrame, query_vec: list[float],
                           k: int = 10, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k with an Arrow-batched numpy kernel.

    Same semantics as ``cosine_topk``; different physical strategy: each
    Arrow batch becomes one (rows × dim) float64 matrix and the scores
    are a single BLAS matvec, instead of per-row expression folds. At
    bench scale (2k × 64) the JVM fold wins on overhead; the crossover
    is around 10^5 vectors/batch or dim >= 256, where matmul throughput
    dominates — this is the kernel the 100 TB path uses, with the same
    TakeOrderedAndProject top-k above it.
    """
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * qn)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "cosine": np.round(cos, 6)})

    scored = emb.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} long, cosine double")
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 5,
             qid_col: str = "qid", qvec_col: str = "qv",
             cid_col: str = "cid", cvec_col: str = "cv",
             exclude_self: bool = True) -> DataFrame:
    """Batched exact k-NN join: for every query vector, its top-k
    corpus neighbors by cosine. Output (qid, cid, cosine, rk).

    ``exclude_self`` drops pairs whose query id equals the corpus id —
    correct when the queries ARE corpus rows (self-similarity search,
    the registered query's shape). Pass False when the two id spaces
    are independent: an id collision there is a coincidence, and a
    legitimate neighbor must not be silently dropped.

    The 100 TB shape, in three moves:

    1. Broadcast the query batch (eval/query sets are the small side)
       and cross-join corpus x queries — map-only, the corpus never
       shuffles. Cosine is the JVM fold expression (similarity.dot),
       rounded to 6 dp so ordering keys are engine-portable.
    2. Per-partition top-k PRUNE with mapInPandas: a dict of heaps per
       qid, fed batch-by-batch. Pure SELECTION on the already-computed
       cosine (no Python arithmetic → no float drift vs the oracle);
       shrinks the pair stream from |corpus|x|Q| rows to at most
       k x |Q| per partition before anything shuffles.
    3. One window over the survivors for the global rank — the only
       shuffle, sized O(partitions x k x |Q|), independent of corpus
       size.

    The prune criteria (cosine desc, cid asc) equal the final ranking
    criteria, so pruning is lossless.
    """
    from pyspark.sql import Window

    q = queries.select(F.col(qid_col).alias("qid"),
                       F.col(qvec_col).alias("_qv"))
    c = corpus.select(F.col(cid_col).alias("cid"),
                      F.col(cvec_col).alias("_cv"))
    join_cond = F.col("qid") != F.col("cid") if exclude_self else F.lit(True)
    pairs = (
        c.join(F.broadcast(q), join_cond)
        .select("qid", "cid",
                F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cosine"))
    )

    import heapq
    from collections.abc import Iterator

    import pandas as pd

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        heaps: dict = {}                       # qid -> min-heap of size <= k
        for b in batches:
            for qid, cid, cos in zip(b["qid"], b["cid"], b["cosine"]):
                h = heaps.setdefault(qid, [])
                # heap key: (cosine, -cid) so the WORST kept row is the
                # smallest cosine / largest cid — matches (cosine desc,
                # cid asc) ranking.
                item = (cos, -cid)
                if len(h) < k:
                    heapq.heappush(h, item)
                elif item > h[0]:
                    heapq.heapreplace(h, item)
        out = [(qid, -ncid, cos)
               for qid, h in heaps.items() for cos, ncid in h]
        yield pd.DataFrame(out, columns=["qid", "cid", "cosine"])

    pruned = pairs.mapInPandas(local_topk, schema=pairs.schema)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        pruned.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "cid", "cosine", "rk")
    )


def kmeans_fit(emb: DataFrame, nlist: int = 8, iters: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               seed_centroids: list[tuple[int, list[float]]] | None = None,
               ) -> list[tuple[int, list[float]]]:
    """Spherical k-means (Lloyd) for IVF centroids, as DataFrame aggs.

    Replaces the lowest-id seeds of ``ivf_centroids`` with a real fit
    while keeping every per-round step cluster-shaped:

    - **assign**: ``ivf_assign`` — the argmax over an inlined centroid
      array, whole-stage codegen, zero shuffle;
    - **update**: normalize each vector, ``posexplode`` to
      (cell, pos, x/|x|), then ``groupBy(cell, pos).avg`` — the dim-fold
      row inflation is absorbed by map-side partial aggregation, so the
      shuffle carries only nlist x dim rows; the driver collects just
      the new centroids (nlist x dim floats) per round.

    Spherical update = mean of UNIT vectors, re-normalized: for cosine
    assignment this is the exact maximizer of the per-cell cosine sum
    (sum_x cos(x,c) = (sum_x x/|x|) . c/|c|), so the mean-cosine
    objective is monotone non-decreasing per Lloyd round — the property
    the tests assert. Empty cells keep their previous centroid.
    """
    cents = seed_centroids or ivf_centroids(emb, nlist, id_col, vec_col)
    for _ in range(iters):
        assigned = ivf_assign(emb, cents, id_col, vec_col)
        parts = (
            assigned
            .withColumn("_n", l2norm(F.col(vec_col)))
            .select("cell", F.posexplode(
                F.transform(F.col(vec_col),
                            lambda x: x / F.col("_n"))).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()  # bounded: nlist x dim rows
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in parts:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        new = []
        for cid, old in cents:
            if cid in by_cell:
                vec = [by_cell[cid][p] for p in sorted(by_cell[cid])]
                nrm = sum(x * x for x in vec) ** 0.5 or 1.0
                new.append((cid, [x / nrm for x in vec]))
            else:
                new.append((cid, old))
        cents = new
    return cents
