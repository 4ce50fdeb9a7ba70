"""Dedup / similarity / text-feature / multimodal / windowed tiers: exact+MinHash+SimHash+embedding dedup, ANN search, text quality, media kernels, w1/s9 windows, percentiles, scalar rows, a8-a11, t8, Q2/Q5, as-of + range joins.

Split from the monolithic ``catalog.py`` (round 7): registration side
effects only — every query lands in ``catalog.QUERIES`` /
``catalog.ORACLES`` via the shared :func:`~.catalog.register`
decorator, and the public surface is still
``twitter_analysis_spark.catalog``. No behavior change; the split is
review / merge-conflict surface only.
"""

from __future__ import annotations

import os  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .catalog import (FIXTURE_TWEETS, ORACLES, QUERIES,  # noqa: F401
                      _SH_CAPPED_SQL, _SHINGLES_SQL, _TOKS_SQL, _t,
                      maybe_broadcast, register)
from .operators import dedup as _dedup  # noqa: F401
from .operators import multimodal as _mm  # noqa: F401
from .operators import similarity as _sim  # noqa: F401
from .operators import textstats as _ts  # noqa: F401
from .operators import curation as _cur  # noqa: F401
from .operators import linkage as _lk  # noqa: F401
from .operators import rollup as _roll  # noqa: F401

@register(
    "dedup_exact",
    """
    SELECT text, min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact dedup: lowest id wins per identical content. One
    # hash-aggregate shuffle (spills at scale; the reference used an
    # in-memory dict, cell16:50).
    return _dedup.exact_dedup(_t(spark, sf_dir, "documents"), "doc_id", ["text"])


@register(
    "dedup_incremental",
    """
    WITH corpus AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
    batch AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
    idx AS (SELECT md5(text) AS k, min(doc_id) AS holder
            FROM corpus GROUP BY md5(text)),
    bm AS (SELECT md5(text) AS k, min(doc_id) AS bf
           FROM batch GROUP BY md5(text))
    SELECT b.doc_id,
           CASE WHEN idx.holder IS NOT NULL THEN 'dup_of_corpus'
                WHEN b.doc_id <> bm.bf THEN 'dup_in_batch'
                ELSE 'new' END AS status,
           CAST(CASE WHEN idx.holder IS NOT NULL THEN idx.holder
                     WHEN b.doc_id <> bm.bf THEN bm.bf END
                AS BIGINT) AS dup_of
    FROM batch b
    JOIN bm ON md5(b.text) = bm.k
    LEFT JOIN idx ON md5(b.text) = idx.k
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Daily-ingest dedup (operators/dedup.py:incremental_exact_dedup):
    # a new BATCH (odd doc_ids stand in for today's drop) is deduped
    # against the existing corpus' content index (even doc_ids) —
    # corpus-side work is ONLY the pre-materialized index; everything
    # else scales with the batch. The catalog variant keys on md5 so
    # the oracle replays index build, batch-winner selection, and
    # status classification; the engine default is xxhash64 (8-byte
    # keys), pinned equivalent by tests.
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    idx = _dedup.content_index(corpus, "doc_id", "text", hash_fn="md5")
    return _dedup.incremental_exact_dedup(batch, idx, "doc_id", "text",
                                          hash_fn="md5")


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
    ), sh AS (
      {_SH_CAPPED_SQL}
    ), sizes AS (
      SELECT doc, count(*) AS n FROM sh GROUP BY doc
    ), inter AS (
      SELECT a.doc AS id1, b.doc AS id2, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY a.doc, b.doc
    )
    SELECT id1, id2,
           round(n_common::DOUBLE / (s1.n + s2.n - n_common), 6) AS jaccard
    FROM inter JOIN sizes s1 ON s1.doc = id1 JOIN sizes s2 ON s2.doc = id2
    WHERE n_common::DOUBLE / (s1.n + s2.n - n_common) >= 0.1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact 3-gram Jaccard pairs via shingle inverted-index self-join,
    # with the boilerplate DF cap active (DEFAULT_MAX_SHINGLE_DF; the
    # oracle's sh CTE applies the identical cap). Deliberately NO
    # cleanup list: this row is cap-plan-pinned (tests/test_plans.py
    # greps the returned lazy plan for the size(_docs) <= 256 filter),
    # so the persisted index follows the documented
    # leak-until-clearCache contract.
    return _dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.1)


#: Full MinHash+LSH pipeline in SQL: the portable Carter-Wegman
#: minhash family h_j = (a_j*m1 + b_j*m2) mod 2^31-1 over one md5 per
#: shingle (mirrors dedup._signatures_from hash_fn="md5"; constants
#: from dedup.km_constants inlined as a VALUES table), raw-tuple band
#: keys, the hot-bucket cap, candidate generation, and exact-Jaccard
#: verification over the capped shingle sets.
_KM_VALUES_SQL = ", ".join(
    f"({j}, {a}, {b})"
    for j, (a, b) in enumerate(_dedup.km_constants(32)))

ORACLE_MINHASH = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
    ), sh AS (
      {_SH_CAPPED_SQL}
    ), km AS (
      SELECT * FROM (VALUES {_KM_VALUES_SQL}) t(j, a, b)
    ), hashed AS (
      SELECT doc, km.j,
             (km.a * CAST(('0x' || substr(md5(shingle), 1, 7)) AS BIGINT)
              + km.b * CAST(('0x' || substr(md5(shingle), 9, 7)) AS BIGINT))
             % 2147483647 AS h
      FROM sh CROSS JOIN km
    ), sig AS (
      SELECT doc, j, min(h) AS m FROM hashed GROUP BY doc, j
    ), bands AS (
      SELECT doc, j // 4 AS band,
             string_agg(m, ',' ORDER BY j) AS bh
      FROM sig GROUP BY doc, j // 4
    ), bsz AS (
      SELECT band, bh, count(*) AS c FROM bands GROUP BY band, bh
    ), capped AS (
      SELECT bands.* FROM bands JOIN bsz USING (band, bh)
      WHERE c <= {_dedup.DEFAULT_MAX_BAND_BUCKET}
    ), cand AS (
      SELECT DISTINCT a.doc AS id1, b.doc AS id2
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc
    ), sizes AS (
      SELECT doc, count(*) AS n FROM sh GROUP BY doc
    ), inter AS (
      SELECT a.doc AS id1, b.doc AS id2, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY a.doc, b.doc
    )
    SELECT id1, id2,
           round(n_common::DOUBLE / (s1.n + s2.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.doc = id1 JOIN sizes s2 ON s2.doc = id2
    JOIN cand USING (id1, id2)
    WHERE n_common::DOUBLE / (s1.n + s2.n - n_common) >= 0.1
"""


@register("dedup_minhash_lsh", ORACLE_MINHASH)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MinHash+LSH candidates verified by exact Jaccard. The catalog
    # variant uses the md5/KM double-hash family (hash_fn="md5": one
    # md5 per shingle + integer ops, see dedup._signatures_from) plus
    # raw-tuple band keys so the oracle rebuilds the ENTIRE pipeline
    # in SQL — signatures, band buckets, the hot-bucket cap, candidate
    # pairs, and the Jaccard verification all cross-engine-checked;
    # any drift anywhere breaks the hash match. Library callers
    # default to xxhash64 (no string hex round-trip); both families
    # keep the candidates-⊆-exact + recall tests in
    # tests/test_dedup_similarity.py.
    return _dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, num_hashes=32, bands=8, threshold=0.1, hash_fn="md5")


ORACLES_SIMHASH = f"""
    WITH tok AS (
      SELECT doc_id AS doc, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    chunk AS (
      SELECT doc, i.i,
             CAST(('0x' || substr(md5(tok), i.i*4 + 1, 4)) AS INT) AS c
      FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) i
    ),
    bitsum AS (
      SELECT doc, i*16 + j.j AS b,
             SUM(CASE WHEN (c >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM chunk CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j
      GROUP BY doc, i*16 + j.j
    ),
    sig AS (
      SELECT doc, CAST(SUM(CASE WHEN s > 0
                       THEN CAST(1 AS UBIGINT) << b
                       ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS sg
      FROM bitsum GROUP BY doc
    )
    SELECT a.doc AS id1, b.doc AS id2,
           CAST(bit_count(xor(a.sg, b.sg)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc < b.doc
    WHERE bit_count(xor(a.sg, b.sg)) <= 8
      AND ((a.sg >> 0)  & 65535 = (b.sg >> 0)  & 65535 OR
           (a.sg >> 16) & 65535 = (b.sg >> 16) & 65535 OR
           (a.sg >> 32) & 65535 = (b.sg >> 32) & 65535 OR
           (a.sg >> 48) & 65535 = (b.sg >> 48) & 65535)
"""


@register("dedup_simhash", ORACLES_SIMHASH)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SimHash near-pairs (hamming <= 8) via the 4-block bucket join.
    # The catalog variant hashes tokens with md5 (hash_fn="md5") so the
    # oracle can rebuild the exact 64-bit signatures in SQL from the
    # raw text and recompute the pair set from scratch — signature
    # construction, block bucketing, and Hamming verification are all
    # cross-engine-checked. The oracle's shared-block predicate mirrors
    # the 4-block candidate generation exactly: at max_hamming=8 (> 3)
    # the block scheme is knowingly approximate (a pair differing in
    # all 4 blocks is unreachable — the pigeonhole guarantee only
    # covers hamming <= 3), so the oracle states the operator's true
    # contract rather than an all-pairs superset it never promised.
    # The engine default stays xxhash64 (faster, JVM-native, no string
    # materialization); its behavior is pinned by the distance
    # properties in tests/test_dedup_similarity.py.
    return _dedup.simhash_near_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=8,
        hash_fn="md5")


@register(
    "dedup_embedding_cosine",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Embedding-cosine near-dup pairs (threshold sized to the synthetic
    # corpus where max off-diagonal cosine ~ 0.51). Engine side runs
    # the EXACT cell-pruned pair join (centroid cells + triangle-
    # inequality cluster pruning -> cell equi-join, no CartesianProduct);
    # the oracle keeps the brute-force all-pairs formulation — the two
    # are bit-equal by construction at any scale.
    return _dedup.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.4)


# ---------------------------------------------------------------------------
# Extension suite 2: similarity search (operators/similarity.py)
# ---------------------------------------------------------------------------


def _qvec0(spark, emb):
    """Driver-side fetch of the query vector (vec_id = 0), honoring the
    similarity NULL contract: returns None when the row is absent or
    its embedding is NULL — the oracle's q CTE is empty then, so the
    caller must return zero rows rather than dereference a NULL blob
    (r14, null-audit class A)."""
    row = (emb.where((F.col("vec_id") == 0)
                     & F.col("embedding").isNotNull())
           .select("embedding").first())
    return [float(x) for x in row[0]] if row else None


@register(
    "sim_cosine_topk",
    """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0 AND embedding IS NOT NULL),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)
    SELECT vec_id,
           round(list_dot_product(v, qv) /
                 (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
                 6) AS cosine
    FROM e, q
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Brute-force exact ANN baseline: one scan + TakeOrderedAndProject.
    emb = _t(spark, sf_dir, "embeddings")
    qvec = _qvec0(spark, emb)
    if qvec is None:
        return spark.createDataFrame([], "vec_id bigint, cosine double")
    return _sim.cosine_topk(emb, qvec, k=10)


def _pq_dists_sql(vec: str) -> str:
    """DuckDB list of 16 per-code L2² distances for subspace s (0-based
    in scope), mirroring similarity._l2sq's sequential fold."""
    return (f"[list_sum([({vec}[s*8+i] - seeds[k][s*8+i]) * "
            f"({vec}[s*8+i] - seeds[k][s*8+i]) "
            f"for i in generate_series(1, 8)]) "
            f"for k in generate_series(1, 16)]")


#: PQ ANN with seed (iters=0) codebooks: the entire
#: normalize→codebook→encode→ADC-shortlist→exact-rerank chain in SQL.
ORACLE_PQ = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
    u AS (SELECT vec_id,
                 [x / sqrt(list_dot_product(v, v)) for x in v] AS uv
          FROM e),
    cb AS (SELECT list(uv ORDER BY vec_id) AS seeds
           FROM (SELECT vec_id, uv FROM u ORDER BY vec_id LIMIT 16)),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    qh AS (SELECT [x / sqrt(list_dot_product(qv, qv)) for x in qv] AS qhat
           FROM q),
    lut AS (
      SELECT [[list_sum([qhat[s*8 + i] * seeds[k][s*8 + i]
                         for i in generate_series(1, 8)])
               for k in generate_series(1, 16)]
              for s in generate_series(0, 7)] AS l
      FROM qh, cb
    ),
    codes AS (
      SELECT u.vec_id,
             [CAST(list_position({_pq_dists_sql('uv')},
                                 list_min({_pq_dists_sql('uv')})) AS INT)
              for s in generate_series(0, 7)] AS c
      FROM u, cb
    ),
    adc AS (
      SELECT codes.vec_id,
             round(l[1][c[1]] + l[2][c[2]] + l[3][c[3]] + l[4][c[4]]
                 + l[5][c[5]] + l[6][c[6]] + l[7][c[7]] + l[8][c[8]],
                   6) AS shortlist_score
      FROM codes, lut
      ORDER BY shortlist_score DESC, vec_id
      LIMIT 50
    )
    SELECT e.vec_id,
           round(list_dot_product(v, qv) /
                 (sqrt(list_dot_product(v, v)) *
                  sqrt(list_dot_product(qv, qv))), 6) AS adc_score
    FROM e JOIN adc USING (vec_id), q
    ORDER BY adc_score DESC, vec_id
    LIMIT 10
"""


@register("sim_pq_topk", ORACLE_PQ)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Product-quantization ANN: per-subspace codebooks, encode the
    # corpus to m small ints per vector, ADC-scan the compressed index
    # for a 50-candidate shortlist, exact-rerank the shortlist. The
    # memory-compression scale path: the full scan touches 64x-smaller
    # codes; raw vectors are read for only C=50 rows.
    #
    # The catalog variant uses SEED codebooks (iters=0: unit slices of
    # the ksub lowest-id vectors — the trainer's deterministic
    # initialization), which makes every stage closed-form: the oracle
    # rebuilds normalization, codebooks, argmin encoding (first-min
    # tie-break = list_position), the ADC lookup-table scoring in the
    # same fixed addition order, the rounded shortlist cut, and the
    # exact rerank — the entire PQ serving path cross-engine-checked.
    # Lloyd TRAINING (iters>0, driver-bounded collects) is exercised
    # by tests/test_pq.py: recall floors, exactness on
    # codebook-expressible corpora, and reconstruction-error descent.
    emb = _t(spark, sf_dir, "embeddings")
    qvec = _qvec0(spark, emb)
    if qvec is None:
        return spark.createDataFrame([], "vec_id bigint, adc_score double")
    books = _sim.pq_train(emb, m=8, ksub=16, iters=0)
    return _sim.pq_topk(emb, books, qvec, k=10, rerank=50)


@register(
    "sim_lsh_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
         q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         pl AS (SELECT * FROM (VALUES (0, 31), (1, 37), (2, 41),
                                      (3, 43), (4, 47), (5, 53)) t(i, p)),
         b AS (
           SELECT e.vec_id, e.v,
                  CAST(sum(CASE WHEN list_dot_product(e.v,
                         [CAST((j*p) % 11 - 5 AS DOUBLE)
                          for j in generate_series(0, len(e.v)-1)]) >= 0
                       THEN 1 << i ELSE 0 END) AS INT) AS bucket
           FROM e CROSS JOIN pl GROUP BY e.vec_id, e.v
         ),
         qb AS (
           SELECT CAST(sum(CASE WHEN list_dot_product(q.qv,
                         [CAST((j*p) % 11 - 5 AS DOUBLE)
                          for j in generate_series(0, len(q.qv)-1)]) >= 0
                       THEN 1 << i ELSE 0 END) AS INT) AS qbucket
           FROM q CROSS JOIN pl
         )
    SELECT vec_id,
           round(list_dot_product(v, qv) /
                 (sqrt(list_dot_product(v, v)) *
                  sqrt(list_dot_product(qv, qv))), 6) AS cosine
    FROM b, q, qb
    WHERE bit_count(xor(b.bucket, qb.qbucket)) <= 1
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale-path ANN: sign-bit LSH bucket probe (multi-probe
    # Hamming-1), exact cosine within the probed buckets. The catalog
    # variant uses closed-form integer-valued planes (arith_planes) so
    # the oracle regenerates the SAME buckets from the same formula —
    # a full cross-engine check of bucketing + probing + scoring, not
    # just a rows-only run. Production indexes keep fixed_planes
    # (xorshift); recall tests cover that path.
    emb = _t(spark, sf_dir, "embeddings")
    qvec = _qvec0(spark, emb)
    if qvec is None:
        return spark.createDataFrame([], "vec_id bigint, cosine double")
    planes = _sim.arith_planes(len(qvec), num_planes=6)
    return _sim.lsh_topk(emb, planes, qvec, k=10)


# ---------------------------------------------------------------------------
# Extension suite 3: text analysis (operators/textstats.py)
# ---------------------------------------------------------------------------

@register(
    "text_token_counts",
    f"""
    SELECT doc_id,
           len({_TOKS_SQL})::BIGINT AS n_tokens,
           len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT
               AS n_subwords
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _ts.token_count(F.col("text")).alias("n_tokens"),
        _ts.subword_count(F.col("text")).alias("n_subwords"),
    )


_MARKER_SQL = {
    lang: "(" + ", ".join(f"'{w}'" for w in words) + ")"
    for lang, words in _ts.LANG_MARKERS.items()
}


@register(
    "text_quality_features",
    f"""
    WITH base AS (
      SELECT doc_id, text, {_TOKS_SQL} AS tk FROM documents
    )
    SELECT doc_id,
      len(tk)::BIGINT AS n_tokens,
      round(list_sum(list_transform(tk, t -> length(t)))::DOUBLE
            / greatest(len(tk), 1), 6) AS mean_token_len,
      round(len(list_filter(tk, t -> t IN {_MARKER_SQL['en']}))::DOUBLE
            / greatest(len(tk), 1), 6) AS stopword_ratio,
      round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
            / greatest(length(text), 1), 6) AS punct_ratio,
      round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
            / greatest(length(text), 1), 6) AS digit_ratio,
      round(0.25 * least((len(list_filter(tk, t -> t IN {_MARKER_SQL['en']}))::DOUBLE
                          / greatest(len(tk), 1)) * 5, 1.0)
          + 0.25 * least(greatest(len(tk), 1)::DOUBLE / 100.0, 1.0)
          + 0.25 * (1.0 - least(((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
                                 / greatest(length(text), 1)) * 4, 1.0))
          + 0.25 * (1.0 - least(((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                                 / greatest(length(text), 1)) * 4, 1.0)), 6) AS quality_score
    FROM base
    """,
)
def text_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return _ts.quality_features(docs).drop("text")


_LANG_RATIO_SQL = {
    lang: f"len(list_filter(tk, t -> t IN {_MARKER_SQL[lang]}))::DOUBLE / greatest(len(tk), 1)"
    for lang in _ts.LANG_MARKERS
}
_MX = "greatest(" + ", ".join(f"r_{x}" for x in sorted(_ts.LANG_MARKERS)) + ")"


@register(
    "text_lang_id",
    f"""
    WITH scores AS (
      SELECT doc_id,
             {", ".join(f"{_LANG_RATIO_SQL[x]} AS r_{x}" for x in sorted(_ts.LANG_MARKERS))}
      FROM (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents)
    )
    SELECT doc_id,
           CASE WHEN {_MX} > 0.05 THEN
             CASE {" ".join(f"WHEN r_{x} = {_MX} THEN '{x}'" for x in sorted(_ts.LANG_MARKERS))}
             END
           ELSE 'und' END AS lang_pred
    FROM scores
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", _ts.lang_id(F.col("text")).alias("lang_pred"))


@register(
    "text_fingerprint",
    f"""
    WITH toks AS (
      SELECT doc_id, text, {_TOKS_SQL} AS tk FROM documents
    )
    SELECT doc_id,
      md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS md5_fp,
      list_aggregate(list_transform({_SHINGLES_SQL}, s -> md5(s)), 'min')
          AS min_shingle_fp
    FROM toks
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # md5 is engine-independent (unlike xxhash64), so both fingerprints
    # are fully oracle-checkable.
    return _ts.fingerprint(_t(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# Extension suite 4: multimodal columns (operators/multimodal.py)
# ---------------------------------------------------------------------------

@register(
    "mm_media_metadata",
    """
    SELECT doc_id,
           (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS media_type,
           octet_length(encode(text))::BIGINT AS n_bytes,
           (doc_id % 1920 + 1)::INT AS width
    FROM documents
    """,
)
def mm_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Typed metadata over the opaque binary media column.
    media = _mm.media_table(_t(spark, sf_dir, "documents"))
    return media.select(
        "doc_id", "media_type",
        F.length("content").cast("bigint").alias("n_bytes"),
        F.col("meta.width").alias("width"),
    )


@register(
    "mm_decode_features",
    """
    WITH m AS (
      SELECT doc_id,
             doc_id % 3 AS mt,
             doc_id % 16 + 1 AS iw, doc_id % 12 + 1 AS ih,
             doc_id % 2000 + 1 AS ns,
             doc_id % 8 + 1 AS nf
      FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT doc_id,
           CASE mt WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                   ELSE 'video' END AS media_type,
           CAST(CASE mt
             WHEN 0 THEN length('P6' || chr(10) || iw || ' ' || ih ||
                              chr(10) || '255' || chr(10)) + iw*ih*3
             WHEN 1 THEN 44 + ns
             ELSE 8 + nf * (11 + 48) END AS BIGINT) AS n_bytes,
           CAST(CASE mt WHEN 0 THEN iw WHEN 1 THEN 0 ELSE 4 END
                AS INT) AS width,
           CAST(CASE mt WHEN 0 THEN ih WHEN 1 THEN 0 ELSE 4 END
                AS INT) AS height,
           CASE mt WHEN 0 THEN 0.0
                   WHEN 1 THEN ns / 8000.0
                   ELSE nf / 4.0 END AS duration_s,
           CAST(CASE mt
             WHEN 0 THEN list_sum([(doc_id*31 + i*7) % 256
                                   for i in generate_series(0, iw*ih*3 - 1)])
             WHEN 1 THEN list_sum([(doc_id*17 + i*5) % 256
                                   for i in generate_series(0, ns - 1)])
             ELSE list_sum(flatten(
                    [[(doc_id*13 + f*19 + i*7) % 256
                      for i in generate_series(0, 47)]
                     for f in generate_series(0, nf - 1)]))
             END AS BIGINT) AS pixel_sum,
           CAST(CASE mt WHEN 0 THEN iw*ih*3 WHEN 1 THEN ns
                ELSE nf*48 END AS BIGINT) AS n_vals
    FROM m
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow-batched mapInPandas decode over REAL container formats
    # (PPM / WAV / PV01 frame stream, multimodal.py docstring). The
    # kernel sees only bytes — media type, dimensions, duration and
    # the payload digest all come out of the parse — while the oracle
    # recomputes every field from the closed-form generation formulas,
    # so a parser bug anywhere breaks the hash match. checksum (sha1)
    # is dropped from the projection only because the oracle can't
    # reconstruct blobs in SQL; pixel_sum/n_vals pin the same payload.
    media = _mm.synthetic_media_table(_t(spark, sf_dir, "documents"))
    return _mm.extract_features(media).drop("checksum")


@register(
    "mm_resize_images",
    """
    WITH m AS (
      SELECT doc_id, doc_id % 16 + 1 AS iw, doc_id % 12 + 1 AS ih
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id, CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
           -- linear index i over (y, x, c) = (i//24, (i//3)%8, i%3)
           CAST(list_sum([
             (doc_id*31 + ((((i//24)*ih)//6 * iw
                            + (((i//3)%8)*iw)//8)*3 + i%3)*7) % 256
             for i in generate_series(0, 143)
           ]) AS BIGINT) AS pixel_sum
    FROM m
    """,
)
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL nearest-neighbor resize (multimodal.py:resize): P6 parse →
    # numpy fancy-index resample → P6 re-emit → RE-PARSE of the
    # emitted blob. The oracle recomputes the resampled pixel sum from
    # the closed-form source-pixel formula and the exact integer
    # mapping src=(dst*W)//out — a bug in the resampler, the P6
    # writer, or the parser all break the hash.
    media = _mm.synthetic_media_table(_t(spark, sf_dir, "documents"))
    return _mm.resize(media, out_w=8, out_h=6).drop("content")


@register(
    "mm_resample_audio",
    """
    WITH m AS (
      SELECT doc_id, doc_id % 2000 + 1 AS ns,
             (doc_id % 2000 + 1) // 2 AS msamp
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT doc_id, CAST(4000 AS INT) AS rate,
           CAST(msamp AS BIGINT) AS n_samples,
           msamp / 4000.0 AS duration_s,
           CAST(CASE WHEN msamp = 0 THEN 0 ELSE
             list_sum([(doc_id*17 + ((j*ns)//msamp)*5) % 256
                       for j in generate_series(0, msamp - 1)])
           END AS BIGINT) AS sample_sum
    FROM m
    """,
)
def mm_resample_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL audio resample (multimodal.py:resample_audio): WAV parse →
    # nearest-neighbor sample pick at 4 kHz (m = n//2 at the 8 kHz
    # source, src index = (j*n)//m) → WAV re-emit → re-parse. The
    # oracle regenerates the picked samples from the closed-form
    # payload formula, so resampler, WAV writer, and parser are all
    # under the hash.
    media = _mm.synthetic_media_table(_t(spark, sf_dir, "documents"))
    return _mm.resample_audio(media, target_rate=4000).drop("content")


@register(
    "mm_frame_sample",
    """
    WITH m AS (
      SELECT doc_id, doc_id % 8 + 1 AS nf
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, CAST(f AS INT) AS frame_idx, f / 4.0 AS ts_s,
           CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           CAST(list_sum([(doc_id*13 + f*19 + i*7) % 256
                          for i in generate_series(0, 47)])
                AS BIGINT) AS pixel_sum
    FROM m CROSS JOIN generate_series(0, 7) t(f)
    WHERE f < nf AND f % 2 = 0
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL frame sampling (multimodal.py:frame_sample): PV01 parse,
    # every 2nd frame re-emitted as a standalone P6 and re-parsed for
    # its stats; ts = frame/4fps. The oracle regenerates each sampled
    # frame's pixel sum from the per-frame closed-form formula.
    media = _mm.synthetic_media_table(_t(spark, sf_dir, "documents"))
    return _mm.frame_sample(media, stride=2).drop("content")


# ---------------------------------------------------------------------------
# Log-analytics shapes over the events stream table: batch event-time
# windows, sessionization, result-set union, percentile statistics.
# (Streaming variants live in streaming/keyword_counts.py; these are the
# batch equivalents the driver can oracle-check.)
# ---------------------------------------------------------------------------

@register(
    "w1_tumbling_window_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def w1_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batch tumbling window == group by truncated event time. One
    # shuffle, map-side partials; the streaming twin adds a watermark.
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz")
            .alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "s9_sessionization",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
    ), sess AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def s9_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Classic log sessionization: lag-gap detection + running sum to
    # assign session ids, then per-session aggregation. Two window
    # passes over ONE shuffle (both windows share the user_id
    # partitioning, so Catalyst reuses the exchange).
    #
    # NULL contract (r14, null-audit class B): a session event without
    # a timestamp has no position in the gap chain — excluded both
    # sides (Spark sorts it FIRST and opens a session; ANSI sorts it
    # LAST and absorbs it into the final one). NULL user_id stays: one
    # anonymous actor partition, identical in both engines; NULL
    # event_id is harmless (tied-ts rows share a gap of zero whatever
    # their tie order).
    ev = (_t(spark, sf_dir, "events")
          .where(F.col("ts").isNotNull()))
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # TIMESTAMP_NTZ has no direct long cast; compare gaps in epoch
    # MICROseconds (session tz is UTC, so ntz->ltz is the identity
    # wall-clock map) — second-truncated unix_timestamp would disagree
    # with the oracle's full-precision interval on e.g. a 1800.5s gap.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.unix_micros(F.lag(F.col("ts")).over(w).cast("timestamp"))
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0))
    # event_id tiebreak on BOTH windows: with ts ties the cumsum's row
    # order would otherwise be ambiguous and session ids partitioning-
    # dependent (the gap window always had the tiebreak; the oracle
    # carries the identical ORDER BY).
    wsum = (Window.partitionBy("user_id")
            .orderBy(F.asc("ts"), F.asc("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(wsum).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "u2_union_results",
    """
    SELECT DISTINCT doc_id, lang FROM (
        SELECT doc_id, lang FROM documents WHERE regexp_matches(text, '(?i)spark')
        UNION ALL
        SELECT doc_id, lang FROM documents
        WHERE list_has_any(string_split(text, ' '), ['vector', 'stream'])
    )
    """,
)
def u2_union_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U2 (app.py:141-144): keyword-entity + hashtag-entity search
    # results unioned, deduplicated by id.
    kw = QUERIES["f1_keyword_regex"](spark, sf_dir)
    ht = QUERIES["f2_array_membership"](spark, sf_dir)
    return kw.unionByName(ht).distinct()


@register(
    "a7_percentiles",
    """
    SELECT event_type,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.95) AS p95
    FROM events GROUP BY event_type
    """,
)
def a7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact interpolated percentiles (Spark `percentile` == DuckDB
    # quantile_cont: sort + linear interpolation on identical doubles).
    # The 100 TB variant is approx_percentile (t-digest) — used in
    # monitoring paths where a 1e-3 relative error is fine; exact here
    # so the oracle can check it.
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile(F.col("value"), F.lit(0.5)).alias("p50"),
            F.percentile(F.col("value"), F.lit(0.95)).alias("p95"),
        )
    )


@register(
    "a7_percentiles_approx",
    """
    SELECT event_type, count(*) AS n_events,
           TRUE AS p50_in_tol, TRUE AS p95_in_tol
    FROM events GROUP BY event_type
    """,
)
def a7_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The 100 TB form of a7, actually exercised (three rows document
    # "swap to approx_percentile at scale" — ts_winsorized_mean,
    # ts_mad_robust, a7 — this row RUNS that swap): same grouping as
    # a7_percentiles, but through percentile_approx's mergeable
    # quantile sketch — fixed-size per-partition state, one partial
    # agg, no global sort, which is the entire point of the swap.
    # accuracy=10000 bounds rank error at n/10000 (1e-4 relative).
    # Approx VALUES cannot hash-match an exact SQL oracle, so —
    # following the a11_approx_sketches precedent (round-8 VERDICT
    # directive 2) — the row carries the TOLERANCE CONTRACT instead:
    # an exact group count (hash-compared against DuckDB) plus
    # in-tolerance booleans the oracle asserts as TRUE: each approx
    # percentile must lie inside the exact ±0.01-quantile band (100x
    # slack over the 1e-4 guarantee; `value` is a double, so the
    # band needs no integer floor/ceil widening). A drifting sketch
    # now FAILS the driver hash instead of sliding through a
    # rows-only check; the raw estimates stay pinned by
    # tests/test_analytics.py::test_a7_approx_within_rank_error_of_exact.
    bands = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.percentile_approx(F.col("value"), F.lit(0.5), 10000)
            .alias("p50a"),
            F.percentile_approx(F.col("value"), F.lit(0.95), 10000)
            .alias("p95a"),
            F.percentile(F.col("value"), F.lit(0.49)).alias("p50_lo"),
            F.percentile(F.col("value"), F.lit(0.51)).alias("p50_hi"),
            F.percentile(F.col("value"), F.lit(0.94)).alias("p95_lo"),
            F.percentile(F.col("value"), F.lit(0.96)).alias("p95_hi"),
        )
    )
    return bands.select(
        "event_type", "n_events",
        ((F.col("p50a") >= F.col("p50_lo"))
         & (F.col("p50a") <= F.col("p50_hi"))).alias("p50_in_tol"),
        ((F.col("p95a") >= F.col("p95_lo"))
         & (F.col("p95a") <= F.col("p95_hi"))).alias("p95_in_tol"),
    )


# ---------------------------------------------------------------------------
# Remaining SURVEY §2 line items: F4 absence filter, T2/T4 sidebar
# top-5, the C-function scalar suite, plus two scale-technique
# demonstrations (salted skew aggregation, IVF ANN probe).
# ---------------------------------------------------------------------------

@register(
    "f4_absence_filter",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def f4_absence_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F4: {"retweeted_status": {"$exists": False}} (app.py:120,170) —
    # absence-of-related-fact as a left-anti join (the relational form
    # of Mongo's field-absence test). No row multiplication; at scale
    # the anti join shuffles both sides on the key once.
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "t2_top5_sidebar",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 5
    """,
)
def t2_top5_sidebar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T2+T4: the sidebar "top-5 users by followers" (app.py:156, SQL
    # LIMIT 5; sort shape cache.py:153). TakeOrderedAndProject again —
    # each partition keeps 5, no global sort.
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(5)
    )


@register(
    "c_scalar_suite",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%m/%d/%Y') AS date_fmt,
           strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y')::DATE AS date_roundtrip,
           regexp_matches(o_orderstatus, '^[A-Za-z0-9]+$') AS status_alnum,
           CAST(o_orderpriority = '1-URGENT' AS INT) AS is_urgent,
           '#' || o_orderstatus AS tagged_status,
           epoch(o_orderdate)::BIGINT AS epoch_s
    FROM orders WHERE o_orderkey < 1000
    """,
)
def c_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C3 (UI date parse, app.py:39-45), C6 (isalnum, cache.py:217),
    # C9 (bool->int, cell33:10), C11 (string tagging, app.py:165,209),
    # C12 (epoch seconds, cache.py:87,123) in one projection — all
    # codegen'd JVM expressions, no UDFs.
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "MM/dd/yyyy").alias("date_fmt"),
            F.to_date(F.date_format("o_orderdate", "MM/dd/yyyy"), "MM/dd/yyyy")
            .alias("date_roundtrip"),
            F.col("o_orderstatus").rlike("^[A-Za-z0-9]+$").alias("status_alnum"),
            (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("is_urgent"),
            F.concat(F.lit("#"), F.col("o_orderstatus")).alias("tagged_status"),
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_s"),
        )
    )


@register(
    "a8_salted_skew_agg",
    """
    SELECT event_type, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def a8_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Salting demo: event_type has ~single-digit cardinality, so at
    # 100 TB a plain groupBy would hash all rows of one type onto one
    # reducer. Stage 1 aggregates on (key, salt16) spreading each hot
    # key over 16 reducers; stage 2 merges the 16 partials per key.
    # DECIMAL partials keep the two-stage sum bit-identical to the
    # oracle's one-stage sum. (Spark's own partial aggregation already
    # mitigates this for algebraic aggs; the pattern matters for
    # collect_list/percentile-style holistic aggs and is exercised here
    # against an oracle to prove result-invariance.)
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn("_salt", F.pmod(F.hash("event_id"), F.lit(16)))
    partial = (
        salted.groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_s"),
        )
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("_n").alias("n_events"),
            F.sum("_s").cast("double").alias("sum_value"),
        )
    )


@register(
    "sim_ivf_topk",
    """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0 AND embedding IS NOT NULL),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)
    SELECT vec_id,
           round(list_dot_product(v, qv) /
                 (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
                 6) AS cosine
    FROM e, q
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF coarse-quantization ANN, run at nprobe = nlist: probing every
    # cell is provably identical to brute force (the cells PARTITION
    # the corpus — asserted in tests), so the exact-cosine SQL is a
    # true oracle for the whole assign→probe→score machinery: any bug
    # in centroid training, cell assignment, or per-cell scoring breaks
    # the hash match. The approximate operating point (nprobe=2, the
    # 100 TB read-pruning path) keeps its recall-floor coverage in
    # tests/test_dedup_similarity.py.
    emb = _t(spark, sf_dir, "embeddings")
    qvec = _qvec0(spark, emb)
    if qvec is None:
        return spark.createDataFrame([], "vec_id bigint, cosine double")
    cents = _sim.ivf_centroids(emb, nlist=8)
    return _sim.ivf_topk(emb, cents, qvec, k=10, nprobe=8)


# ---------------------------------------------------------------------------
# OLAP capability tier beyond the reference: multi-level aggregation
# (rollup), distribution-of-aggregates, grouped distinct counting, and
# the approximate-sketch variants used at 100 TB.
# ---------------------------------------------------------------------------

@register(
    "a9_rollup_revenue",
    """
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           total_bal, n_suppliers
    FROM (
        SELECT r.r_name, n.n_name,
               CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
               count(*) AS n_suppliers
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    )
    """,
)
def a9_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hierarchical subtotals (region -> nation -> grand total) in ONE
    # pass: Catalyst expands the rollup into grouping sets evaluated in
    # a single Expand+HashAggregate, not three scans.
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        supplier
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double")
            .alias("total_bal"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        # subtotal rows carry NULL group keys; surface them as 'ALL' so
        # the result is total-orderable for the oracle hash compare
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "total_bal", "n_suppliers",
        )
    )


@register(
    "q13_order_distribution",
    """
    SELECT n_orders, count(*) AS n_customers FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) GROUP BY n_orders
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q13 shape: distribution of per-customer order counts —
    # outer join preserving order-less customers, then an aggregate of
    # an aggregate (two shuffles, both on small post-agg data).
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "a10_grouped_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a10_grouped_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouped distinct-aggregate: Catalyst plans the classic two-phase
    # expand (dedup on (flag, supp) then count) with partial aggs.
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_suppkey").alias("n_supps"),
             F.count(F.lit(1)).alias("n_rows"))
    )


def a11_sketch_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch estimates next to their exact twins and tolerance
    bands — the frame the a11 row and its property test both consume."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supps_exact"),
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("n_supps_approx"),
            F.percentile_approx("l_quantity", F.lit(0.5), 10000)
            .alias("qty_p50"),
            F.percentile_approx("l_quantity", F.lit(0.95), 10000)
            .alias("qty_p95"),
            # Exact quantiles +-0.01 around each target: the tolerance
            # band. percentile_approx(accuracy=10000) guarantees rank
            # error <= n/10000 (relative 1e-4), so a 1e-2 band is 100x
            # slack — if it ever trips, the sketch is genuinely broken.
            F.expr("percentile(l_quantity, 0.49)").alias("_p50_lo"),
            F.expr("percentile(l_quantity, 0.51)").alias("_p50_hi"),
            F.expr("percentile(l_quantity, 0.94)").alias("_p95_lo"),
            F.expr("percentile(l_quantity, 0.96)").alias("_p95_hi"),
        )
    )


@register(
    "a11_approx_sketches",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supps_exact,
           TRUE AS supps_in_tol, TRUE AS p50_in_tol, TRUE AS p95_in_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a11_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The 100 TB forms of a6/a7: HyperLogLog++ cardinality and t-digest
    # percentiles — fixed-size sketches, mergeable across partitions,
    # no exact-sort/dedup cost. Sketch VALUES are engine-internal (no
    # SQL engine can recompute them), so the row carries the TOLERANCE
    # CONTRACT instead: exact distinct counts (hash-compared against
    # DuckDB) plus in-tolerance booleans the oracle asserts as TRUE —
    # HLL at rsd=0.02 within 5% (2.5 sigma), percentile_approx
    # (rank error <= 1e-4 relative) inside the exact +-0.01-quantile
    # band. A drifting sketch now FAILS the driver hash instead of
    # sliding through a rows-only check; the raw estimates remain
    # pinned by tests/test_oracle_parity.py::
    # test_approx_sketches_error_bounds over a11_sketch_detail.
    d = a11_sketch_detail(spark, sf_dir)
    rel_err = (F.abs(F.col("n_supps_approx") - F.col("n_supps_exact"))
               / F.col("n_supps_exact"))
    return d.select(
        "l_returnflag", "n_supps_exact",
        (rel_err <= 0.05).alias("supps_in_tol"),
        ((F.col("qty_p50") >= F.floor("_p50_lo"))
         & (F.col("qty_p50") <= F.ceil("_p50_hi"))).alias("p50_in_tol"),
        ((F.col("qty_p95") >= F.floor("_p95_lo"))
         & (F.col("qty_p95") <= F.ceil("_p95_hi"))).alias("p95_in_tol"),
    )


@register(
    "t8_moving_avg",
    """
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id
                                  ORDER BY (ts IS NOT NULL),
                                           COALESCE(ts, TIMESTAMP '2000-01-01'),
                                           (event_id IS NOT NULL),
                                           COALESCE(event_id, 0)
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
               AS mov_avg
    FROM events WHERE user_id < 100
    """,
)
def t8_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sliding-frame window (3-event moving average per user): one
    # shuffle on the partition key, sorted frame scan within. The
    # rounding bounds double addition-order noise: both engines sum the
    # same <=3 values in frame order, so 6dp agree.
    #
    # Oracle NULL-ordering pin, null-free form: DuckDB 1.0.0's window
    # ORDER BY is NONDETERMINISTIC over a NULL-bearing sort key — the
    # NULL row's placement varies run to run even WITH an explicit
    # NULLS FIRST (probed directly in r14, see test_null_contracts).
    # `(k IS NOT NULL), COALESCE(k, const)` expresses the same
    # NULLS-FIRST order with strictly non-null keys, sidestepping the
    # bug; Spark's ASC default already sorts NULLS FIRST.
    w = (Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
         .rowsBetween(-2, Window.currentRow))
    return (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id") < 100)
        .select("user_id", "event_id",
                F.round(F.avg("value").over(w), 6).alias("mov_avg"))
    )


@register(
    "q2_groupwise_argmin",
    """
    WITH mn AS (
      SELECT p_brand, min(p_retailprice) AS min_price
      FROM part GROUP BY p_brand
    )
    SELECT p.p_brand, p.p_partkey, p.p_name, p.p_retailprice
    FROM part p JOIN mn ON p.p_brand = mn.p_brand
               AND p.p_retailprice = mn.min_price
    """,
)
def q2_groupwise_argmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q2 shape: rows achieving the per-group minimum — aggregate
    # once, rejoin on (group, min). The agg output is small (one row
    # per brand), so it broadcasts back onto the fact scan; ties are
    # all kept, exactly as SQL semantics dictate.
    part = _t(spark, sf_dir, "part")
    mn = (part.groupBy(F.col("p_brand").alias("mn_brand"))
          .agg(F.min("p_retailprice").alias("min_price")))
    return (
        part.join(maybe_broadcast(mn),
                  (F.col("p_brand") == F.col("mn_brand"))
                  & (F.col("p_retailprice") == F.col("min_price")))
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5 shape: six-table join. The region filter prunes through
    # the broadcast dim chain (region -> nation -> supplier) BEFORE the
    # fact tables join, so lineitem rows for other regions' suppliers
    # drop at the (broadcast) supplier probe, not after a full join.
    # Only orders⋈lineitem shuffles; every dim side broadcasts.
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")))
    lineitem = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    asia_suppliers = (
        supplier
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        lineitem
        .join(maybe_broadcast(asia_suppliers),
              lineitem.l_suppkey == F.col("s_suppkey"))
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


from .operators.asof import asof_join as _asof_join  # noqa: E402


@register(
    "j6_asof_join",
    """
    WITH o1 AS (
      SELECT o_custkey AS user_id, o_orderdate,
             max(o_orderkey) AS o_orderkey
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
      GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           date_trunc('second', e.ts) AS ts_sec,
           o1.o_orderkey AS last_orderkey
    FROM (SELECT * FROM events WHERE ts IS NOT NULL) e
    ASOF LEFT JOIN o1
      ON e.user_id = o1.user_id AND e.ts >= o1.o_orderdate
    UNION ALL
    SELECT event_id, user_id, CAST(NULL AS TIMESTAMP) AS ts_sec,
           CAST(NULL AS BIGINT) AS last_orderkey
    FROM events WHERE ts IS NULL
    """,
)
def j6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # As-of join (operators/asof.py): each event picks up the customer's
    # most recent order at-or-before the event time. Right side is
    # deduplicated to one order per (customer, date) so the as-of winner
    # is deterministic in both engines.
    #
    # The oracle spells out the operator's NULL contract (asof.py):
    # rows with a NULL key or time on the RIGHT are un-matchable and
    # excluded; LEFT rows with a NULL time keep their row with a NULL
    # payload. DuckDB's ASOF alone would NOT give this — its
    # binary-search implementation sorts NULL as +infinity, so a NULL
    # event ts "matches" the customer's LATEST order and a NULL
    # o_orderdate becomes greater than every event time, both
    # violations of the three-valued `e.ts >= o1.o_orderdate` the
    # clause claims to express (probed directly in r14; the explicit
    # guards + union restore the 3VL reading).
    events = (
        _t(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts",
                F.date_trunc("second", F.col("ts")).cast("timestamp_ntz")
                .alias("ts_sec"))
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    return (
        _asof_join(events, orders, key="user_id",
                   left_ts="ts", right_ts="o_orderdate",
                   payload=["o_orderkey"])
        .select("event_id", "user_id", "ts_sec",
                F.col("o_orderkey").alias("last_orderkey"))
    )


from .operators.rangejoin import interval_join as _interval_join  # noqa: E402


@register(
    "j7_range_join",
    """
    WITH ev AS (
      SELECT user_id, event_id, value, date_trunc('second', ts) AS ts_s
      FROM events
    ), anchors AS (
      SELECT user_id, event_id AS anchor_event_id,
             ts_s AS astart, ts_s + INTERVAL 30 MINUTE AS aend
      FROM (SELECT user_id, event_id, ts_s,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rn
            FROM ev)
      WHERE rn <= 3
    )
    SELECT a.user_id, a.anchor_event_id, count(*) AS n_events
    FROM anchors a JOIN ev e
      ON e.user_id = a.user_id AND e.ts_s >= a.astart AND e.ts_s < a.aend
    GROUP BY a.user_id, a.anchor_event_id
    """,
)
def j7_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range join (operators/rangejoin.py): per-user activity counts
    # inside 30-minute windows anchored at each user's top-3 events.
    # Timestamps second-truncated on BOTH engines (sub-second precision
    # differs: parquet nanos vs Spark micros) so the boundary
    # comparisons agree. The bucket width equals the window length, so
    # each anchor interval lands in <= 2 buckets.
    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "value",
                F.date_trunc("second", F.col("ts")).cast("timestamp_ntz")
                .alias("ts_s"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    anchors = (
        ev.select("user_id", "event_id", "ts_s",
                  F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .select("user_id",
                F.col("event_id").alias("anchor_event_id"),
                F.col("ts_s").alias("astart"),
                (F.col("ts_s") + F.expr("INTERVAL 30 MINUTES")).alias("aend"))
    )
    return (
        _interval_join(ev.select("user_id", "event_id", "ts_s"), anchors,
                       key="user_id", ts="ts_s",
                       start="astart", end="aend", bucket_seconds=1800)
        .groupBy("user_id", "anchor_event_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


