"""Planted-fixture tests for the unigram-LM quality score and the
vocabulary-coverage table (operators/textstats.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from twitter_analysis_spark.operators import textstats as ts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_unigram_xent_hand_math(spark):
    """counts a:2 b:2 c:1 -> N=5 V=3 denom=9; Laplace probabilities
    are (c+1)/9 and xent is the mean -ln."""
    df = _docs(spark, [(0, "a a b"), (1, "b c")])
    out = {r["doc_id"]: r for r in
           ts.unigram_lm_xent(df, "doc_id", "text").collect()}
    assert out[0]["n_tok"] == 3 and out[0]["n_oov"] == 0
    assert out[0]["xent"] == round(math.log(3.0), 6)
    want1 = round((-math.log(3 / 9) - math.log(2 / 9)) / 2, 6)
    assert out[1]["xent"] == want1


def test_unigram_xent_oov_mass(spark):
    """Scoring against a model trained elsewhere: unseen tokens are
    counted as OOV and take the reserved 1/(N+V+1) probability."""
    model = ts.unigram_counts(_docs(spark, [(0, "a a b"), (1, "b c")]))
    out = ts.unigram_lm_xent(_docs(spark, [(7, "a z")]), "doc_id", "text",
                             model=model).collect()[0]
    assert out["n_oov"] == 1
    want = round((-math.log(3 / 9) - math.log(1 / 9)) / 2, 6)
    assert out["xent"] == want


def test_unigram_xent_surprise_ordering(spark, sf_dir):
    """A doc made of the corpus' most common tokens must score lower
    (less surprising) than a doc of rare tokens — the property the
    quality filter relies on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = ts.unigram_counts(docs)
    vocab = ts.vocab_topk(docs, k=5).collect()
    common = " ".join(r["tok"] for r in vocab)
    probe = _docs(spark, [(1, common), (2, "zq1 zq2 zq3 zq4 zq5")])
    out = {r["doc_id"]: r["xent"] for r in
           ts.unigram_lm_xent(probe, "doc_id", "text", model=model).collect()}
    assert out[1] < out[2]


def test_vocab_topk_coverage(spark):
    df = _docs(spark, [(0, "a a a b b c")])
    rows = ts.vocab_topk(df, k=2).collect()
    assert [(r["rank"], r["tok"], r["c"]) for r in rows] == \
        [(1, "a", 3), (2, "b", 2)]
    assert rows[0]["coverage"] == 0.5
    assert rows[1]["coverage"] == round(5 / 6, 6)


def test_vocab_topk_monotone(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = ts.vocab_topk(docs, k=50).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    covs = [r["coverage"] for r in rows]
    assert all(a <= b for a, b in zip(covs, covs[1:]))
    assert covs[-1] <= 1.0
    cs = [r["c"] for r in rows]
    assert all(a >= b for a, b in zip(cs, cs[1:]))


def test_bigram_xent_hand_math(spark):
    """Train 'a b' x2: bigram (a,b) prob 1; score 'a b' -> first token
    unigram, second exact bigram; score 'a z' -> backoff for z."""
    import math

    train = _docs(spark, [(0, "a b"), (2, "a b")])
    # train: uni a:2 b:2 -> N=4 V=2 denom=7; big (a,b)=2; ctx a=2
    score = _docs(spark, [(1, "a b"), (3, "a z")])
    out = {r["doc_id"]: r for r in
           ts.bigram_lm_xent(score, "doc_id", "text",
                             train=train).collect()}
    want_ab = round((-math.log(3 / 7) - math.log(2 / 2)) / 2, 6)
    assert out[1]["n_backoff"] == 0
    assert out[1]["xent"] == want_ab
    # 'a z': z unseen -> backoff 0.4 * (0+1)/7
    want_az = round((-math.log(3 / 7) - math.log(0.4 * (1 / 7))) / 2, 6)
    assert out[3]["n_backoff"] == 1
    assert out[3]["xent"] == want_az


def test_bigram_xent_self_trained_no_backoff(spark, sf_dir):
    """Scoring the training corpus itself never backs off, and seen
    bigram sequences score lower than shuffled ones on average."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    out = ts.bigram_lm_xent(docs, "doc_id", "text")
    assert out.where(F.col("n_backoff") > 0).count() == 0


def test_hash_bow_dense_round_trip(spark, sf_dir):
    """Sparse counts conserve total tokens per doc; densified arrays
    have the declared dim, reproduce the sparse entries, and feed the
    embedding-cosine machinery without modification."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    sparse = ts.hash_bow(docs, "doc_id", "text", dim=64)
    totals = {r["doc_id"]: r["s"] for r in
              sparse.groupBy("doc_id").agg(F.sum("cnt").alias("s"))
              .collect()}
    want = {r["doc_id"]: r["n"] for r in
            docs.select("doc_id",
                        ts.token_count(F.col("text")).alias("n")).collect()}
    assert totals == want

    dense = ts.assemble_dense(sparse, "doc_id", dim=64)
    rows = {r["doc_id"]: r["embedding"] for r in dense.collect()}
    assert all(len(v) == 64 for v in rows.values())
    for r in sparse.collect():
        assert rows[r["doc_id"]][r["bucket"]] == float(r["cnt"])

    # md5 and xxhash64 keyings produce the same per-doc vector NORM
    # profile (same multiset of counts, different bucket permutation
    # only when no within-doc collisions differ) — check total mass
    x = ts.hash_bow(docs, "doc_id", "text", dim=64, hash_fn="xxhash64")
    xt = {r["doc_id"]: r["s"] for r in
          x.groupBy("doc_id").agg(F.sum("cnt").alias("s")).collect()}
    assert xt == want

    # dense vectors drive the embedding near-dup operator unchanged
    from twitter_analysis_spark.operators.dedup import (
        embedding_near_dup_pairs)
    pairs = embedding_near_dup_pairs(dense, "doc_id", "embedding",
                                     threshold=0.95)
    for p in pairs.collect():
        assert 0.95 <= p["cosine"] <= 1.0


def test_sentiment_lexicon_planted(spark, tmp_path):
    """Hand-checkable lexicon scores: multiplicity counts, zero-match
    docs stay in the denominator with score 0."""
    import os
    from twitter_analysis_spark import catalog

    rows = [
        (1, "fast fast slow", "en", "s1", 14),   # 2*2 - 2 = +2
        (2, "the a key",      "en", "s1", 9),    # no lexicon words -> 0
        (3, "dup dup",        "en", "s2", 7),    # -6
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    sf = str(tmp_path / "sent_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    got = {r.source: (r.n_docs, r.sum_score, r.mean_score) for r in
           catalog.QUERIES["text_sentiment_lexicon"](spark, sf).collect()}
    assert got == {"s1": (2, 2, 1.0), "s2": (1, -6, -6.0)}


def test_rake_keyphrases_planted(spark, tmp_path):
    """Hand-checkable RAKE scoring: phrase runs split at stopwords,
    degree counts full phrase length per occurrence, integer ranking."""
    import os
    from twitter_analysis_spark import catalog

    rows = [
        # "fast join" twice, "fast" once alone; "the"/"a" are stopwords
        (1, "the fast join a fast join", "en", "s1", 24),
        (2, "a fast the", "en", "s1", 10),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    sf = str(tmp_path / "rake_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    got = [(r.phrase, r.n_occ, r.deg_sum, r.freq_sum) for r in
           catalog.QUERIES["text_keyphrases_rake"](spark, sf).collect()]
    # word stats: fast: freq 3 (2 in "fast join" + 1 alone),
    #             deg 2+2+1 = 5; join: freq 2, deg 4.
    # phrase "fast join": deg_sum 5+4=9, freq_sum 3+2=5, n_occ 2
    # phrase "fast": deg_sum 5, freq_sum 3, n_occ 1
    assert got == [("fast join", 2, 9, 5), ("fast", 1, 5, 3)]
