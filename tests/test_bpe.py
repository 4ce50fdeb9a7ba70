"""BPE trainer/encoder: the Sennrich et al. worked example, greedy
merge semantics, determinism, and compression monotonicity."""

from __future__ import annotations

from twitter_analysis_spark.operators import bpe


def _corpus(spark, words: dict[str, int]):
    rows, i = [], 0
    for w, n in words.items():
        for _ in range(n):
            rows.append((i, w)); i += 1
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_bpe_classic_example(spark):
    """The original paper's toy corpus: merges start with the 'es'/
    'est' family driven by newest+widest frequencies."""
    df = _corpus(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges = bpe.bpe_train(df, num_merges=4)
    # counts: (e,s)=9 and (s,t)=9 tie -> lexicographic 'e' < 's';
    # then (es,t)=9, (est,</w>)=9, (l,o)=7
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", bpe.EOW)
    assert merges[3] == ("l", "o")


def test_bpe_encode_roundtrip_and_greedy(spark):
    df = _corpus(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges = bpe.bpe_train(df, num_merges=8)
    enc = {(r["doc_id"], r["word_idx"]): r for r in
           bpe.bpe_encode(df, merges).collect()}
    for (doc, _), r in enc.items():
        # concatenated subwords reconstruct the word + EOW exactly
        joined = "".join(r["subwords"])
        assert joined.endswith(bpe.EOW)
        assert 1 <= r["n_subwords"] <= len(joined)
    # frequent whole words compress to few symbols
    newest = [r for r in enc.values()
              if "".join(r["subwords"]) == "newest" + bpe.EOW]
    assert newest and all(r["n_subwords"] <= 3 for r in newest)


def test_bpe_greedy_overlap_rule(spark):
    """(a,a) over 'aaaa' merges greedily left-to-right: aa+aa."""
    df = _corpus(spark, {"aaaa": 3})
    merges = bpe.bpe_train(df, num_merges=1)
    assert merges == [("a", "a")]
    out = bpe.bpe_encode(df, merges).collect()[0]
    assert out["subwords"] == ["aa", "aa", bpe.EOW]


def test_bpe_deterministic_and_monotone(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    m1 = bpe.bpe_train(docs, num_merges=12)
    m2 = bpe.bpe_train(docs.repartition(13), num_merges=12)
    assert m1 == m2                       # partitioning-invariant
    # more merges never increase the encoded length of any word
    import pyspark.sql.functions as F
    short = bpe.bpe_encode(docs, m1[:4]).select("doc_id", "word_idx",
                                                F.col("n_subwords")
                                                .alias("n4"))
    full = bpe.bpe_encode(docs, m1).select("doc_id", "word_idx",
                                           F.col("n_subwords").alias("n12"))
    j = short.join(full, ["doc_id", "word_idx"])
    assert j.where(F.col("n12") > F.col("n4")).count() == 0


def test_bpe_driver_and_distributed_paths_agree(spark):
    """The auto/driver fast path (collected word-type table, Python
    merge loop) and the distributed rounds are the same trainer:
    identical merge lists, including tie-breaks and the
    min_pair_count early stop."""
    df = _corpus(spark, {"low": 5, "lower": 2, "newest": 6,
                         "widest": 3, "wide": 1, "neat": 1})
    kw = dict(num_merges=10, min_pair_count=2)
    m_driver = bpe.bpe_train(df, strategy="driver", **kw)
    m_dist = bpe.bpe_train(df, strategy="distributed", **kw)
    m_auto = bpe.bpe_train(df, **kw)
    assert m_driver == m_dist == m_auto
    assert len(m_driver) >= 4


def test_bpe_encode_replace_equals_fold(spark):
    """The replace-chain hot path and the fold spec agree symbol-for-
    symbol — including on words containing the bracket metacharacters
    the string representation escapes."""
    df = _corpus(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3,
                         "aaaa": 4, "a[b]": 3, "x\\[y": 3, "[[": 2})
    merges = bpe.bpe_train(df, num_merges=10, min_pair_count=2)
    cols = ["doc_id", "word_idx"]
    fast = bpe.bpe_encode(df, merges).orderBy(cols).collect()
    spec = bpe.bpe_encode(df, merges, impl="fold").orderBy(cols).collect()
    assert len(fast) == len(spec) > 0
    for r1, r2 in zip(fast, spec):
        assert r1["subwords"] == r2["subwords"], (r1, r2)
    # escaped-metacharacter words survive the string round-trip
    joined = {"".join(r["subwords"]) for r in fast}
    assert "a[b]" + bpe.EOW in joined and "[[" + bpe.EOW in joined


def test_bpe_auto_guard_forces_distributed_on_high_type_count(
        spark, monkeypatch):
    """The driver fast path's Heaps-law bound is ENFORCED, not assumed:
    when the counted word-type table exceeds ``max_driver_vocab`` the
    auto strategy must run the distributed rounds — no word-type
    collect can reach the driver. Pinned by making the driver-path
    trainer explode: an adversarial corpus (every word a distinct
    type, the shape Heaps' law fails on) must still train, and must
    produce the same merges as the unguarded driver path."""
    words = {f"w{i:03d}xyz": 1 for i in range(40)}
    words.update({"newest": 6, "widest": 3})
    df = _corpus(spark, words)
    kw = dict(num_merges=4, min_pair_count=2)

    want = bpe.bpe_train(df, strategy="driver", **kw)

    def boom(*a, **k):
        raise AssertionError(
            "driver-path merge loop ran despite type count > cap")
    monkeypatch.setattr(bpe, "_train_local", boom)
    got = bpe.bpe_train(df, strategy="auto", max_driver_vocab=8, **kw)
    assert got == want and len(got) == 4
