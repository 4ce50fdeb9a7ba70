"""Operator-level tests for the corpus-curation tier
(operators/curation.py, sampling.deterministic_mix): planted-PII
redaction, n=8 decontamination semantics, repetition features on
handcrafted docs, packing arithmetic, and partitioning-invariance of
the deterministic domain mix."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_analysis_spark.operators import curation as cur
from twitter_analysis_spark.operators.sampling import deterministic_mix


def _docs(spark, rows, schema="doc_id LONG, text STRING"):
    return spark.createDataFrame(rows, schema)


def test_pii_scrub_counts_and_redaction(spark):
    df = _docs(spark, [
        (1, "mail me at alice.smith+x@corp.example.org today"),
        (2, "see https://a.example.com/x?q=1 and http://b.org"),
        (3, "host 10.0.0.7 and 192.168.255.1 up"),
        (4, "call +1 415-555-0199 now"),
        (5, "clean text with no identifiers at all"),
    ])
    out = {r["doc_id"]: r for r in cur.pii_scrub(df).collect()}
    assert (out[1]["n_email"], out[1]["n_url"], out[1]["n_ipv4"],
            out[1]["n_phone"]) == (1, 0, 0, 0)
    assert out[1]["text_clean"] == "mail me at <EMAIL> today"
    assert out[2]["n_url"] == 2
    assert out[2]["text_clean"] == "see <URL> and <URL>"
    assert out[3]["n_ipv4"] == 2
    assert out[3]["text_clean"] == "host <IP> and <IP> up"
    assert out[4]["n_phone"] == 1
    assert out[4]["text_clean"] == "call <PHONE> now"
    assert out[5]["text_clean"] == out[5]["text"]
    assert (out[5]["n_email"] + out[5]["n_url"] + out[5]["n_ipv4"]
            + out[5]["n_phone"]) == 0


def test_decontaminate_exact_ngram_rule(spark):
    span = "one two three four five six seven eight"      # 8 words
    bench = _docs(spark, [(100, f"benchmark prefix {span} suffix")])
    docs = _docs(spark, [
        (1, f"copied {span} into a longer document body"),  # shares the 8-gram
        (2, "one two three four five six seven DIFFERENT"),  # only 7 shared
        (3, "one two three"),                                # < n tokens
    ])
    hits = {r["doc_id"]: r["n_hits"]
            for r in cur.decontaminate(docs, bench, "doc_id", "text",
                                       n=8).collect()}
    assert hits == {1: 1}


def test_decontaminate_counts_distinct_shingles(spark):
    bench = _docs(spark, [(100, "a b c d e f")])  # 4-grams: abcd bcde cdef
    docs = _docs(spark, [(1, "a b c d e x")])     # shares abcd, bcde
    hits = cur.decontaminate(docs, bench, "doc_id", "text", n=4).collect()
    assert [(r["doc_id"], r["n_hits"]) for r in hits] == [(1, 2)]


def test_decontaminate_dedups_repeated_shingles_within_doc(spark):
    # doc 4-grams {"a b a b" (×2 → once), "b a b a"}; bench 4-grams
    # {"x a b a", "a b a b", "b a b y"} — intersection is exactly one
    # shingle, counted once despite repeating inside the doc
    bench = _docs(spark, [(100, "x a b a b y")])
    docs = _docs(spark, [(1, "a b a b a b")])
    hits = cur.decontaminate(docs, bench, "doc_id", "text", n=4).collect()
    assert [(r["doc_id"], r["n_hits"]) for r in hits] == [(1, 1)]


def test_repetition_features_handcrafted(spark):
    df = _docs(spark, [
        (1, "a a a a"),        # top 4/4; bigrams [aa,aa,aa] -> dup 2/3
        (2, "w"),              # single token: no bigrams -> dup 0.0
        (3, "a b a b c"),      # top 2/5; bigrams [ab,ba,ab,bc] -> dup 1/4
    ])
    out = {r["doc_id"]: r
           for r in cur.repetition_features(df, "doc_id").collect()}
    assert out[1]["top_word_frac"] == 1.0
    assert out[1]["dup_2gram_frac"] == round(1 - 1 / 3, 6)
    assert out[2]["top_word_frac"] == 1.0
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[3]["top_word_frac"] == 0.4
    assert out[3]["dup_2gram_frac"] == 0.25


def test_pack_sequences_chunk_arithmetic(spark):
    # token counts: 4, 3, 5, 2 in doc_id order within one shard ->
    # starts 0, 4, 7, 12; budget 5 -> seq ids 0, 0, 1, 2.
    df = spark.createDataFrame(
        [(1, "s", "t t t t"), (2, "s", "t t t"),
         (3, "s", "t t t t t"), (4, "s", "t t")],
        "doc_id LONG, source STRING, text STRING")
    out = {r["doc_id"]: r
           for r in cur.pack_sequences(df, "doc_id", "source", "doc_id",
                                       budget=5).collect()}
    assert [(out[i]["seq_id"], out[i]["tok_offset"]) for i in (1, 2, 3, 4)] \
        == [(0, 0), (0, 4), (1, 2), (2, 2)]


def test_pack_sequences_partitioning_invariant(spark, sf_dir):
    from twitter_analysis_spark.sources.io import load_table
    docs = load_table(spark, sf_dir, "documents")
    a = cur.pack_sequences(docs, "doc_id", "source", "doc_id", 512)
    b = cur.pack_sequences(docs.repartition(13), "doc_id", "source",
                           "doc_id", 512)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_deterministic_mix_quota_and_stability(spark, sf_dir):
    from twitter_analysis_spark.sources.io import load_table
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    quota = F.when(F.substring("source", 4, 10).cast("int") % 2 == 0,
                   F.lit(10)).otherwise(F.lit(5))
    a = deterministic_mix(docs, "source", "doc_id", quota)
    per_src = {r["source"]: r["n"] for r in
               a.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, n in per_src.items():
        want = 10 if int(src[3:]) % 2 == 0 else 5
        assert n == want, (src, n)
    # content-hash order => identical selection under any partitioning
    b = deterministic_mix(docs.repartition(17), "source", "doc_id", quota)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pii_scrub_idempotent_property(spark):
    """Scrubbing is a fixpoint: replacement tokens (<EMAIL> etc.)
    contain no digits/@/://, so a second pass changes nothing —
    property-checked over adversarial alphabet strings."""
    import random

    rng = random.Random(42)
    alphabet = list("ab @.:/+-0123456789\thttp")
    rows = [(i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60))))
            for i in range(200)]
    rows += [(1000, "a@b.co http://x 1.2.3.4 +12 3456-7890"),
             (1001, "@@..//++ 999.999.999.999 http://")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    once = cur.pii_scrub(df).select("doc_id", F.col("text_clean").alias("text"))
    twice = cur.pii_scrub(once).select("doc_id", "text_clean")
    joined = once.alias("a").join(twice.alias("b"), "doc_id").where(
        F.col("a.text") != F.col("b.text_clean"))
    assert joined.count() == 0, joined.limit(5).collect()


def test_pack_sequences_conservation(spark, sf_dir):
    """Within each shard: offsets are consistent with a contiguous
    token stream (start of doc i+1 == start of doc i + n_tok_i) and
    every tok_offset < budget."""
    from twitter_analysis_spark.sources.io import load_table
    docs = load_table(spark, sf_dir, "documents")
    out = cur.pack_sequences(docs, "doc_id", "source", "doc_id", 512)
    rows = sorted(map(tuple, out.collect()))
    assert all(r[4] < 512 for r in rows)
    by_src: dict[str, list] = {}
    for doc_id, src, n_tok, seq_id, off in rows:
        by_src.setdefault(src, []).append((doc_id, n_tok, seq_id, off))
    for src, ds in by_src.items():
        ds.sort()
        start = 0
        for doc_id, n_tok, seq_id, off in ds:
            assert seq_id == start // 512, (src, doc_id)
            assert off == start % 512, (src, doc_id)
            start += n_tok


def test_unit_dedup_stats_planted(spark):
    """Sentence-level corpus dedup on a planted multi-sentence corpus:
    the globally FIRST occurrence of a sentence is never flagged;
    every later occurrence is, across and within documents."""
    rows = [
        (0, "The sky is blue. Water is wet. Unique zero."),
        (1, "The sky is blue. Totally fresh sentence."),     # 1 dup
        (2, "water is wet.   THE SKY IS BLUE. Another one."),  # 2 dups
        (3, "Repeat me. Repeat me. Repeat me."),             # self-dups
        (4, "Nothing shared here at all."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_units"], r["n_dup_units"])
           for r in cur.unit_dedup_stats(df, "doc_id").collect()}
    assert got[0] == (3, 0)          # all first occurrences
    assert got[1] == (2, 1)          # 'the sky is blue' seen in doc 0
    assert got[2] == (3, 2)          # case/whitespace-normalized dups
    # last unit keeps its trailing '.' (no separator follows), so it
    # normalizes differently: 2 of 3 units equal, 1 within-doc dup
    assert got[3] == (3, 1)
    assert got[4] == (1, 0)


def test_chunk_text_windows(spark):
    """Chunk arithmetic: full windows at each stride, a short final
    window, reconstruction of the token stream from stride-aligned
    chunks, and no chunks for empty docs."""
    rows = [(0, " ".join(f"t{i}" for i in range(80))),   # 80 tokens
            (1, "only four little tokens"),
            (2, "   ")]                                  # empty
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = cur.chunk_text(df, "doc_id", size=32, stride=24)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc                               # empty -> none
    assert [r["start_tok"] for r in sorted(by_doc[0],
            key=lambda r: r["chunk_id"])] == [0, 24, 48, 72]
    last = max(by_doc[0], key=lambda r: r["chunk_id"])
    assert last["n_chunk_toks"] == 8                     # 80 - 72
    assert last["chunk_text"].split() == [f"t{i}" for i in range(72, 80)]
    assert by_doc[1][0]["n_chunk_toks"] == 4
    # stride-aligned prefixes reconstruct the stream
    first = min(by_doc[0], key=lambda r: r["chunk_id"])
    assert first["chunk_text"].split()[:24] == [f"t{i}" for i in range(24)]


def test_duplicated_spans_planted(spark):
    """A 10-token span copied into another doc yields exactly 3
    duplicated 8-windows whose merged coverage is 10 tokens; the
    source occurrence (global first) is never flagged; docs shorter
    than the window emit zeros."""
    span = " ".join(f"w{i}" for i in range(10))          # 10 tokens
    rows = [
        (0, span + " tail0 tail1"),                       # first occurrence
        (1, "lead0 lead1 " + span),                       # copy, offset 2
        (2, "short doc"),                                 # n_tok < window
        (3, "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9"),             # unique, no dups
    ]
    out = {r["doc_id"]: r for r in
           cur.duplicated_spans(_docs(spark, rows), "doc_id", "text",
                                window=8).collect()}
    assert out[0]["n_dup_windows"] == 0 and out[0]["n_dup_tokens"] == 0
    # windows of the copy at starts 2,3,4 duplicate starts 0,1,2 of doc 0
    assert out[1]["n_dup_windows"] == 3
    # merged coverage: starts 2,3,4 with window 8 -> tokens [2, 12) = 10
    assert out[1]["n_dup_tokens"] == 10
    assert out[1]["dup_tok_ratio"] == round(10 / 12, 6)
    assert out[2]["n_tok"] == 2 and out[2]["n_dup_tokens"] == 0
    assert out[3]["n_dup_windows"] == 0


def test_duplicated_spans_identical_docs(spark):
    """An exact duplicate document is 100% covered; the first copy
    (lowest doc_id) is untouched."""
    text = " ".join(f"t{i}" for i in range(20))
    out = {r["doc_id"]: r for r in
           cur.duplicated_spans(_docs(spark, [(5, text), (9, text)]),
                                "doc_id", "text", window=8).collect()}
    assert out[5]["n_dup_tokens"] == 0
    assert out[9]["n_dup_tokens"] == 20
    assert out[9]["dup_tok_ratio"] == 1.0


def test_duplicated_spans_hash_key_equivalent(spark, sf_dir):
    """All three keyings (xxhash64 production, md5 oracle-replayable,
    raw string) must produce identical stats on the real corpus —
    collisions are the only divergence mode and must not occur here."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = cur.duplicated_spans(docs, "doc_id", "text", window=8,
                             key_mode="xxhash64")
    b = cur.duplicated_spans(docs, "doc_id", "text", window=8,
                             key_mode="raw")
    c = cur.duplicated_spans(docs, "doc_id", "text", window=8,
                             key_mode="md5")
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    assert ra == sorted(map(tuple, c.collect()))


def test_weighted_repeat_multiplicity(spark):
    """Integer weights repeat exactly; fractional weights resolve per
    row to floor/ceil with the expected aggregate rate; zero/negative
    weights drop; copy_idx enumerates copies."""
    from twitter_analysis_spark.operators.sampling import weighted_repeat

    rows = [(i, "a") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    out = weighted_repeat(df, "doc_id", F.lit(3.0)).collect()
    assert len(out) == 3000
    per = {}
    for r in out:
        per.setdefault(r["doc_id"], []).append(r["copy_idx"])
    assert all(sorted(v) == [0, 1, 2] for v in per.values())

    frac = weighted_repeat(df, "doc_id", F.lit(2.5)).collect()
    counts = {}
    for r in frac:
        counts[r["doc_id"]] = counts.get(r["doc_id"], 0) + 1
    assert set(counts.values()) <= {2, 3}
    # md5 buckets are uniform: expected 2500 +- a generous band
    assert 2300 <= len(frac) <= 2700

    assert weighted_repeat(df, "doc_id", F.lit(0.0)).count() == 0

    # stability: same decision regardless of partitioning
    a = sorted(map(tuple, weighted_repeat(
        df.repartition(17), "doc_id", F.lit(1.5)).collect()))
    b = sorted(map(tuple, weighted_repeat(
        df.coalesce(1), "doc_id", F.lit(1.5)).collect()))
    assert a == b


def test_select_within_budget_matches_naive(spark):
    """Two-phase selection == naive global greedy prefix, including
    the boundary-group partial fill and quality ties."""
    import random

    from twitter_analysis_spark.operators.sampling import (
        select_within_budget)

    rng = random.Random(7)
    rows = [(i, round(rng.choice([0.2, 0.5, 0.5, 0.8]), 6),
             rng.randint(1, 50)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id LONG, q DOUBLE, n LONG")
    for budget in (0, 37, 1000, 10**9):
        got = sorted(r["doc_id"] for r in
                     select_within_budget(df, "doc_id", "q", "n",
                                          budget).collect())
        cum, want = 0, []
        for i, q, n in sorted(rows, key=lambda r: (-r[1], r[0])):
            if cum + n > budget:
                break
            cum += n
            want.append(i)
        assert got == sorted(want), budget


def test_nb_classifier_separates_planted(spark):
    """Docs built from 'high-label' tokens score positive against docs
    of 'low-label' tokens when labels are supplied explicitly."""
    from twitter_analysis_spark.operators.textstats import (
        nb_quality_classifier)

    rows = ([(i, "good fine great solid nice", 1) for i in range(20)]
            + [(100 + i, "spam junk noise blah blah", 0)
               for i in range(20)]
            + [(500, "good great nice", None), (501, "spam junk blah", None)])
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, y INT")
    out = {r["doc_id"]: r for r in nb_quality_classifier(
        df, "doc_id", "text",
        label_col=F.coalesce(F.col("y"), F.lit(0))).collect()}
    assert out[0]["nb_score"] > out[100]["nb_score"]
    assert out[500]["nb_score"] > out[501]["nb_score"]


def test_cut_duplicated_spans_semantics(spark):
    """The cut preserves global first occurrences, removes later ones,
    agrees with duplicated_spans' coverage arithmetic, and leaves
    untouched docs byte-identical (token-joined)."""
    span = " ".join(f"w{i}" for i in range(10))
    rows = [
        (0, span + " tail0 tail1"),
        (1, "lead0 lead1 " + span),
        (2, "short doc"),
        (3, " ".join(f"u{i}" for i in range(12))),
    ]
    df = _docs(spark, rows)
    out = {r["doc_id"]: r for r in
           cur.cut_duplicated_spans(df, "doc_id", "text",
                                    window=8).collect()}
    assert out[0]["clean_text"] == span + " tail0 tail1"   # first kept
    assert out[1]["clean_text"] == "lead0 lead1"           # copy cut
    assert out[2]["clean_text"] == "short doc"
    assert out[3]["n_removed"] == 0
    stats = {r["doc_id"]: r for r in
             cur.duplicated_spans(df, "doc_id", "text",
                                  window=8).collect()}
    for did, r in out.items():
        assert r["n_removed"] == stats[did]["n_dup_tokens"], did

    # an exact duplicate document is cut to empty
    dup = _docs(spark, [(5, span + " x y z a b"), (9, span + " x y z a b")])
    got = {r["doc_id"]: r["clean_text"] for r in
           cur.cut_duplicated_spans(dup, "doc_id", "text",
                                    window=8).collect()}
    assert got[5] == span + " x y z a b" and got[9] == ""


def test_pack_sequences_null_order_keys_excluded(spark):
    """r14 NULL contract: a NULL order key has no deterministic slot
    in the packed stream — excluded, and every surviving doc's offset
    is computed as if it never existed."""
    df = spark.createDataFrame(
        [(1, "s", "a b c"), (None, "s", "x y"), (2, "s", "d e")],
        "doc_id long, source string, text string")
    out = {r["doc_id"]: (r["seq_id"], r["tok_offset"])
           for r in cur.pack_sequences(df, "doc_id", "source", "doc_id",
                                       budget=4).collect()}
    assert set(out) == {1, 2}
    assert out[1] == (0, 0)
    assert out[2] == (0, 3)      # offsets unshifted by the NULL-key doc


def test_deterministic_mix_null_ids_excluded(spark):
    """r14 NULL contract: quota membership is a pure function of
    (key, id) — NULL-id rows are excluded and do not displace any
    hash-ranked survivor."""
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(f"s{i % 2}", i) for i in range(12)], "source string, doc_id long")
    with_nulls = base.unionByName(spark.createDataFrame(
        [("s0", None), ("s1", None)], "source string, doc_id long"))
    pick = lambda df: sorted(  # noqa: E731
        (r["source"], r["doc_id"])
        for r in deterministic_mix(df, "source", "doc_id",
                                   F.lit(3)).collect())
    assert pick(base) == pick(with_nulls)
    assert all(d is not None for _, d in pick(with_nulls))
