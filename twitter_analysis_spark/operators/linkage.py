"""Similarity joins for record linkage / entity resolution.

Four classic linkage primitives the reference's exact-match joins
(app.py:106-191 equality lookups) cannot express, built Spark-first
(:func:`sorted_neighborhood_pairs` completes the candidate-generator
triple: equality blocking, prefix-filtered set joins, sort-order
neighborhoods — three recall contracts that miss different pairs):

* :func:`set_similarity_join` — exact set-similarity self-join
  (Jaccard >= t over token n-gram SETS) via PPJoin-style *prefix
  filtering* (Chaudhuri et al., "A Primitive Operator for Similarity
  Joins", ICDE'06; Xiao et al. PPJoin, WWW'08). Unlike the MinHash/
  SimHash tiers (operators/dedup.py), the prefix filter is LOSSLESS:
  the output is exactly the all-pairs result, but only candidate
  pairs that share a *rare-prefix* token are ever materialized.

* :func:`containment_join` — the ASYMMETRIC variant
  (|A∩B|/|A| >= t): doc-in-doc / quote detection, with the prefix
  filter applied one-sided (only the contained side shrinks).

* :func:`blocked_fuzzy_pairs` — blocked edit-distance linkage:
  candidates from an equality join on a cheap blocking key, verified
  with ``levenshtein`` (JVM built-in). Blocking is part of the
  operator contract (recall bounded by the blocking function), the
  same honesty contract the LSH rows declare.

All are pure DataFrame compositions — no UDFs, whole-stage codegen
end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens, word_shingles


def _shingle_sets(df: DataFrame, id_col: str, text_col: str,
                  n: int) -> DataFrame:
    """(doc, st, n_sh): DISTINCT word n-gram set per document."""
    return (
        df.select(F.col(id_col).alias("doc"),
                  tokens(F.col(text_col)).alias("_tk"))
        .select("doc",
                F.array_distinct(word_shingles(F.col("_tk"), n)).alias("st"))
        .select("doc", "st", F.size("st").alias("n_sh"))
    )


def _prefix_postings(sets: DataFrame, threshold: float):
    """(full posting list, rarest-first prefix slice) for a sets table.

    Posting = one (doc, n_sh, sh) row per set element; prefix keeps
    each doc's first ``|S| - ceil(t*|S|) + 1`` elements under the
    global (df asc, sh asc) order — the shared machinery of the
    symmetric (Jaccard) and asymmetric (containment) prefix joins.
    The frequency agg and the rank join both key on sh, so they share
    one exchange.
    """
    posting = sets.select("doc", "n_sh", F.explode("st").alias("sh"))
    freq = posting.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        posting.join(freq, "sh")
        .withColumn("rnk", F.row_number().over(
            Window.partitionBy("doc").orderBy("df", "sh")))
    )
    prefix = ranked.where(
        F.col("rnk") <= F.col("n_sh") - F.ceil(F.lit(threshold)
                                               * F.col("n_sh")) + 1)
    return posting, prefix


def set_similarity_join(df: DataFrame, id_col: str, text_col: str = "text",
                        threshold: float = 0.5, n: int = 3,
                        cleanup: list | None = None) -> DataFrame:
    """Exact Jaccard >= ``threshold`` self-join over word ``n``-gram
    sets, prefix-filtered. Returns (id1, id2, jaccard), id1 < id2.

    Losslessness of the prefix filter: order every set by ascending
    global shingle frequency (ties by value) and keep the first
    ``|S| - ceil(t*|S|) + 1`` elements. If J(A,B) >= t then
    ``|A∩B| >= t*|A∪B| >= ceil(t*max(|A|,|B|))``, and a set whose
    first ``|S|-c+1`` elements all missed the intersection could
    contain at most ``c-1`` of it — contradiction. So both prefixes
    contain intersection elements under the SAME total order, and the
    earliest common intersection element appears in both prefixes
    (each prefix is at least as long as the ``|S|-c+1`` bound needs).
    Every qualifying pair therefore collides on >= 1 prefix shingle;
    verification computes exact Jaccard, so output == all-pairs truth.

    Scale shape: the inverted index is built over PREFIX shingles only
    — the globally rarest ~(1-t) fraction of each set — so posting
    lists stay short exactly where the corpus is hot. The length
    filter ``t*|A| <= |B| <= |A|/t`` prunes candidates before the
    verify join. Shuffles: shingle-frequency agg (keyed by shingle),
    per-doc rank window (keyed by doc), candidate join (keyed by
    shingle), verify joins (keyed by id) — each on a different key by
    necessity; no shuffle is repeated.

    Shingle width matters: prefix filtering only pays off when rare
    shingles EXIST, so the default is word trigrams (n=3). On a corpus
    with a dense narrow vocabulary (this testbed: 31 distinct words,
    so ~900 possible bigrams shared by everyone), n=2 prefix postings
    collapse into a few hot buckets and the candidate join degenerates
    toward all-pairs (measured 17x slower at sf0.1); trigrams keep
    mean posting length ~10 while near-dups still share most shingles.

    ``cleanup`` follows the dedup.py persist contract: the sets table
    feeds four plan branches (posting, rank, both verify sides) and is
    persisted; pass a list to receive it for unpersisting.
    """
    sets = _shingle_sets(df, id_col, text_col, n).persist()
    if cleanup is not None:
        cleanup.append(sets)

    posting, prefix = _prefix_postings(sets, threshold)
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc") < F.col("b.doc"))
               # length filter: t*|A| <= |B| <= |A|/t (both directions,
               # since id order is not size order)
               & (F.col("b.n_sh") * threshold <= F.col("a.n_sh"))
               & (F.col("a.n_sh") * threshold <= F.col("b.n_sh")))
        .select(F.col("a.doc").alias("id1"), F.col("b.doc").alias("id2"))
        .distinct()
    )

    s1 = sets.select(F.col("doc").alias("id1"), F.col("st").alias("st1"),
                     F.col("n_sh").alias("n1"))
    s2 = sets.select(F.col("doc").alias("id2"), F.col("st").alias("st2"),
                     F.col("n_sh").alias("n2"))
    inter = F.size(F.array_intersect("st1", "st2"))
    jacc = inter.cast("double") / (F.col("n1") + F.col("n2") - inter)
    return (
        cand.join(s1, "id1").join(s2, "id2")
        .where(jacc >= threshold)
        .select("id1", "id2", F.round(jacc, 6).alias("jaccard"))
    )


def blocked_fuzzy_pairs(df: DataFrame, key_col: str, block_col,
                        max_dist: int = 2,
                        count_col: str | None = None) -> DataFrame:
    """Blocked edit-distance linkage over DISTINCT keys.

    Collapses ``df`` to one row per distinct ``key_col`` value (with
    an occurrence count), equality-joins on ``block_col`` (a column
    expression over the key — the blocking function), prunes by the
    length bound ``|len(a)-len(b)| <= max_dist`` (a lower bound on
    edit distance, evaluated before the O(len^2) levenshtein), and
    emits verified pairs (name_a, name_b, dist, n_a, n_b), a < b.

    The distinct-key collapse makes the quadratic stage run on the
    VOCABULARY (entity dictionary), not the corpus: 10^11 rows with
    10^6 distinct names cost one hash-agg plus a 10^6-row blocked
    self-join. Candidate recall is bounded by the blocking function —
    an edit that changes the block key escapes the join; that contract
    is declared, exactly as the LSH tiers declare theirs.
    """
    names = (
        df.groupBy(F.col(key_col).alias("name"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("blk", block_col)
    )
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.name") < F.col("b.name")))
        .where(F.abs(F.length(F.col("a.name"))
                     - F.length(F.col("b.name"))) <= max_dist)
        .where(dist <= max_dist)
        .select(F.col("a.name").alias("name_a"),
                F.col("b.name").alias("name_b"),
                dist.alias("dist"),
                F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b"))
    )


def containment_join(df: DataFrame, id_col: str, text_col: str = "text",
                     threshold: float = 0.8, n: int = 3,
                     cleanup: list | None = None) -> DataFrame:
    """ASYMMETRIC set-containment self-join: pairs where
    ``|A ∩ B| / |A| >= threshold`` — document A's shingle set mostly
    inside document B's (quotes, excerpts, doc-in-doc duplication the
    symmetric Jaccard of :func:`set_similarity_join` misses: a short
    doc fully quoted inside a long one has low Jaccard but containment
    1.0). Returns (inner_id, outer_id, containment), inner != outer;
    exact-dup pairs appear in both orientations, by definition.

    Prefix filtering adapts asymmetrically: the required overlap
    ``c = ceil(t*|A|)`` depends only on the CONTAINED side, so only
    A-side postings shrink to the rarest ``|A|-c+1`` prefix — the
    outer side must stay fully indexed (anything might contain A).
    Candidates also require ``|B| >= t*|A|`` (B too small can't hold
    the needed overlap). Verification computes exact containment, so
    the output equals the all-pairs truth — same losslessness argument
    as the Jaccard prefix, one-sided.
    """
    sets = _shingle_sets(df, id_col, text_col, n).persist()
    if cleanup is not None:
        cleanup.append(sets)

    posting, prefix = _prefix_postings(sets, threshold)
    # Candidate join keyed on xxhash64(sh), not the shingle STRING
    # (r16, guide §2.3): the exchange then shuffles an 8-byte key and
    # the n-word string never leaves the map side. Output-invariant by
    # construction — unlike the Jaccard count-join (whose n_common
    # would be corrupted by a collision), every candidate here is
    # re-verified below with an exact array_intersect over the TRUE
    # shingle sets, so a hash collision can only ADD a candidate that
    # verification rejects; it can never add, drop, or change an
    # output row. (The prefix SELECTION stays on the exact (df, sh)
    # order — only the equi-join key is hashed.) j10's symmetric join
    # keeps the string key: it is a pinned bench control, and its
    # kept-pair semantics flow through the same exact-verify argument
    # only via a separate code path — left untouched deliberately.
    a = prefix.select(F.col("doc").alias("inner_doc"),
                      F.col("n_sh").alias("inner_n"),
                      F.xxhash64("sh").alias("shh"))
    b = posting.select(F.col("doc").alias("outer_doc"),
                       F.col("n_sh").alias("outer_n"),
                       F.xxhash64("sh").alias("shh"))
    cand = (
        a.join(b, "shh")
        .where((F.col("inner_doc") != F.col("outer_doc"))
               & (F.col("outer_n") >= F.col("inner_n") * threshold))
        .select(F.col("inner_doc").alias("inner_id"),
                F.col("outer_doc").alias("outer_id"))
        .distinct()
    )

    s1 = sets.select(F.col("doc").alias("inner_id"),
                     F.col("st").alias("st1"), F.col("n_sh").alias("n1"))
    s2 = sets.select(F.col("doc").alias("outer_id"),
                     F.col("st").alias("st2"))
    containment = (F.size(F.array_intersect("st1", "st2")).cast("double")
                   / F.col("n1"))
    return (
        cand.join(s1, "inner_id").join(s2, "outer_id")
        .where(containment >= threshold)
        .select("inner_id", "outer_id",
                F.round(containment, 6).alias("containment"))
    )


def sorted_neighborhood_pairs(df: DataFrame, key_col: str,
                              window: int = 5, max_dist: int = 3,
                              sort_key=None,
                              cleanup: list | None = None) -> DataFrame:
    """Sorted-Neighborhood Method (Hernandez & Stolfo 1995): rank the
    DISTINCT keys by a sort key, compare each key only to its next
    ``window`` neighbors in that order, verify with levenshtein.
    Returns (name_a, name_b, dist, rank_gap), a before b in sort order.

    The third classic ER candidate generator, complementary to
    equality blocking (:func:`blocked_fuzzy_pairs` — misses pairs
    whose block key the typo changed) and prefix-filtered set joins:
    SNM's recall is bounded by the sort key and window instead. Run
    several passes with different sort keys in practice; each pass is
    this operator.

    Scale shape: everything after the distinct-key collapse is
    dictionary-sized (the blocked_fuzzy_pairs argument). Ranks come
    from :func:`~.layout.ranked_cumsum`'s size-gated auto strategy:
    the plain window while Catalyst's estimate says the dictionary is
    small, the two-phase range-band plan (per-band ranks + bounded
    offset collect) for dictionaries too big for one task — identical
    ranks either way, so the gate can't change candidates. When the
    two-phase path fires it localCheckpoints the ranked frame; pass
    ``cleanup`` (a list the caller later unpersists) to reclaim those
    blocks — without it they live for the session. The
    neighbor band join avoids a theta join via the grid trick: each
    rank lands in one ``window``-wide block, the left side probes its
    own and the next block, and the band predicate filters inside —
    every pair meets exactly once (b's block is unique).
    """
    from .layout import ranked_cumsum

    sort_key = F.col("name") if sort_key is None else sort_key
    names = (df.groupBy(F.col(key_col).alias("name"))
             .agg(F.count(F.lit(1)).alias("n")))
    ranked = ranked_cumsum(names, [sort_key.asc(), F.col("name").asc()],
                           rank_col="rnk", cleanup=cleanup)
    blk = (F.col("rnk") / window).cast("bigint")
    a = (ranked.withColumn(
        "_blk", F.explode(F.array(blk, blk + 1))).alias("a"))
    b = ranked.withColumn("_blk", blk).alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    gap = F.col("b.rnk") - F.col("a.rnk")
    return (
        a.join(b, (F.col("a._blk") == F.col("b._blk"))
               & (F.col("b.rnk") > F.col("a.rnk"))
               & (F.col("b.rnk") <= F.col("a.rnk") + window))
        .where(dist <= max_dist)
        .select(F.col("a.name").alias("name_a"),
                F.col("b.name").alias("name_b"),
                dist.alias("dist"), gap.alias("rank_gap"))
    )
