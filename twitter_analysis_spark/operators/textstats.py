"""Text analysis operators for training-data pipelines.

Everything is built from Catalyst string/array expressions (no Python
in the hot path): language ID via stopword-hit ratios, quality scoring
via length/punctuation/stopword features, token counting (whitespace +
a BPE-ish subword regex), and content fingerprinting (md5 full-text +
min-shingle). Extends the reference's keyword analytics (cache.py:215-240)
to the corpus-hygiene operations a 100 TB pipeline runs before training.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens, word_shingles

#: Tiny per-language stopword inventories (deterministic, dependency-free;
#: stands in for fasttext-style langid which isn't in this container).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "dans", "pour"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "en", "para"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "in", "zu", "für"),
}


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("bigint")


def subword_count(col: Column) -> Column:
    """BPE-ish subword count: alphanumeric runs + each punctuation mark
    counts as a token (a cheap, deterministic proxy for BPE vocab size
    used to budget training tokens). RE2-compatible pattern (no
    lookarounds) so the DuckDB oracle can mirror it exactly."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), F.lit(0))
    ).cast("bigint")


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio (0..1), double precision."""
    toks = tokens(col)
    total = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: (_marker_hits(toks, markers).cast("double")
               / total.cast("double"))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column, min_score: float = 0.05) -> Column:
    """Predicted language = argmax marker ratio, 'und' below threshold.

    Ties broken by language-code order (deterministic)."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(float(min_score))
    # Alphabetical iteration + strict '>' means ties go to the
    # alphabetically-first language — mirrors a plain SQL
    # CASE-on-GREATEST, keeping the oracle expressible.
    for lang in sorted(scores):
        cond = scores[lang] > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append deterministic quality-scoring features:

    - n_tokens, mean_token_len
    - stopword_ratio (English markers)
    - punct_ratio (punctuation chars / chars)
    - digit_ratio
    - quality_score: a fixed linear blend in [0,1] — the shape of
      heuristic quality filters (Gopher/C4 rules) with reproducible
      arithmetic (integer counts → one double blend, rounded).
    """
    c = F.col(text_col)
    # One tokenize per row: the stats below reference the materialized
    # array instead of re-splitting the text per feature.
    df = df.withColumn("_tk", tokens(c))
    toks = F.col("_tk")
    n_tokens = F.greatest(F.size(toks), F.lit(1)).cast("double")
    n_chars = F.greatest(F.length(c), F.lit(1)).cast("double")
    stop_ratio = _marker_hits(toks, LANG_MARKERS["en"]).cast("double") / n_tokens
    punct_ratio = (F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
                   ).cast("double") / n_chars
    digit_ratio = (F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
                   ).cast("double") / n_chars
    mean_tok_len = (F.aggregate(toks, F.lit(0),
                                lambda a, t: a + F.length(t)).cast("double")
                    / n_tokens)
    score = (
        F.lit(0.25) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.25) * F.least(n_tokens / 100.0, F.lit(1.0))
        + F.lit(0.25) * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
        + F.lit(0.25) * (F.lit(1.0) - F.least(digit_ratio * 4, F.lit(1.0)))
    )
    return df.select(
        "*",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(score, 6).alias("quality_score"),
    ).drop("_tk")


def fingerprint(df: DataFrame, id_col: str, text_col: str,
                shingle_n: int = 3) -> DataFrame:
    """Content fingerprints per document:

    - ``md5_fp``: md5 of whitespace-normalized lowercased text (exact
      dedup key robust to spacing).
    - ``min_shingle_fp``: lexicographic min of md5(shingle) — a
      1-permutation MinHash usable as a near-dup blocking key; md5 is
      identical across engines, so it is oracle-checkable (unlike
      engine-native hash functions).
    """
    c = F.col(text_col)
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    # Materialize the token array before shingling — an inline tokens()
    # expression would be re-evaluated per shingle inside the transform
    # lambda (see word_shingles docstring; 10x on the bench corpus).
    toked = df.select(
        F.col(id_col),
        F.md5(normalized).alias("md5_fp"),
        tokens(c).alias("_tk"),
    )
    shingles = word_shingles(F.col("_tk"), shingle_n)
    return toked.select(
        F.col(id_col),
        "md5_fp",
        F.array_min(F.transform(shingles, F.md5)).alias("min_shingle_fp"),
    )


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unigram model: (tok, c) counts over the whitespace
    tokenizer. One shuffle keyed by token with map-side partial
    aggregation — hot tokens ('the') collapse to one row per upstream
    partition before the exchange, so token skew never concentrates
    raw occurrences on a reducer."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def unigram_lm_xent(df: DataFrame, id_col: str, text_col: str = "text",
                    model: DataFrame | None = None,
                    cleanup: list | None = None) -> DataFrame:
    """Per-document cross-entropy under a Laplace-smoothed unigram LM
    — the CCNet/KenLM-style perplexity quality filter, reduced to the
    model order that needs no external artifact: documents of
    boilerplate-typical tokens score low (likely), lexically odd
    documents score high (surprising), and the score is comparable
    across shards because the model is global.

    p(t) = (c_t + 1) / (N + V + 1); unseen tokens (scoring against a
    ``model`` trained elsewhere) take the reserved c=0 mass
    1 / (N + V + 1). Output: (id, n_tok, n_oov, xent) with
    xent = round(mean -ln p, 6) (nats/token; perplexity = e^xent).

    Scale shape: training is ``unigram_counts`` (one partial-agg
    shuffle); (N, V) is a one-row aggregate broadcast-crossed onto the
    token stream (never a driver collect); scoring joins occurrences
    to the model on token — fan-out per hot token is occurrences x 1
    (the model is unique per token), then one partial-agg shuffle by
    doc id. Three shuffles total, none skew-prone. The per-doc ln-sum
    is float addition whose order Spark doesn't pin, but addends are
    O(10) nats and the rounding at 1e-6 absorbs reassociation noise of
    ~1e-13 — the t8_moving_avg argument.

    A self-trained model is persisted: it feeds BOTH the (N, V)
    scalar and the scoring join, and without the persist the static
    plan re-aggregates the whole corpus twice (AQE stage reuse would
    usually dedupe the identical exchanges at runtime, but one
    ``.persist()`` makes single-computation a guarantee instead of an
    optimizer outcome). A caller-supplied ``model`` is left untouched
    — its lifecycle belongs to the caller.
    """
    m = model if model is not None else unigram_counts(df, text_col).persist()
    if model is None and cleanup is not None:
        cleanup.append(m)
    stats = m.agg(F.sum("c").alias("_N"),
                  F.count(F.lit(1)).alias("_V"))
    occ = df.select(F.col(id_col).alias("_doc"),
                    F.explode(tokens(F.col(text_col))).alias("tok"))
    denom = (F.col("_N") + F.col("_V") + 1).cast("double")
    scored = (
        occ.join(m, "tok", "left")
        .join(F.broadcast(stats))
        .select(
            "_doc",
            F.col("c").isNull().cast("int").alias("_oov"),
            (-F.log((F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / denom)).alias("_nll"),
        )
    )
    return (
        scored.groupBy("_doc")
        .agg(F.count(F.lit(1)).alias("n_tok"),
             F.sum("_oov").cast("bigint").alias("n_oov"),
             F.round(F.sum("_nll") / F.count(F.lit(1)), 6).alias("xent"))
        .select(F.col("_doc").alias(id_col), "n_tok", "n_oov", "xent")
    )


def vocab_topk(df: DataFrame, k: int = 100,
               text_col: str = "text",
               cleanup: list | None = None) -> DataFrame:
    """Top-k vocabulary with cumulative corpus coverage — the
    tokenizer-training prep table ("how many tokens does a k-entry
    vocab cover?"). Output: (rank, tok, c, coverage) where coverage =
    cumulative c / total corpus tokens, rounded to 6.

    Ordered rank and running sum run AFTER a top-k cut
    (TakeOrderedAndProject on the aggregated counts), so the
    single-partition window touches k rows, not the vocabulary — the
    q11 pattern: a global window is fine when its input is provably
    tiny. Ties broken by token for cross-engine determinism. The
    counts feed both the top-k cut and the total; persisting them
    guarantees one corpus aggregation (same argument as
    unigram_lm_xent).
    """
    from pyspark.sql import Window

    counts = unigram_counts(df, text_col).persist()
    if cleanup is not None:
        cleanup.append(counts)
    total = counts.agg(F.sum("c").alias("_T"))
    top = (counts.orderBy(F.desc("c"), F.asc("tok")).limit(k))
    w = (Window.orderBy(F.desc("c"), F.asc("tok"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        top.join(F.broadcast(total))
        .select(
            F.row_number().over(
                Window.orderBy(F.desc("c"), F.asc("tok"))).alias("rank"),
            "tok", "c",
            F.round(F.sum("c").over(w).cast("double")
                    / F.col("_T").cast("double"), 6).alias("coverage"),
        )
    )


def nb_quality_classifier(df: DataFrame, id_col: str,
                          text_col: str = "text",
                          label_col: Column | None = None,
                          cleanup: list | None = None) -> DataFrame:
    """Learned quality filter, GPT-3/CC-net shape: train a multinomial
    Naive Bayes on weak labels and score every document by its
    log-odds of being "high quality". The real pipelines train
    fastText/LR against a gold corpus; NB over token counts is the
    deterministic, external-artifact-free form with the same serving
    plan (per-token weight table + join-score), so swapping in real
    weights later changes only the table.

    ``label_col`` defaults to the heuristic ``quality_score >= 0.5``
    (weak supervision from quality_features); pass a Column for real
    labels. Laplace-smoothed: p(t|y) = (c_ty + 1)/(N_y + V), prior
    odds = (D_1 + 1)/(D_0 + 1).

    Output: (id, n_tok, nb_score, pred) with
    nb_score = round(ln prior odds + Σ_t [ln p(t|1) − ln p(t|0)], 6).

    Scale shape: one token-keyed count shuffle (map-side partials),
    one-row class totals broadcast-crossed, scoring join fan-out
    occurrences x 1, one doc-keyed aggregate — the unigram_lm_xent
    plan with a two-class weight table; the label pass is map-only.
    """
    if label_col is None:
        feats = quality_features(df.select(id_col, text_col))
        labeled = feats.select(
            F.col(id_col).alias("_doc"), F.col(text_col),
            (F.col("quality_score") >= 0.5).cast("int").alias("_y"))
    else:
        labeled = df.select(F.col(id_col).alias("_doc"), F.col(text_col),
                            label_col.cast("int").alias("_y"))
    occ = labeled.select("_doc", "_y",
                         F.explode(tokens(F.col(text_col))).alias("tok"))
    counts = (occ.groupBy("tok")
              .agg(F.sum("_y").alias("c1"),
                   F.sum(1 - F.col("_y")).alias("c0"))
              .persist())
    if cleanup is not None:
        cleanup.append(counts)
    stats = counts.agg(F.sum("c1").alias("_n1"), F.sum("c0").alias("_n0"),
                       F.count(F.lit(1)).alias("_v"))
    priors = labeled.agg(F.sum("_y").alias("_d1"),
                         F.sum(1 - F.col("_y")).alias("_d0"))
    term = (F.log((F.col("c1") + 1).cast("double")
                  / (F.col("_n1") + F.col("_v")).cast("double"))
            - F.log((F.col("c0") + 1).cast("double")
                    / (F.col("_n0") + F.col("_v")).cast("double")))
    prior = F.log((F.col("_d1") + 1).cast("double")
                  / (F.col("_d0") + 1).cast("double"))
    return (
        occ.join(counts, "tok")
        .join(F.broadcast(stats))
        .join(F.broadcast(priors))
        .groupBy("_doc")
        .agg(F.count(F.lit(1)).alias("n_tok"),
             F.round(F.first(prior) + F.sum(term), 6).alias("nb_score"))
        .select(F.col("_doc").alias(id_col), "n_tok", "nb_score",
                (F.col("nb_score") > 0).alias("pred"))
    )


def _token_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, pos, tok, prev) occurrences, map-only: one posexplode of
    a per-row struct array; prev is NULL at document start."""
    toked = df.select(F.col(id_col).alias("_doc"),
                      tokens(F.col(text_col)).alias("_tk"))
    n = F.size("_tk")
    pairs = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            F.element_at("_tk", i + 1).alias("tok"),
            F.when(i > 0, F.element_at("_tk", i)).alias("prev")))) \
        .otherwise(F.array().cast("array<struct<tok:string,prev:string>>"))
    return (toked.select("_doc", F.posexplode(pairs).alias("_pos", "_p"))
            .select("_doc", "_pos", F.col("_p.tok").alias("tok"),
                    F.col("_p.prev").alias("prev")))


def bigram_lm_xent(df: DataFrame, id_col: str, text_col: str = "text",
                   train: DataFrame | None = None,
                   alpha: float = 0.4,
                   cleanup: list | None = None) -> DataFrame:
    """Order-2 LM quality score with STUPID BACKOFF (Brants et al.
    2007 — the un-normalized backoff used for web-scale LMs precisely
    because it needs no discounting state): score(t|prev) =
    c(prev,t)/c(prev) when the bigram was seen in ``train``, else
    alpha * unigram probability (Laplace (c+1)/(N+V+1), the
    unigram_lm_xent model); document-initial tokens score as unigrams.

    Output: (id, n_tok, n_backoff, xent) — n_backoff counts scored
    bigrams that fell back (0 when train is df itself).

    Scale shape: pair extraction is map-only (no lag window); counts
    are token-/bigram-keyed partial-agg shuffles; scoring is three
    left key-joins (fan-out occurrences x 1 — count tables are unique
    per key) + one broadcast one-row stats frame; final doc-keyed
    aggregate. ln-sum rounding argument as unigram_lm_xent.
    """
    tr = train if train is not None else df
    t_occ = _token_pairs(tr, id_col, text_col)
    uni = t_occ.groupBy("tok").agg(F.count(F.lit(1)).alias("c1")).persist()
    if cleanup is not None:
        cleanup.append(uni)
    stats = uni.agg(F.sum("c1").alias("_n"), F.count(F.lit(1)).alias("_v"))
    big = (t_occ.where(F.col("prev").isNotNull())
           .groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("c2")))
    ctx = (t_occ.where(F.col("prev").isNotNull())
           .groupBy("prev").agg(F.count(F.lit(1)).alias("cc")))
    s_occ = _token_pairs(df, id_col, text_col)
    denom = (F.col("_n") + F.col("_v") + 1).cast("double")
    uni_nll = -F.log(
        (F.coalesce(F.col("c1"), F.lit(0)) + 1).cast("double") / denom)
    back_nll = -F.log(
        F.lit(float(alpha))
        * ((F.coalesce(F.col("c1"), F.lit(0)) + 1).cast("double") / denom))
    nll = (F.when(F.col("prev").isNull(), uni_nll)
            .when(F.col("c2").isNotNull(),
                  -F.log(F.col("c2").cast("double")
                         / F.col("cc").cast("double")))
            .otherwise(back_nll))
    fell_back = (F.col("prev").isNotNull()
                 & F.col("c2").isNull()).cast("int")
    return (
        s_occ.join(big, ["prev", "tok"], "left")
        .join(ctx, "prev", "left")
        .join(uni, "tok", "left")
        .join(F.broadcast(stats))
        .groupBy("_doc")
        .agg(F.count(F.lit(1)).alias("n_tok"),
             F.sum(fell_back).cast("bigint").alias("n_backoff"),
             F.round(F.sum(nll) / F.count(F.lit(1)), 6).alias("xent"))
        .select(F.col("_doc").alias(id_col), "n_tok", "n_backoff", "xent")
    )


def hash_bow(df: DataFrame, id_col: str, text_col: str = "text",
             dim: int = 64, hash_fn: str = "xxhash64") -> DataFrame:
    """Feature-hashing bag-of-words (the hashing-trick vectorizer):
    each token is hashed into one of ``dim`` buckets and counted —
    a fixed-width sparse document vector with NO vocabulary artifact,
    which is what makes it trainable-free and embarrassingly
    distributable at 100 TB (map-only until one doc-keyed count).

    Returns the SPARSE form (id, bucket, cnt) — exact integers, the
    cross-engine-checkable representation; ``assemble_dense`` turns it
    into the array<double> column the embedding operators
    (dedup.embedding_near_dup_pairs, similarity.*) consume.

    ``hash_fn``: "xxhash64" (production) or "md5" (oracle-replayable,
    bucket = first 8 hex chars mod dim).
    """
    if hash_fn == "md5":
        bucket = (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10)
                  .cast("long") % dim)
    else:
        bucket = F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("long")
    return (
        df.select(F.col(id_col),
                  F.explode(tokens(F.col(text_col))).alias("tok"))
        .select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def assemble_dense(sparse: DataFrame, id_col: str, dim: int = 64,
                   vec_col: str = "embedding") -> DataFrame:
    """Densify (id, bucket, cnt) into array<double> of length dim —
    one doc-keyed aggregate (map_from_entries + sequence lookup), no
    driver involvement. Feeds the ANN/near-dup embedding operators."""
    return (
        sparse.groupBy(id_col)
        .agg(F.map_from_entries(
            F.collect_list(F.struct("bucket", "cnt"))).alias("_m"))
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda k: F.coalesce(F.element_at("_m", k.cast("long")),
                                     F.lit(0)).cast("double"))
            .alias(vec_col))
    )
