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
