"""Text scalar functions: tokenizer + stopword filtering (C4-C6, UF1).

The reference tokenizes with NLTK word_tokenize + isalnum + an English
stopword set, per row in Python (cache.py:215-218). Engine equivalent:
lower → regex split → alnum filter → stopword anti-filter, all
Catalyst expressions (explode happens at the aggregation site, A2).
A static stopword list stands in for NLTK's download — deterministic
and broadcast as a literal array.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Compact English stopword snapshot (NLTK-style; FIXTURES.md).
STOPWORDS: tuple[str, ...] = (
    "a", "about", "above", "after", "again", "against", "all", "am", "an",
    "and", "any", "are", "as", "at", "be", "because", "been", "before",
    "being", "below", "between", "both", "but", "by", "can", "did", "do",
    "does", "doing", "down", "during", "each", "few", "for", "from",
    "further", "had", "has", "have", "having", "he", "her", "here", "hers",
    "him", "his", "how", "i", "if", "in", "into", "is", "it", "its",
    "just", "me", "more", "most", "my", "no", "nor", "not", "now", "of",
    "off", "on", "once", "only", "or", "other", "our", "out", "over",
    "own", "rt", "s", "same", "she", "should", "so", "some", "such", "t",
    "than", "that", "the", "their", "them", "then", "there", "these",
    "they", "this", "those", "through", "to", "too", "under", "until",
    "up", "very", "was", "we", "were", "what", "when", "where", "which",
    "while", "who", "whom", "why", "will", "with", "you", "your",
)


def tokenize(col: Column) -> Column:
    """C4+C5: lowercase, split on non-alphanumeric runs, drop empties.
    (isalnum filter C6 is implied: the split pattern only yields
    alphanumeric tokens.)"""
    return F.filter(F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: t != "")


def extract_keywords_col(col: Column,
                         stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """UF1 (cache.py:215-218) as a pure column expression: tokens minus
    stopwords. Used by the A2 keyword aggregation and cache warm-up."""
    return F.filter(tokenize(col), lambda t: ~t.isin(*stopwords))
