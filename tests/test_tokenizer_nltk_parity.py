"""C5/UF1 tokenizer fidelity contract vs the reference's NLTK pipeline.

The reference extracts keywords as ``word_tokenize(text.lower())``
followed by ``isalnum() and not stopword`` (cache.py:215-218). Our
engine spells the same step as lower → non-alnum regex split →
stopword anti-filter, entirely in Catalyst (functions/text.py).

This module closes the SURVEY §7 question ("NLTK-fidelity via
pandas_udf only if fixture comparison fails") with a recorded
ground-truth comparison. NLTK itself is not installable in this
sandbox, so the expected values below are RECORDED outputs of the
reference pipeline — ``[w for w in word_tokenize(text.lower())
if w.isalnum() and w not in stopwords.words('english')]`` under NLTK's
Treebank word tokenizer and English stopword list — not recomputed at
test time. Three classes of input diverge by construction and are
pinned below as accepted divergences (also documented in COVERAGE.md
§2.10):

1. contractions — Treebank splits "don't" → ["do", "n't"]: "do" is an
   NLTK stopword and "n't" fails isalnum, so the reference drops the
   word entirely; the regex split yields ["don", "t"] and keeps "don"
   (our stopword snapshot drops bare "t"/"s" but does not carry NLTK's
   contraction stems "don"/"ain"/"wasn"/…).
2. intra-word punctuation — Treebank keeps "co-operate" / "u.s.a" as
   one token, which then fails isalnum and vanishes; the regex split
   keeps the alphanumeric fragments.
3. the "rt" domain stopword — our snapshot deliberately includes the
   retweet marker (the corpus' most frequent non-word; the reference
   handles RT-ness structurally via its RT-prefix predicate instead,
   app.py F7), so reference keyword lists contain "rt" where ours
   don't.

On the corpus shapes that dominate the Twitter fixture — plain words,
punctuation runs, hashtags, numerals — the two pipelines agree
token-for-token, which is why the keyword-level golden fixtures (a2
counts) pass and the approximation was accepted instead of paying a
per-row pandas_udf in the hot aggregation path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_analysis_spark.functions.text import extract_keywords_col

#: (text, reference_keywords, engine_keywords) — reference_keywords is
#: the RECORDED NLTK-pipeline output (see module docstring);
#: engine_keywords is None where the two pipelines agree.
CASES = [
    # -- convergent classes: the fixture corpus' dominant shapes --
    ("The quick brown fox jumps over the lazy dog",
     ["quick", "brown", "fox", "jumps", "lazy", "dog"], None),
    ("Hello, world! This is a test.",
     ["hello", "world", "test"], None),
    ("Cases rose 25% in 2021, officials said",
     ["cases", "rose", "25", "2021", "officials", "said"], None),
    ("lockdown... again?!", ["lockdown"], None),
    ("vaccine rollout update #covid19 #Vaccine",
     ["vaccine", "rollout", "update", "covid19", "vaccine"], None),
    ("numbers 100 200 300", ["numbers", "100", "200", "300"], None),
    ("", [], None),
    # -- divergence 3: the deliberate "rt" domain stopword ("rt" is
    # NOT in NLTK's English list, so the reference keeps it; "@" and
    # ":" split off and fail isalnum in both pipelines) --
    ("RT @JohnDoe: masks work",
     ["rt", "johndoe", "masks", "work"], ["johndoe", "masks", "work"]),
    # -- divergence 1: contractions --
    ("don't panic", ["panic"], ["don", "panic"]),
    ("it's working", ["working"], None),  # "it"/"'s" drop both ways
    # -- divergence 2: intra-word punctuation --
    ("co-operate with u.s.a officials",
     ["officials"], ["co", "operate", "u", "officials"]),
]


def test_keyword_extraction_matches_recorded_nltk_pipeline(spark):
    rows = [(i, text) for i, (text, _, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i LONG, text STRING")
    got = {r["i"]: list(r["kw"]) for r in df.select(
        "i", extract_keywords_col(F.col("text")).alias("kw")).collect()}
    for i, (text, ref_kw, engine_kw) in enumerate(CASES):
        want = ref_kw if engine_kw is None else engine_kw
        assert got[i] == want, (text, got[i], want)


def test_divergences_are_bounded_to_declared_classes(spark):
    """Every divergent case involves an apostrophe, intra-word
    punctuation, or the RT marker; on inputs free of all three, engine
    output == recorded reference output. This keeps the divergence
    list honest: a new divergence class would have to be declared."""
    for text, ref_kw, engine_kw in CASES:
        if engine_kw is not None and engine_kw != ref_kw:
            assert ("'" in text or "-" in text or "." in text
                    or "rt" in text.lower().split()), text
