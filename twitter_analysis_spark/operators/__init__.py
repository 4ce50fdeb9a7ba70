"""Relational + large-scale pipeline operators.

- ``search``     parameterized tweet-search builders (reference parity)
- ``dedup``      exact / n-gram-Jaccard / MinHash-LSH / SimHash /
                 embedding near-duplicate detection
- ``similarity`` cosine top-k (brute force + LSH-bucketed ANN)
- ``textstats``  language-ID, quality scoring, token counts, fingerprints
- ``multimodal`` binary media columns: schema + Arrow-batched decode plumbing
- ``windows``    per-group top-k and pagination
"""
