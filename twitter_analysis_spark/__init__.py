"""twitter_analysis_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo
``shintan777/694_2024_Team19_TwitterAnalysis`` (a Streamlit search UI
over MongoDB tweets + MySQL users, see ``/root/reference``), built
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, Parquet
columnar storage, broadcast joins instead of N+1 lookups, distributed
top-k instead of cursor truncation.

Layout
------
- ``session``    SparkSession factory tuned for large-scale scans.
- ``sources``    Readers/writers: Parquet tables, raw tweet JSON-lines.
- ``operators``  Relational operators: search filters, joins, top-k,
                 windows, dedup, similarity search, text analytics,
                 multimodal column plumbing.
- ``functions``  Scalar helpers (Twitter date parsing, tokenization).
- ``plans``      Engine-level layers above Catalyst (query-result memo).
- ``streaming``  Structured Streaming equivalents (windowed keyword counts).
- ``etl``        The raw-capture → curated tables pipeline
                 (reference: DataProcessing.ipynb).
"""

__version__ = "0.1.0"
