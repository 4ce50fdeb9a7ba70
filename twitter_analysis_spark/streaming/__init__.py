from .keyword_counts import streaming_keyword_counts  # noqa: F401
