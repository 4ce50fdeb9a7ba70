from .keyword_counts import streaming_keyword_counts  # noqa: F401
from .sessionize import (  # noqa: F401
    streaming_sessions,
    streaming_sessions_custom,
)
