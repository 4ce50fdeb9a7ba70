from .dates import (  # noqa: F401
    format_display, format_tweet_date, parse_twitter_ts, parse_ui_date,
)
from .text import extract_keywords_col, tokenize  # noqa: F401
