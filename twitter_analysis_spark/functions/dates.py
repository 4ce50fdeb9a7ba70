"""Date/time scalar functions (C1-C3, SURVEY.md §2.8).

The reference parses Twitter's '%a %b %d %H:%M:%S %z %Y' with per-row
strptime wrapped in try/except that falls back to the literal
"Invalid date format" (app.py:31-37, format_tweet_date) and formats for
display as '%m/%d/%Y %I:%M %p' (app.py:34). All JVM-side here: one
``to_timestamp`` + ``date_format``, with the fallback expressed as
``coalesce`` — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Twitter's created_at, e.g. "Sun Apr 12 18:47:53 +0000 2020".
#: Spark's CORRECTED-mode parser refuses day-of-week ('EEE') on the
#: parse side, so we strip the fixed-width "Sun " prefix and parse the
#: remainder (the day name is redundant with the date anyway).
TWITTER_FMT = "MMM dd HH:mm:ss Z yyyy"
#: Reference display format "%m/%d/%Y %I:%M %p" (app.py:34).
DISPLAY_FMT = "MM/dd/yyyy hh:mm a"
#: UI date input "%m/%d/%Y" (app.py:39-45).
UI_FMT = "MM/dd/yyyy"


def parse_twitter_ts(col: Column) -> Column:
    """C1: Twitter date string → timestamp (null on malformed input,
    like the reference's except-branch). Validates the 30-char shape
    before stripping the day-of-week prefix so arbitrary garbage can't
    accidentally parse."""
    return F.when(
        col.rlike(r"^[A-Z][a-z]{2} [A-Z][a-z]{2} \d{2} "
                  r"\d{2}:\d{2}:\d{2} [+-]\d{4} \d{4}$"),
        F.try_to_timestamp(F.substring(col, 5, 26), F.lit(TWITTER_FMT)),
    )


def format_display(ts: Column) -> Column:
    """C2: timestamp → display string."""
    return F.date_format(ts, DISPLAY_FMT)


def format_tweet_date(col: Column) -> Column:
    """The reference's format_tweet_date (app.py:31-37): parse Twitter
    format, render display format, 'Invalid date format' on failure."""
    return F.coalesce(format_display(parse_twitter_ts(col)),
                      F.lit("Invalid date format"))


def parse_ui_date(col: Column) -> Column:
    """C3: 'MM/dd/yyyy' UI input → date (null on malformed)."""
    return F.try_to_timestamp(col, F.lit(UI_FMT)).cast("date")
