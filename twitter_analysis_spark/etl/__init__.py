from .pipeline import build_tweets, build_users, run_etl  # noqa: F401
