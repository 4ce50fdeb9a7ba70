from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from twitter_analysis_spark.session import get_spark
    # Modest parallelism for tests; correctness is partition-count
    # independent by construction.
    spark = get_spark(app_name="tests", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8",
                                  "spark.ui.enabled": "false"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def twitter_fixture(spark, tmp_path_factory):
    """Materialized Twitter-shaped fixtures (FIXTURES.md): curated
    tweets/users parquet, raw jsonl capture + golden manifest, plus the
    in-memory dicts for pure-Python oracle computations."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "fixtures"))
    import json

    from gen_tweets import make_raw_stream, make_tweets, make_users

    root = tmp_path_factory.mktemp("twitter")
    users = make_users(500)
    tweets = make_tweets(2000)
    lines, golden = make_raw_stream(1000)

    raw_path = str(root / "raw_stream.jsonl")
    with open(raw_path, "w") as f:
        f.write("\n".join(lines) + "\n")

    users_df = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(u) for u in users], 4))
    tweets_df = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(t) for t in tweets], 8))
    users_path = str(root / "users.parquet")
    tweets_path = str(root / "tweets.parquet")
    users_df.write.mode("overwrite").parquet(users_path)
    tweets_df.write.mode("overwrite").parquet(tweets_path)

    return {
        "root": str(root),
        "raw_path": raw_path,
        "golden": golden,
        "users": users, "tweets": tweets,
        "users_df": spark.read.parquet(users_path),
        "tweets_df": spark.read.parquet(tweets_path),
    }
