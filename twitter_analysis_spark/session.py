"""SparkSession factory.

One place to set the scale-sensitive knobs so every entry point (tests,
bench, driver harness) runs the same configuration. Defaults target the
local[32] test box but are chosen to also be sane on a 1000-executor
cluster: AQE on (runtime shuffle-partition coalescing + skew-join
splitting), broadcast threshold generous enough for true dimension
tables, UTC session timezone so timestamp semantics match the DuckDB
oracle and any other engine reading the same Parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Resolved lazily so tests and the driver can override via env.
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(app_name: str = "twitter_analysis_spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    The config philosophy (SURVEY.md §4): express plans declaratively and
    let Catalyst/AQE pick physical strategies. The only hand-set knobs are
    the ones Catalyst cannot infer: shuffle parallelism floor, broadcast
    threshold, Arrow for the (rare) pandas-UDF paths.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        # AQE: runtime coalescing of shuffle partitions, skew-join
        # splitting, and dynamic join-strategy switching. Essential at
        # 100 TB where static partition counts are always wrong.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Floor for shuffle parallelism on the test box; AQE coalesces
        # down from here. On a real cluster this would be set to
        # ~2-3x total cores by the submitter.
        .config("spark.sql.shuffle.partitions", "32")
        # Dimension tables (users ~19k rows in the reference; nation/
        # region/supplier here) must broadcast — never shuffle a 100 TB
        # fact table to join a KB-scale dim.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow-batched transfer for pandas UDF paths (similarity,
        # multimodal decode): 10-100x over row-at-a-time pickling.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics across engines (DuckDB
        # oracle, Parquet readers elsewhere).
        .config("spark.sql.session.timeZone", "UTC")
        # Twitter's "EEE MMM dd HH:mm:ss Z yyyy" needs the modern
        # (CORRECTED) parser; fail loudly rather than silently legacy.
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects outright; read the raw int64 nanos and convert
        # in the events loader (sources/io.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_ATTACH_EXISTING"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    # Deployment-specific overrides (cluster shuffle parallelism,
    # compression codec, memory sizing) without code edits: a JSON
    # object of conf key -> value. Overrides the defaults ABOVE but
    # not the caller's explicit ``extra_conf`` (r15 ADVICE: an
    # ambient/stale env var must never silently defeat programmatic
    # config — the bench harness and test fixtures set contract knobs
    # through ``extra_conf``, and those win).
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        import json
        try:
            parsed = json.loads(env_conf)
        except ValueError as e:
            raise ValueError(
                f"SPARK_GRAFT_EXTRA_CONF is not valid JSON: {e}") from e
        shadowed = sorted(k for k in parsed if k in (extra_conf or {}))
        if shadowed:
            import warnings
            warnings.warn(
                "SPARK_GRAFT_EXTRA_CONF keys overridden by the caller's "
                f"explicit extra_conf (caller wins): {shadowed}",
                stacklevel=2)
        for k, v in parsed.items():
            builder = builder.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
