"""Curated-table IO (reference operators S2-S5, SURVEY.md §2.1).

The reference scatters its data across MongoDB collections and a MySQL
table and reads them row-at-a-time over sockets (cache.py:153,
cache.py:164-178). Here every curated dataset is a Parquet table read
through the DataFrame API, which gives us vectorized columnar scans,
predicate/projection pushdown into the file format, and partition
pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver materializes at each scale factor (TESTDATA.md).
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one curated Parquet table (S2/S3 equivalent).

    Plain ``spark.read.parquet`` — filters and column selections applied
    by callers reach the scan via Catalyst pushdown, so no scan-level
    options are needed here.

    ``events`` is special-cased: its ``ts`` column is parquet
    TIMESTAMP(NANOS), which Spark cannot represent. With
    ``spark.sql.legacy.parquet.nanosAsLong`` the scan yields raw int64
    nanos; we convert to microsecond TIMESTAMP_NTZ here (integer `div`,
    no double rounding) so every downstream operator sees a real
    timestamp. Sub-microsecond digits are truncated — queries that
    surface event timestamps should additionally date_trunc to seconds
    when compared against nanosecond-capable engines.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    """Load several tables and register each as a temp view so both the
    DataFrame API and ``spark.sql`` can reach them by name."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """Sink a curated table (S4/S5 equivalent of the reference's
    insert_one / INSERT loops, DataProcessing.ipynb:cell20,cell33 —
    replaced by one distributed columnar write)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 16,
                   sort_cols: list[str] | None = None) -> None:
    """Bucketed managed-table sink: pre-shuffles rows into ``n_buckets``
    hash buckets on ``bucket_cols`` at write time.

    The 100 TB play: two fact tables bucketed the same way join WITHOUT
    a runtime shuffle (both sides' partitioning already satisfies the
    join's distribution requirement) — pay the shuffle once at ingest,
    amortize it over every subsequent join/aggregation on that key.
    Requires ``saveAsTable`` (bucket metadata lives in the catalog, not
    the files).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_jsonl(spark: SparkSession, path: str, schema,
               mode: str = "PERMISSIVE",
               corrupt_col: str | None = "_corrupt_record") -> DataFrame:
    """JSON-lines scan with an EXPLICIT schema (S1 generalized beyond
    the tweet layout of sources/tweets_raw.py).

    The schema argument is mandatory by design: without it Spark runs
    a whole-extra inference pass over the data — at 100 TB that is a
    second full scan before the first real job starts. PERMISSIVE +
    a corrupt-record column keeps one malformed line from failing a
    2000-task stage; callers split the frame on ``corrupt_col IS
    NULL`` and quarantine the rest (the tweets_raw.py pattern).
    """
    from pyspark.sql.types import StructField, StructType, StringType

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string
        schema = _parse_datatype_string(schema)
    if corrupt_col and corrupt_col not in schema.fieldNames():
        schema = StructType(list(schema.fields)
                            + [StructField(corrupt_col, StringType(), True)])
    reader = spark.read.schema(schema).option("mode", mode)
    if corrupt_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = None,
                partition_by: list[str] | None = None) -> None:
    """JSON-lines sink — the interchange format for nested/array
    columns (embeddings, entities) that CSV cannot carry.

    ``compression`` defaults to None: gzip output is NOT splittable,
    so one 10 GB .json.gz file becomes one map task on re-read — at
    scale prefer uncompressed-but-partitioned output, or a splittable
    columnar format (write_parquet) when the consumer speaks it.
    """
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def read_csv(spark: SparkSession, path: str, schema,
             header: bool = True, mode: str = "PERMISSIVE",
             corrupt_col: str | None = "_corrupt_record",
             **options) -> DataFrame:
    """CSV scan with an explicit schema (same no-inference-pass and
    quarantine arguments as ``read_jsonl``; flat columns only)."""
    from pyspark.sql.types import StructField, StructType, StringType

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string
        schema = _parse_datatype_string(schema)
    if corrupt_col and corrupt_col not in schema.fieldNames():
        schema = StructType(list(schema.fields)
                            + [StructField(corrupt_col, StringType(), True)])
    reader = (spark.read.schema(schema)
              .option("header", str(header).lower())
              .option("mode", mode))
    if corrupt_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True,
              mode: str = "overwrite", compression: str | None = None,
              partition_by: list[str] | None = None) -> None:
    """CSV sink for flat exports (compression caveat as write_jsonl)."""
    writer = df.write.mode(mode).option("header", str(header).lower())
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.csv(path)
