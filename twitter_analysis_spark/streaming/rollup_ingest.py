"""Streaming rollup maintenance: drop-dir events → raw lake → fresh
pre-aggregates, continuously.

Completes the rollup story (operators/rollup.py): the batch API builds
and refreshes hourly/daily pre-aggregates on demand; this keeps them
CURRENT as events stream in, with the same crash contract the other
ingest pipelines use (streaming/ingest.py).

Per micro-batch (inside ``foreachBatch``):

1. dedupe the batch against a persistent ``(event_id, event_date)``
   index PARTITIONED BY event_date (event payloads are not
   content-addressed, so the key is the id) and append only
   genuinely-new rows to the raw lake, partitioned by ``event_date``;
2. append their (id, date) rows to the index's touched partitions;
3. recompute the rollup for exactly the batch's touched dates with
   ``refresh_rollup`` (dynamic partition overwrite — other dates'
   files untouched);
4. stamp the batch marker last.

Why RECOMPUTE-from-pruned-raw instead of merging the batch's partial
aggregate into the stored rollup: a merge is cheaper per trigger but
is only exactly-once on a transactional sink (Delta/Iceberg MERGE) —
on plain parquet a replayed batch would double-merge. Recompute is
idempotent by construction: every crash window replays into the same
final state, because the refresh derives from the (deduped) lake, not
from the batch. The lake read is partition-pruned to the touched
dates, AND the index anti-join reads only the touched dates' index
partitions (a redelivered record carries its original ``ts``, hence
its original date — the same identity assumption every dedup contract
here makes), so per-trigger cost is batch size + those dates'
partitions — NOT corpus size. (A flat ``event_id``-only index built
by versions before the date partitioning needs a one-time reindex —
rebuild it from the lake's ids with a partitioned write;
``_absorb_into_lake`` detects the legacy layout and raises an error
naming that fix rather than failing the date prune opaquely.) The one remaining torn window (lake appended, index
append crashed) can leave duplicate raw rows for the crashed batch
only; the refresh guards against even that by deduplicating the
pruned scan on ``event_id`` before aggregating, so the SERVED rollup
never double-counts while the next ``maintenance.upsert_by_key``
compaction cures the lake itself (the repo-wide recovery contract for
non-transactional sinks).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsmeta
from ..operators.rollup import prune_to_dates, refresh_rollup
from .ingest import _batch_token_lenient, _marker

_EVENT_SCHEMA = ("event_id LONG, ts TIMESTAMP, user_id LONG, "
                 "event_type STRING, value DOUBLE")


def _absorb_into_lake(spark: SparkSession, batch: DataFrame,
                      lake_path: str, index_path: str,
                      dates: list) -> None:
    """Steps 1-2 of the per-batch contract, shared by both pipelines:
    anti-join the (already in-batch-deduped) batch against the
    date-PRUNED id index, append the novel rows to the lake, extend
    the index's touched partitions. Index contact is bounded by the
    batch's touched dates — never the corpus — because the index is
    partitioned by event_date and a redelivered record carries its
    original ts."""
    if fsmeta.exists(index_path):
        index = spark.read.parquet(index_path)
        if "event_date" not in index.columns:
            # a flat event_id-only index built by versions before the
            # date partitioning: without the partition column the
            # date prune below would die with an opaque
            # unresolved-column error on the first drain — name the
            # fix instead.
            raise ValueError(
                f"rollup ingest index at {index_path!r} predates the "
                "event_date partitioning (columns: "
                f"{index.columns}); a one-time reindex is required — "
                "rebuild it from the lake's ids with "
                "a write partitioned by event_date, e.g. "
                "spark.read.parquet(lake).select('event_id', "
                "'event_date').write.partitionBy('event_date')"
                ".parquet(new_index_path)")
        index = (index.where(F.col("event_date").isin(dates))
                 .select("event_id"))
    else:
        index = spark.createDataFrame([], "event_id LONG")
    # Two-step probe (same join-direction argument as
    # operators/dedup.py:incremental_exact_dedup): a direct
    # `batch ANTI index` builds on the index side, so a HOT date's
    # index partition past the broadcast threshold shuffles whole.
    # Semi-joining the index against the batch's ids first keeps the
    # index scanned-never-shuffled (batch ids are the build side),
    # and the anti then runs against the batch-sized hit set.
    hits = index.join(batch.select("event_id").distinct(),
                      "event_id", "left_semi")
    new = (batch.join(hits, "event_id", "left_anti")
           .withColumn("event_date", F.to_date("ts")).persist())
    # REBALANCE by the partition column before each partitioned
    # append: without it every one of the writer's input partitions
    # holds rows of every touched date, so one micro-batch creates
    # tasks x dates files (measured at sf0.1: 32 x 30 = 960 per sink
    # per drain — ~1.9k file commits dominated the drain). The AQE
    # rebalance clusters rows by date into ~one file per date AND
    # splits an oversized date back up (a backfill batch hammering
    # one hot date still parallelizes), which a plain
    # repartition("event_date") would not.
    (new.hint("rebalance", "event_date")
     .write.partitionBy("event_date")
     .mode("append").parquet(lake_path))
    (new.select("event_id", "event_date")
     .hint("rebalance", "event_date")
     .write.partitionBy("event_date").mode("append").parquet(index_path))
    new.unpersist()


def streaming_rollup_ingest(spark: SparkSession, drop_dir: str,
                            lake_path: str, index_path: str,
                            rollup_path: str,
                            grain: str = "hour",
                            schema: str = _EVENT_SCHEMA,
                            checkpoint: str | None = None):
    """Drain ``drop_dir`` (availableNow) into the date-partitioned raw
    lake and keep the ``grain`` rollup at ``rollup_path`` exactly
    consistent with it. Returns the finished streaming query.

    Marker scoping follows :func:`streaming.ingest.streaming_ingest_dedup`:
    reuse one checkpoint for the pipeline's lifetime.
    """

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(drop_dir)
        .where(F.col("event_id").isNotNull() & F.col("ts").isNotNull())
    )

    lineage_cache: dict = {}

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        # checkpoint-scoped markers (ingest.py:_marker), named by the
        # LINEAGE-SCOPED token like every other pipeline — markers
        # happen to die with the checkpoint today, but a bare numeric
        # id would quietly re-open the swallowed-batch-0 bug if marker
        # storage were ever relocated. The LENIENT token form: these
        # sinks write no token-scoped partitions, so an unresolvable
        # checkpoint path degrades to markers-disabled (the id index
        # absorbs redelivered events; refresh/anti-join are
        # idempotent) instead of failing the drain.
        token = _batch_token_lenient(checkpoint, batch_id, lineage_cache)
        marker = _marker(checkpoint, "__rollup_batches", token)
        if marker and fsmeta.exists(marker):  # re-delivered after crash
            return
        batch = batch_df.dropDuplicates(["event_id"]).persist()
        # Touched grain partitions: a bounded collect (distinct DATES
        # in one micro-batch — days, not rows).
        dates = [r["d"] for r in
                 batch.select(F.to_date("ts").alias("d")).distinct()
                 .collect()]
        if dates:
            _absorb_into_lake(spark, batch, lake_path, index_path, dates)
            # Refresh from the lake, NOT from the batch: idempotent
            # under replay. Prune to the touched dates BELOW the
            # event_id dedup — an aggregate on a non-partition key
            # blocks filter pushdown, so the manual order (prune, then
            # dedup) is what keeps the scan partition-scoped.
            lake = spark.read.parquet(lake_path)
            pruned = prune_to_dates(lake, grain, dates, "event_date") \
                .dropDuplicates(["event_id"])
            refresh_rollup(spark, pruned, rollup_path, grain=grain,
                           dates=dates)
        batch.unpersist()
        if marker:
            fsmeta.touch(marker)              # recompute-skip fast path

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q


def streaming_anomaly_alerts(spark: SparkSession, drop_dir: str,
                             lake_path: str, index_path: str,
                             rollup_path: str, alerts_path: str,
                             schema: str = _EVENT_SCHEMA,
                             checkpoint: str | None = None):
    """Continuous anomaly detection on top of the streamed rollup.

    Extends :func:`streaming_rollup_ingest`: after each micro-batch's
    rollup refresh, re-evaluate the trailing z-score detector
    (catalog.ts_anomaly_zscore's spec) and append alerts for newly
    anomalous (event_type, day) cells. Detection reads the ROLLUP
    (one row per (hour, type)), never the raw lake, so per-trigger
    detector cost is rollup-sized regardless of corpus size; alerts
    dedupe against the persistent alerts table by (event_type, day) —
    a left-anti join against a frame that only grows by confirmed
    anomalies — so replayed batches and re-evaluated windows cannot
    re-alert. The batch marker commits last (the repo's standard torn-
    batch contract; a torn alert append re-runs into the same rows and
    is removed by the anti-join).
    """
    from pyspark.sql import Window


    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(drop_dir)
        .where(F.col("event_id").isNotNull() & F.col("ts").isNotNull())
    )

    def detect() -> DataFrame:
        rolled = spark.read.parquet(rollup_path)
        daily = (rolled
                 .groupBy("event_type",
                          F.to_date("bucket_ts").alias("d"))
                 .agg(F.sum("n_events").alias("n")))
        w = (Window.partitionBy("event_type").orderBy("d")
             .rowsBetween(-7, -1))
        win = daily.select(
            "event_type", "d", "n",
            F.count(F.lit(1)).over(w).alias("w_n"),
            F.sum("n").over(w).alias("w_sum"),
            F.sum(F.col("n") * F.col("n")).over(w).alias("w_sq"))
        var_num = (F.col("w_n") * F.col("w_sq")
                   - F.col("w_sum") * F.col("w_sum"))
        dev = (F.col("n").cast("double") * F.col("w_n").cast("double")
               - F.col("w_sum").cast("double"))
        return (win.where((F.col("w_n") == 7) & (var_num > 0)
                          & (F.abs(dev)
                             > 2 * F.sqrt(var_num.cast("double"))))
                .select("event_type", "d",
                        F.col("n").cast("bigint").alias("n"),
                        (dev / F.sqrt(var_num.cast("double")))
                        .alias("zscore")))

    lineage_cache: dict = {}

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        # lineage-scoped LENIENT marker token, same rationale as
        # streaming_rollup_ingest's
        token = _batch_token_lenient(checkpoint, batch_id, lineage_cache)
        marker = _marker(checkpoint, "__alert_batches", token)
        if marker and fsmeta.exists(marker):
            return
        batch = batch_df.dropDuplicates(["event_id"]).persist()
        dates = [r["d"] for r in
                 batch.select(F.to_date("ts").alias("d")).distinct()
                 .collect()]
        if dates:
            _absorb_into_lake(spark, batch, lake_path, index_path, dates)
            lake = spark.read.parquet(lake_path)
            pruned = prune_to_dates(lake, "hour", dates, "event_date") \
                .dropDuplicates(["event_id"])
            refresh_rollup(spark, pruned, rollup_path, grain="hour",
                           dates=dates)
            anomalies = detect()
            if fsmeta.exists(alerts_path):
                known = spark.read.parquet(alerts_path) \
                    .select("event_type", "d")
                fresh = anomalies.join(known, ["event_type", "d"],
                                       "left_anti")
            else:
                fresh = anomalies
            fresh = fresh.withColumn(
                "detected_batch", F.lit(int(batch_id)).cast("long"))
            fresh.write.mode("append").parquet(alerts_path)
        batch.unpersist()
        if marker:
            fsmeta.touch(marker)

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q
