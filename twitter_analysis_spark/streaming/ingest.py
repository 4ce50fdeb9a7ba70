"""Streaming deduplicating ingestion: drop-dir → curated corpus.

The continuous form of the daily-ingest pattern
(operators/dedup.py:incremental_exact_dedup): JSONL documents landing
in a drop directory are appended to a curated parquet corpus, each
micro-batch deduped against a PERSISTENT content index — the corpus
itself is never rescanned, so per-trigger cost is proportional to the
batch at any corpus size.

Per micro-batch (inside ``foreachBatch``):

1. classify every batch row new / dup_in_batch / dup_of_corpus
   against the on-disk index;
2. append the 'new' rows to the corpus;
3. append their content keys to the index — a PURE append, because
   'new' is by definition "key absent from the index", so merged keys
   can never collide with existing ones (the invariant
   tests/test_dedup_similarity.py::
   test_incremental_dedup_index_merge_roundtrip pins);
4. stamp a batch-id marker file LAST. Parquet appends are not
   transactional, so a crash between 2 and 4 can leave a torn batch;
   on restart the marker check skips finished batches (dedup of
   re-delivered input), and because the index append happens after the
   corpus append, a torn batch re-runs with the OLD index and simply
   re-classifies — re-appended 'new' rows are possible only for the
   crashed batch and are cleaned by the next
   ``maintenance.upsert_by_key`` compaction, which is the documented
   recovery for every non-transactional sink in this repo.

At 100 TB the index is the only corpus-sized artifact touched per
trigger, and only through a key-partitioned join; store it bucketed by
``content_key`` (sources/io.py:write_bucketed) so the probe join
co-locates without a shuffle of the batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import content_index, incremental_exact_dedup

#: content_key dtype per hash family (xxhash64 → 8-byte long,
#: md5/text → string).
_KEY_TYPE = {"xxhash64": "LONG", "md5": "STRING", "text": "STRING"}


def _empty_index(spark: SparkSession, hash_fn: str) -> DataFrame:
    return spark.createDataFrame(
        [], f"content_key {_KEY_TYPE[hash_fn]}, holder_id LONG")


def streaming_ingest_dedup(spark: SparkSession, drop_dir: str,
                           corpus_path: str, index_path: str,
                           schema: str = "doc_id LONG, text STRING",
                           hash_fn: str = "xxhash64",
                           checkpoint: str | None = None):
    """Drain ``drop_dir`` (availableNow) into the corpus at
    ``corpus_path``, maintaining the content index at ``index_path``.
    Returns the finished streaming query.

    Batch-id markers are scoped to the CHECKPOINT: batch ids only mean
    "same batch" within one checkpoint lineage (a fresh checkpoint
    restarts at 0 while the file source re-reads nothing or
    everything depending on its own tracking), so reuse one checkpoint
    for the lifetime of an ingest pipeline — which is also what makes
    the file source skip already-ingested drop files across drains.
    """
    marker_dir = (os.path.join(checkpoint, "__ingest_batches")
                  if checkpoint else f"{index_path}__batches")
    os.makedirs(marker_dir, exist_ok=True)

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(drop_dir)
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch_{batch_id}")
        if os.path.exists(marker):            # re-delivered after crash
            return
        index = (spark.read.parquet(index_path)
                 if os.path.exists(index_path)
                 else _empty_index(spark, hash_fn))
        res = incremental_exact_dedup(batch_df, index, "doc_id", "text",
                                      hash_fn=hash_fn)
        new_ids = res.where(F.col("status") == "new").select("doc_id")
        new_docs = batch_df.join(new_ids, "doc_id", "left_semi").persist()
        new_docs.write.mode("append").parquet(corpus_path)
        (content_index(new_docs, "doc_id", "text", hash_fn=hash_fn)
         .write.mode("append").parquet(index_path))
        new_docs.unpersist()
        open(marker, "w").close()             # commit point, written last

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q


def _empty_band_index(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "band INT, bh LONG, doc LONG")


def streaming_ingest_neardup(spark: SparkSession, drop_dir: str,
                             corpus_path: str, band_index_path: str,
                             schema: str = "doc_id LONG, text STRING",
                             n: int = 3, num_hashes: int = 32,
                             bands: int = 8, threshold: float = 0.5,
                             checkpoint: str | None = None):
    """NEAR-duplicate streaming ingestion: the MinHash+LSH analogue of
    :func:`streaming_ingest_dedup`. The persistent artifact is a BAND
    INDEX (band, bh, doc) — ``bands`` rows per corpus document — so a
    micro-batch probes the corpus with one key-equi join on
    (band, bh), never a corpus rescan.

    Per batch: signature + band keys for the batch docs; candidates =
    band collisions against the index PLUS intra-batch collisions;
    candidates are verified with EXACT n-gram Jaccard, the corpus side
    of the verification reading only the candidate partner docs
    (a key semi-join into the corpus — bucketed by doc_id at deploy
    scale, a pruned read). Batch docs drop when a verified pair ties
    them to the corpus or to a lower-id batch doc (first copy
    survives); duplicate CHAINS resolve across triggers the same
    one-pass way each trigger. Survivors append to the corpus and
    their band rows to the index; the batch marker commits last, with
    exactly the torn-batch recovery contract documented on
    :func:`streaming_ingest_dedup`.

    doc_ids are assumed globally unique across drops (they key both
    the corpus and the index). Signatures use the xxhash64 family and
    band keys; the hot-bucket cap is inherited from the banded
    self-join defaults — a mega-bucket in the INDEX costs the probe
    join, so the cap applies to the index side too at deploy scale.

    CLEAN checkpoint-loss replay is absorbed by an identity guard,
    not the markers (markers die with the checkpoint): a redelivered
    doc collides with its own index rows in every band, so the
    ``bdoc == pdoc`` candidates from the probe join name exactly the
    replayed ids and they drop without verification — at zero extra
    index contact. The guard needs the doc's INDEX rows to fire, so
    it covers only batches whose appends completed: a torn batch
    (crash after the corpus append, before the index append) can
    still double-append its corpus rows on re-run, and relies on the
    documented ``upsert_by_key`` compaction healer — the same
    torn-batch recovery contract as :func:`streaming_ingest_dedup`.
    """
    from ..operators.dedup import (_jaccard_pairs_from, _signatures_from,
                                   doc_shingle_pairs)

    marker_dir = (os.path.join(checkpoint, "__ingest_batches")
                  if checkpoint else f"{band_index_path}__batches")
    os.makedirs(marker_dir, exist_ok=True)
    r = num_hashes // bands
    assert num_hashes % bands == 0

    def banded_of(df: DataFrame) -> DataFrame:
        ds = doc_shingle_pairs(df, "doc_id", "text", n)
        sigs = _signatures_from(ds, num_hashes)
        return sigs.select(
            "doc",
            F.explode(F.array([
                F.struct(F.lit(b).alias("band"),
                         F.xxhash64(*[F.col("sig")[b * r + i]
                                      for i in range(r)]).alias("bh"))
                for b in range(bands)
            ])).alias("bk"),
        ).select("doc", "bk.band", "bk.bh")

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(drop_dir)
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch_{batch_id}")
        if os.path.exists(marker):            # re-delivered after crash
            return
        batch_df = batch_df.persist()
        banded = banded_of(batch_df).persist()
        index = (spark.read.parquet(band_index_path)
                 if os.path.exists(band_index_path)
                 else _empty_band_index(spark))

        # candidate pairs, normalized to (batch doc, partner doc).
        # The early .distinct() on each branch is deliberate: a pair
        # colliding in k <= 8 bands arrives k times, and cand feeds
        # THREE consumers (partners, pair_keys, dropped) — deduping
        # once at the source keeps the k-fold inflation out of all
        # three (a round-8 A/B of removing these was inconclusive
        # under box drift; the dedup-at-source shape is kept on the
        # fan-out argument).
        vs_corpus = (
            banded.alias("b")
            .join(index.alias("i"), ["band", "bh"])
            .select(F.col("b.doc").alias("bdoc"),
                    F.col("i.doc").alias("pdoc"))
            .distinct())
        in_batch = (
            banded.alias("l").join(banded.alias("r"), ["band", "bh"])
            .where(F.col("l.doc") > F.col("r.doc"))
            .select(F.col("l.doc").alias("bdoc"),
                    F.col("r.doc").alias("pdoc"))
            .distinct())
        cand = vs_corpus.unionByName(in_batch).persist()

        # exact-Jaccard verify over batch docs + candidate partners
        # only (uncapped shingle sets: band collision is the recall
        # device, the verify is the truth)
        partners = cand.select(F.col("pdoc").alias("doc_id")).distinct()
        corpus_part = (
            spark.read.parquet(corpus_path)
            .join(partners, "doc_id", "left_semi")
            if os.path.exists(corpus_path)
            else batch_df.limit(0))
        vdocs = batch_df.select("doc_id", "text").unionByName(
            corpus_part.select("doc_id", "text"))
        vset = doc_shingle_pairs(vdocs, "doc_id", "text", n,
                                 max_shingle_df=None)
        pair_keys = cand.select(
            F.least("bdoc", "pdoc").alias("id1"),
            F.greatest("bdoc", "pdoc").alias("id2")).distinct()
        verified = (_jaccard_pairs_from(vset, threshold)
                    .join(pair_keys, ["id1", "id2"], "left_semi"))
        dropped = (
            cand.select("bdoc",
                        F.least("bdoc", "pdoc").alias("id1"),
                        F.greatest("bdoc", "pdoc").alias("id2"))
            .join(verified.select("id1", "id2"), ["id1", "id2"],
                  "left_semi")
            .select(F.col("bdoc").alias("doc_id")).distinct())
        # Replay identity guard: after CHECKPOINT LOSS the whole drop
        # redelivers as batch 0 with the markers gone, and the verify
        # path would re-append every replayed doc (pair generation is
        # id1 < id2, so a doc never Jaccard-matches itself). But a
        # replayed doc X necessarily collides with its OWN index rows
        # in every band, so the bdoc == pdoc candidates already name
        # exactly the replayed ids — doc_ids are globally unique by
        # this function's contract, same id = same doc, drop without
        # verification. Zero extra index contact: the probe join
        # already ran.
        replayed = (cand.where(F.col("bdoc") == F.col("pdoc"))
                    .select(F.col("bdoc").alias("doc_id")).distinct())

        new_docs = (batch_df
                    .join(dropped, "doc_id", "left_anti")
                    .join(replayed, "doc_id", "left_anti")
                    .persist())
        new_docs.write.mode("append").parquet(corpus_path)
        # Recomputing the survivors' band rows looks wasteful next to
        # a semi-join against the persisted `banded`; a round-8 A/B
        # could not separate the variants from box noise (drain cost
        # at sf0.1 is fixed stage overhead either way, and the box
        # drifts ~1.3x within an hour). Kept as the recompute: one
        # fewer exchange pair, and the map-side shingle+hash is
        # batch-proportional. Revisit with cluster-scale batches
        # where signature CPU could dominate exchange overhead.
        (banded_of(new_docs)
         .write.mode("append").parquet(band_index_path))
        for d in (new_docs, cand, banded, batch_df):
            d.unpersist()
        open(marker, "w").close()             # commit point, written last

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q


def streaming_ingest_decontaminate(spark: SparkSession, drop_dir: str,
                                   benchmark: DataFrame, corpus_path: str,
                                   quarantine_path: str,
                                   schema: str = "doc_id LONG, text STRING",
                                   n: int = 4,
                                   checkpoint: str | None = None):
    """Decontaminating ingestion: drain ``drop_dir`` (availableNow),
    appending benchmark-clean documents to ``corpus_path`` and routing
    contaminated ones (any shared word ``n``-gram with ``benchmark``)
    to ``quarantine_path`` with their distinct-hit counts.

    The Bloom filter over the benchmark shingles is built ONCE, before
    the stream starts (operators/curation.py:
    build_decontamination_filter) — the few-KiB words list is
    captured by the ``foreachBatch`` closure and baked into every
    micro-batch plan as a literal, and the exact-verify shingle set is
    persisted across batches; per-trigger cost is proportional to the
    batch, never to the benchmark. Crash contract: both appends land
    before the batch-id marker, a torn batch re-runs whole, and
    duplicate rows from the crashed batch are cleaned by the next
    ``maintenance.upsert_by_key`` compaction. Unlike the indexed
    pipelines this one keeps NO identity artifact, so CHECKPOINT LOSS
    redelivers the whole drop and duplicates the outputs wholesale —
    same healer (key compaction), and the clean/quarantine routing is
    deterministic so no doc changes side on replay (both halves
    pinned in tests). Compose after ``streaming_ingest_dedup`` when
    duplicates must never be visible between compactions.
    """
    from ..operators.curation import (build_decontamination_filter,
                                      decontaminate_probe)

    marker_dir = (os.path.join(checkpoint, "__decon_batches")
                  if checkpoint else f"{corpus_path}__batches")
    os.makedirs(marker_dir, exist_ok=True)

    bench_sh, words = build_decontamination_filter(benchmark, "text", n)
    bench_sh = bench_sh.persist()
    bench_sh.count()                       # materialize once, up front

    stream = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(drop_dir)
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch_{batch_id}")
        if os.path.exists(marker):            # re-delivered after crash
            return
        batch = batch_df.persist()
        hits = decontaminate_probe(batch, bench_sh, words,
                                   "doc_id", "text", n).persist()
        (batch.join(hits, "doc_id")
         .write.mode("append").parquet(quarantine_path))
        (batch.join(hits.select("doc_id"), "doc_id", "left_anti")
         .write.mode("append").parquet(corpus_path))
        hits.unpersist()
        batch.unpersist()
        open(marker, "w").close()             # commit point, written last

    writer = stream.writeStream.foreachBatch(ingest) \
        .trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    bench_sh.unpersist()
    return q
