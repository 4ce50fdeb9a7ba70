"""Sampling and dataset-split operators for corpus pipelines.

The reference never samples — it truncates sorted cursors (top-50,
cache.py:155-159). A training-data pipeline needs two different things:

- **Deterministic splits** that are a pure function of the record id,
  so the train/val assignment of a document never changes when the
  corpus is re-partitioned, re-ordered, or incrementally grown — the
  property that keeps eval sets honest across pipeline runs. Done by
  hashing the id (md5, available in every engine) and bucketing the
  first hex digits: no RNG, no state, embarrassingly parallel.
- **Stratified samples** for inspection/eval subsets with per-stratum
  rates (``sampleBy``): Bernoulli per row, map-only, no shuffle. The
  seed makes a run reproducible for a fixed input partitioning, but it
  is NOT content-stable — use the hash split when assignment must
  survive repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 256 buckets from the first two hex chars of md5(id).
_N_BUCKETS = 256


def split_assign(df: DataFrame, id_col: str,
                 val_fraction: float = 0.1,
                 split_col: str = "split") -> DataFrame:
    """Assign each row to 'train' or 'val' by content-addressed hash.

    bucket = int(md5(id)[:2], 16) in [0, 256); rows with
    bucket < 256*val_fraction go to 'val'. Adding documents later
    never reassigns existing ones, and the same id lands in the same
    split on any engine that has md5 — including the DuckDB oracle.
    """
    n_val = int(_N_BUCKETS * val_fraction)
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2),
                    16, 10).cast("int")
    return df.withColumn(
        split_col,
        F.when(bucket < n_val, F.lit("val")).otherwise(F.lit("train")))


def stratified_sample(df: DataFrame, stratum_col: str,
                      fractions: dict[str, float], seed: int = 42,
                      ) -> DataFrame:
    """Per-stratum Bernoulli sample (e.g. per-language eval subsets).

    ``sampleBy`` evaluates one RNG draw per row against the stratum's
    fraction — a map-only operator: no shuffle, no stratum-size
    precomputation, works identically at any scale.
    """
    return df.sampleBy(stratum_col, fractions, seed)


def stratified_sample_hash(df: DataFrame, stratum_col: str, id_col: str,
                           fractions: dict[str, float],
                           ) -> DataFrame:
    """Per-stratum sample with CONTENT-STABLE membership.

    :func:`stratified_sample` (``sampleBy``) draws per-row RNG — fast,
    but a document's membership changes when the corpus is
    repartitioned or re-read. This variant derives the draw from
    ``md5(id)`` exactly like :func:`split_assign`, with a per-stratum
    threshold looked up in a broadcast map literal: rate resolution is
    1/256, membership is a pure function of (id, stratum rate), and
    any engine with md5 reproduces it — so eval subsets stay fixed
    across runs, engines, and incremental corpus growth. Strata absent
    from ``fractions`` are dropped (rate 0). Map-only: no shuffle, no
    RNG state, works identically at any scale.
    """
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2),
                    16, 10).cast("int")
    pairs: list = []
    for s, frac in sorted(fractions.items()):
        pairs += [F.lit(s), F.lit(int(_N_BUCKETS * frac))]
    thresholds = F.create_map(*pairs)
    return df.where(
        bucket < F.coalesce(thresholds[F.col(stratum_col)], F.lit(0)))


def weighted_sample_topk(df: DataFrame, id_col: str, weight_col,
                         k: int) -> DataFrame:
    """Weighted sample WITHOUT replacement of ``k`` rows
    (Efraimidis–Spirakis A-ES), deterministic and engine-portable.

    A-ES keys each row by ``u^(1/w)`` (u uniform) and takes the top-k.
    For INTEGER weights that key has an exact integer twin: the max of
    ``w`` independent uniform draws is distributed as ``u^(1/w)``, so
    key(row) = max_{i=1..w} hash(id, i) — pure integer arithmetic, no
    ``pow``/``ln`` whose libm rounding could diverge across engines.
    Draws come from the first 15 hex digits of ``md5(id:i)`` (60 bits;
    collisions are broken by id, so the result is a total order).

    Plan shape: weights explode map-side (rows emitted = sum of
    weights — keep weights small integers, e.g. epochs-per-domain),
    one per-id max partial-aggregates before the shuffle, and the
    top-k is ``TakeOrderedAndProject`` — never a global sort. The
    aggregate is optional work: hash(id, i) could feed top-k directly,
    but per-id max collapses the explode before the exchange, which is
    the difference between shuffling sum(w) rows and |df| rows.

    NULL contract (r14, null-audit class D — found by the 1/10-rate
    stress pass): a draw is a pure function of the id, so NULL ids
    are excluded (concat_ws would silently hash a DIFFERENT key than
    ANSI ||, letting anonymous rows compete); a NULL weight yields no
    draws, identically to w < 1.
    """
    df = df.where(F.col(id_col).isNotNull())
    key = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                              F.col("_i").cast("string"))), 1, 15),
        16, 10).cast("bigint")
    return (
        df.select(F.col(id_col), weight_col.cast("int").alias("_w"))
        .where(F.col("_w") >= 1)
        .select(id_col, F.explode(F.sequence(F.lit(1), F.col("_w")))
                .alias("_i"))
        .select(id_col, key.alias("_key"))
        .groupBy(id_col).agg(F.max("_key").alias("sample_key"))
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  cmp_cols: list[str]) -> DataFrame:
    """Diff two corpus snapshots by key: (key, status) with status in
    {added, removed, changed, unchanged}.

    One full-outer shuffle join on the key — the incremental-pipeline
    primitive (what changed since the last crawl/ingest?) that decides
    which documents re-enter dedup/quality stages instead of
    reprocessing the whole corpus. Comparison columns are checked
    null-safely (<=>) so a NULL field doesn't read as a change.
    """
    o = old.select(F.col(key).alias("_k"),
                   *[F.col(c).alias(f"_o_{c}") for c in cmp_cols])
    n = new.select(F.col(key),
                   *[F.col(c).alias(f"_n_{c}") for c in cmp_cols])
    # Key-only diff (no comparison columns): rows present on both sides
    # can only be 'unchanged'.
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"_n_{c}").eqNullSafe(F.col(f"_o_{c}"))
    joined = n.join(o, n[key] == o["_k"], "full_outer")
    return joined.select(
        F.coalesce(F.col(key), F.col("_k")).alias(key),
        F.when(F.col("_k").isNull(), F.lit("added"))
        .when(F.col(key).isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
        .otherwise(F.lit("unchanged")).alias("status"),
    )


def global_shuffle_order(df: DataFrame, id_col: str, seed: int = 42,
                         n_shards: int = 8, n_parts: int | None = None,
                         cleanup: list | None = None) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``(shard, shard_pos)`` placement from a seedless total order over
    ``md5(id || ':' || seed)``.

    Training pipelines need the corpus in a *reproducible* random-ish
    order (epoch shuffling, shard assignment for data loaders), stable
    across engines, partitionings, and reruns — so the order is a pure
    content hash, not an RNG (same rationale as ``split_assign``).
    Round-robin modulo over the global position gives shards whose
    sizes differ by at most one row.

    The global position is computed the scalable way (the DataFrame
    equivalent of ``zipWithIndex``): rows are assigned to one of
    ``n_parts`` CONTENT-DERIVED buckets — the bucket index is a
    monotone function of the hash key's leading 16 bits, so bucket
    boundaries align with the global sort order — then one bounded
    driver collect of per-bucket counts yields bucket offsets, and
    position = bucket offset + local row_number within the bucket. No
    single-task global sort at any scale.

    Because the bucket is a pure function of the row's content (NOT
    ``spark_partition_id`` of a sampled range partitioning, which an
    earlier version used), the offsets stay valid across recomputation:
    unpersisting ``ranged`` before materializing the result is safe —
    the persist is purely a performance choice (it lets the count job
    and the final plan share one scan). Pass ``cleanup`` to unpersist
    after materialization (dedup.py convention).

    The DuckDB oracle states the same thing declaratively:
    ``row_number() OVER (ORDER BY md5(...), id) - 1``.

    NULL contract (r14, null-audit class D): a shuffle placement is a
    pure function of the row's id, so a NULL id has none — excluded by
    an explicit filter, mirrored by ``id IS NOT NULL`` in any replay.
    (Left in, the engines even hash DIFFERENT keys: ``concat_ws``
    skips the NULL while ``||`` nulls the whole key.)
    """
    from pyspark.sql import Window

    df = df.where(F.col(id_col).isNotNull())
    key = F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                            F.lit(str(seed))))
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Leading 16 bits of the hex key, scaled to n_parts buckets. The
    # scaling is monotone (floor of a nondecreasing map), so
    # bucket asc, then (_key, id) asc within bucket, IS the global
    # (_key, id) order; equal keys share a prefix hence a bucket.
    prefix = F.conv(F.substring("_key", 1, 4), 16, 10).cast("bigint")
    ranged = (df.select(F.col(id_col)).withColumn("_key", key)
              .withColumn("_pfx", prefix)
              .withColumn("_bkt",
                          F.expr(f"(_pfx * {n_parts}) div 65536").cast("int"))
              .drop("_pfx")
              .persist())
    if cleanup is not None:
        cleanup.append(ranged)
    # Bounded driver collect: one (bucket, count) row per bucket.
    counts = ranged.groupBy("_bkt").count().collect()
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: r["_bkt"]):
        offsets.append((r["_bkt"], acc))
        acc += r["count"]
    odf = spark.createDataFrame(offsets, schema="_bkt int, _off bigint")
    w = Window.partitionBy("_bkt").orderBy(F.asc("_key"), F.asc(id_col))
    pos = F.row_number().over(w).cast("bigint") + F.col("_off") - F.lit(1)
    return (ranged.join(F.broadcast(odf), "_bkt")
            .withColumn("_pos", pos)
            .select(F.col(id_col),
                    (F.col("_pos") % n_shards).cast("bigint").alias("shard"),
                    F.expr(f"_pos div {n_shards}").cast("bigint")
                    .alias("shard_pos")))


def deterministic_mix(df: DataFrame, key_col: str, id_col: str,
                      quota_col) -> DataFrame:
    """Domain-mixture sampler: keep the first ``quota_col`` rows per
    ``key_col`` group, ordered by ``md5(key || '|' || id)`` — a
    seedless content hash any SQL engine reproduces bit-for-bit, so
    the sampled subset is stable under repartitioning, re-ordering,
    and incremental corpus growth (same properties as
    ``split_assign``, applied to per-domain quota sampling: the
    "mix web : code : books at fixed ratios" step of training-data
    assembly).

    ``quota_col`` is a per-row integer Column (typically a CASE over
    the key), so heterogeneous domain quotas are one expression — no
    driver-side loop over domains.

    One shuffle on the domain key; row_number within each domain. At
    100 TB the group sizes are corpus-scale but the window carries
    only (key, hash) — no payload columns — and per-domain skew is
    bounded by the domain granularity the caller picks (source,
    shard, crawl); for a single mega-domain, pre-aggregate to
    per-shard sub-keys first.

    NULL contract (r14, null-audit class D): quota membership is a
    pure function of (key, id), so a NULL id has no hash position —
    its NULL sort key would rank FIRST under Spark and LAST under
    ANSI, shifting every other row's rank in the group. NULL ids are
    excluded, mirrored in any replay; a NULL ``key_col`` stays (one
    more domain, grouped identically in both engines — its rows all
    share a NULL hash, so the id tiebreak alone orders them).
    """
    from pyspark.sql import Window

    df = df.where(F.col(id_col).isNotNull())
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|"),
                       F.col(id_col).cast("string")))
    w = Window.partitionBy(key_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= quota_col)
            .drop("_rn"))


def weighted_repeat(df: DataFrame, id_col: str, weight_col) -> DataFrame:
    """Weighted domain UPSAMPLING: emit each row ``floor(w)`` or
    ``ceil(w)`` times so the expected multiplicity equals its (possibly
    fractional, possibly >1) weight — the "epochs per domain" knob of
    LLM data mixes (quality domains repeated 2-3x, bulk web <1x),
    where ``deterministic_mix`` only SUBSAMPLES.

    The fractional part is resolved by a seedless content hash
    (md5(id) bucket < frac·1000, the split_assign device), so the
    decision is a pure function of the row id: stable under
    repartitioning and incremental growth, and bit-reproducible by any
    SQL engine. w <= 0 drops the row. Output adds ``copy_idx``
    (0-based) so downstream shuffles can distinguish copies.

    Map-only: weight arithmetic + sequence/explode per row, fan-out
    bounded by ceil(max weight); no shuffle at any scale.
    """
    w = weight_col.cast("double")
    frac_mill = ((w - F.floor(w)) * 1000).cast("long")
    bucket = F.conv(F.substring(
        F.md5(F.col(id_col).cast("string")), 1, 3), 16, 10).cast("long") % 1000
    n = (F.floor(w).cast("long")
         + F.when(bucket < frac_mill, F.lit(1)).otherwise(F.lit(0)))
    return (
        df.withColumn("_n", n)
        .where(F.col("_n") > 0)
        .select("*", F.explode(
            F.sequence(F.lit(0), F.col("_n") - 1)).alias("copy_idx"))
        .drop("_n")
    )


def select_within_budget(df: DataFrame, id_col: str, quality_col: str,
                         tokens_col: str, budget: int,
                         cleanup: list | None = None) -> DataFrame:
    """Greedy data selection under a token budget: keep the
    highest-quality documents whose cumulative token count fits
    ``budget`` — the "best N tokens for this training run" cut that
    follows scoring in an LLM data pipeline.

    Selection order is (quality desc, id asc) — fully deterministic.
    Output: the selected rows (id, quality, n_tok).

    Scale shape (the q11 pattern, applied twice): a naive global
    cumsum window would single-partition the corpus. Instead:
    (1) aggregate token totals per DISTINCT QUALITY VALUE — bounded by
        the score's quantization (quality_score is rounded to 1e-6 in
        [0,1], so ≤1e6+1 groups at any corpus size), never by corpus
        rows;
    (2) run the ordered cumsum over those bounded aggregates to find
        the threshold quality: every strictly-better quality is taken
        whole;
    (3) the single BOUNDARY quality group is filled by an id-ordered
        window restricted to that one group — the only per-row window,
        scoped to one quality value's documents.
    """
    from pyspark.sql import Window

    q, t = F.col(quality_col), F.col(tokens_col).cast("bigint")
    per_q = df.groupBy(quality_col).agg(F.sum(t).alias("_qt")).persist()
    if cleanup is not None:
        cleanup.append(per_q)
    wq = (Window.orderBy(F.desc(quality_col))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = per_q.withColumn("_cum", F.sum("_qt").over(wq))
    # highest quality whose WHOLE group still fits; groups above it are
    # fully selected, the next group below is the boundary
    full = cum.where(F.col("_cum") <= budget)
    boundary = (cum.where(F.col("_cum") > budget)
                .orderBy(F.desc(quality_col)).limit(1)
                .select(F.col(quality_col).alias("_bq"),
                        (F.lit(budget) - (F.col("_cum") - F.col("_qt")))
                        .alias("_remain")))
    whole = df.join(F.broadcast(full.select(quality_col)), quality_col,
                    "left_semi")
    wb = (Window.partitionBy(quality_col).orderBy(F.asc(id_col))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    part = (
        df.join(F.broadcast(boundary), df[quality_col] == F.col("_bq"))
        .withColumn("_bcum", F.sum(t).over(wb))
        .where(F.col("_bcum") <= F.col("_remain"))
        .drop("_bq", "_remain", "_bcum")
    )
    return (whole.unionByName(part)
            .select(F.col(id_col), q.alias("quality"),
                    t.alias("n_tok")))
