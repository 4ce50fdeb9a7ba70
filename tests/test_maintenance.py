"""Compaction and upsert maintenance ops: data-identical, layout-better."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from twitter_analysis_spark.sources.maintenance import (
    compact_parquet, upsert_by_key,
)


def _parquet_files(path: str) -> list[str]:
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_compact_reduces_files_preserves_data(spark, tmp_path):
    path = str(tmp_path / "frag")
    src = spark.range(50_000).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    # fragmented write: 64 tiny files
    src.repartition(64).write.parquet(path)
    assert len(_parquet_files(path)) == 64
    before = {(r["id"], r["k"]) for r in spark.read.parquet(path).collect()}

    n = compact_parquet(spark, path, target_file_mb=128, sort_within_by=["k"])
    assert n == 1 and len(_parquet_files(path)) == 1
    after = {(r["id"], r["k"]) for r in spark.read.parquet(path).collect()}
    assert after == before


def test_compact_partitioned_sizes_files_per_partition(spark, tmp_path):
    """The file-size target must hold PER PARTITION: a hot partition
    many times the target splits into multiple files instead of
    collapsing into one straggler task's oversized file (the 100 TB
    hazard: one date holding 100x the target compacting through a
    single task), while a cold partition stays at one file. Null
    partition values (the __HIVE_DEFAULT_PARTITION__ directory) ride
    along, the layout is preserved, and the salted assignment is
    deterministic across runs."""
    path = str(tmp_path / "lake")
    pad = F.rpad(F.col("id").cast("string"), 100, "x").alias("payload")
    hot = spark.range(5_000).select(
        F.col("id"), F.to_date(F.lit("2024-03-01")).alias("event_date"), pad)
    cold = spark.range(5_000, 5_010).select(
        F.col("id"), F.to_date(F.lit("2024-03-02")).alias("event_date"), pad)
    nulls = spark.range(5_010, 5_015).select(
        F.col("id"), F.lit(None).cast("date").alias("event_date"), pad)
    (hot.unionByName(cold).unionByName(nulls)
     .repartition(8)  # fragmented, multi-file starting layout
     .write.partitionBy("event_date").parquet(path))
    before = {(r["id"], str(r["event_date"])) for r in
              spark.read.parquet(path).collect()}

    # ~64 KiB target: hot partition (~0.5 MB of payload) must split
    compact_parquet(spark, path, target_file_mb=0.0625,
                    partition_by=["event_date"])
    dirs = {d for d in os.listdir(path) if os.path.isdir(
        os.path.join(path, d))}
    assert dirs == {"event_date=2024-03-01", "event_date=2024-03-02",
                    "event_date=__HIVE_DEFAULT_PARTITION__"}
    counts = {d: len(_parquet_files(os.path.join(path, d))) for d in dirs}
    assert counts["event_date=2024-03-01"] >= 2, counts
    assert counts["event_date=2024-03-02"] == 1, counts
    assert counts["event_date=__HIVE_DEFAULT_PARTITION__"] == 1, counts
    after = {(r["id"], str(r["event_date"])) for r in
             spark.read.parquet(path).collect()}
    assert after == before

    # deterministic salt: a second compaction reproduces the layout
    compact_parquet(spark, path, target_file_mb=0.0625,
                    partition_by=["event_date"])
    counts2 = {d: len(_parquet_files(os.path.join(path, d))) for d in dirs}
    assert counts2 == counts
    assert {(r["id"], str(r["event_date"])) for r in
            spark.read.parquet(path).collect()} == before


def test_upsert_by_key(spark, tmp_path):
    path = str(tmp_path / "snap")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k long, v string, ver long")
    v1.write.parquet(path)

    updates = spark.createDataFrame(
        [(2, "b2", 20),          # newer version replaces
         (3, "c_old", 5),        # OLDER version must lose
         (4, "d", 20)],          # new key inserts
        "k long, v string, ver long")
    upsert_by_key(spark, path, updates, key="k", order_by="ver")

    got = {r["k"]: (r["v"], r["ver"])
           for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 10), 4: ("d", 20)}
    # replay of the same updates is idempotent
    upsert_by_key(spark, path, updates, key="k", order_by="ver")
    again = {r["k"]: (r["v"], r["ver"])
             for r in spark.read.parquet(path).collect()}
    assert again == got


def test_swap_crash_never_loses_table(spark, tmp_path, monkeypatch):
    """A crash at any point of the table swap leaves the data
    recoverable: the old table is moved aside, never deleted, until the
    new one is live."""
    from twitter_analysis_spark.sources import maintenance as m

    path = str(tmp_path / "snap")
    v1 = spark.createDataFrame([(1, "a")], "k long, v string")
    v1.write.parquet(path)
    updates = spark.createDataFrame([(2, "b")], "k long, v string")

    # Crash while moving the new table in: the original must be
    # restored. The swap's renames go through the fsmeta shim (the
    # round-11 seam), so the crash is injected there.
    real_rename = m.fsmeta.rename

    def crash_on_tmp_move(src, dst):
        if dst == path and "__upsert_" in src:
            raise OSError("simulated crash")
        real_rename(src, dst)

    monkeypatch.setattr(m.fsmeta, "rename", crash_on_tmp_move)
    try:
        upsert_by_key(spark, path, updates, key="k")
    except OSError:
        pass
    monkeypatch.setattr(m.fsmeta, "rename", real_rename)
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {1}

    # Crash during old-table cleanup: the NEW table is already live and
    # complete; only a stray __old dir leaks.
    real_rmtree = m.fsmeta.rmtree

    def crash_rmtree(p, *a, **kw):
        raise OSError("simulated crash")

    monkeypatch.setattr(m.fsmeta, "rmtree", crash_rmtree)
    try:
        upsert_by_key(spark, path, updates, key="k")
    except OSError:
        pass
    monkeypatch.setattr(m.fsmeta, "rmtree", real_rmtree)
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {1, 2}


def _partition_state(root: str) -> dict[str, set[tuple[str, int, int]]]:
    """Map grain_date=... partition dir -> its (file, size, mtime_ns)
    set — the physical identity that proves a partition was or wasn't
    rewritten."""
    out: dict[str, set[tuple[str, int, int]]] = {}
    for part in os.listdir(root):
        pdir = os.path.join(root, part)
        if not (os.path.isdir(pdir) and part.startswith("grain_date=")):
            continue
        out[part] = {
            (f, os.path.getsize(os.path.join(pdir, f)),
             os.stat(os.path.join(pdir, f)).st_mtime_ns)
            for f in os.listdir(pdir) if f.endswith(".parquet")}
    return out


def test_steady_state_rollup_rewrites_only_touched_partitions(
        spark, tmp_path):
    """Three incremental drains: each refresh physically rewrites ONLY
    the partitions whose dates the micro-batch touched — untouched
    partitions keep byte-identical file sets (names, sizes, mtimes).
    This is the steady-state behavior the single-drain bench cannot
    show (one batch touching all dates = a full rebuild, BASELINE.md
    round-6 streaming-rollup note); here batches touch 1-2 of up to 3
    dates, the production shape. Afterwards, compaction collapses the
    per-drain small files of the APPEND-mode lake without changing its
    content — the other half of the steady-state story."""
    import json

    from twitter_analysis_spark.operators.rollup import rollup
    from twitter_analysis_spark.streaming.rollup_ingest import (
        streaming_rollup_ingest)

    drop = tmp_path / "ss_drop"
    drop.mkdir()
    lake = str(tmp_path / "ss_lake")
    index = str(tmp_path / "ss_index")
    roll = str(tmp_path / "ss_rollup")
    ckpt = str(tmp_path / "ss_ckpt")

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for eid, ts, etype, val in rows:
                f.write(json.dumps({
                    "event_id": eid, "ts": ts, "user_id": eid % 5,
                    "event_type": etype, "value": val}) + "\n")

    def drain():
        streaming_rollup_ingest(spark, str(drop), lake, index, roll,
                                grain="hour", checkpoint=ckpt)

    # drain 1: two dates
    write_drop("d1.json", [
        (1, "2024-03-01 10:05:00", "click", 1.5),
        (2, "2024-03-02 09:00:00", "view", 4.0),
    ])
    drain()
    s1 = _partition_state(roll)
    assert set(s1) == {"grain_date=2024-03-01", "grain_date=2024-03-02"}

    # drain 2: touches 03-02 (late event) and a new date 03-03;
    # 03-01 must come through physically untouched.
    write_drop("d2.json", [
        (3, "2024-03-02 09:30:00", "view", 2.0),
        (4, "2024-03-03 12:00:00", "click", 8.0),
    ])
    drain()
    s2 = _partition_state(roll)
    assert set(s2) == set(s1) | {"grain_date=2024-03-03"}
    assert s2["grain_date=2024-03-01"] == s1["grain_date=2024-03-01"]
    assert s2["grain_date=2024-03-02"] != s1["grain_date=2024-03-02"]

    # drain 3: only 03-03; both earlier dates untouched.
    write_drop("d3.json", [(5, "2024-03-03 13:00:00", "click", 1.0)])
    drain()
    s3 = _partition_state(roll)
    assert s3["grain_date=2024-03-01"] == s2["grain_date=2024-03-01"]
    assert s3["grain_date=2024-03-02"] == s2["grain_date=2024-03-02"]
    assert s3["grain_date=2024-03-03"] != s2["grain_date=2024-03-03"]

    # rollup still equals the from-scratch truth over the deduped lake
    def key(r):
        return (str(r["bucket_ts"]), r["event_type"], r["n_events"],
                str(r["sum_value_dec"]))
    truth = sorted(map(key, rollup(
        spark.read.parquet(lake).dropDuplicates(["event_id"]),
        "hour").collect()))
    assert sorted(map(key, spark.read.parquet(roll).collect())) == truth

    # steady-state lake hygiene: three append drains left >= 3 file
    # generations; compaction shrinks the file count, keeps content.
    before = {str(r["event_id"]) for r in
              spark.read.parquet(lake).collect()}
    n_files_before = sum(len(fs) for fs in _partition_state_lake(lake))
    compact_parquet(spark, lake, target_file_mb=128,
                    partition_by=["event_date"])
    after = {str(r["event_id"]) for r in
             spark.read.parquet(lake).collect()}
    n_files_after = sum(len(fs) for fs in _partition_state_lake(lake))
    assert after == before and len(before) == 5
    assert n_files_after < n_files_before


def _partition_state_lake(root: str) -> list[set[str]]:
    out = []
    for part in os.listdir(root):
        pdir = os.path.join(root, part)
        if os.path.isdir(pdir) and part.startswith("event_date="):
            out.append({f for f in os.listdir(pdir)
                        if f.endswith(".parquet")})
    return out


def test_compact_multi_level_partitioning(spark, tmp_path):
    """compact_parquet(partition_by=[a, b]) must walk the two-level
    Hive layout for its per-partition plan (the recursion in
    _partition_file_plan), preserve both directory levels, and keep
    content identical."""
    from twitter_analysis_spark.sources.maintenance import (
        _partition_file_plan)

    path = str(tmp_path / "ml")
    df = spark.range(2_000).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("region"),
        F.to_date(F.lit("2024-01-01")).alias("event_date"),
        F.rpad(F.col("id").cast("string"), 50, "y").alias("payload"))
    df.repartition(4).write.partitionBy("region", "event_date") \
        .parquet(path)
    plan = _partition_file_plan(path, ["region", "event_date"], 1 << 20)
    assert sorted(vals for vals, _k in plan) == [
        ["0", "2024-01-01"], ["1", "2024-01-01"]]
    before = {r["id"] for r in spark.read.parquet(path).collect()}

    compact_parquet(spark, path, target_file_mb=1,
                    partition_by=["region", "event_date"])
    assert {r["id"] for r in spark.read.parquet(path).collect()} == before
    for region in ("region=0", "region=1"):
        sub = os.path.join(path, region)
        assert os.path.isdir(sub)
        assert os.listdir(sub) == ["event_date=2024-01-01"]


def test_upsert_partition_scoped(spark, tmp_path):
    """The scale path of upsert_by_key: with partition_by, only the
    partitions the UPDATES touch are rewritten — untouched partition
    dirs stay byte-identical (names, sizes, mtimes) — and the
    winner-per-key semantics hold inside the touched ones. Also pins
    the empty-updates no-op and that the prune predicate reaches the
    scan as PartitionFilters (the cost contract: updates + touched
    partitions, never the table)."""
    path = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(1, "a", 10, "2024-01-01"), (2, "b", 10, "2024-01-01"),
         (3, "c", 10, "2024-01-02"), (4, "d", 10, "2024-01-03")],
        "k long, v string, ver long, d string")
    base.write.partitionBy("d").parquet(path)

    def state(day):
        pdir = os.path.join(path, f"d={day}")
        return {(f, os.path.getsize(os.path.join(pdir, f)),
                 os.stat(os.path.join(pdir, f)).st_mtime_ns)
                for f in os.listdir(pdir) if f.endswith(".parquet")}

    s2, s3 = state("2024-01-02"), state("2024-01-03")
    updates = spark.createDataFrame(
        [(2, "b2", 20, "2024-01-01"),    # newer version replaces
         (1, "a_old", 5, "2024-01-01"),  # older version loses
         (9, "i", 20, "2024-01-01")],    # insert
        "k long, v string, ver long, d string")

    # PartitionFilters must carry the touched-date prune
    cur = spark.read.parquet(path).where(
        F.col("d").eqNullSafe(F.lit("2024-01-01")))
    assert "PartitionFilters: [" in \
        cur._jdf.queryExecution().executedPlan().toString()

    upsert_by_key(spark, path, updates, key="k", order_by="ver",
                  partition_by=["d"])
    got = {r["k"]: (r["v"], r["ver"], str(r["d"]))
           for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10, "2024-01-01"), 2: ("b2", 20, "2024-01-01"),
                   3: ("c", 10, "2024-01-02"), 4: ("d", 10, "2024-01-03"),
                   9: ("i", 20, "2024-01-01")}
    # untouched partitions physically not rewritten
    assert state("2024-01-02") == s2
    assert state("2024-01-03") == s3

    # replay idempotence (replay may physically rewrite d1, but its
    # contents converge) and empty-updates total no-op
    upsert_by_key(spark, path, updates, key="k", order_by="ver",
                  partition_by=["d"])
    assert {r["k"]: (r["v"], r["ver"], str(r["d"]))
            for r in spark.read.parquet(path).collect()} == got
    s1 = state("2024-01-01")
    upsert_by_key(spark, path, updates.limit(0), key="k",
                  order_by="ver", partition_by=["d"])
    assert state("2024-01-01") == s1           # no partition touched
    assert state("2024-01-02") == s2

    # first write of a fresh table keeps the partitioned layout
    fresh = str(tmp_path / "fresh")
    upsert_by_key(spark, fresh, updates, key="k", order_by="ver",
                  partition_by=["d"])
    assert os.path.isdir(os.path.join(fresh, "d=2024-01-01"))


def test_upsert_many_partitions_flat_predicate(spark, tmp_path):
    """A batch touching MANY partitions (here 120 dates x 2 regions)
    must stay correct and keep the touched-partition prune FLAT: the
    predicate is one tuple-key .isin over the updates' distinct
    partition tuples, not an Or-chain whose depth equals the tuple
    count (a deep Or tree costs analysis time and obscures pruning).
    Pins: (a) winner-per-key correctness across all touched
    partitions, (b) untouched partitions physically unrewritten,
    (c) the plan the merge actually reads carries a single IN over
    the partition columns in PartitionFilters — no Or nodes."""
    import os

    from twitter_analysis_spark.sources.maintenance import upsert_by_key

    path = str(tmp_path / "many")
    n_dates, regions = 120, ["e", "w"]
    base = spark.createDataFrame(
        [(d * 10 + r, f"v{d}", 1,
          f"2024-{1 + d // 28:02d}-{1 + d % 28:02d}", regions[r])
         for d in range(n_dates) for r in range(2)],
        "k long, v string, ver long, d string, region string")
    base.write.partitionBy("d", "region").parquet(path)
    untouched_dir = os.path.join(path, "d=2024-01-01", "region=w")
    before = {(f, os.stat(os.path.join(untouched_dir, f)).st_mtime_ns)
              for f in os.listdir(untouched_dir)
              if f.endswith(".parquet")}

    # update every date's region=e row; leave region=w alone
    updates = spark.createDataFrame(
        [(d * 10, f"NEW{d}", 2,
          f"2024-{1 + d // 28:02d}-{1 + d % 28:02d}", "e")
         for d in range(n_dates)],
        "k long, v string, ver long, d string, region string")

    # pin the real predicate shape on the current-side read the merge
    # performs: same tuple-key expression as the implementation
    from pyspark.sql import functions as F
    sep = chr(1)
    tk = F.concat_ws(sep, *[
        F.coalesce(F.col(c).cast("string"),
                   F.lit("__HIVE_DEFAULT_PARTITION__"))
        for c in ("d", "region")])
    touched = [r["_tk"] for r in
               updates.select(tk.alias("_tk")).distinct().collect()]
    assert len(touched) == n_dates
    pruned = spark.read.parquet(path).where(tk.isin(touched))
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        plan = pruned._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert (" IN " in pf or "INSET" in pf.upper()), pf[:500]
    assert " OR " not in pf.upper(), pf[:500]

    upsert_by_key(spark, path, updates, key="k", order_by="ver",
                  partition_by=["d", "region"])
    got = {r["k"]: (r["v"], r["ver"])
           for r in spark.read.parquet(path).collect()}
    assert len(got) == n_dates * 2
    for d in range(n_dates):
        assert got[d * 10] == (f"NEW{d}", 2)        # updated
        assert got[d * 10 + 1] == (f"v{d}", 1)      # untouched row
    after = {(f, os.stat(os.path.join(untouched_dir, f)).st_mtime_ns)
             for f in os.listdir(untouched_dir)
             if f.endswith(".parquet")}
    assert after == before          # untouched partition not rewritten


def test_upsert_full_rewrite_heals_cross_partition_dups(spark, tmp_path):
    """full_rewrite=True is the healer form for CROSS-partition
    duplicates (a key living in two _batch_id partitions, e.g. after
    a replace-by-batch checkpoint loss): the partition-scoped merge
    must NOT be used there (the key is not partition-stable), so the
    flag forces the corpus-sized read-union-dedup-rewrite through the
    crash-safe swap while keeping partition_by as the OUTPUT layout.
    Pins: cross-partition dups collapse to one winner, the partitioned
    layout survives, and the write went through the temp+swap path
    (no dynamic in-place overwrite)."""
    import os

    from twitter_analysis_spark.sources.maintenance import upsert_by_key

    path = str(tmp_path / "healme")
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0),      # batch 0
         (2, "b_replay", 1), (3, "c", 1)],   # batch 1 replayed doc 2
        "k long, v string, _batch_id long")
    base.write.partitionBy("_batch_id").parquet(path)
    assert spark.read.parquet(path).count() == 4

    dedup = spark.read.parquet(path).dropDuplicates(["k"])
    upsert_by_key(spark, path, dedup, key="k",
                  partition_by=["_batch_id"], full_rewrite=True)
    got = {r["k"] for r in spark.read.parquet(path).collect()}
    assert got == {1, 2, 3}
    assert spark.read.parquet(path).count() == 3
    # layout preserved: _batch_id partition dirs, no flat root files
    entries = os.listdir(path)
    assert any(e.startswith("_batch_id=") for e in entries)
    assert not any(e.endswith(".parquet") for e in entries)


def test_upsert_duplicate_winner_is_layout_deterministic(spark, tmp_path):
    """Duplicate keys WITHIN one side whose copies DIFFER (the round-10
    ADVICE case: replayed copies carrying different ``_batch_id``
    values) must resolve to the SAME winner on every run —
    ``_winner_per_key`` breaks those ties by a stable hash of the
    row's remaining columns, not by shuffle order. Pins: two merges
    from the same logical state but OPPOSITE physical layouts
    (1-partition vs 8-partition writes, reversed input order) produce
    byte-identical survivors, and the survivor is one of the planted
    candidate rows (not a mixed row)."""
    from twitter_analysis_spark.sources.maintenance import upsert_by_key

    dup_rows = [(2, "replay_a", 0), (2, "replay_b", 1)]
    base_rows = [(1, "a", 0), (3, "c", 1)] + dup_rows
    updates = spark.createDataFrame(
        [(4, "d", 2)], "k long, v string, _batch_id long")

    def merge_with_layout(name: str, n_parts: int,
                          reverse: bool) -> dict[int, tuple]:
        path = str(tmp_path / name)
        rows = list(reversed(base_rows)) if reverse else base_rows
        (spark.createDataFrame(rows, "k long, v string, _batch_id long")
         .repartition(n_parts)
         .write.partitionBy("_batch_id").parquet(path))
        upsert_by_key(spark, path, updates, key="k",
                      partition_by=["_batch_id"], full_rewrite=True)
        return {r["k"]: (r["v"], r["_batch_id"])
                for r in spark.read.parquet(path).collect()}

    got1 = merge_with_layout("lay1", 1, reverse=False)
    got2 = merge_with_layout("lay2", 8, reverse=True)
    assert got1 == got2
    assert set(got1) == {1, 2, 3, 4}
    # the survivor for the duplicated key is one intact planted row
    assert got1[2] in {("replay_a", 0), ("replay_b", 1)}


def test_upsert_partition_type_skew_refuses_loudly(spark, tmp_path):
    """Partition-type agreement is enforced, not assumed (round-10
    review finding): a table partitioned by string month '01' reads
    back with month inferred as INT (directory-name type inference),
    so updates carrying the original string type would string-form-
    miss the touched-partition predicate — and dynamic overwrite
    would then replace month=01 with updates-only rows, silently
    deleting its pre-existing keys. The merge must refuse with a
    named remedy instead. Matching types (the contract) keep
    working."""
    import pytest

    from twitter_analysis_spark.sources.maintenance import upsert_by_key

    path = str(tmp_path / "skewed")
    base = spark.createDataFrame(
        [(1, "a", "01"), (2, "b", "01"), (3, "c", "02")],
        "k long, v string, month string")
    base.write.partitionBy("month").parquet(path)
    # inference reads month back as int
    assert dict(spark.read.parquet(path).dtypes)["month"] == "int"

    updates = spark.createDataFrame(
        [(2, "b2", "01")], "k long, v string, month string")
    with pytest.raises(ValueError, match="type inference"):
        upsert_by_key(spark, path, updates, key="k",
                      partition_by=["month"])
    # nothing was touched by the refusal
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {1, 2, 3}

    # casting the updates to the read schema is NOT enough for this
    # table: its dirs (month=01) are not canonical for the inferred
    # int type (write form month=1), so dynamic overwrite would write
    # winners into a NEW directory beside the old one — the table-
    # level guard refuses that too
    cur = spark.read.parquet(path)
    fixed = updates.withColumn("month", F.col("month").cast(
        dict(cur.dtypes)["month"]))
    with pytest.raises(ValueError, match="not canonical"):
        upsert_by_key(spark, path, fixed, key="k",
                      partition_by=["month"])
    assert {r["k"] for r in spark.read.parquet(path).collect()} == {1, 2, 3}

    # the named remedy: full_rewrite merges correctly AND emerges with
    # a canonical layout, after which partition-scoped merges work
    upsert_by_key(spark, path, fixed, key="k", partition_by=["month"],
                  full_rewrite=True)
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}
    assert os.path.isdir(os.path.join(path, "month=1"))
    assert not os.path.isdir(os.path.join(path, "month=01"))
    more = spark.createDataFrame([(4, "d", 2)], "k long, v string, month int")
    upsert_by_key(spark, path, more, key="k", partition_by=["month"])
    assert {r["k"] for r in spark.read.parquet(path).collect()} == \
        {1, 2, 3, 4}


def test_fold_index_bucketed_two_tier_roundtrip(spark, tmp_path):
    """Round-11 directive: drain -> fold -> drain again. The folded
    base table must (a) keep the corpus duplicate-free through
    subsequent two-tier drains, (b) keep reconcile_replace_by_batch
    from mistaking folded corpus partitions for torn batches, and
    (c) carry the bucketed layout under which the probe's index
    branch reaches its first join with ZERO exchange even when
    nothing can broadcast."""
    import json

    from twitter_analysis_spark.operators.dedup import (
        incremental_exact_dedup)
    from twitter_analysis_spark.sources.maintenance import (
        fold_index_bucketed)
    from twitter_analysis_spark.streaming.ingest import (
        reconcile_replace_by_batch, streaming_ingest_dedup)

    drop = tmp_path / "drop"
    drop.mkdir()
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    tbl = "fold_idx_base"

    def write_drop(name, rows):
        with open(drop / name, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    try:
        write_drop("d1.json", [(1, "alpha"), (2, "alpha"), (3, "beta")])
        streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=ckpt)
        folded = fold_index_bucketed(spark, index, tbl)
        assert len(folded) == 1
        # delta is drained into the base: no _batch_id dirs remain
        assert not [e for e in os.listdir(index)
                    if e.startswith("_batch_id=")]
        base_tokens = {r["_batch_id"] for r in
                       spark.table(tbl).select("_batch_id")
                       .distinct().collect()}
        assert base_tokens == set(folded)
        # idempotent no-op when there is nothing to fold
        assert fold_index_bucketed(spark, index, tbl) == []

        # second drain, two-tier: dups of BASE content (alpha, beta),
        # a new doc, and an in-batch dup of the new doc
        write_drop("d2.json", [(10, "alpha"), (11, "gamma"),
                               (12, "beta"), (13, "gamma")])
        streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=ckpt, base_index_table=tbl)
        got = {r["doc_id"]: r["text"]
               for r in spark.read.parquet(corpus).collect()}
        assert got == {1: "alpha", 3: "beta", 11: "gamma"}
        texts = list(got.values())
        assert len(texts) == len(set(texts))   # zero duplicates

        # reconcile, base-aware: the folded batch's corpus partition
        # has no delta index partition — exactly the torn signature —
        # but its tokens live in the base, so nothing is dropped
        assert reconcile_replace_by_batch(
            corpus, index, spark=spark, base_index_table=tbl) == []
        assert {r["doc_id"] for r in
                spark.read.parquet(corpus).collect()} == {1, 3, 11}
        # a drop_tokens entry naming a folded token refuses loudly
        import pytest
        with pytest.raises(ValueError, match="folded into"):
            reconcile_replace_by_batch(
                corpus, index, drop_tokens=[folded[0]],
                spark=spark, base_index_table=tbl)

        # fold the second drain's delta in too (merge path), then a
        # third drain against the twice-folded base
        folded2 = fold_index_bucketed(spark, index, tbl)
        assert len(folded2) == 1 and folded2[0] not in folded
        write_drop("d3.json", [(14, "gamma"), (15, "epsilon")])
        streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=ckpt, base_index_table=tbl)
        assert {r["doc_id"] for r in
                spark.read.parquet(corpus).collect()} == {1, 3, 11, 15}

        # (c) the zero-exchange pin over the folded base, read exactly
        # the way the streaming probe reads it, nothing broadcastable
        from tests.test_plans import _ancestors_of_index_scan
        keys = ("spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold")
        prev = {k: spark.conf.get(k, None) for k in keys}
        for k in keys:
            spark.conf.set(k, "-1")
        try:
            base = (spark.table(tbl)
                    .where(F.col("_batch_id") != "zz").drop("_batch_id"))
            batch = spark.createDataFrame(
                [(100, "alpha"), (101, "zeta")], "doc_id LONG, text STRING")
            res = incremental_exact_dedup(batch, base, "doc_id", "text")
            res.collect()
            plan = res._jdf.queryExecution().executedPlan().toString()
            assert "SelectedBucketsCount: 8 out of 8" in plan
            anc = _ancestors_of_index_scan(plan)
            fj = next((i for i, s in enumerate(anc) if "Join" in s), None)
            fe = next((i for i, s in enumerate(anc)
                       if s.startswith("Exchange")), len(anc))
            assert fj is not None and fj < fe, anc
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    finally:
        for t in (tbl, f"{tbl}__folding", f"{tbl}__prefold"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_dedup_multi_tier_min_holder(spark):
    """Two-tier probe semantics: keys present in BOTH tiers (the
    fold's crash-retry overlap window) resolve to the MIN holder, and
    a key in either single tier still classifies dup_of_corpus."""
    from twitter_analysis_spark.operators.dedup import (
        content_index, incremental_exact_dedup)

    # build both tiers from real hashes so the join keys line up
    docs = spark.createDataFrame(
        [(7, "shared"), (9, "base_only")], "doc_id LONG, text STRING")
    base = content_index(docs, "doc_id", "text")
    delta_docs = spark.createDataFrame(
        [(3, "shared"), (4, "delta_only")], "doc_id LONG, text STRING")
    delta = content_index(delta_docs, "doc_id", "text")
    batch = spark.createDataFrame(
        [(20, "shared"), (21, "base_only"), (22, "delta_only"),
         (23, "brand_new")], "doc_id LONG, text STRING")
    res = {r["doc_id"]: (r["status"], r["dup_of"]) for r in
           incremental_exact_dedup(batch, [base, delta],
                                   "doc_id", "text").collect()}
    assert res[20] == ("dup_of_corpus", 3)    # min(7, 3) wins
    assert res[21] == ("dup_of_corpus", 9)
    assert res[22] == ("dup_of_corpus", 4)
    assert res[23] == ("new", None)


def test_fold_crash_windows_heal_at_entry(spark, tmp_path):
    """fold_index_bucketed's torn states heal at the NEXT call's
    entry (docstring contract): (A) crashed between the two catalog
    renames — live missing, backup present — restores the backup
    before computing, so no base row is lost; (B) already-folded
    tokens whose delta dirs survived a crash-before-deletion are
    skipped (no rewrite) and their dirs removed; (C) a stale backup
    next to a live table (crash after swap, before the drop) is
    dropped."""
    from twitter_analysis_spark.sources.maintenance import (
        fold_index_bucketed)

    tbl = "fold_crash_tbl"
    schema = "content_key LONG, holder_id LONG, _batch_id STRING"
    idx = str(tmp_path / "idx")
    spark.createDataFrame(
        [(11, 1, "lin-a_0"), (22, 2, "lin-a_1")], schema
    ).write.partitionBy("_batch_id").parquet(idx)
    try:
        # (A) backup-only state: the pre-fold base was moved aside and
        # the crash hit before the staging rename
        spark.createDataFrame([(33, 3, "lin-0_0")], schema) \
            .write.bucketBy(8, "content_key").sortBy("content_key") \
            .saveAsTable(f"{tbl}__prefold")
        folded = fold_index_bucketed(spark, idx, tbl)
        assert folded == ["lin-a_0", "lin-a_1"]
        rows = {(r["content_key"], r["_batch_id"])
                for r in spark.table(tbl).collect()}
        assert rows == {(11, "lin-a_0"), (22, "lin-a_1"), (33, "lin-0_0")}
        assert not spark.catalog.tableExists(f"{tbl}__prefold")
        assert not [e for e in os.listdir(idx)
                    if e.startswith("_batch_id=")]

        # (B) folded-but-undeleted: a delta dir for a token already in
        # the base must not re-fold (no duplicate rows), only vanish
        spark.createDataFrame([(11, 1, "lin-a_0")], schema) \
            .write.mode("append").partitionBy("_batch_id").parquet(idx)
        assert fold_index_bucketed(spark, idx, tbl) == ["lin-a_0"]
        assert spark.table(tbl).count() == 3          # unchanged
        assert not [e for e in os.listdir(idx)
                    if e.startswith("_batch_id=")]

        # (C) stale backup beside a live table is dropped at entry
        spark.createDataFrame([(99, 9, "stale_0")], schema) \
            .write.bucketBy(8, "content_key").sortBy("content_key") \
            .saveAsTable(f"{tbl}__prefold")
        assert fold_index_bucketed(spark, idx, tbl) == []
        assert not spark.catalog.tableExists(f"{tbl}__prefold")
        assert spark.table(tbl).count() == 3          # live untouched
    finally:
        for t in (tbl, f"{tbl}__folding", f"{tbl}__prefold"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_two_tier_guards_refuse_before_damage(spark, tmp_path):
    """Review-pass pins: (a) a base_index_table that does not exist
    refuses BEFORE the stream starts (a silent single-tier fallback
    would re-ingest every key the missing tier holds); (b) the same
    refusal in reconcile; (c) a reconcile refused over a folded
    drop_tokens entry must have deleted NOTHING — including torn
    partitions its structural pass would otherwise drop."""
    import json

    import pytest

    from twitter_analysis_spark.sources.maintenance import (
        fold_index_bucketed)
    from twitter_analysis_spark.streaming.ingest import (
        reconcile_replace_by_batch, streaming_ingest_dedup)

    drop = tmp_path / "drop"
    drop.mkdir()
    corpus, index = str(tmp_path / "c"), str(tmp_path / "i")
    with pytest.raises(ValueError, match="does not exist"):
        streaming_ingest_dedup(spark, str(drop), corpus, index,
                               base_index_table="never_created_tbl")
    with pytest.raises(ValueError, match="does not exist"):
        reconcile_replace_by_batch(corpus, index, spark=spark,
                                   base_index_table="never_created_tbl")

    tbl = "guard_fold_tbl"
    try:
        with open(drop / "d.json", "w") as f:
            f.write(json.dumps({"doc_id": 1, "text": "alpha"}) + "\n")
        streaming_ingest_dedup(spark, str(drop), corpus, index,
                               checkpoint=str(tmp_path / "ck"))
        folded = fold_index_bucketed(spark, index, tbl)
        # plant a TORN partition (corpus dir with no index partition)
        torn = os.path.join(corpus, "_batch_id=torn-lineage_0")
        os.makedirs(torn)
        with pytest.raises(ValueError, match="folded into"):
            reconcile_replace_by_batch(corpus, index,
                                       drop_tokens=[folded[0]],
                                       spark=spark, base_index_table=tbl)
        assert os.path.isdir(torn)      # refusal deleted NOTHING
        # without the offending drop_tokens entry the torn partition
        # is dropped and the folded one survives
        assert reconcile_replace_by_batch(
            corpus, index, spark=spark,
            base_index_table=tbl) == ["torn-lineage_0"]
        assert [e for e in os.listdir(corpus)
                if e.startswith("_batch_id=")] == [
                    f"_batch_id={folded[0]}"]
    finally:
        for t in (tbl, f"{tbl}__folding", f"{tbl}__prefold"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_fold_refuses_flat_legacy_layout(spark, tmp_path):
    """A pre-replace-by-batch index (flat parquet at the root) must
    refuse with the named migration, not silently return [] as if
    two-tier were active with nothing to fold."""
    import pytest

    from twitter_analysis_spark.sources.maintenance import (
        fold_index_bucketed)

    flat = str(tmp_path / "flat_idx")
    spark.createDataFrame([(1, 1)], "content_key LONG, holder_id LONG") \
        .coalesce(1).write.parquet(flat)
    with pytest.raises(ValueError, match="one-time migration"):
        fold_index_bucketed(spark, flat, "never_made_tbl")


def test_fold_refuses_index_schema_drift(spark, tmp_path):
    """Merging a delta whose columns drifted from the base refuses AT
    THE FOLD (next to the cause) instead of poisoning the base and
    failing every later streaming micro-batch far from it."""
    import pytest

    from twitter_analysis_spark.sources.maintenance import (
        fold_index_bucketed)

    idx = str(tmp_path / "idx")
    tbl = "drift_fold_tbl"
    spark.createDataFrame(
        [(1, 1, "lin-a_0")],
        "content_key LONG, holder_id LONG, _batch_id STRING"
    ).write.partitionBy("_batch_id").parquet(idx)
    try:
        fold_index_bucketed(spark, idx, tbl)
        spark.createDataFrame(
            [(2, 2, 9, "lin-a_1")],
            "content_key LONG, holder_id LONG, extra LONG, "
            "_batch_id STRING"
        ).write.mode("append").partitionBy("_batch_id").parquet(idx)
        with pytest.raises(ValueError, match="schema drift"):
            fold_index_bucketed(spark, idx, tbl)
        # refusal left the base untouched and the delta dir in place
        assert spark.table(tbl).count() == 1
        assert [e for e in os.listdir(idx) if e.startswith("_batch_id=")]
    finally:
        for t in (tbl, f"{tbl}__folding", f"{tbl}__prefold"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_empty_string_base_table_refused(spark, tmp_path):
    """'' is ambiguous between 'no base on purpose' and 'config key
    came through empty'; on the reconcile side the mistaken reading
    is permanent data loss, so both entry points refuse it."""
    import pytest

    from twitter_analysis_spark.streaming.ingest import (
        reconcile_replace_by_batch, streaming_ingest_dedup)

    with pytest.raises(ValueError, match="ambiguous"):
        streaming_ingest_dedup(spark, str(tmp_path / "d"),
                               str(tmp_path / "c"), str(tmp_path / "i"),
                               base_index_table="")
    with pytest.raises(ValueError, match="ambiguous"):
        reconcile_replace_by_batch(str(tmp_path / "c"),
                                   str(tmp_path / "i"),
                                   base_index_table="")


def test_fold_refuses_heterogeneous_fresh_partitions(spark, tmp_path):
    """A FIRST fold over deltas that disagree among themselves must
    refuse — the merged-footer view alone would mint a NULL-padded
    base whose NULLed keys never match a probe (silent re-ingest of
    every doc those rows covered)."""
    import pytest

    from twitter_analysis_spark.sources.maintenance import (
        fold_index_bucketed)

    idx = str(tmp_path / "idx")
    spark.createDataFrame(
        [(1, 1, "lin-a_0")],
        "content_key LONG, holder_id LONG, _batch_id STRING"
    ).write.partitionBy("_batch_id").parquet(idx)
    spark.createDataFrame(
        [(2, 2, 9, "lin-a_1")],
        "content_key LONG, holder_id LONG, extra LONG, _batch_id STRING"
    ).write.mode("append").partitionBy("_batch_id").parquet(idx)
    with pytest.raises(ValueError, match="disagree on file schema"):
        fold_index_bucketed(spark, idx, "never_made_het_tbl")
    assert not spark.catalog.tableExists("never_made_het_tbl")


def test_fold_tolerates_empty_torn_partition_dir(spark, tmp_path):
    """A fresh _batch_id dir with no readable parquet (torn write
    remnant) must not wedge the fold: it contributes no rows, its
    dir is deleted, and real partitions fold normally — restoring
    the torn-batch signature for reconcile instead of failing every
    subsequent fold with an opaque infer-schema error."""
    from twitter_analysis_spark.sources.maintenance import (
        fold_index_bucketed)

    idx = str(tmp_path / "idx")
    tbl = "fold_empty_tbl"
    spark.createDataFrame(
        [(1, 1, "lin-a_0")],
        "content_key LONG, holder_id LONG, _batch_id STRING"
    ).write.partitionBy("_batch_id").parquet(idx)
    os.makedirs(os.path.join(idx, "_batch_id=lin-torn_1"))
    try:
        folded = fold_index_bucketed(spark, idx, tbl)
        assert folded == ["lin-a_0", "lin-torn_1"]
        assert spark.table(tbl).count() == 1
        assert not [e for e in os.listdir(idx)
                    if e.startswith("_batch_id=")]
        # all-empty case: only torn remnants present -> no table
        # mutation, dirs still cleaned
        os.makedirs(os.path.join(idx, "_batch_id=lin-torn_2"))
        assert fold_index_bucketed(spark, idx, tbl) == ["lin-torn_2"]
        assert spark.table(tbl).count() == 1
    finally:
        for t in (tbl, f"{tbl}__folding", f"{tbl}__prefold"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_fold_refuses_mixed_generation_files_within_one_partition(
        spark, tmp_path):
    """The pass-5 reproduction: ONE partition dir holding files of
    two writer generations (a torn commit straddling a schema
    change). Any merged-footer view unions to the old schema when
    the new generation DROPPED a column, NULL-padding the key
    straight into the base — so verification is per file, and this
    dir must refuse."""
    import glob
    import shutil

    import pytest

    from twitter_analysis_spark.sources.maintenance import (
        fold_index_bucketed)

    idx = str(tmp_path / "idx")
    spark.createDataFrame(
        [(1, 10, "lin-a_0")],
        "content_key LONG, holder_id LONG, _batch_id STRING"
    ).write.partitionBy("_batch_id").parquet(idx)
    # smuggle a dropped-column file into the same partition dir
    stray = str(tmp_path / "stray")
    spark.createDataFrame([(20,)], "holder_id LONG") \
        .coalesce(1).write.parquet(stray)
    part = glob.glob(os.path.join(stray, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(idx, "_batch_id=lin-a_0",
                                   "part-torn-gen2.parquet"))
    with pytest.raises(ValueError, match="disagree on file schema"):
        fold_index_bucketed(spark, idx, "never_made_mixed_tbl")
    assert not spark.catalog.tableExists("never_made_mixed_tbl")


def test_fold_temporary_remnant_and_foreign_files(spark, tmp_path):
    """Pass-6 pins: (a) a partition holding only a _temporary task
    dir from a crashed write is a torn EMPTY remnant — folded away,
    never wedging the merge (Spark's own reads ignore hidden paths,
    so counting their part files as data would make the merged read
    see zero files and fail forever); (b) a VISIBLE non-parquet file
    refuses loudly — treating that dir as empty would rmtree real
    data."""
    import pytest

    from twitter_analysis_spark.sources.maintenance import (
        fold_index_bucketed)

    idx = str(tmp_path / "idx")
    tbl = "fold_remnant_tbl"
    spark.createDataFrame(
        [(1, 1, "lin-a_0")],
        "content_key LONG, holder_id LONG, _batch_id STRING"
    ).write.partitionBy("_batch_id").parquet(idx)
    # (a) torn write: only an uncommitted task file under _temporary
    tmpdir = os.path.join(idx, "_batch_id=lin-torn_1",
                          "_temporary", "0", "task_0")
    os.makedirs(tmpdir)
    with open(os.path.join(tmpdir, "part-00000.parquet"), "w") as f:
        f.write("not really parquet")
    try:
        folded = fold_index_bucketed(spark, idx, tbl)
        assert folded == ["lin-a_0", "lin-torn_1"]
        assert spark.table(tbl).count() == 1
        # (b) foreign visible file: refuse, delete nothing
        foreign_dir = os.path.join(idx, "_batch_id=lin-x_2")
        os.makedirs(foreign_dir)
        with open(os.path.join(foreign_dir, "data.csv"), "w") as f:
            f.write("a,b\n1,2\n")
        with pytest.raises(ValueError, match="non-parquet visible"):
            fold_index_bucketed(spark, idx, tbl)
        assert os.path.exists(os.path.join(foreign_dir, "data.csv"))
        os.remove(os.path.join(foreign_dir, "data.csv"))
        os.rmdir(foreign_dir)
        # (c) the stray census covers STALE tokens too: a leftover
        # dir for an already-folded token (fresh = empty) holding a
        # foreign file must refuse, not be swept by the cleanup pass
        stale_dir = os.path.join(idx, "_batch_id=lin-a_0")
        os.makedirs(stale_dir, exist_ok=True)
        with open(os.path.join(stale_dir, "data.csv"), "w") as f:
            f.write("a,b\n")
        with pytest.raises(ValueError, match="non-parquet visible"):
            fold_index_bucketed(spark, idx, tbl)
        assert os.path.exists(os.path.join(stale_dir, "data.csv"))
    finally:
        for t in (tbl, f"{tbl}__folding", f"{tbl}__prefold"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_rollup_ingest_writes_one_file_per_touched_date(spark, tmp_path):
    """SCALE.md hazard 18: a date-partitioned append whose input
    partitioning is uncorrelated with event_date writes tasks x dates
    files per batch (measured pre-guard at sf0.1: 32 x 30 = 960 per
    sink per drain). With the rebalance-by-date guard, one micro-batch
    touching k dates leaves each sink with ~one file per date — pin a
    small constant bound per partition dir, not an exact 1, so an AQE
    skew-split of a genuinely hot date stays legal."""
    import json

    from twitter_analysis_spark.streaming.rollup_ingest import (
        streaming_rollup_ingest)

    drop = tmp_path / "ff_drop"
    drop.mkdir()
    lake = str(tmp_path / "ff_lake")
    index = str(tmp_path / "ff_index")
    # one batch spanning 6 dates x 40 events, written from several
    # input slices so the pre-guard writer would fan out per task
    with open(drop / "d1.json", "w") as f:
        for i in range(240):
            f.write(json.dumps({
                "event_id": i, "ts": f"2024-03-{(i % 6) + 1:02d} 10:00:00",
                "user_id": i % 7, "event_type": "click",
                "value": 1.0}) + "\n")
    streaming_rollup_ingest(
        spark, str(drop), lake, index, str(tmp_path / "ff_rollup"),
        grain="hour", checkpoint=str(tmp_path / "ff_ckpt"))
    for sink in (lake, index):
        parts = [d for d in os.listdir(sink) if d.startswith("event_date=")]
        assert len(parts) == 6, sink
        for d in parts:
            n = len(_parquet_files(os.path.join(sink, d)))
            assert 1 <= n <= 2, (sink, d, n)
    assert spark.read.parquet(lake).count() == 240
