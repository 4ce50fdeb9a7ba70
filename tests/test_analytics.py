"""Event-analytics semantics on planted scenarios: funnel step
ordering, cohort week arithmetic, SCD2 interval chaining."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from twitter_analysis_spark import catalog


def _events(spark, rows, tmp_path, name):
    """(event_id, ts, user_id, event_type, value) -> sf_dir fixture."""
    df = spark.createDataFrame(
        [(i, datetime.fromisoformat(ts) if ts else None, u, et, float(v))
         for i, (ts, u, et, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double")
    sf = tmp_path / name
    df.write.mode("overwrite").parquet(str(sf / "events.parquet"))
    return str(sf)


def test_funnel_step_order_enforced(spark, tmp_path):
    rows = [
        # user 1: full ordered funnel
        ("2024-01-01 10:00:00", 1, "signup", 0),
        ("2024-01-01 11:00:00", 1, "click", 0),
        ("2024-01-01 12:00:00", 1, "purchase", 0),
        # user 2: click BEFORE signup — step 2 must not count
        ("2024-01-02 09:00:00", 2, "click", 0),
        ("2024-01-02 10:00:00", 2, "signup", 0),
        # user 3: purchase before click — stops at step 2
        ("2024-01-03 08:00:00", 3, "signup", 0),
        ("2024-01-03 08:30:00", 3, "purchase", 0),
        ("2024-01-03 09:00:00", 3, "click", 0),
        # user 4: never signed up — not in the funnel at all
        ("2024-01-04 10:00:00", 4, "click", 0),
        ("2024-01-04 11:00:00", 4, "purchase", 0),
        # user 1 tie case: same-second click as signup does NOT count
        # (strict >), but the later one above already did.
    ]
    sf = _events(spark, rows, tmp_path, "funnel")
    got = catalog.QUERIES["funnel_conversion"](spark, sf).collect()[0]
    assert got["n_signup"] == 3          # users 1, 2, 3
    assert got["n_click_after"] == 2     # users 1, 3
    assert got["n_purchase_after"] == 1  # user 1 only
    assert got["purchase_rate"] == 1 / 3


def test_cohort_week_offsets(spark, tmp_path):
    rows = [
        # user 1 first seen Jan 1; active day 0, day 6 (week 0), day 7
        # (week 1), day 20 (week 2)
        ("2024-01-01 10:00:00", 1, "view", 0),
        ("2024-01-07 10:00:00", 1, "view", 0),
        ("2024-01-08 10:00:00", 1, "view", 0),
        ("2024-01-21 10:00:00", 1, "view", 0),
        # user 2 shares the cohort, only ever active in week 0
        ("2024-01-01 12:00:00", 2, "view", 0),
        # user 3: its own cohort on Jan 10
        ("2024-01-10 09:00:00", 3, "view", 0),
        ("2024-01-17 09:00:00", 3, "view", 0),
        # NULL user and NULL ts: excluded by contract — activity
        # requires an identified user and a timestamp (without the
        # explicit filter a NULL user would count toward cohort_size
        # but never n_active under SQL join semantics; pinned here so
        # the Spark path and the oracle stay total together)
        ("2024-01-01 13:00:00", None, "view", 0),
        (None, 1, "view", 0),
    ]
    sf = _events(spark, rows, tmp_path, "cohort")
    got = {(str(r["cohort_date"]), r["week_offset"]):
           (r["n_active"], r["cohort_size"], r["retention"])
           for r in catalog.QUERIES["cohort_retention"](spark, sf).collect()}
    assert got[("2024-01-01", 0)] == (2, 2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 2, 0.5)
    assert got[("2024-01-01", 2)] == (1, 2, 0.5)
    assert got[("2024-01-10", 0)] == (1, 1, 1.0)
    assert got[("2024-01-10", 1)] == (1, 1, 1.0)
    assert len(got) == 5


def test_cohort_week_zero_is_complete(spark, sf_dir):
    # The invariant the r13 rewrite's window trick rests on: a user's
    # cohort_date is one of their own active days, so EVERY cohort has
    # a week-0 row and its n_active equals the cohort size (which the
    # window then lifts across the grid). Checked on real data, not a
    # plant.
    df = catalog.QUERIES["cohort_retention"](spark, sf_dir)
    rows = df.collect()
    week0 = {r["cohort_date"]: r for r in rows if r["week_offset"] == 0}
    cohorts = {r["cohort_date"] for r in rows}
    assert set(week0) == cohorts
    assert all(r["n_active"] == r["cohort_size"]
               for r in week0.values())
    assert all(0 < r["retention"] <= 1.0 for r in rows)


def test_scd2_collapse_and_chaining(spark, tmp_path):
    rows = [
        # user 1: value 5 -> 5 (collapsed) -> 7 -> 7 -> 5 again
        ("2024-01-01 10:00:00", 1, "purchase", 5),
        ("2024-01-02 10:00:00", 1, "purchase", 5),
        ("2024-01-03 10:00:00", 1, "purchase", 7),
        ("2024-01-04 10:00:00", 1, "purchase", 7),
        ("2024-01-05 10:00:00", 1, "purchase", 5),
        # noise: non-purchase events are not part of the change log
        ("2024-01-06 10:00:00", 1, "view", 99),
        # user 2: single version, current from the start
        ("2024-01-01 00:00:00", 2, "purchase", 1),
    ]
    sf = _events(spark, rows, tmp_path, "scd2")
    out = catalog.QUERIES["scd2_intervals"](spark, sf)
    got = sorted(
        (r["user_id"], r["value"], str(r["valid_from"]),
         str(r["valid_to"]), r["is_current"])
        for r in out.collect())
    assert got == [
        (1, 5.0, "2024-01-01 10:00:00", "2024-01-03 10:00:00", False),
        (1, 5.0, "2024-01-05 10:00:00", "None", True),
        (1, 7.0, "2024-01-03 10:00:00", "2024-01-05 10:00:00", False),
        (2, 1.0, "2024-01-01 00:00:00", "None", True),
    ]
    # Intervals per user chain gaplessly: valid_to == next valid_from.
    # (Asserted by construction above; re-check relationally.)
    nxt = out.alias("a").join(
        out.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.valid_to") == F.col("b.valid_from")), "left_anti") \
        .where(F.col("a.valid_to").isNotNull())
    assert nxt.count() == 0


def test_cooccur_pmi_planted(spark, tmp_path):
    import math

    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple banana"),
         (3, "apple cherry"), (4, "durian durian kiwi")],
        "doc_id long, text string")
    docs = docs.selectExpr("doc_id", "text", "'en' AS lang",
                           "'t' AS source", "length(text) AS n_chars")
    sf = tmp_path / "pmi"
    docs.write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    got = {(r["t1"], r["t2"]): (r["n_ab"], r["pmi"])
           for r in catalog.QUERIES["text_cooccur_pmi"](
               spark, str(sf)).collect()}
    # duplicate token within a doc counts once (distinct per doc)
    assert got[("durian", "kiwi")][0] == 1
    assert got[("apple", "banana")][0] == 2
    # hand PMI: n_ab=2, N=4, n_a=3, n_b=2 -> ln(2*4/(3*2))
    assert got[("apple", "banana")][1] == round(math.log(8 / 6), 6)
    # pairs are the i<j upper triangle of the SORTED list: no reversed
    # duplicates
    assert ("banana", "apple") not in got


def test_anomaly_zscore_flags_spike(spark, tmp_path):
    # Quiet days alternate 9/11 (nonzero variance), then a 100-count
    # spike: only the spike is flagged, and only with a full trailing
    # window. A constant series (zero variance) is never flagged.
    rows = []
    for day in range(1, 15):
        n = 100 if day == 14 else (9 if day % 2 else 11)
        for _ in range(n):
            rows.append((f"2024-01-{day:02d} 12:00:00", 1, "click", 0))
    for day in range(1, 15):
        for _ in range(5):
            rows.append((f"2024-01-{day:02d} 12:00:00", 2, "view", 0))
    sf = _events(spark, rows, tmp_path, "anom")
    got = catalog.QUERIES["ts_anomaly_zscore"](spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["event_type"], str(r["d"]), r["n"]) == \
        ("click", "2024-01-14", 100)
    # trailing 7 of days 7..13: four odd days (9), three even (11)
    assert r["mean7"] == (4 * 9 + 3 * 11) / 7
    assert r["zscore"] > 2


def test_anomaly_zero_variance_and_short_window_excluded(spark, tmp_path):
    # 8 identical days + spike: the spike's window has zero variance
    # -> excluded (no infinite z). Short history (< 7 prior days) is
    # likewise never flagged.
    rows = []
    for day in range(1, 9):
        for _ in range(10):
            rows.append((f"2024-02-{day:02d} 12:00:00", 1, "click", 0))
    for _ in range(100):
        rows.append(("2024-02-09 12:00:00", 1, "click", 0))
    sf = _events(spark, rows, tmp_path, "anom0")
    got = catalog.QUERIES["ts_anomaly_zscore"](spark, sf).collect()
    assert got == []


def test_attribution_multitouch_planted(spark, tmp_path):
    """Planted purchase/click history: linear splits 1/n, first/last
    pick window extremes, second-truncated ties split evenly, clicks
    outside the 12 h horizon and clickless purchases drop."""
    import datetime as dt
    from twitter_analysis_spark import catalog
    from twitter_analysis_spark.sources.io import TESTDATA_TABLES

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: three clicks in window (two tied at the same second),
        # one click 13h before (outside), purchase of value 12.0
        (101, t0 - 13 * h, 1, "click", 0.0),
        (102, t0 - 2 * h, 1, "click", 0.0),
        (103, t0 - 1 * h, 1, "click", 0.0),
        (104, t0 - 1 * h, 1, "click", 0.0),      # tie with 103 (same second)
        (105, t0, 1, "purchase", 12.0),
        # user 2: purchase with no clicks -> unattributed, absent
        (201, t0, 2, "purchase", 5.0),
        # user 3: click AT the purchase second (not strictly before) drops
        (301, t0, 3, "click", 0.0),
        (302, t0, 3, "purchase", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    sf = str(tmp_path / "attr_sf")
    import os
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    got = {(r.model, r.click_id): r.credit for r in
           catalog.QUERIES["attribution_multitouch"](spark, sf).collect()}
    assert got == {
        ("linear", 102): 4.0, ("linear", 103): 4.0, ("linear", 104): 4.0,
        ("first", 102): 12.0,
        ("last", 103): 6.0, ("last", 104): 6.0,    # tied last split
    }


def test_rolling_distinct_users_planted(spark, tmp_path):
    """Hand-checkable 7-day rolling distinct counts: repeat visits
    inside one window count once; windows slide daily; only event days
    emit rows."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    d = dt.datetime
    rows = [
        # user 1 active two days in the same week -> counts once in
        # windows covering both; user 2 once; user 3 far later.
        (1, d(2024, 1, 1, 10), 1, "click", 0.0),
        (2, d(2024, 1, 3, 10), 1, "view", 0.0),
        (3, d(2024, 1, 3, 11), 2, "click", 0.0),
        (4, d(2024, 1, 20, 9), 3, "click", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    sf = str(tmp_path / "roll_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    got = {r.window_end.isoformat(): r.n_users for r in
           catalog.QUERIES["ts_rolling_distinct_users"](spark, sf).collect()}
    assert got == {
        "2024-01-01": 1,          # only user 1 so far
        "2024-01-03": 2,          # users 1 and 2 within [12-28..1-03]
        "2024-01-20": 1,          # user 3; window misses the early days
    }


def test_event_paths_planted(spark, tmp_path):
    """One user, one session of 4 events -> two overlapping trigram
    paths; a 30-minute gap starts a new session so no path crosses it."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    t0 = dt.datetime(2024, 3, 1, 9, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0 + 0 * m, 1, "view", 0.0),
        (2, t0 + 1 * m, 1, "click", 0.0),
        (3, t0 + 2 * m, 1, "view", 0.0),
        (4, t0 + 3 * m, 1, "purchase", 0.0),
        # new session (45 min gap): only 2 events -> no trigram
        (5, t0 + 48 * m, 1, "view", 0.0),
        (6, t0 + 49 * m, 1, "click", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    sf = str(tmp_path / "paths_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    got = {r.path: r.cnt for r in
           catalog.QUERIES["s10_event_paths"](spark, sf).collect()}
    assert got == {"view>click>view": 1, "click>view>purchase": 1}


def test_trend_slope_planted_exact_line(spark, tmp_path):
    """Values on an exact line (value = 2 + 3*day_offset, one event per
    day) recover slope 3e6 micro-units/day exactly; a flat series
    gives slope 0; repartitioning cannot change the answer (integer
    accumulation)."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    d0 = dt.datetime(2024, 2, 1, 12, 0, 0)
    rows = []
    for i in range(10):
        rows.append((i, d0 + dt.timedelta(days=i), 1, "up", 2.0 + 3.0 * i))
        rows.append((100 + i, d0 + dt.timedelta(days=i), 1, "flat", 7.5))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    sf = str(tmp_path / "trend_sf")
    os.makedirs(sf, exist_ok=True)
    df.repartition(13).write.mode("overwrite").parquet(
        os.path.join(sf, "events.parquet"))
    got = {r.event_type: (r.n_days, r.slope_micro_per_day) for r in
           catalog.QUERIES["ts_trend_slope"](spark, sf).collect()}
    assert got == {"up": (10, 3_000_000.0), "flat": (10, 0.0)}


def test_winsorized_mean_planted(spark, tmp_path):
    """An extreme outlier moves the plain mean but is clipped to the
    95th-percentile bound in the winsorized mean."""
    import os
    import datetime as dt
    from twitter_analysis_spark import catalog

    t0 = dt.datetime(2024, 1, 1)
    vals = [float(v) for v in range(1, 20)] + [10_000.0]   # 20 values
    rows = [(i, t0, 1, "t", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    sf = str(tmp_path / "win_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    r = catalog.QUERIES["ts_winsorized_mean"](spark, sf).first()
    assert r.n == 20
    # hi = quantile_cont(0.95): sorted index 0.95*(20-1)=18.05 ->
    # 19 + 0.05*(10000-19) = 518.05; lo = 1 + 0.95*(2-1) = 1.95.
    # Replicating the interpolation in Python floats lands within
    # 1 ulp of the engine (engine-vs-engine identity is the oracle's
    # job); assert to micro-unit tolerance per row here.
    import math
    clipped = [min(max(v, 1.95), 518.05) for v in vals]
    want = sum(math.floor(v * 1e6) for v in clipped)
    assert abs(r.sum_micro - want) <= len(vals)
    # the outlier is tamed: plain mean ~534, winsorized mean ~35.5
    assert r.winsorized_mean_micro < 40_000_000
    assert abs(r.winsorized_mean_micro - r.sum_micro / 20) < 1e-6


def test_changepoint_cusum_planted(spark, tmp_path):
    """A level shift mid-series puts the CUSUM extremum at the last
    pre-shift day; a flat series yields S == 0 everywhere (earliest
    day wins the tie)."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    d0 = dt.datetime(2024, 4, 1)
    rows = []
    # "shift": 5 days at 10.0 then 5 days at 20.0 -> extremum at day 5
    for i in range(10):
        rows.append((i, d0 + dt.timedelta(days=i), 1, "shift",
                     10.0 if i < 5 else 20.0))
    # "flat": constant 7.0
    for i in range(10):
        rows.append((100 + i, d0 + dt.timedelta(days=i), 1, "flat", 7.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    sf = str(tmp_path / "cusum_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    got = {r.event_type: (r.changepoint_day.isoformat(), r.s_scaled) for r in
           catalog.QUERIES["ts_changepoint_cusum"](spark, sf).collect()}
    # shift: T = 150e6, D = 10; S_5 = 5*(10*10e6 - 150e6) = -250e6
    assert got["shift"] == ("2024-04-05", -250_000_000)
    assert got["flat"] == ("2024-04-01", 0)


def test_longest_streak_planted(spark, tmp_path):
    """Consecutive-day islands: 3-day streak beats two 1-day islands;
    multiple events per day collapse; tie picks the earliest streak."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    d = dt.datetime
    rows = [
        # user 1: Jan 1,2,3 (streak 3), then Jan 10 (streak 1)
        (1, d(2024, 1, 1, 9), 1, "v", 0.0), (2, d(2024, 1, 1, 10), 1, "v", 0.0),
        (3, d(2024, 1, 2, 9), 1, "v", 0.0), (4, d(2024, 1, 3, 9), 1, "v", 0.0),
        (5, d(2024, 1, 10, 9), 1, "v", 0.0),
        # user 2: two 2-day streaks -> earliest wins the tie
        (6, d(2024, 2, 1, 9), 2, "v", 0.0), (7, d(2024, 2, 2, 9), 2, "v", 0.0),
        (8, d(2024, 2, 10, 9), 2, "v", 0.0), (9, d(2024, 2, 11, 9), 2, "v", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    sf = str(tmp_path / "streak_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    got = {r.user_id: (r.streak_days, r.streak_start.isoformat()) for r in
           catalog.QUERIES["ts_longest_streak"](spark, sf).collect()}
    assert got == {1: (3, "2024-01-01"), 2: (2, "2024-02-01")}


def test_mad_robust_planted(spark, tmp_path):
    """MAD ignores the outlier that wrecks stddev: values 1..9 plus
    1000 -> median 5.5, MAD 2.5."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    t0 = dt.datetime(2024, 1, 1)
    vals = [float(v) for v in range(1, 10)] + [1000.0]
    rows = [(i, t0, 1, "t", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    sf = str(tmp_path / "mad_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    r = catalog.QUERIES["ts_mad_robust"](spark, sf).first()
    assert r.median_value == 5.5
    # deviations sorted: 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5
    assert r.mad == 2.5


def test_abc_classification_planted(spark, tmp_path):
    """Hand-checkable knees: revenues 80, 15, 5 (in cents after the
    floor) land exactly on the 80/95 boundaries -> one part per class
    (boundary rows belong to the better class: cum*100 <= t*80)."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    d = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, 1, 1, 1.0, 0.80, 0.0, 0.0, "N", "O", d),
        (2, 2, 2, 1, 1.0, 0.15, 0.0, 0.0, "N", "O", d),
        (3, 3, 3, 1, 1.0, 0.05, 0.0, 0.0, "N", "O", d),
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_partkey long, "
              "l_linenumber int, l_quantity double, l_extendedprice double, "
              "l_discount double, l_tax double, l_returnflag string, "
              "l_linestatus string, l_shipdate timestamp")
    sf = str(tmp_path / "abc_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "lineitem.parquet"))
    got = {r.abc_class: (r.n_parts, r.revenue_cents, r.share) for r in
           catalog.QUERIES["a18_abc_classification"](spark, sf).collect()}
    assert got == {"A": (1, 80, 0.80), "B": (1, 15, 0.15),
                   "C": (1, 5, 0.05)}


def test_rfm_boundary_scores_low(spark, tmp_path):
    """Five customers with strictly increasing monetary totals land in
    five distinct m_score buckets; a value exactly ON a threshold
    scores into the lower bucket (strict >)."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    d = dt.datetime(2024, 1, 1)
    # one order per customer, totals 10,20,30,40,50 -> m quintile
    # thresholds 18,26,34,42; same date -> r_days identical for all.
    rows = [(i, i, f"P{i}", 10.0 * i, d) for i in range(1, 6)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderpriority string, "
              "o_totalprice double, o_orderdate timestamp")
    sf = str(tmp_path / "rfm_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "orders.parquet"))
    got = {r.m_score: r.n_customers for r in
           catalog.QUERIES["a19_rfm_segments"](spark, sf).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
    all_rows = catalog.QUERIES["a19_rfm_segments"](spark, sf).collect()
    # identical recency/frequency -> every row shares r=5 (0 days
    # behind the max -> best) and f bucket 1 (all on the threshold)
    assert {r.r_score for r in all_rows} == {5}
    assert {r.f_score for r in all_rows} == {1}


def test_gini_extremes(spark, tmp_path):
    """Equal revenues -> Gini ~0 ((n-1)-scaled exact: (n+1) formula
    gives 0 for perfectly equal v); total concentration -> (n-1)/n."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    d = dt.datetime(2024, 1, 1)

    def write_sf(name, prices):
        rows = [(i, 1, i, 1, 1.0, p, 0.0, 0.0, "N", "O", d)
                for i, p in enumerate(prices, start=1)]
        df = spark.createDataFrame(
            rows, "l_orderkey long, l_suppkey long, l_partkey long, "
                  "l_linenumber int, l_quantity double, "
                  "l_extendedprice double, l_discount double, l_tax double, "
                  "l_returnflag string, l_linestatus string, "
                  "l_shipdate timestamp")
        sf = str(tmp_path / name)
        os.makedirs(sf, exist_ok=True)
        df.write.mode("overwrite").parquet(
            os.path.join(sf, "lineitem.parquet"))
        return sf

    equal = catalog.QUERIES["a20_gini_concentration"](
        spark, write_sf("gini_eq", [5.0] * 4)).first()
    assert equal.gini == 0.0
    conc = catalog.QUERIES["a20_gini_concentration"](
        spark, write_sf("gini_cc", [0.01, 0.0, 0.0, 100.0])).first()
    # one part holds ~all revenue of 4 -> Gini near (n-1)/n = 0.75
    assert 0.74 < conc.gini <= 0.75


def test_copurchase_pairs_planted(spark, tmp_path):
    """Pair support counts ORDERS, not line items: a part repeated in
    one order contributes once; pairs never cross orders."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    d = dt.datetime(2024, 1, 1)
    rows = [
        # order 1: parts 10, 20 (20 twice -> still support 1)
        (1, 1, 10, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (1, 1, 20, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (1, 1, 20, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        # order 2: parts 10, 20, 30
        (2, 1, 10, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (2, 1, 20, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (2, 1, 30, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        # order 3: single item -> no pairs
        (3, 1, 40, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_partkey long, "
              "l_linenumber int, l_quantity double, l_extendedprice double, "
              "l_discount double, l_tax double, l_returnflag string, "
              "l_linestatus string, l_shipdate timestamp")
    sf = str(tmp_path / "basket_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "lineitem.parquet"))
    got = {(r.p1, r.p2): r.support for r in
           catalog.QUERIES["a21_copurchase_pairs"](spark, sf).collect()}
    assert got == {(10, 20): 2, (10, 30): 1, (20, 30): 1}


def test_ship_latency_percentiles_planted(spark, tmp_path):
    """Latency gaps 1..4 days for one priority: exact interpolated
    percentiles; orders without matching lines are absent."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    d = dt.datetime
    orders = [(k, 1, "1-URGENT", 10.0, d(2024, 1, 1)) for k in (1, 2, 3, 4)]
    orders.append((9, 1, "5-LOW", 10.0, d(2024, 1, 1)))   # no lines
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderpriority string, "
                "o_totalprice double, o_orderdate timestamp")
    lines = [(k, 1, k, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
              d(2024, 1, 1 + k)) for k in (1, 2, 3, 4)]
    ldf = spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long, l_partkey long, "
               "l_linenumber int, l_quantity double, l_extendedprice double, "
               "l_discount double, l_tax double, l_returnflag string, "
               "l_linestatus string, l_shipdate timestamp")
    sf = str(tmp_path / "lat_sf")
    os.makedirs(sf, exist_ok=True)
    odf.write.mode("overwrite").parquet(os.path.join(sf, "orders.parquet"))
    ldf.write.mode("overwrite").parquet(os.path.join(sf, "lineitem.parquet"))
    got = {r.o_orderpriority: r for r in
           catalog.QUERIES["t11_ship_latency_percentiles"](
               spark, sf).collect()}
    assert set(got) == {"1-URGENT"}
    r = got["1-URGENT"]
    assert (r.n_lines, r.p50_days, r.max_days) == (4, 2.5, 4)
    assert r.p90_days == 1 + 0.9 * 3   # interpolated over 1..4


def test_a7_approx_within_rank_error_of_exact(spark, sf_dir):
    """The 100 TB swap row (a7_percentiles_approx) now carries the
    a11-style tolerance contract at the driver (round-9: exact group
    counts hash-compared + in-tolerance booleans the oracle asserts
    TRUE). The RAW numeric pin stays here: every approx percentile
    must fall inside the exact ±0.01-quantile band around its target,
    100x slack over percentile_approx(accuracy=10000)'s n/10000
    rank-error guarantee — computed from the same expressions the
    catalog row folds into its booleans."""
    raw = {r["event_type"]: r for r in (
        catalog._t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.expr("percentile_approx(value, 0.5, 10000)").alias("p50"),
             F.expr("percentile_approx(value, 0.95, 10000)").alias("p95"),
             F.expr("percentile(value, 0.49)").alias("p50_lo"),
             F.expr("percentile(value, 0.51)").alias("p50_hi"),
             F.expr("percentile(value, 0.94)").alias("p95_lo"),
             F.expr("percentile(value, 0.96)").alias("p95_hi"))
        .collect())}
    assert len(raw) > 0
    for r in raw.values():
        assert r["p50_lo"] <= r["p50"] <= r["p50_hi"], r
        assert r["p95_lo"] <= r["p95"] <= r["p95_hi"], r

    # and the catalog row itself: exact anchor counts, all booleans
    # TRUE (what the driver hash-compares against the DuckDB oracle)
    rows = catalog.QUERIES["a7_percentiles_approx"](
        spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == set(raw)
    assert all(r["p50_in_tol"] and r["p95_in_tol"] for r in rows), rows
    assert all(r["n_events"] > 0 for r in rows)


def test_ts_robust_approx_tolerance_and_anchors(spark, sf_dir):
    """The round-9 swap row must (a) exercise all three documented
    approx swaps with every tolerance boolean TRUE, and (b) carry
    exact anchors that agree with the exact twins it certifies
    against — the rolling anchors ARE ts_rolling_distinct_users'
    output, the per-type anchors ARE the group counts."""
    rows = catalog.QUERIES["ts_robust_approx"](spark, sf_dir).collect()
    by_measure: dict[str, dict] = {}
    for r in rows:
        by_measure.setdefault(r["measure"], {})[r["grain_key"]] = r
    assert set(by_measure) == {"winsor_mean", "mad",
                               "rolling_distinct_hll"}
    assert all(r["in_tol"] for r in rows), \
        [(r["measure"], r["grain_key"]) for r in rows if not r["in_tol"]]
    assert all(r["n_exact"] > 0 for r in rows)

    counts = {r["event_type"]: r["n"] for r in (
        catalog._t(spark, sf_dir, "events")
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        .collect())}
    for meas in ("winsor_mean", "mad"):
        got = {k: r["n_exact"] for k, r in by_measure[meas].items()}
        assert got == counts, meas

    exact_roll = {str(r["window_end"]): r["n_users"] for r in
                  catalog.QUERIES["ts_rolling_distinct_users"](
                      spark, sf_dir).collect()}
    got_roll = {k: r["n_exact"]
                for k, r in by_measure["rolling_distinct_hll"].items()}
    assert got_roll == exact_roll
