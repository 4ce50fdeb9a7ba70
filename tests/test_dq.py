"""Data-quality constraint report: planted violations are counted
exactly, clean tables report zero."""

from __future__ import annotations

from datetime import date

from twitter_analysis_spark import catalog


def _write(df, path):
    df.write.mode("overwrite").parquet(str(path))


def test_dq_report_counts_planted_violations(spark, tmp_path):
    li = spark.createDataFrame(
        [
            # (orderkey, linenumber, quantity, extendedprice, shipdate)
            (1, 1, 10.0, 100.0, date(2024, 1, 1)),   # clean
            (1, 2, 0.0, 50.0, date(2024, 1, 2)),     # qty out of range
            (2, 1, 99.0, -5.0, None),  # qty + price + null shipdate
            (2, 1, 7.0, 70.0, date(2024, 1, 3)),     # duplicate key
        ],
        "l_orderkey long, l_linenumber long, l_quantity double, "
        "l_extendedprice double, l_shipdate date")
    orders = spark.createDataFrame(
        [(1, 10, 100.0), (2, 11, 0.0), (3, 999, 50.0)],
        "o_orderkey long, o_custkey long, o_totalprice double")
    cust = spark.createDataFrame(
        [(10,), (11,)], "c_custkey long")
    sf = tmp_path / "dq"
    _write(li, sf / "lineitem.parquet")
    _write(orders, sf / "orders.parquet")
    _write(cust, sf / "customer.parquet")

    got = {(r["table_name"], r["rule"]): (r["n_rows"], r["n_violations"])
           for r in catalog.QUERIES["dq_constraint_report"](
               spark, str(sf)).collect()}
    assert got[("lineitem", "quantity_in_[1,50]")] == (4, 2)
    assert got[("lineitem", "extendedprice_positive")] == (4, 1)
    assert got[("lineitem", "shipdate_not_null")] == (4, 1)
    assert got[("lineitem", "orderkey_linenumber_unique")] == (4, 1)
    assert got[("orders", "totalprice_positive")] == (3, 1)
    assert got[("orders", "custkey_in_customer")] == (3, 1)
    assert len(got) == 6


def test_dq_report_on_driver_tables(spark, sf_dir):
    # The generated tables satisfy the range/null/referential rules —
    # and the report catches the one constraint the generator does NOT
    # enforce: (l_orderkey, l_linenumber) is not a key in this data.
    # A DQ gate that only ever prints zeros proves nothing; this row
    # is the live demonstration.
    got = {(r["table_name"], r["rule"]): r
           for r in catalog.QUERIES["dq_constraint_report"](
               spark, sf_dir).collect()}
    assert len(got) == 6
    dup = got[("lineitem", "orderkey_linenumber_unique")]
    assert dup["n_violations"] > 0
    assert 0 < dup["rate"] < 1
    for key, r in got.items():
        if key != ("lineitem", "orderkey_linenumber_unique"):
            assert r["n_violations"] == 0 and r["rate"] == 0.0, key


def test_column_profile_planted(spark):
    from twitter_analysis_spark.operators.dq import column_profile
    rows = [(1, "a", 10), (2, "a", 20), (3, None, 30), (4, "b", None)]
    df = spark.createDataFrame(rows, ["id", "s", "v"])
    got = {r.column_name: r for r in
           column_profile(df, [("id", True), ("s", False),
                               ("v", True)]).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_nonnull == 4
    assert got["id"].n_distinct == 4 and got["id"].sum_value == 10
    assert (got["id"].min_value, got["id"].max_value) == ("1", "4")
    assert got["s"].n_nonnull == 3 and got["s"].n_distinct == 2
    assert got["s"].sum_value is None
    assert (got["s"].min_value, got["s"].max_value) == ("a", "b")
    assert got["v"].n_nonnull == 3 and got["v"].sum_value == 60
    # numeric min/max computed on the native type, not lexicographic
    assert (got["v"].min_value, got["v"].max_value) == ("10", "30")


def test_column_profile_single_scan_single_expand(spark, sf_dir):
    from twitter_analysis_spark import catalog
    plan = catalog.QUERIES["dq_column_profile"](spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2 \
        and "Expand" in plan
    # exact distincts come from the one Expand, not repeated scans
    assert plan.count("Expand") == 1


def test_table_fingerprint_invariant_and_sensitive(spark):
    from twitter_analysis_spark.operators.dq import table_fingerprint
    rows = [(1, "a"), (2, None), (3, "c")]
    df = spark.createDataFrame(rows, ["id", "s"])
    fp = lambda d: tuple(table_fingerprint(d, ["id", "s"], "t").first())
    base = fp(df)
    assert base[1] == 3
    # invariant under repartitioning / reordering
    assert fp(df.repartition(7)) == base
    assert fp(spark.createDataFrame(list(reversed(rows)), ["id", "s"])) == base
    # sensitive to a single changed cell
    changed = spark.createDataFrame([(1, "a"), (2, None), (3, "X")],
                                    ["id", "s"])
    assert fp(changed) != base
    # NULL is not the string 'null'
    nulled = spark.createDataFrame([(1, "a"), (2, "null"), (3, "c")],
                                   ["id", "s"])
    assert fp(nulled) != base


def test_benford_digit_extraction(spark, tmp_path):
    """Leading digits come from the decimal rendering (power-of-ten
    values stay digit 1; sub-1 values find their first significant
    digit); non-positive values are excluded."""
    import datetime as dt
    import os
    from twitter_analysis_spark import catalog

    t0 = dt.datetime(2024, 1, 1)
    vals = [1000.0, 999.999999, 0.00042, 7.5, 0.0, -3.0, 1.0]
    rows = [(i, t0, 1, "t", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    sf = str(tmp_path / "benford_sf")
    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    got = {r.digit: r.n for r in
           catalog.QUERIES["dq_benford_digits"](spark, sf).collect()}
    assert got == {1: 2, 9: 1, 4: 1, 7: 1}   # 0.0 and -3.0 excluded


def test_table_fingerprint_cross_engine_adversarial(spark, tmp_path):
    """The round-7 driver red showed the fingerprint's oracle breaking
    on ENGINE quirks (hex-string casts, NUL-in-VARCHAR), not on the
    checksum. Pin the cross-engine identity on values chosen to hit
    every such seam at once: unicode, the \\x1f column separator
    INSIDE a value, newlines/quotes/backslashes, empty string vs
    NULL, and long-range integers — Spark's fingerprint and a DuckDB
    recompute from version-stable primitives (Horner strpos fold,
    chr(1) sentinel, VARCHAR output) must agree cell-exactly."""
    import duckdb

    from twitter_analysis_spark.operators.dq import table_fingerprint
    import pyspark.sql.functions as F

    rows = [
        (1, "plain"),
        (2, None),                          # NULL ...
        (3, ""),                            # ... is not empty string
        (4, "uniçødé ☃"),
        (5, "sep\x1finside"),               # separator byte in a VALUE
        (6, "line\nbreak\tand\"quote\\"),
        (-9223372036854775808, "min long"),
        (9223372036854775807, "max long"),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    p = str(tmp_path / "adv.parquet")
    df.coalesce(2).write.mode("overwrite").parquet(p)

    got = (table_fingerprint(spark.read.parquet(p), ["id", "s"], "adv")
           .select("table_name", "n_rows",
                   F.col("fingerprint").cast("string").alias("fp"))
           .first())

    acc = "CAST(0 AS BIGINT)"
    for i in range(1, 16):
        acc = (f"(({acc}) * 16 + "
               f"(strpos('0123456789abcdef', substr(h, {i}, 1)) - 1))")
    want = duckdb.connect().execute(
        f"SELECT count(*) AS n, "
        f"CAST(CAST(coalesce(sum({acc}), 0) AS DECIMAL(38,0)) AS VARCHAR) "
        f"AS fp FROM (SELECT substr(md5(concat_ws(chr(31), "
        f"coalesce(CAST(id AS VARCHAR), chr(1) || 'null'), "
        f"coalesce(CAST(s AS VARCHAR), chr(1) || 'null'))), 1, 15) AS h "
        f"FROM read_parquet('{p}/*.parquet'))").fetchone()
    assert got["n_rows"] == want[0] == len(rows)
    assert got["fp"] == want[1]
