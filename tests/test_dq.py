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
