"""SQL-API parity + catalog introspection (S8).

The engine is DataFrame-first, but registered views make every table
reachable from ``spark.sql`` — a user can run the catalog's oracle SQL
(minus DuckDB-isms) directly. Also covers the reference's catalog
introspection surface (list collections, count docs —
DataProcessing.ipynb:cell24-26) via spark.catalog.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_analysis_spark.sources.io import TESTDATA_TABLES, load_tables


def test_views_registered_and_listed(spark, sf_dir):
    load_tables(spark, sf_dir)
    listed = {t.name for t in spark.catalog.listTables()}
    assert set(TESTDATA_TABLES) <= listed          # S8: list collections
    # S8: count docs
    assert spark.table("documents").count() == \
        spark.sql("SELECT count(*) AS n FROM documents").first()["n"]


def test_sql_equals_dataframe_plan(spark, sf_dir):
    """The same flagship pipeline through spark.sql returns identical
    rows to the DataFrame build (one Catalyst underneath)."""
    from twitter_analysis_spark import catalog

    load_tables(spark, sf_dir)
    sql_rows = spark.sql("""
        SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_name
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        WHERE e.event_type = 'click' AND e.value > 5.0
        ORDER BY e.value DESC, date_trunc('second', e.ts) DESC, e.event_id
        LIMIT 50
    """).collect()
    df_rows = (
        catalog.QUERIES["flagship_search"](spark, sf_dir)
        .select("event_id", "user_id", "event_type", "value", "c_name")
        .collect()
    )
    assert {r["event_id"] for r in sql_rows} == {r["event_id"] for r in df_rows}
