"""Every catalog query must match its DuckDB oracle at sf0.01 —
the same check the driver's CORRECTNESS gate runs."""

from __future__ import annotations

import pytest

from twitter_analysis_spark import catalog

from parity import compare


@pytest.mark.parametrize("name", sorted(catalog.ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    problems = compare(spark, sf_dir, name, catalog.QUERIES[name],
                       catalog.ORACLES[name])
    assert not problems, "\n".join(problems)


def test_every_query_has_rows(spark, sf_dir):
    """Queries without oracles still must run and return a stable schema."""
    for name, fn in catalog.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()


def test_approx_sketches_error_bounds(spark, sf_dir):
    """HLL cardinality within 5% of exact; t-digest median within the
    interquartile neighborhood of the exact percentile."""
    from twitter_analysis_spark import catalog

    approx = {r["l_returnflag"]: r for r in
              catalog.a11_sketch_detail(spark, sf_dir).collect()}
    exact = {r["l_returnflag"]: r for r in
             catalog.QUERIES["a10_grouped_distinct"](spark, sf_dir).collect()}
    import duckdb
    con = duckdb.connect()
    med = dict(con.execute(
        f"SELECT l_returnflag, quantile_cont(l_quantity, 0.5) "
        f"FROM '{sf_dir}/lineitem.parquet' GROUP BY l_returnflag").fetchall())
    assert set(approx) == set(exact)
    for flag, row in approx.items():
        rel = abs(row["n_supps_approx"] - exact[flag]["n_supps"]) \
            / exact[flag]["n_supps"]
        assert rel <= 0.05, (flag, rel)
        assert abs(row["qty_p50"] - med[flag]) <= 2.0, flag
        assert row["qty_p50"] <= row["qty_p95"], flag
