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
