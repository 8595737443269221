"""Every catalog query with an oracle must match DuckDB exactly at sf0.001.

This mirrors the driver's t2 gate (sf0.01) so drift is caught in-repo.
Queries registered without an oracle get a smoke run (must return a
DataFrame; count must not raise).
"""

from __future__ import annotations

import pytest

from dbt_foundation_spark.queries import all_oracles, all_queries
from tests.oracle import compare, duckdb_connect

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        compare(df, con, ORACLES[name], name=name)
    else:
        assert df.count() >= 0
