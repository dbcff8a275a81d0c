"""Every registered query must match its DuckDB oracle exactly at sf0.001.

This is the local mirror of the driver's CORRECTNESS gate (t2) — if these
pass, the driver's hash compare passes too.
"""

from __future__ import annotations

import pytest

from salesdata_engineering_spark.registry import QUERIES

from .oracle_utils import assert_oracle_match, duckdb_con

ORACLE_QUERIES = [(name, q) for name, q in QUERIES.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name,q", ORACLE_QUERIES, ids=[n for n, _ in ORACLE_QUERIES])
def test_oracle_parity(spark, sf_dir, con, name, q):
    assert_oracle_match(q.fn(spark, sf_dir), con, q.oracle, name)
