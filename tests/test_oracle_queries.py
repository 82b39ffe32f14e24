"""Differential tests: every oracle-backed query vs DuckDB at sf0.001
(fast) — the same comparison the driver runs at sf0.01."""

import pytest

from tests.oracle import compare, duckdb_conn
from thrill_spark.plans.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF)
    compare(df, con, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
