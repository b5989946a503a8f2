"""The t2 gate, locally: every registered query with an oracle must
hash-match DuckDB on sf0.01 (the driver's correctness scale factor)."""

from __future__ import annotations

import pytest

from tests.oracle_utils import assert_parity, duckdb_con
from vector_db_spark.queries import ORACLES, QUERIES


@pytest.fixture(scope="module")
def con(sf_correctness):
    c = duckdb_con(sf_correctness)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_correctness, con, name):
    df = QUERIES[name](spark, sf_correctness)
    assert_parity(df, con, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_correctness, name):
    df = QUERIES[name](spark, sf_correctness)
    assert df.count() >= 0
