"""Every queries() entry matches its DuckDB oracle at sf0.001 (fast local
replica of the driver's sf0.01 gate)."""

from __future__ import annotations

import pytest

from credix_data_pipeline_spark.plans.reference_queries import QUERIES
from tests.duck_compare import compare, duckdb_conn

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duckdb_conn(SF_DIR)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    fn, sql = QUERIES[name]
    problems = compare(fn(spark, SF_DIR), con, sql, name)
    assert not problems, "\n".join(problems)
