"""Oracle parity gates.

* sf0.001 — fast tolerance-based compare of the reference queries (the
  original local gate).
* sf0.01  — the DRIVER's scale, ALL queries (reference + corpus), with the
  exact-representation compare.  VERDICT r1: two driver hash failures passed
  the sf0.001 gate because rounding ties / type divergence only materialize
  with more rows — this test reproduces the round gate locally.
"""

from __future__ import annotations

import pytest

from credix_data_pipeline_spark.plans.cdc_replay import CDC_QUERIES
from credix_data_pipeline_spark.plans.corpus_ops import CORPUS_QUERIES
from credix_data_pipeline_spark.plans.monitoring import MONITOR_QUERIES
from credix_data_pipeline_spark.plans.reference_queries import QUERIES
from credix_data_pipeline_spark.plans.temporal_ops import TEMPORAL_QUERIES
from tests.duck_compare import compare, compare_strict, duckdb_conn

SF_FAST = "/root/testdata/sf0.001"
SF_DRIVER = "/root/testdata/sf0.01"

ALL_QUERIES = {
    **QUERIES,
    **CORPUS_QUERIES,
    **MONITOR_QUERIES,
    **CDC_QUERIES,
    **TEMPORAL_QUERIES,
}


@pytest.fixture(scope="module")
def con():
    return duckdb_conn(SF_FAST)


@pytest.fixture(scope="module")
def con_driver():
    return duckdb_conn(SF_DRIVER)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    fn, sql = QUERIES[name]
    problems = compare(fn(spark, SF_FAST), con, sql, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle_at_driver_scale(spark, con_driver, name):
    fn, sql = ALL_QUERIES[name]
    problems = compare_strict(fn(spark, SF_DRIVER), con_driver, sql, name)
    assert not problems, "\n".join(problems)
