"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC-shaped pipeline over sf0.001.
``queries()``   — one entry per implemented operator family (SURVEY §2),
each mirrored by a DuckDB oracle in ``oracle_sql()``; entries without an
oracle (the end-to-end CDC replay) get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from credix_data_pipeline_spark.plans.cdc_replay import CDC_QUERIES
from credix_data_pipeline_spark.plans.corpus_ops import CORPUS_QUERIES
from credix_data_pipeline_spark.plans.monitoring import MONITOR_QUERIES
from credix_data_pipeline_spark.plans.reference_queries import QUERIES
from credix_data_pipeline_spark.plans.temporal_ops import TEMPORAL_QUERIES

ALL_QUERIES = {
    **QUERIES,
    **CORPUS_QUERIES,
    **MONITOR_QUERIES,
    **CDC_QUERIES,
    **TEMPORAL_QUERIES,
}

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LWW dedup (W2) + gold-style rollup over the events change
    feed at sf0.001 — the reference's medallion flow as one declarative plan."""
    fn, _ = QUERIES["user_activity_summary"]
    return fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items()}
