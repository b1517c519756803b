"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC-shaped pipeline over sf0.001.
``queries()``   — one entry per implemented operator family (SURVEY §2),
each mirrored by a DuckDB oracle in ``oracle_sql()``; entries without an
oracle (the end-to-end CDC replay) get the driver's rows-only check.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from credix_data_pipeline_spark.plans.cdc_replay import CDC_QUERIES
from credix_data_pipeline_spark.plans.corpus_ops import CORPUS_QUERIES
from credix_data_pipeline_spark.plans.monitoring import MONITOR_QUERIES
from credix_data_pipeline_spark.plans.reference_queries import QUERIES

ALL_QUERIES = {**QUERIES, **CORPUS_QUERIES, **MONITOR_QUERIES, **CDC_QUERIES}

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LWW dedup (W2) + gold-style rollup over the events change
    feed at sf0.001 — the reference's medallion flow as one declarative plan."""
    fn, _ = QUERIES["user_activity_summary"]
    return fn(spark, SF0001)


def _cdc_transcripts_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript-feed engine demo: deterministic feed → streaming replay
    with pandas-UDF text normalization, dedup, tombstones, fencing → gold
    conversation summary of the final lakehouse state.  The feed is engine-
    generated (not a driver table) so this entry is rows-only; the oracle-
    checked replay is ``cdc_replay_e2e`` (plans/cdc_replay.py), and value
    correctness here is pinned by tests/ against the pure-Python LWW
    oracle."""
    from credix_data_pipeline_spark.functions.normalize import with_normalized_text
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.apply import read_clean
    from credix_data_pipeline_spark.plans.gold import conversation_summary
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
    from credix_data_pipeline_spark.streaming import runner

    spec = FeedSpec(
        n_events=4_000,
        n_conversations=50,
        turns_per_conversation=8,
        delete_pct=5,
        duplicate_pct=3,
        shuffle_window=32,
        events_per_chunk=1_000,
        evolution_frac=0.5,
    )
    work = os.path.join(tempfile.gettempdir(), "cdc_transcripts_e2e")
    shutil.rmtree(work, ignore_errors=True)
    feed, table = os.path.join(work, "feed"), os.path.join(work, "transcripts")
    write_feed(spark, feed, spec)
    runner.replay(
        spark, feed, table,
        chunks_per_batch=2, num_buckets=8,
        transform=with_normalized_text, collect_stats=False,
    )
    return conversation_summary(read_clean(LakeTable.load(spark, table))).orderBy(
        "conv_id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: fn for name, (fn, _sql) in ALL_QUERIES.items()
    }
    out["cdc_transcripts_e2e"] = _cdc_transcripts_e2e
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items()}
