"""Regression tests for the round-2 advisor findings (ADVICE.md r2).

Each test pins one fixed failure mode:
* retention burying the exactly-once fence under maintenance commits
* MoR picking a nondeterministic LWW winner on `_lsn` ties
* JDBC option construction deferring invalid input to load time
* gold incremental refresh silently mixing bucket layouts
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import (
    apply_batch,
    last_applied_batch_id,
    read_clean,
)
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _mk(spark, path, merge_mode="cow"):
    return LakeTable.create(
        spark,
        path,
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
        merge_mode=merge_mode,
    )


def test_expire_snapshots_preserves_fence(spark, tmp_path):
    """>= keep_last maintenance commits after the last merge must not bury
    the batch_id fence (ADVICE r2 medium)."""
    table = _mk(spark, str(tmp_path / "t"))
    apply_batch(
        table,
        _batch(spark, [("I", 1, BASE, "c0", 0, "user", "hi", None, BASE)]),
        0,
        collect_stats=False,
    )
    assert last_applied_batch_id(table) == 0

    # pile maintenance commits past the retention window
    for _ in range(4):
        table.append(
            spark.createDataFrame([], table.current().schema),
            summary={"operation": "warehouse-load"},
        )
        table.compact()

    table.expire_snapshots(keep_last=2, orphan_grace_sec=0.0)

    # the fence survives — both via compact's carry-forward and via the
    # expire-side protection of the newest batch_id-bearing manifest
    assert last_applied_batch_id(table) == 0
    # a redelivered batch is still fenced out
    res = apply_batch(
        table,
        _batch(spark, [("U", 1, BASE, "c0", 0, "user", "dupe", None, BASE)]),
        0,
        collect_stats=False,
    )
    assert res.skipped
    assert read_clean(table).count() == 1


def test_compact_carries_fence_forward(spark, tmp_path):
    table = _mk(spark, str(tmp_path / "t"))
    apply_batch(
        table,
        _batch(spark, [("I", 7, BASE, "c0", 0, "user", "hi", None, BASE)]),
        3,
        collect_stats=False,
    )
    # a warehouse append lands a second file in c0's bucket -> compactable
    extra = spark.createDataFrame(
        [("c0", 1, "user", "more", None, BASE, 8, False)],
        table.current().schema,
    )
    table.append(extra)
    table.compact()
    newest = table.current()
    assert newest.summary.get("operation") == "compact"
    assert int(newest.summary["batch_id"]) == 3
    assert int(newest.summary["lsn_max"]) == 7


def test_mor_lsn_tie_breaks_like_cow(spark, tmp_path):
    """Reused LSN across batches with differing payloads: MoR must pick the
    same (later-batch) winner as CoW (ADVICE r2 low)."""
    rows_b0 = [("I", 5, BASE, "c0", 0, "user", "first", None, BASE)]
    rows_b1 = [("U", 5, BASE, "c0", 0, "user", "second", None, BASE)]
    cow = _mk(spark, str(tmp_path / "cow"), "cow")
    mor = _mk(spark, str(tmp_path / "mor"), "mor")
    for tbl in (cow, mor):
        apply_batch(tbl, _batch(spark, rows_b0), 0, collect_stats=False)
        apply_batch(tbl, _batch(spark, rows_b1), 1, collect_stats=False)
    want = [(r["turn_idx"], r["text"]) for r in read_clean(cow).collect()]
    got = [(r["turn_idx"], r["text"]) for r in read_clean(mor).collect()]
    assert want == got == [(0, "second")]
    # position-delete MoR arbitrates the tie at WRITE time (the stored
    # lsn-5 row loses to the event on the _src comparator and gets
    # position-deleted) — no `_seq` column exists anywhere
    assert "_seq" not in read_clean(mor).columns
    assert "_seq" not in [f.name for f in mor.current().schema.fields]
    # and the winner survives compaction (the rewrite consumes the deletes)
    mor.compact()
    got2 = [(r["turn_idx"], r["text"]) for r in read_clean(mor).collect()]
    assert got2 == [(0, "second")]


def test_jdbc_validation_fails_fast():
    from credix_data_pipeline_spark.sources.jdbc import (
        JdbcWatermarkSource,
        greatest_watermark_query,
        watermark_query,
    )

    with pytest.raises(ValueError, match="lower_bound"):
        JdbcWatermarkSource(
            url="jdbc:postgresql://db/x",
            query="SELECT 1",
            partition_column="id",
        ).options()
    with pytest.raises(ValueError, match="watermark_cols"):
        watermark_query("t", ["a"], "2024-01-01 00:00:00", [])
    with pytest.raises(ValueError, match="nullable_date_cols"):
        greatest_watermark_query("t", ["a"], "2024-01-01 00:00:00", [])


def test_gold_refresh_rejects_bucket_mismatch(spark, tmp_path):
    from credix_data_pipeline_spark.operators.gold_incremental import (
        refresh_conversation_summary,
    )
    from credix_data_pipeline_spark.plans.gold import conversation_summary
    from credix_data_pipeline_spark.schema import TRANSCRIPTS_SCHEMA

    src = LakeTable.create(
        spark,
        str(tmp_path / "src"),
        TRANSCRIPTS_SCHEMA,
        key=["conv_id", "turn_idx"],
        num_buckets=8,
        bucket_by=["conv_id"],
    )
    # pre-existing gold table with a DIFFERENT bucket count
    gold_schema = conversation_summary(
        src.read().filter(F.lit(False))
    ).schema
    LakeTable.create(
        spark,
        str(tmp_path / "gold"),
        gold_schema,
        key=["conv_id"],
        num_buckets=4,
        bucket_by=["conv_id"],
    )
    with pytest.raises(ValueError, match="bucket layout mismatch"):
        refresh_conversation_summary(src, str(tmp_path / "gold"))
