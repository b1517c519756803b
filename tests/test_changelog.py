"""Snapshot-diff changelog scan (Iceberg changelog / Delta CDF analogue).

Contract: ``read_changes(table, a, b)`` emits the NET row-image changes
between two snapshots — inserts/deletes/update pairs — identically for CoW
and MoR tables, aligned to the to-snapshot schema, and never reads a bucket
whose file list did not change."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.operators.changelog import read_changes
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _table(spark, path, merge_mode="cow", num_buckets=8):
    return LakeTable.create(
        spark, path, target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=num_buckets,
        bucket_by=["conv_id"], merge_mode=merge_mode,
    )


def _ev(op, lsn, conv, turn, text):
    role = None if op == "D" else "user"
    txt = None if op == "D" else text
    ts = None if op == "D" else BASE
    return (op, lsn, BASE, conv, turn, role, txt, None, ts)


def _changes(table, a, b):
    df = read_changes(table, a, b)
    return sorted(
        (r.conv_id, r.turn_idx, r.text, r._change_type) for r in df.collect()
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_changelog_insert_update_delete(spark, tmp_path, mode):
    t = _table(spark, str(tmp_path / mode), merge_mode=mode)
    b0 = spark.createDataFrame(
        [_ev("I", 1, "c0", 0, "a"), _ev("I", 2, "c1", 0, "b"),
         _ev("I", 3, "c2", 0, "c")], CHANGE_SCHEMA)
    apply_batch(t, b0, 0, collect_stats=False)
    s0 = t.current().snapshot_id
    b1 = spark.createDataFrame(
        [_ev("U", 4, "c1", 0, "b2"),      # update
         _ev("D", 5, "c2", 0, None),      # delete
         _ev("I", 6, "c3", 0, "d")],      # insert
        CHANGE_SCHEMA)
    apply_batch(t, b1, 1, collect_stats=False)

    assert _changes(t, s0, t.current().snapshot_id) == [
        ("c1", 0, "b", "update_before"),
        ("c1", 0, "b2", "update_after"),
        ("c2", 0, "c", "delete"),
        ("c3", 0, "d", "insert"),
    ]
    # unchanged key never appears
    assert all(c[0] != "c0" for c in _changes(t, s0, None))


def test_changelog_net_semantics_and_empty(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    apply_batch(t, spark.createDataFrame([_ev("I", 1, "c0", 0, "a")],
                                         CHANGE_SCHEMA), 0, collect_stats=False)
    s0 = t.current().snapshot_id
    # insert-then-delete between the endpoints nets out
    apply_batch(t, spark.createDataFrame([_ev("I", 2, "c9", 0, "x")],
                                         CHANGE_SCHEMA), 1, collect_stats=False)
    apply_batch(t, spark.createDataFrame([_ev("D", 3, "c9", 0, None)],
                                         CHANGE_SCHEMA), 2, collect_stats=False)
    assert _changes(t, s0, None) == []
    # same-snapshot diff is empty with the envelope schema intact
    df = read_changes(t, s0, s0)
    assert df.count() == 0 and "_change_type" in df.columns
    # backwards diff refuses
    with pytest.raises(ValueError):
        read_changes(t, t.current().snapshot_id, s0)


def test_changelog_prunes_untouched_buckets(spark, tmp_path, monkeypatch):
    t = _table(spark, str(tmp_path / "t"), num_buckets=16)
    rows0 = [_ev("I", i + 1, f"c{i}", 0, f"t{i}") for i in range(12)]
    apply_batch(t, spark.createDataFrame(rows0, CHANGE_SCHEMA), 0,
                collect_stats=False)
    s0 = t.current().snapshot_id
    apply_batch(t, spark.createDataFrame([_ev("U", 100, "c3", 0, "new")],
                                         CHANGE_SCHEMA), 1, collect_stats=False)

    seen: dict[str, list] = {}
    orig = LakeTable.read_snap

    def spy(self, snap, buckets=None, **kw):
        seen.setdefault("buckets", []).append(buckets)
        return orig(self, snap, buckets=buckets, **kw)

    monkeypatch.setattr(LakeTable, "read_snap", spy)
    out = _changes(t, s0, None)
    assert out == [("c3", 0, "new", "update_after"),
                   ("c3", 0, "t3", "update_before")]
    # only the single dirty bucket was read, at both snapshots
    assert all(b is not None and len(b) == 1 for b in seen["buckets"])


def test_changelog_across_schema_evolution(spark, tmp_path):
    """A column added between the endpoints reads as NULL in before-images
    (to-snapshot schema alignment)."""
    t = _table(spark, str(tmp_path / "t"))
    apply_batch(t, spark.createDataFrame([_ev("I", 1, "c0", 0, "a")],
                                         CHANGE_SCHEMA), 0, collect_stats=False)
    s0 = t.current().snapshot_id
    evolved = T.StructType(CHANGE_SCHEMA.fields + [
        T.StructField("tool_meta", T.StringType(), True)])
    b1 = spark.createDataFrame(
        [("U", 2, BASE, "c0", 0, "user", "a2", None, BASE, "m1")], evolved)
    apply_batch(t, b1, 1, collect_stats=False)

    df = read_changes(t, s0, None)
    rows = {r._change_type: r for r in df.collect()}
    assert set(rows) == {"update_before", "update_after"}
    assert rows["update_before"].tool_meta is None
    assert rows["update_after"].tool_meta == "m1"
    assert "_deleted" not in df.columns
