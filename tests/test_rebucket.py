"""Partition-spec evolution (``LakeTable.rebucket``).

The Iceberg spec-evolution + rewrite_data_files pair, eager variant: a table
that outgrew its bucket count rewrites into a new layout in one atomic
commit.  Pinned invariants:

* row-identical content before/after (CoW and MoR)
* all pruning surfaces follow the new layout (``read_keys``, dirty-bucket
  MERGE on the next applied batch)
* the exactly-once fence survives the rewrite (a re-delivered batch is
  still fenced; the next new batch applies normally)
* time travel to the pre-rebucket snapshot still reads the old layout
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

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


def _mk(spark, path, merge_mode="cow", num_buckets=4):
    return LakeTable.create(
        spark,
        path,
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=num_buckets,
        bucket_by=["conv_id"],
        merge_mode=merge_mode,
    )


def _seed(spark, table, n_convs=20, turns=3):
    rows = [
        ("I", c * 100 + t, BASE, f"c{c}", t, "user", f"text {c}/{t}", None, BASE)
        for c in range(n_convs)
        for t in range(turns)
    ]
    apply_batch(table, _batch(spark, rows), 0, collect_stats=False)


def _sorted_rows(df):
    return [
        tuple(r)
        for r in df.select(
            "conv_id", "turn_idx", "role", "text", "_lsn"
        ).orderBy("conv_id", "turn_idx").collect()
    ]


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_rebucket_preserves_rows_and_prunes(spark, tmp_path, merge_mode):
    table = _mk(spark, str(tmp_path / "t"), merge_mode=merge_mode)
    _seed(spark, table)
    # a second batch so a MoR table really has delta versions to collapse
    apply_batch(
        table,
        _batch(
            spark,
            [("U", 9001, BASE, "c1", 0, "user", "edited", None, BASE)],
        ),
        1,
        collect_stats=False,
    )
    before = _sorted_rows(read_clean(table))
    old_snap = table.current()

    snap = table.rebucket(16)
    assert snap.num_buckets == 16
    assert set(int(b) for b in snap.files) <= set(range(16))
    assert _sorted_rows(read_clean(table)) == before

    # pruning follows the new layout: a key lookup touches exactly the
    # bucket its conv hashes to under N=16
    hit = table.read_keys(["c1"])
    got = {(r["conv_id"], r["turn_idx"], r["text"]) for r in hit.collect()}
    assert ("c1", 0, "edited") in got

    # time travel: the pre-rebucket snapshot still reads under its layout
    # (read_clean applies the MoR LWW collapse for delta-carrying snapshots)
    assert _sorted_rows(read_clean(table, snapshot_id=old_snap.snapshot_id)) == before


def test_rebucket_keeps_fence_and_next_merge(spark, tmp_path):
    table = _mk(spark, str(tmp_path / "t"))
    _seed(spark, table, n_convs=8, turns=2)
    assert last_applied_batch_id(table) == 0

    table.rebucket(8)
    # fence rides the rebucket commit: the already-applied batch is fenced
    assert last_applied_batch_id(table) == 0
    res = apply_batch(
        table,
        _batch(spark, [("I", 1, BASE, "c0", 0, "user", "dup", None, BASE)]),
        0,
        collect_stats=False,
    )
    assert res.skipped

    # the next real batch merges under the new layout (dirty buckets < 8)
    res = apply_batch(
        table,
        _batch(spark, [("U", 5000, BASE, "c3", 1, "user", "new text", None, BASE)]),
        1,
        collect_stats=False,
    )
    assert not res.skipped
    assert res.dirty_buckets and all(0 <= b < 8 for b in res.dirty_buckets)
    got = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in read_clean(table).where("conv_id = 'c3'").collect()
    }
    assert ("c3", 1, "new text") in got


def test_maintenance_rewrites_sort_by_key(spark, tmp_path):
    """compact()/rebucket() lay rows down sorted by the table key within
    each file (Iceberg sort-order-at-rewrite), so parquet row-group min/max
    stats carry disjoint key ranges for key-targeted reads."""
    import os

    import pyarrow.parquet as pq

    # MoR: delta files accumulate per bucket, so compact really rewrites
    table = _mk(spark, str(tmp_path / "t"), num_buckets=2, merge_mode="mor")
    for b in range(3):
        rows = [
            ("I", b * 1000 + c * 10 + t, BASE, f"c{c}", t, "user",
             f"b{b} {c}/{t}", None, BASE)
            for c in range(12)
            for t in range(2)
        ]
        apply_batch(table, _batch(spark, rows), b, collect_stats=False)
    before = _sorted_rows(read_clean(table))
    assert any(len(f) > 1 for f in table.current().files.values())

    table.compact()
    snap = table.current()
    assert _sorted_rows(read_clean(table)) == before
    for b, files in snap.files.items():
        for rel in files:
            t = pq.read_table(
                os.path.join(table.path, rel), columns=["conv_id", "turn_idx"]
            )
            keys = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
            assert keys == sorted(keys), f"bucket {b} file {rel} not key-sorted"

    table.rebucket(4)
    snap = table.current()
    assert _sorted_rows(read_clean(table)) == before
    for b, files in snap.files.items():
        for rel in files:
            t = pq.read_table(
                os.path.join(table.path, rel), columns=["conv_id", "turn_idx"]
            )
            keys = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
            assert keys == sorted(keys), f"bucket {b} file {rel} not key-sorted"


def test_rebucket_validates_and_noops(spark, tmp_path):
    table = _mk(spark, str(tmp_path / "t"))
    _seed(spark, table, n_convs=4, turns=1)
    v0 = table.current().version
    # same spec -> no new commit
    assert table.rebucket(4).version == v0
    with pytest.raises(ValueError):
        table.rebucket(0)
    with pytest.raises(ValueError):
        table.rebucket(8, bucket_by=["no_such_col"])
    # changing bucket columns alone is a real spec change
    snap = table.rebucket(4, bucket_by=["conv_id", "turn_idx"])
    assert snap.bucket_by == ["conv_id", "turn_idx"]
    assert snap.version > v0
