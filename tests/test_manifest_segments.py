"""Manifest segments (Iceberg manifest-file/manifest-list split): commit
metadata is O(dirty buckets) — unchanged buckets' segments are shared
byte-for-byte across snapshots; retention GCs unreferenced segments;
legacy inline manifests still load."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.table import _manifest_name

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("_lsn", T.LongType(), True),
    ]
)


def _mk(spark, path, **kw):
    return LakeTable.create(
        spark, path, SCHEMA, key=["conv_id", "turn_idx"], num_buckets=4, **kw
    )


def _rows(spark, convs, turns=2, lsn0=1):
    data = [
        (f"conv{c:04d}", i, f"text {c} {i}", lsn0 + c * turns + i)
        for c in convs
        for i in range(turns)
    ]
    return spark.createDataFrame(data, SCHEMA)


def _bucket_of(t, conv: str) -> int:
    return (
        t.spark.createDataFrame([(conv,)], "conv_id string")
        .select(t.bucket_expr().alias("b"))
        .collect()[0]["b"]
    )


def _segs(t) -> set[str]:
    return {
        n for n in os.listdir(t.meta_path)
        if n.startswith("seg-") and n.endswith(".json")
    }


def _raw_manifest(t, version) -> dict:
    with open(os.path.join(t.meta_path, _manifest_name(version))) as f:
        return json.load(f)


def test_commit_writes_only_dirty_bucket_segments(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.append(_rows(spark, range(16)))  # all 4 buckets populated
    snap_all = t.current()
    assert len(snap_all.files) == 4
    before = _segs(t)

    # one conversation -> exactly one dirty bucket
    one = t.replace_buckets(
        [_bucket_of(t, "conv0000")], _rows(spark, [0], lsn0=1000)
    )
    after = _segs(t)
    m_prev = _raw_manifest(t, snap_all.version)
    m_new = _raw_manifest(t, one.version)
    changed = {
        b for b in m_new["segments"]
        if m_new["segments"][b] != m_prev["segments"].get(b)
    }
    assert len(changed) == 1  # O(dirty buckets) metadata
    assert len(after - before) == 1  # exactly one new segment file
    # the 3 untouched buckets reference the PARENT's segment names
    untouched = set(m_prev["segments"]) - changed
    assert all(
        m_new["segments"][b] == m_prev["segments"][b] for b in untouched
    )


def test_snapshot_skeleton_carries_no_per_file_state(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.append(_rows(spark, range(8)))
    m = _raw_manifest(t, t.current().version)
    for heavy in ("files", "file_stats", "file_seq", "delete_files"):
        assert heavy not in m
    assert set(m["segments"]) == set(t.current().files)


def test_segmented_manifest_roundtrips_per_file_state(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.append(_rows(spark, range(8)))
    t.append(_rows(spark, range(8, 12), lsn0=100))
    snap = t.current()
    # fresh instance: empty segment cache, reassembles purely from disk
    t2 = LakeTable.load(spark, tmp_table)
    s2 = t2.current()
    assert s2.files == snap.files
    assert s2.file_stats == snap.file_stats
    assert s2.file_seq == snap.file_seq
    assert s2.delete_files == snap.delete_files
    assert snap.file_stats  # _lsn stats survived segmentation
    assert set(snap.file_seq) == set(snap.all_files())


def test_legacy_inline_manifest_still_loads(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.append(_rows(spark, range(8)))
    snap = t.current()
    # rewrite the current manifest in the pre-segment inline layout
    m = _raw_manifest(t, snap.version)
    del m["segments"]
    m["files"] = snap.files
    m["file_stats"] = snap.file_stats
    m["file_seq"] = snap.file_seq
    m["delete_files"] = snap.delete_files
    p = os.path.join(t.meta_path, _manifest_name(snap.version))
    with open(p, "w") as f:
        json.dump(m, f)
    s2 = LakeTable.load(spark, tmp_table).current()
    assert s2.files == snap.files
    assert s2.file_stats == snap.file_stats
    assert s2.file_seq == snap.file_seq


def test_expire_gcs_unreferenced_segments(spark, tmp_table):
    t = _mk(spark, tmp_table)
    b0 = None
    for i in range(6):  # churn one bucket -> one obsolete segment per round
        t.append(_rows(spark, range(8), lsn0=1 + 100 * i))
        if b0 is None:
            b0 = _bucket_of(t, "conv0000")
        t.replace_buckets([b0], _rows(spark, [0], lsn0=50 + 100 * i))
    res = t.expire_snapshots(keep_last=2, orphan_grace_sec=0.0)
    assert res["segments_deleted"] > 0
    # every surviving segment is referenced by a retained manifest
    referenced: set[str] = set()
    for name in os.listdir(t.meta_path):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(t.meta_path, name)) as f:
                referenced.update(json.load(f)["segments"].values())
    assert _segs(t) == referenced
    # retained history still fully readable from disk
    t2 = LakeTable.load(spark, tmp_table)
    for s in t2.history():
        assert t2.read(snapshot_id=s.snapshot_id).count() >= 0


def test_expire_keeps_segments_of_tagged_and_staged_snapshots(
    spark, tmp_table
):
    t = _mk(spark, tmp_table)
    t.append(_rows(spark, range(8)))
    pinned = t.current()
    t.tag("audit", pinned.snapshot_id)
    b0 = _bucket_of(t, "conv0000")
    for i in range(6):
        t.replace_buckets([b0], _rows(spark, [0], lsn0=100 + i))
    staged = t.replace_buckets(
        [b0], _rows(spark, [0], lsn0=999), staged=True
    )
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    segs = _segs(t)
    for v, snap in (("tagged", pinned), ("staged", staged)):
        m = _raw_manifest(t, snap.version) if v == "tagged" else None
        if m is None:
            with open(
                os.path.join(t.meta_path, f"staged-{_manifest_name(staged.version)}")
            ) as f:
                m = json.load(f)
        assert set(m["segments"].values()) <= segs, v
    # the pinned snapshot still reads
    assert t.read(snapshot_id=pinned.snapshot_id).count() == 16


def test_unreferenced_segment_respects_orphan_grace(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.append(_rows(spark, range(4)))
    fresh = os.path.join(t.meta_path, "seg-deadbeefdeadbeefdeadbeef.json")
    with open(fresh, "w") as f:
        json.dump({"files": [], "file_stats": {}, "file_seq": {},
                   "delete_files": []}, f)
    t.expire_snapshots(keep_last=5, orphan_grace_sec=3600.0)
    assert os.path.exists(fresh)  # in-flight commit residue: kept
    old = time.time() - 7200
    os.utime(fresh, (old, old))
    res = t.expire_snapshots(keep_last=5, orphan_grace_sec=3600.0)
    assert not os.path.exists(fresh)
    assert res["segments_deleted"] == 1
