"""Zero-copy shallow clone (Delta SHALLOW CLONE / Iceberg snapshot-ref
analogue): one metadata commit references the source's files by absolute
path; the clone then lives its own life — CoW divergence on write, local
materialization on compact, retention that can never touch source data,
and a carried exactly-once fence so a cloned ingest table RESUMES its feed.

Reference parity: the reference has no clone primitive — dev/test copies
are full-refresh rebuilds (``credix_pipeline/dbt_project`` — every model is
re-materialized).  At 100 TB a rebuild is a cluster-day; a clone is one
manifest write.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=4_000,
    n_conversations=60,
    turns_per_conversation=10,
    delete_pct=6,
    duplicate_pct=4,
    shuffle_window=48,
    events_per_chunk=1_000,
)


def _state(t: LakeTable) -> list[tuple]:
    df = read_clean(t)
    return sorted(
        tuple(r) for r in df.select(sorted(df.columns)).collect()
    )


def _local_data_files(t: LakeTable) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(t.path, "data", "**", "*.parquet"),
                           recursive=True)
    ]


@pytest.fixture()
def source(spark, tmp_path):
    feed, table = str(tmp_path / "feed"), str(tmp_path / "src")
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, table, chunks_per_batch=2, num_buckets=8,
                  collect_stats=False)
    return feed, LakeTable.load(spark, table)


def test_clone_is_zero_copy_and_byte_equal(spark, tmp_path, source):
    _, src = source
    dest = src.clone_to(str(tmp_path / "dev"))

    # no data was copied: the clone's data dir is empty, every manifest
    # entry is an absolute path into the source
    assert _local_data_files(dest) == []
    snap = dest.current()
    assert snap.summary["operation"] == "clone"
    assert all(os.path.isabs(f) for fl in snap.files.values() for f in fl)
    assert snap.version == src.current().version + 1  # seq space above src

    assert _state(dest) == _state(src)
    # schema/key/layout identity
    assert snap.schema == src.current().schema
    assert snap.column_ids == src.current().column_ids
    assert snap.num_buckets == src.current().num_buckets

    # the source snapshot is pinned by a per-clone tag (nonce suffix so a
    # second clone of the same snapshot neither collides nor shares a pin)
    pin_tag = snap.summary["clone_pin_tag"]
    assert pin_tag.startswith(f"clone-{src.current().snapshot_id}-")
    assert src.tags()[pin_tag] == src.current().snapshot_id


def test_clone_diverges_cow_both_directions(spark, tmp_path, source):
    _, src = source
    dest = src.clone_to(str(tmp_path / "dev"))
    before = _state(src)

    schema = src.current().schema
    extra = spark.createDataFrame(
        [("convNEW", 0, "dev", "dev-only row", None, None, 10**9, False)],
        schema,
    )
    dest.append(extra)
    assert len(_state(dest)) == len(before) + 1
    assert _state(src) == before, "writing the clone must not touch source"

    src.append(
        spark.createDataFrame(
            [("convSRC", 0, "src", "src-only row", None, None, 10**9 + 1,
              False)],
            schema,
        )
    )
    assert len(_state(dest)) == len(before) + 1, (
        "writing the source must not leak into the clone"
    )


def test_clone_resumes_feed_from_fence(spark, tmp_path):
    """The blue/green move: clone the ingest table, point the SAME feed at
    the clone — replay resumes from the carried fence, no re-application,
    and the clone converges to the full-replay oracle."""
    import json
    import shutil

    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    manifest = json.load(open(os.path.join(feed, "_feed.json")))
    assert len(manifest["chunks"]) >= 4
    # the half feed is the same data with a truncated chunk list — the
    # "feed as it looked before the tail chunks arrived"
    half_feed = str(tmp_path / "half")
    shutil.copytree(feed, half_feed)
    half = dict(manifest)
    half["chunks"] = manifest["chunks"][: len(manifest["chunks"]) // 2]
    with open(os.path.join(half_feed, "_feed.json"), "w") as f:
        json.dump(half, f)

    src_path = str(tmp_path / "src")
    runner.replay(spark, half_feed, src_path, chunks_per_batch=2,
                  num_buckets=8, collect_stats=False)
    src = LakeTable.load(spark, src_path)
    dest = src.clone_to(str(tmp_path / "green"))

    # full feed against the CLONE: only the tail batches apply
    stats = runner.replay(spark, feed, str(tmp_path / "green"),
                          chunks_per_batch=2, num_buckets=8,
                          collect_stats=False)
    assert stats.batches >= 1

    oracle_path = str(tmp_path / "oracle")
    runner.replay(spark, feed, oracle_path, chunks_per_batch=2,
                  num_buckets=8, collect_stats=False)
    assert _state(LakeTable.load(spark, str(tmp_path / "green"))) == _state(
        LakeTable.load(spark, oracle_path)
    )
    # idempotence: a second replay of the same feed is a no-op
    again = runner.replay(spark, feed, str(tmp_path / "green"),
                          chunks_per_batch=2, num_buckets=8,
                          collect_stats=False)
    assert again.batches == 0


def test_clone_carries_purges_and_seq_rule(spark, tmp_path, source):
    _, src = source
    victim = read_clean(src).select("conv_id").first()[0]
    src.delete_keys([victim])
    dest = src.clone_to(str(tmp_path / "dev"))

    got = read_clean(dest)
    assert got.filter(F.col("conv_id") == victim).count() == 0

    # seq rule across the clone boundary: a re-insert of the purged key
    # INTO THE CLONE is newer than the carried entry and must be visible
    dest.append(
        spark.createDataFrame(
            [(victim, 999, "user", "reborn in clone", None, None, 10**9,
              False)],
            dest.current().schema,
        )
    )
    reborn = read_clean(dest).filter(
        (F.col("conv_id") == victim) & (F.col("turn_idx") == 999)
    )
    assert reborn.count() == 1


def test_clone_mor_compact_materializes_locally(spark, tmp_path):
    feed, table = str(tmp_path / "feed"), str(tmp_path / "src")
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, table, chunks_per_batch=2, num_buckets=8,
                  merge_mode="mor", collect_stats=False)
    src = LakeTable.load(spark, table)
    assert src.current().all_delete_files(), "MoR source has delete files"

    dest = src.clone_to(str(tmp_path / "dev"))
    assert _state(dest) == _state(src)

    dest.compact()
    snap = dest.current()
    # deep-copy on demand: after compaction every reference is local
    assert all(
        not os.path.isabs(f) for fl in snap.files.values() for f in fl
    ), "compact must rewrite into the clone's own root"
    assert not snap.all_delete_files()
    assert _state(dest) == _state(src)


def test_clone_retention_never_touches_source(spark, tmp_path, source):
    _, src = source
    dest = src.clone_to(str(tmp_path / "dev"))
    n_src_files = len(_local_data_files(src))

    # churn the clone so it has local history, then expire aggressively
    dest.compact()
    dest.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert len(_local_data_files(src)) == n_src_files
    assert _state(LakeTable.load(spark, src.path)) == _state(src)

    # and the pin holds on the source side: expiring the source keeps the
    # tagged (cloned-from) snapshot's files
    src.compact()
    src.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    pre_compact_dest = LakeTable.load(spark, str(tmp_path / "dev"))
    assert _state(pre_compact_dest) == _state(src)


def test_clone_as_of_past_state_and_source_ddl_isolation(
    spark, tmp_path, source
):
    _, src = source
    early = src.history()[1]
    dest = src.clone_to(str(tmp_path / "past"),
                        snapshot_id=early.snapshot_id)
    assert dest.read().count() == src.read(
        snapshot_id=early.snapshot_id
    ).count()

    # DDL on the source after the clone does not reach the clone
    src.rename_column("text", "body")
    assert "text" in [f.name for f in dest.current().schema.fields]
    assert _state(dest)  # still readable


def test_clone_rejects_existing_dest_and_double_probe(spark, tmp_path,
                                                      source):
    _, src = source
    dest = str(tmp_path / "dev")
    src.clone_to(dest, pin=False)
    with pytest.raises(FileExistsError):
        src.clone_to(dest, pin=False)
    with pytest.raises(ValueError):
        src.clone_to(str(tmp_path / "x"), snapshot_id=1, as_of_ms=1)


def test_compact_fully_materializes_compacted_source_clone(
    spark, tmp_path, source
):
    """compact() must deep-copy EVERY adopted reference, including
    single-file delete-free buckets.  Regression: a clone of an
    already-compacted source was a permanent compact() no-op, so the
    docstring's 'untag when fully materialized' workflow let source
    retention delete files the clone still referenced."""
    _, src = source
    src.compact()  # one file per bucket: the no-op-hazard layout
    dest = src.clone_to(str(tmp_path / "dev"))
    before = _state(dest)

    dest.compact()
    snap = dest.current()
    assert all(
        not os.path.isabs(f) for fl in snap.files.values() for f in fl
    ), "materialized clone must hold no external references"
    assert _state(dest) == before

    # the documented workflow ('untag when fully materialized') is safe now
    src.untag(dest.history()[0].summary["clone_pin_tag"])
    assert _state(dest) == before


def test_two_clones_of_same_snapshot_pin_independently(
    spark, tmp_path, source
):
    """Regression: the shared tag name clone-<sid> made a second clone of
    the same snapshot raise CommitConflict, and (had it been pre-dropped)
    both clones would have SHARED one pin — deleting clone #1 stripped
    clone #2's retention protection."""
    _, src = source
    d1 = src.clone_to(str(tmp_path / "dev1"))
    d2 = src.clone_to(str(tmp_path / "dev2"))  # raised pre-fix
    t1 = d1.current().summary["clone_pin_tag"]
    t2 = d2.current().summary["clone_pin_tag"]
    assert t1 != t2
    sid = src.current().snapshot_id
    assert src.tags()[t1] == sid and src.tags()[t2] == sid
    # deleting clone #1 releases ONLY its own pin
    src.untag(t1)
    assert t2 in src.tags()
