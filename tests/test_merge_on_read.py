"""Merge-on-read mode (the Iceberg CoW-vs-MoR axis, selected per table).

MoR appends each batch's deduped winners as delta rows — O(batch) ingest
even when updates scatter across every bucket — and defers cross-batch LWW
to read (`read_current`) / compaction.  The contract: a MoR replay of any
feed must produce EXACTLY the same clean state as the CoW replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import (
    apply_batch,
    last_applied_batch_id,
    read_clean,
)
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=5_000,
    n_conversations=60,
    turns_per_conversation=8,
    delete_pct=8,
    duplicate_pct=5,
    shuffle_window=48,
    events_per_chunk=1_000,
    evolution_frac=0.5,
)


def _rows(table):
    df = read_clean(table)
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_mor_replay_equals_cow_replay(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    runner.replay(spark, feed, cow, chunks_per_batch=2, num_buckets=8,
                  collect_stats=False)
    runner.replay(spark, feed, mor, chunks_per_batch=2, num_buckets=8,
                  collect_stats=False, merge_mode="mor")
    tc, tm = LakeTable.load(spark, cow), LakeTable.load(spark, mor)
    assert tm.current().merge_mode == "mor"
    # byte-equal clean state through deletes, duplicates, reorders, and
    # in-flight schema evolution
    assert _rows(tc) == _rows(tm)
    # MoR ingest commits are appends: no bucket's file set ever shrank
    ops = [s.summary.get("operation") for s in tm.history()]
    assert set(ops) == {"create", "append"} or "add-columns" in ops
    # physical rows exceed logical rows (delta versions retained)
    assert tm.read().count() > read_clean(tm).count()


def test_mor_exactly_once_fence(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, FeedSpec(n_events=1_000, n_conversations=20,
                                     turns_per_conversation=8,
                                     events_per_chunk=500))
    mor = str(tmp_path / "mor")
    runner.replay(spark, feed, mor, chunks_per_batch=1, num_buckets=4,
                  collect_stats=False, merge_mode="mor")
    table = LakeTable.load(spark, mor)
    before = _rows(table)
    n_files = sum(len(fl) for fl in table.current().files.values())
    # redeliver an already-applied batch id -> fenced, nothing appended
    from credix_data_pipeline_spark.sources.feed import read_chunks, read_manifest

    man = read_manifest(feed)
    batch = read_chunks(spark, feed, man["chunks"][:1])
    res = apply_batch(table, batch, 0, collect_stats=False)
    assert res.skipped
    assert _rows(table) == before
    assert sum(len(fl) for fl in table.current().files.values()) == n_files
    assert last_applied_batch_id(table) == 1


def test_mor_compact_collapses_versions(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    mor = str(tmp_path / "mor")
    runner.replay(spark, feed, mor, chunks_per_batch=1, num_buckets=8,
                  collect_stats=False, merge_mode="mor")
    table = LakeTable.load(spark, mor)
    before = _rows(table)
    phys_before = table.read().count()

    table.compact()

    # merge_mode survives the compact commit; clean state unchanged
    assert table.current().merge_mode == "mor"
    assert _rows(table) == before
    # exactly one physical version per key remains
    phys_after = table.read().count()
    assert phys_after < phys_before
    dup_keys = (
        table.read().groupBy("conv_id", "turn_idx")
        .agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1).count()
    )
    assert dup_keys == 0
    # incremental ingest continues after compaction (fence intact)
    assert last_applied_batch_id(table) is not None


def test_mor_expire_tombstones_cannot_resurrect(spark, tmp_path):
    """Tombstone expiry on MoR collapses delta versions first — dropping a
    tombstone must never expose the lower-LSN pre-delete version."""
    from datetime import datetime, timezone

    from credix_data_pipeline_spark.operators.apply import expire_tombstones
    from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for

    table = LakeTable.create(
        spark, str(tmp_path / "t"), target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
        merge_mode="mor",
    )
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    # batch 0: insert (lsn 1); batch 1: delete (lsn 2)
    ins = spark.createDataFrame(
        [("I", 1, base, "c0", 0, "user", "hello", None, base)], CHANGE_SCHEMA)
    dele = spark.createDataFrame(
        [("D", 2, base, "c0", 0, None, None, None, None)], CHANGE_SCHEMA)
    apply_batch(table, ins, 0, collect_stats=False)
    apply_batch(table, dele, 1, collect_stats=False)
    assert read_clean(table).count() == 0

    expire_tombstones(table, horizon_lsn=10)
    # the pre-delete version must NOT come back, and the tombstone is gone
    assert read_clean(table).count() == 0
    assert table.read().count() == 0


def test_mor_read_keys_returns_current_versions(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, FeedSpec(n_events=2_000, n_conversations=20,
                                     turns_per_conversation=8,
                                     duplicate_pct=5, events_per_chunk=500))
    mor = str(tmp_path / "mor")
    runner.replay(spark, feed, mor, chunks_per_batch=1, num_buckets=4,
                  collect_stats=False, merge_mode="mor")
    table = LakeTable.load(spark, mor)
    conv = read_clean(table).select("conv_id").first()["conv_id"]
    got = table.read_keys([conv])
    # exactly one version per key, matching the collapsed clean read
    per_key = got.groupBy("conv_id", "turn_idx").count().filter("count > 1")
    assert per_key.count() == 0
    want = sorted(
        (r["turn_idx"], r["text"]) for r in read_clean(table)
        .filter(F.col("conv_id") == conv).collect()
    )
    have = sorted(
        (r["turn_idx"], r["text"]) for r in got
        .filter(~F.coalesce(F.col("_deleted"), F.lit(False))).collect()
    )
    assert have == want
