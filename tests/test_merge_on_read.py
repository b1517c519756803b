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
    # MoR ingest commits are merge-deltas (append + position deletes): no
    # bucket's data file set ever shrank, no bucket rewrite happened
    ops = set(s.summary.get("operation") for s in tm.history())
    assert "merge" not in ops and "merge-delta" in ops
    # physical rows exceed logical rows (superseded versions stay in the
    # data files; position deletes mask them at read)
    assert tm.read().count() > read_clean(tm).count()
    # position-delete bookkeeping exists for the superseded versions
    assert tm.current().mor_deletes
    assert tm.current().all_delete_files()


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


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_mor_pos_delete_read_shape_and_bookkeeping(spark, tmp_path):
    """Position-delete reads are scan + anti-join — NO key-shuffle LWW
    aggregation (the read-amp fix, VERDICT r3 #2) — and the bookkeeping
    tracks exactly the superseded ordinals."""
    from datetime import datetime, timezone

    from credix_data_pipeline_spark.schema import (
        CHANGE_SCHEMA,
        target_schema_for,
    )

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=4, bucket_by=["conv_id"],
        merge_mode="mor",
    )
    assert t.current().mor_deletes

    def b(rows, bid):
        apply_batch(t, spark.createDataFrame(rows, CHANGE_SCHEMA), bid,
                    collect_stats=False)

    b([("I", i + 1, base, f"c{i}", 0, "user", f"v1-{i}", None, base)
       for i in range(8)], 0)
    b([("U", 100 + i, base, f"c{i}", 0, "user", f"v2-{i}", None, base)
       for i in range(4)], 1)
    b([("U", 200, base, "c0", 0, "user", "v3-0", None, base),
       ("D", 201, base, "c1", 0, None, None, None, None)], 2)

    # clean state: one CURRENT version per key, latest values win
    state = {
        (r.conv_id, r.turn_idx): r.text for r in read_clean(t).collect()
    }
    assert state[("c0", 0)] == "v3-0"
    assert ("c1", 0) not in state
    assert state[("c2", 0)] == "v2-2" and state[("c7", 0)] == "v1-7"
    assert len(state) == 7

    # bookkeeping: batch1 superseded 4 ordinals, batch2 superseded 2 more
    snap = t.current()
    dels = t._delete_rows(snap)
    assert dels.count() == 6
    # every delete coordinate points at a live data file of the snapshot
    files = set(snap.all_files())
    assert all(r["file"] in files for r in dels.collect())

    # the read plan has NO LWW hash-aggregation (anti-join, not shuffle)
    plan = _explain(read_clean(t))
    assert "max_by" not in plan
    assert "LeftAnti" in plan

    # compaction consumes the deletes and preserves the state
    t.compact()
    assert not t.current().all_delete_files()
    state2 = {
        (r.conv_id, r.turn_idx): r.text for r in read_clean(t).collect()
    }
    assert state2 == state
    # post-compaction: exactly one physical row per live key (+0 tombstone
    # for c1? the tombstone row IS retained until expire_tombstones)
    assert t.read().count() == len(state) + 1  # 7 live + 1 tombstone


def test_mor_pos_delete_files_survive_retention(spark, tmp_path):
    """expire_snapshots must treat live position-delete files as
    referenced, not orphans."""
    import os

    from datetime import datetime, timezone

    from credix_data_pipeline_spark.schema import (
        CHANGE_SCHEMA,
        target_schema_for,
    )

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
        merge_mode="mor",
    )
    for bid in range(4):
        apply_batch(
            t,
            spark.createDataFrame(
                [("U", 10 * bid + 1, base, "c0", 0, "user", f"v{bid}",
                  None, base)],
                CHANGE_SCHEMA,
            ),
            bid,
            collect_stats=False,
        )
    dels = t.current().all_delete_files()
    assert dels
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    for f in t.current().all_delete_files():
        assert os.path.exists(os.path.join(t.path, f))
    assert {
        r.text for r in read_clean(t).collect()
    } == {"v3"}


def test_mor_append_replay_equals_cow_replay(spark, tmp_path):
    """merge_mode='mor-append' (write-optimized blind append, LWW at read)
    must produce the same clean state as CoW, never write position deletes,
    and regain the cheap read path after a full compaction."""
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    cow, ma = str(tmp_path / "cow"), str(tmp_path / "ma")
    runner.replay(spark, feed, cow, chunks_per_batch=2, num_buckets=8,
                  collect_stats=False)
    runner.replay(spark, feed, ma, chunks_per_batch=2, num_buckets=8,
                  collect_stats=False, merge_mode="mor-append")
    tc, tm = LakeTable.load(spark, cow), LakeTable.load(spark, ma)
    assert tm.current().merge_mode == "mor"
    assert tm.current().mor_prefer == "append"
    assert not tm.current().mor_deletes  # blind appends broke the invariant
    assert not tm.current().all_delete_files()
    assert "_seq" in [f.name for f in tm.current().schema.fields]
    assert _rows(tc) == _rows(tm)

    # full compaction restores the position-delete invariant: reads switch
    # from the LWW shuffle to the flat scan, same answer
    tm.compact()
    assert tm.current().mor_deletes
    assert _rows(tc) == _rows(tm)
    plan = _explain(read_clean(tm))
    assert "max_by" not in plan


def test_mor_blind_append_clears_invariant_and_merge_falls_back(
    spark, tmp_path
):
    """A warehouse-style blind append on a position-delete table clears the
    invariant; subsequent merges fall back to append+_seq and stay correct;
    compact() restores the invariant."""
    from datetime import datetime, timezone

    from credix_data_pipeline_spark.schema import (
        CHANGE_SCHEMA,
        target_schema_for,
    )

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
        merge_mode="mor",
    )
    apply_batch(
        t,
        spark.createDataFrame(
            [("I", 1, base, "c0", 0, "user", "v1", None, base)],
            CHANGE_SCHEMA,
        ),
        0,
        collect_stats=False,
    )
    assert t.current().mor_deletes

    # blind append introduces a SECOND live version of (c0, 0)
    t.append(
        spark.createDataFrame(
            [("c0", 0, "user", "v2-append", None, base, 5, False)],
            t.current().schema,
        )
    )
    assert not t.current().mor_deletes
    # read falls back to LWW collapse: the lsn-5 append wins
    assert {r.text for r in read_clean(t).collect()} == {"v2-append"}

    # merge falls back to the append+_seq path, still correct
    apply_batch(
        t,
        spark.createDataFrame(
            [("U", 9, base, "c0", 0, "user", "v3", None, base)],
            CHANGE_SCHEMA,
        ),
        1,
        collect_stats=False,
    )
    assert {r.text for r in read_clean(t).collect()} == {"v3"}

    # compaction restores the invariant; merges resume position deletes
    t.compact()
    assert t.current().mor_deletes
    apply_batch(
        t,
        spark.createDataFrame(
            [("U", 12, base, "c0", 0, "user", "v4", None, base)],
            CHANGE_SCHEMA,
        ),
        2,
        collect_stats=False,
    )
    assert {r.text for r in read_clean(t).collect()} == {"v4"}
    assert t.current().all_delete_files()


def test_rollback_restores_mor_invariant_flag(spark, tmp_path):
    """rollback_to must roll the position-delete INVARIANT back with the
    target's files.  Regression: mor_deletes was inherited from the
    CURRENT snapshot, so rolling back from a compacted (invariant-true)
    state to a blind-append-era target took the anti-join read path over
    multi-version files and returned BOTH versions of a key."""
    from datetime import datetime, timezone

    from credix_data_pipeline_spark.schema import (
        CHANGE_SCHEMA,
        target_schema_for,
    )

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
        merge_mode="mor",
    )
    apply_batch(
        t,
        spark.createDataFrame(
            [("I", 1, base, "c0", 0, "user", "v1", None, base)],
            CHANGE_SCHEMA,
        ),
        0,
        collect_stats=False,
    )
    # blind append of a NEWER version of the same key: invariant cleared
    schema = t.current().schema  # payload + _lsn/_deleted
    t.append(
        spark.createDataFrame(
            [("c0", 0, "user", "v2", None, base, 2, False)], schema
        )
    )
    appended = t.current()
    assert not appended.mor_deletes
    # full compaction collapses versions and restores the invariant
    t.compact()
    assert t.current().mor_deletes

    rolled = t.rollback_to(appended.snapshot_id)
    assert rolled.mor_deletes == appended.mor_deletes is False
    rows = read_clean(t).collect()
    assert len(rows) == 1 and rows[0].text == "v2"  # LWW, no duplicates
