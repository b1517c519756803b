"""Concurrent writers on one table (VERDICT r3 #7): the optimistic-
concurrency commit must make one loser fail with CommitConflict, never
lose an update, and a retry must converge with the exactly-once fence
intact.

Two scenarios:

* DETERMINISTIC interleave — a maintenance ``compact()`` commits in the
  exact window between a merge's snapshot read and its commit (injected
  through the merge's ``transform`` hook, which runs driver-side mid-
  apply).  The merge MUST lose (its parent version is taken), the
  compaction must survive, and a retried replay must converge byte-equal.
* THREADED stress — a replay thread races a maintenance thread that
  compacts in a loop; both retry on CommitConflict.  The final state must
  equal a single-writer reference replay regardless of interleaving.
"""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.table import CommitConflict
from credix_data_pipeline_spark.operators.apply import (
    last_applied_batch_id,
    read_clean,
)
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=4_000,
    n_conversations=60,
    turns_per_conversation=8,
    delete_pct=6,
    duplicate_pct=3,
    events_per_chunk=500,
)


def _state(tp, spark):
    t = LakeTable.load(spark, tp)
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text)
        for r in read_clean(t)
        .select("conv_id", "turn_idx", "role", "text")
        .collect()
    }


def test_concurrent_writer_mid_merge_loser_conflicts(spark, tmp_path):
    import datetime

    import pytest

    feed, tp, ref = (str(tmp_path / d) for d in ("feed", "t", "ref"))
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, ref, chunks_per_batch=2, num_buckets=4)
    want = _state(ref, spark)

    # first half applies normally
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                  max_batches=2)
    t2 = LakeTable.load(spark, tp)  # the concurrent writer

    hits = {"n": 0}
    ts = datetime.datetime(2025, 1, 1)

    def interloper(df):
        # runs INSIDE apply_batch, after it pinned its base snapshot and
        # before it commits — the exact OCC race window.  Without base-
        # snapshot pinning this row would be SILENTLY LOST (the merge's
        # bucket swap would replace state it never read); with it, the
        # merge must lose the version race instead.
        if hits["n"] == 0:
            hits["n"] += 1
            t2.append(
                spark.createDataFrame(
                    [("conv-interloper", 0, "user", "survive", None, ts,
                      55_000_000, False)],
                    t2.current().schema,
                )
            )
        return df

    fence_before = last_applied_batch_id(t2)
    with pytest.raises(CommitConflict):
        runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                      max_batches=1, transform=interloper)

    # the concurrent append SURVIVED (no lost update), the losing merge
    # left no trace, and the fence still answers as before the race
    t = LakeTable.load(spark, tp)
    assert t.current().summary.get("operation") == "append"
    assert last_applied_batch_id(t) == fence_before

    # retry converges: the lost batch re-reads from the checkpoint (never
    # advanced) and re-applies on top of the interloper's commit
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    got = _state(tp, spark)
    assert got.pop(("conv-interloper", 0)) == ("user", "survive")
    assert got == want


def test_threaded_replay_vs_compact_converges(spark, tmp_path):
    feed, tp, ref = (str(tmp_path / d) for d in ("feed", "t", "ref"))
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, ref, chunks_per_batch=1, num_buckets=4)
    want = _state(ref, spark)

    stop = threading.Event()
    conflicts = {"replay": 0, "compact": 0}
    errors: list[BaseException] = []

    def replay_thread():
        try:
            # retry loop: a lost OCC race re-enters from the checkpoint;
            # the fence makes re-application idempotent
            for _ in range(50):
                try:
                    runner.replay(spark, feed, tp, chunks_per_batch=1,
                                  num_buckets=4)
                    return
                except CommitConflict:
                    conflicts["replay"] += 1
        except BaseException as e:  # pragma: no cover - surface in main
            errors.append(e)
        finally:
            stop.set()

    def compact_thread():
        try:
            while not stop.is_set():
                try:
                    t = LakeTable.load(spark, tp)
                    t.compact()
                except CommitConflict:
                    conflicts["compact"] += 1
                except FileNotFoundError:
                    pass  # table not created yet
        except BaseException as e:  # pragma: no cover
            errors.append(e)

    a = threading.Thread(target=replay_thread)
    b = threading.Thread(target=compact_thread)
    a.start()
    b.start()
    a.join(timeout=600)
    stop.set()
    b.join(timeout=120)
    assert not errors, errors
    assert _state(tp, spark) == want
    # fence survived whatever interleaving happened
    t = LakeTable.load(spark, tp)
    assert last_applied_batch_id(t) is not None
    # keys unique (no lost/duplicated update under any interleaving)
    dup = (
        t.read().groupBy("conv_id", "turn_idx")
        .agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1).count()
    )
    assert dup == 0


def test_two_staged_writers_publish_race(spark, tmp_path):
    """WAP is single-writer by contract (the crash-recovery re-stage uses
    os.replace): the LAST stage owns the staged slot for a version, exactly
    one publish consumes it, and a second publish attempt fails cleanly
    (the version link itself stays race-protected via os.link)."""
    import datetime

    import pytest

    feed, tp = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                  max_batches=2)
    t1 = LakeTable.load(spark, tp)
    t2 = LakeTable.load(spark, tp)
    fence = last_applied_batch_id(t1)
    ts = datetime.datetime(2025, 1, 1)

    def staged_row(t, text):
        cur = t.current()
        df = spark.createDataFrame(
            [("conv-race", 0, "user", text, None, ts, 77_000_000, False)],
            cur.schema,
        )
        dirty = [
            r["_b"]
            for r in df.select(t.bucket_expr().alias("_b")).distinct().collect()
        ]
        return t.replace_buckets(
            dirty, df, summary={"batch_id": fence + 1}, staged=True
        )

    s1 = staged_row(t1, "writer-one")
    s2 = staged_row(t2, "writer-two")
    assert s1.version == s2.version
    # the second stage REPLACED the first in the per-version staged slot
    staged_now = t1.staged_snapshot()
    assert staged_now is not None and staged_now.snapshot_id == s2.snapshot_id

    # writer two publishes and wins; writer one's attempt fails cleanly
    # (slot consumed) and the published table is exactly writer-two's
    t2.publish_staged(s2.version)
    with pytest.raises((CommitConflict, FileNotFoundError)):
        t1.publish_staged(s1.version)
    got = (
        read_clean(LakeTable.load(spark, tp))
        .filter(F.col("conv_id") == "conv-race")
        .collect()
    )
    assert [r["text"] for r in got] == ["writer-two"]
    # writer one's orphaned staged files are collectable, table unharmed
    t1.expire_snapshots(keep_last=5, orphan_grace_sec=0.0)
    assert [r["text"] for r in (
        read_clean(LakeTable.load(spark, tp))
        .filter(F.col("conv_id") == "conv-race").collect()
    )] == ["writer-two"]


def test_occ_retries_self_heal_mid_merge_conflict(spark, tmp_path):
    """Same deterministic mid-merge interloper, but with ``occ_retries=1``
    the losing merge re-reads state + fence and re-merges — ONE replay
    call converges with the interloper's row intact (the Iceberg
    commit-retry loop as a first-class knob)."""
    import datetime

    feed, tp, ref = (str(tmp_path / d) for d in ("feed", "t", "ref"))
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, ref, chunks_per_batch=2, num_buckets=4)
    want = _state(ref, spark)

    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                  max_batches=2)
    t2 = LakeTable.load(spark, tp)
    hits = {"n": 0}
    ts = datetime.datetime(2025, 1, 1)

    def interloper(df):
        if hits["n"] == 0:
            hits["n"] += 1
            t2.append(
                spark.createDataFrame(
                    [("conv-interloper", 0, "user", "survive", None, ts,
                      55_000_000, False)],
                    t2.current().schema,
                )
            )
        return df

    # no exception: the conflicted batch retries and lands
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                  transform=interloper, occ_retries=1)
    assert hits["n"] == 1  # the race actually happened
    got = _state(tp, spark)
    assert got.pop(("conv-interloper", 0)) == ("user", "survive")
    assert got == want
