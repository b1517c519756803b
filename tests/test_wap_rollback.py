"""Write-audit-publish gate + snapshot rollback.

WAP (Iceberg's wap.id staged-commit pattern / dbt-build's test-before-
promote): each micro-batch commits as a STAGED snapshot invisible to
readers; the data contracts run against the staged dirty-bucket post-image;
only a clean audit publishes.  The reference runs its dbt schema tests
inside ``dbt build`` (dbt/business_case/models/silver/schema.yml) — this is
the same gate moved to the table-commit layer so a bad batch can never be
observed.

Rollback (Iceberg ``rollback_to_snapshot``): a new commit restoring a past
snapshot's file set AND its exactly-once fence, so a post-rollback replay
re-applies exactly the batches after the target and reconverges to the
original state by LWW determinism.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import (
    ContractViolation,
    apply_batch,
    last_applied_batch_id,
    read_clean,
)
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner
from tests.oracle_cdc import oracle_sorted_rows

SPEC = FeedSpec(
    n_events=1_500,
    n_conversations=20,
    turns_per_conversation=6,
    delete_pct=6,
    duplicate_pct=5,
    shuffle_window=24,
    events_per_chunk=300,
)


def _final(spark, table_path, snapshot_id=None):
    t = LakeTable.load(spark, table_path)
    return sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in read_clean(t, snapshot_id=snapshot_id)
        .select("conv_id", "turn_idx", "text")
        .collect()
    )


def _event_row(lsn, role, conv="conv-00001", turn=0, op="U"):
    ts = datetime.datetime(2025, 1, 1, 0, 0, 0)
    return (op, lsn, ts, conv, turn, role, f"text-{lsn}", None, ts)


def _batch_df(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


# ---------------------------------------------------------------- WAP gate
def test_wap_clean_replay_equals_plain_replay(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    t_wap = str(tmp_path / "t_wap")
    t_plain = str(tmp_path / "t_plain")
    runner.replay(spark, feed, t_wap, chunks_per_batch=2, num_buckets=4,
                  wap=True)
    runner.replay(spark, feed, t_plain, chunks_per_batch=2, num_buckets=4)
    assert _final(spark, t_wap) == _final(spark, t_plain)
    tw = LakeTable.load(spark, t_wap)
    # every staged snapshot was published; fence identical to the plain path
    assert tw.staged_snapshot() is None
    assert last_applied_batch_id(tw) == last_applied_batch_id(
        LakeTable.load(spark, t_plain)
    )


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_wap_violation_discards_staged_batch(spark, tmp_path, merge_mode):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    tp = str(tmp_path / f"t_{merge_mode}")
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                  merge_mode=merge_mode)
    t = LakeTable.load(spark, tp)
    before = _final(spark, tp)
    cur = t.current().snapshot_id
    fence = last_applied_batch_id(t)

    bad = _batch_df(spark, [_event_row(10_000_000, role="alien")])
    with pytest.raises(ContractViolation, match="accepted_role"):
        apply_batch(t, bad, fence + 1, wap=True)

    # published table never saw the batch: same snapshot, state, fence;
    # the staged manifest is gone (its files await orphan collection)
    assert t.current().snapshot_id == cur
    assert _final(spark, tp) == before
    assert last_applied_batch_id(t) == fence
    assert t.staged_snapshot() is None

    # the fixed retry with the SAME batch id applies and publishes
    good = _batch_df(spark, [_event_row(10_000_000, role="user")])
    res = apply_batch(t, good, fence + 1, wap=True)
    assert not res.skipped and res.audit["passed"]
    assert last_applied_batch_id(t) == fence + 1
    assert ("conv-00001", 0, "text-10000000") in _final(spark, tp)


def test_wap_violation_halts_replay_then_fixed_rerun_reconverges(
    spark, tmp_path
):
    """End-to-end: a mid-stream corrupt batch trips the audit, replay halts
    with the checkpoint still at the bad chunk, and a fixed re-run resumes
    to the exact oracle state."""
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    tp = str(tmp_path / "t")

    def corrupt(df):
        return df.withColumn(
            "role",
            F.when(F.col("lsn") >= 900, F.lit("alien")).otherwise(
                F.col("role")
            ),
        )

    with pytest.raises(ContractViolation):
        runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4,
                      transform=corrupt, wap=True)
    t = LakeTable.load(spark, tp)
    halted_fence = last_applied_batch_id(t)
    assert t.staged_snapshot() is None
    # no published row carries the corruption
    assert read_clean(t).filter(F.col("role") == "alien").count() == 0

    # upstream fixed: resume from the same checkpoint, no corruption
    runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4,
                  wap=True)
    assert last_applied_batch_id(t) > halted_fence
    assert _final(spark, tp) == [
        (c, i, x) for c, i, x in oracle_sorted_rows(SPEC, normalize=False)
    ]


def test_staged_files_survive_expire(spark, tmp_path):
    """A pending staged snapshot's data files are referenced, not orphans —
    retention must not collect them before the audit decides."""
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    tp = str(tmp_path / "t")
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    t = LakeTable.load(spark, tp)
    fence = last_applied_batch_id(t)
    cur = t.current()
    ts = datetime.datetime(2025, 1, 1)
    row_df = spark.createDataFrame(
        [("conv-staged", 0, "user", "pending", None, ts, 10_000_000, False)],
        cur.schema,
    )
    dirty = [
        r["_b"]
        for r in row_df.select(t.bucket_expr().alias("_b")).distinct().collect()
    ]
    snap = t.replace_buckets(
        dirty, row_df, summary={"batch_id": fence + 1}, staged=True
    )
    staged_only = set(snap.all_files()) - set(cur.all_files())
    assert staged_only  # the staged commit really wrote new files
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    import os

    for f in staged_only:
        assert os.path.exists(os.path.join(t.path, f))
    t.discard_staged(snap.version)
    assert t.staged_snapshot() is None


# ---------------------------------------------------------------- rollback
def test_rollback_restores_state_and_fence_then_reconverges(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    tp = str(tmp_path / "t")
    runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4)
    t = LakeTable.load(spark, tp)
    full_state = _final(spark, tp)

    # the merge commit of batch 1 (summaries carry batch_id atomically)
    target = next(
        s for s in t.history() if s.summary.get("batch_id") == 1
    )
    mid_state = _final(spark, tp, snapshot_id=target.snapshot_id)

    rb = t.rollback_to(target.snapshot_id)
    assert rb.summary["operation"] == "rollback"
    assert _final(spark, tp) == mid_state
    assert last_applied_batch_id(t) == 1
    # history preserved: the abandoned commits are still time-travelable
    assert len(t.history()) > target.version

    # operator resets the feed position; the fence skips batches <= 1 and
    # re-applies the rest — byte-identical reconvergence
    stats = runner.replay(
        spark, feed, tp, chunks_per_batch=1, num_buckets=4,
        checkpoint_path=str(tmp_path / "ckpt2"),
    )
    assert stats.batches >= 2
    assert _final(spark, tp) == full_state


def test_rollback_to_create_resets_fence_to_none(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    tp = str(tmp_path / "t")
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    t = LakeTable.load(spark, tp)
    full_state = _final(spark, tp)

    create = t.history()[0]
    t.rollback_to(create.snapshot_id)
    # explicit null fence: the pre-rollback batch ids must NOT shine through
    assert last_applied_batch_id(t) is None
    assert _final(spark, tp) == []

    runner.replay(
        spark, feed, tp, chunks_per_batch=2, num_buckets=4,
        checkpoint_path=str(tmp_path / "ckpt2"),
    )
    assert _final(spark, tp) == full_state


def test_rollback_commit_survives_retention(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    tp = str(tmp_path / "t")
    runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4)
    t = LakeTable.load(spark, tp)
    target = next(s for s in t.history() if s.summary.get("batch_id") == 1)
    t.rollback_to(target.snapshot_id)
    state = _final(spark, tp)
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    # the rollback commit (newest, fence-bearing) survives with its data
    assert last_applied_batch_id(t) == 1
    assert _final(spark, tp) == state


def test_expire_drops_stale_staged_manifest(spark, tmp_path):
    """A staged snapshot whose version was superseded by a published commit
    (crashed WAP run) can never publish; retention removes it and its files
    become collectable orphans."""
    import os

    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    tp = str(tmp_path / "t")
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                  max_batches=2)
    t = LakeTable.load(spark, tp)
    fence = last_applied_batch_id(t)
    cur = t.current()
    ts = datetime.datetime(2025, 1, 1)
    row_df = spark.createDataFrame(
        [("conv-stale", 0, "user", "x", None, ts, 99_000_000, False)],
        cur.schema,
    )
    dirty = [
        r["_b"]
        for r in row_df.select(t.bucket_expr().alias("_b")).distinct().collect()
    ]
    staged = t.replace_buckets(
        dirty, row_df, summary={"batch_id": fence + 1}, staged=True
    )
    stale_files = set(staged.all_files()) - set(cur.all_files())

    # a later (recovered) run publishes the same version normally
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    assert t.current().version >= staged.version

    t.expire_snapshots(keep_last=2, orphan_grace_sec=0.0)
    assert t.staged_snapshot() is None  # stale manifest removed
    for f in stale_files:
        assert not os.path.exists(os.path.join(t.path, f))  # orphans gone
    # the published table is untouched by the cleanup
    assert read_clean(t).filter(F.col("conv_id") == "conv-stale").count() == 0
