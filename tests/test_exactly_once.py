"""ST3 exactly-once + resumability (SURVEY §5.2.3).

The reference's contract: the CDC watermark advances only after downstream
success (README.md:65-72).  The engine's contract: data commit carries the
batch_id atomically; crash anywhere ⇒ resume reaches the same final state.
"""

from __future__ import annotations

import pytest

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.sources import feed as feed_mod
from credix_data_pipeline_spark.streaming import runner
from tests.oracle_cdc import oracle_sorted_rows

SPEC = FeedSpec(
    n_events=2_000,
    n_conversations=30,
    turns_per_conversation=6,
    delete_pct=6,
    duplicate_pct=5,
    shuffle_window=24,
    events_per_chunk=400,
)


def _final(spark, table_path):
    t = LakeTable.load(spark, table_path)
    return sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in read_clean(t).select("conv_id", "turn_idx", "text").collect()
    )


def test_same_batch_applied_twice_is_noop(spark, tmp_feed, tmp_table):
    """Simulated foreachBatch redelivery: same (batch_id, data) re-applied ⇒
    fenced out, snapshot count unchanged."""
    write_feed(spark, tmp_feed, SPEC)
    manifest = feed_mod.read_manifest(tmp_feed)
    runner.replay(spark, tmp_feed, tmp_table, chunks_per_batch=2, num_buckets=4)
    t = LakeTable.load(spark, tmp_table)
    before = _final(spark, tmp_table)
    n_snaps = len(t.history())

    batch_df = feed_mod.read_chunks(spark, tmp_feed, manifest["chunks"][:2])
    res = apply_batch(t, batch_df, 0)  # re-deliver batch 0
    assert res.skipped
    assert len(t.history()) == n_snaps
    assert _final(spark, tmp_table) == before


def test_crash_after_commit_before_checkpoint_then_resume(spark, tmp_feed, tmp_table):
    """Worst-case crash window: data committed, checkpoint not advanced.
    Resume re-delivers the batch; the fence skips it; final state == oracle."""
    write_feed(spark, tmp_feed, SPEC)
    with pytest.raises(RuntimeError, match="injected crash"):
        runner.replay(
            spark, tmp_feed, tmp_table,
            chunks_per_batch=1, num_buckets=4, fail_at_batch=1,
        )
    stats = runner.replay(spark, tmp_feed, tmp_table, chunks_per_batch=1, num_buckets=4)
    assert stats.batches > 0
    got = _final(spark, tmp_table)
    assert got == [
        (c, t, x) for c, t, x in oracle_sorted_rows(SPEC, normalize=False)
    ]


def test_kill_mid_replay_resume_from_checkpoint(spark, tmp_feed, tmp_table):
    """Stop after 2 batches (clean checkpoint), resume ⇒ same final state as
    one uninterrupted replay."""
    write_feed(spark, tmp_feed, SPEC)
    runner.replay(
        spark, tmp_feed, tmp_table, chunks_per_batch=1, num_buckets=4, max_batches=2
    )
    runner.replay(spark, tmp_feed, tmp_table, chunks_per_batch=1, num_buckets=4)
    got = _final(spark, tmp_table)
    assert got == [
        (c, t, x) for c, t, x in oracle_sorted_rows(SPEC, normalize=False)
    ]


def test_batch_boundary_invariance(spark, tmp_feed, tmp_path):
    """Replay with different batch sizes reaches identical final state —
    the LWW merge is associative over batching."""
    write_feed(spark, tmp_feed, SPEC)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    runner.replay(spark, tmp_feed, a, chunks_per_batch=1, num_buckets=4)
    runner.replay(spark, tmp_feed, b, chunks_per_batch=5, num_buckets=4)
    assert _final(spark, a) == _final(spark, b)
