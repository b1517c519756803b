"""Fan-in ingest: N sharded upstream feeds → one table (SURVEY §2.8 ST+).

The sharded-OLTP shape (tenant-sharded MySQL / Vitess behind N CDC
connectors): each source owns a disjoint key range (conv % n_shards) and
publishes its own change feed with its own LSN space, chunk sequence, and
batch-id sequence.  The engine's contract:

* per-source exactly-once fences (commit summary ``fences`` map) — a
  crash-redelivered batch from one shard is skipped without blocking the
  others;
* the final table state equals the pure-Python LWW oracle of the UNION of
  the shards' events (which, by disjointness, is the unsharded feed);
* interleaving order is irrelevant (each key's history lives in one feed);
* rollback restores every shard's fence together;
* mixing sourceless and fan-in merges on one table is refused.
"""

from __future__ import annotations

import glob
import os
from dataclasses import replace

import pytest

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import (
    apply_batch,
    last_applied_batch_id,
    read_clean,
)
from credix_data_pipeline_spark.sources import feed as feed_mod
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner
from tests.oracle_cdc import (
    event_py,
    oracle_sorted_rows,
    shard_py,
)

FULL = FeedSpec(
    n_events=2_400,
    n_conversations=40,
    turns_per_conversation=6,
    delete_pct=6,
    duplicate_pct=5,
    hot_pct=4,
    shuffle_window=24,
    events_per_chunk=300,
)
S0 = replace(FULL, n_shards=2, shard=0)
S1 = replace(FULL, n_shards=2, shard=1)


def _final(spark, table_path):
    t = LakeTable.load(spark, table_path)
    return sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in read_clean(t).select("conv_id", "turn_idx", "text").collect()
    )


@pytest.fixture()
def shard_feeds(spark, tmp_path):
    f0 = str(tmp_path / "feed_s0")
    f1 = str(tmp_path / "feed_s1")
    write_feed(spark, f0, S0)
    write_feed(spark, f1, S1)
    return f0, f1


def test_shards_partition_the_feed(spark, shard_feeds):
    """Shard feeds are disjoint by conversation and union to the full feed."""
    f0, f1 = shard_feeds
    m0, m1 = feed_mod.read_manifest(f0), feed_mod.read_manifest(f1)
    d0 = feed_mod.read_chunks(spark, f0, m0["chunks"])
    d1 = feed_mod.read_chunks(spark, f1, m1["chunks"])
    convs0 = {r.conv_id for r in d0.select("conv_id").distinct().collect()}
    convs1 = {r.conv_id for r in d1.select("conv_id").distinct().collect()}
    assert convs0 and convs1 and not (convs0 & convs1)
    assert all(int(c[4:]) % 2 == 0 for c in convs0)
    assert all(int(c[4:]) % 2 == 1 for c in convs1)
    # union == the unsharded feed (same spec knobs, n_shards=1)
    n_events_full = sum(
        1 + (1 if feed_mod.h_py(e, 31) % 100 < FULL.duplicate_pct else 0)
        for e in range(FULL.n_events)
    )
    assert d0.count() + d1.count() == n_events_full


def test_fanin_matches_union_oracle(spark, shard_feeds, tmp_table):
    f0, f1 = shard_feeds
    stats = runner.replay_fanin(
        spark, {"s0": f0, "s1": f1}, tmp_table,
        chunks_per_batch=2, num_buckets=4,
    )
    assert stats["s0"].batches > 0 and stats["s1"].batches > 0
    assert _final(spark, tmp_table) == [
        (c, t, x) for c, t, x in oracle_sorted_rows(FULL, normalize=False)
    ]
    # per-source fences are independent and present
    t = LakeTable.load(spark, tmp_table)
    assert last_applied_batch_id(t, "s0") == stats["s0"].batches - 1
    assert last_applied_batch_id(t, "s1") == stats["s1"].batches - 1


def test_fanin_interleave_order_invariance(spark, shard_feeds, tmp_path):
    """Round-robin order is sorted(source name); swapping which shard sorts
    first must not change the final state (disjoint key ownership)."""
    f0, f1 = shard_feeds
    ta, tb = str(tmp_path / "ta"), str(tmp_path / "tb")
    runner.replay_fanin(spark, {"a": f0, "b": f1}, ta,
                        chunks_per_batch=2, num_buckets=4)
    runner.replay_fanin(spark, {"a": f1, "b": f0}, tb,
                        chunks_per_batch=2, num_buckets=4)
    assert _final(spark, ta) == _final(spark, tb)


def test_fanin_crash_redelivery_fenced_per_source(spark, shard_feeds, tmp_table):
    """Crash after s0's commit, before its checkpoint advance: the resume
    re-delivers that batch, the per-source fence skips it, and the final
    state still equals the union oracle."""
    f0, f1 = shard_feeds
    with pytest.raises(RuntimeError, match="injected crash"):
        runner.replay_fanin(
            spark, {"s0": f0, "s1": f1}, tmp_table,
            chunks_per_batch=2, num_buckets=4, fail_at=("s0", 1),
        )
    runner.replay_fanin(
        spark, {"s0": f0, "s1": f1}, tmp_table,
        chunks_per_batch=2, num_buckets=4,
    )
    # the redelivered (s0, batch 1) is fenced, so every batch commits
    # EXACTLY once across both runs: history = create + one commit/batch
    m0 = feed_mod.read_manifest(f0)
    m1 = feed_mod.read_manifest(f1)
    batches = -(-len(m0["chunks"]) // 2) + -(-len(m1["chunks"]) // 2)
    assert len(LakeTable.load(spark, tmp_table).history()) == 1 + batches
    assert _final(spark, tmp_table) == [
        (c, t_, x) for c, t_, x in oracle_sorted_rows(FULL, normalize=False)
    ]


def test_fanin_explicit_redelivery_skipped(spark, shard_feeds, tmp_table):
    f0, f1 = shard_feeds
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tmp_table,
                        chunks_per_batch=2, num_buckets=4)
    t = LakeTable.load(spark, tmp_table)
    before, n_snaps = _final(spark, tmp_table), len(t.history())
    m0 = feed_mod.read_manifest(f0)
    df = feed_mod.read_chunks(spark, f0, m0["chunks"][:2])
    res = apply_batch(t, df, 0, source="s0")
    assert res.skipped
    assert len(t.history()) == n_snaps
    assert _final(spark, tmp_table) == before


def test_fanin_mixed_mode_refused(spark, shard_feeds, tmp_table, tmp_path):
    f0, f1 = shard_feeds
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tmp_table,
                        chunks_per_batch=2, num_buckets=4)
    t = LakeTable.load(spark, tmp_table)
    m0 = feed_mod.read_manifest(f0)
    df = feed_mod.read_chunks(spark, f0, m0["chunks"][:2])
    with pytest.raises(RuntimeError, match="per-source fan-in fences"):
        apply_batch(t, df, 99)  # sourceless merge on a fan-in table

    single = str(tmp_path / "single_table")
    runner.replay(spark, f0, single, chunks_per_batch=4, num_buckets=4)
    t2 = LakeTable.load(spark, single)
    with pytest.raises(RuntimeError, match="single-feed fence"):
        apply_batch(t2, df, 0, source="s0")  # fan-in merge on a single table


def test_fanin_rollback_restores_all_fences_and_reconverges(
    spark, shard_feeds, tmp_table
):
    """Rollback to a mid-stream snapshot restores BOTH shards' fences as of
    that commit; wiping the checkpoints and re-running re-applies exactly
    the post-fence batches and reconverges to the union oracle."""
    f0, f1 = shard_feeds
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tmp_table,
                        chunks_per_batch=2, num_buckets=4)
    t = LakeTable.load(spark, tmp_table)
    # history: create, s0/b0, s1/b0, s0/b1, s1/b1, ... — roll to after s1/b0
    hist = t.history()
    mid = hist[2]
    assert mid.summary.get("fences") == {"s0": 0, "s1": 0}
    t.rollback_to(mid.snapshot_id)
    t2 = LakeTable.load(spark, tmp_table)
    assert last_applied_batch_id(t2, "s0") == 0
    assert last_applied_batch_id(t2, "s1") == 0
    for p in glob.glob(os.path.join(tmp_table, "_checkpoint_fanin_*.json")):
        os.remove(p)
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tmp_table,
                        chunks_per_batch=2, num_buckets=4)
    assert _final(spark, tmp_table) == [
        (c, t_, x) for c, t_, x in oracle_sorted_rows(FULL, normalize=False)
    ]


def test_fanin_resume_from_checkpoint(spark, shard_feeds, tmp_table):
    f0, f1 = shard_feeds
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tmp_table,
                        chunks_per_batch=1, num_buckets=4, max_batches=3)
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tmp_table,
                        chunks_per_batch=1, num_buckets=4)
    assert _final(spark, tmp_table) == [
        (c, t, x) for c, t, x in oracle_sorted_rows(FULL, normalize=False)
    ]


def test_fanin_one_shard_evolves_in_flight(spark, tmp_path, tmp_table):
    """Shard 1's upstream gains ``tool_meta`` mid-stream; shard 0 never
    carries it.  The table evolves in flight when shard 1's first evolved
    batch arrives, and shard-0 winners read the column as NULL — pinned
    against a shard-aware pure-Python oracle."""
    s1e = replace(S1, evolution_frac=0.5)
    f0 = str(tmp_path / "feed_s0")
    f1 = str(tmp_path / "feed_s1e")
    write_feed(spark, f0, S0)
    write_feed(spark, f1, s1e)
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tmp_table,
                        chunks_per_batch=2, num_buckets=4)

    state: dict[tuple, dict] = {}
    for e in range(FULL.n_events):  # global LSN order
        spec = s1e if shard_py(e, S0) == 1 else S0  # S0 carries n_shards=2
        ev = event_py(e, spec)
        k = (ev["conv_id"], ev["turn_idx"])
        if ev["op"] == "D":
            state.pop(k, None)
        else:
            state[k] = {
                "text": ev["text"],
                "tool_meta": ev.get("tool_meta"),
            }
    want = sorted(
        (k[0], k[1], v["text"], v["tool_meta"]) for k, v in state.items()
    )
    t = LakeTable.load(spark, tmp_table)
    got = sorted(
        (r.conv_id, r.turn_idx, r.text, r.tool_meta)
        for r in read_clean(t)
        .select("conv_id", "turn_idx", "text", "tool_meta")
        .collect()
    )
    assert got == want


def test_fanin_refuses_ddl_feeds(spark, shard_feeds, tmp_table, tmp_path):
    f0, _ = shard_feeds
    man = feed_mod.read_manifest(f0)
    man["ddl"] = {man["chunks"][0]: [["rename", "1", "x", "y"]]}
    bad = str(tmp_path / "bad_feed")
    os.makedirs(bad)
    import json

    with open(os.path.join(bad, "_feed.json"), "w") as fh:
        json.dump(man, fh)
    with pytest.raises(RuntimeError, match="DDL channel"):
        runner.replay_fanin(spark, {"s0": bad}, tmp_table)


def test_monitor_reports_per_source_fanin_progress(spark, shard_feeds, tmp_table, tmp_path):
    """The monitor surfaces each shard's fence + checkpoint position and
    flags batch lag between sources (the lagging-connector failure mode);
    single-feed tables report fanin=None."""
    from credix_data_pipeline_spark.streaming.monitoring import monitor

    f0, f1 = shard_feeds
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tmp_table,
                        chunks_per_batch=2, num_buckets=4)
    rep = monitor(spark, tmp_table)
    fan = rep["fanin"]
    assert set(fan["sources"]) == {"s0", "s1"}
    assert fan["batch_lag"] == 0 and fan["status"] == "BALANCED"
    for s in ("s0", "s1"):
        assert fan["sources"][s]["fence_batch_id"] is not None
        assert fan["sources"][s]["next_chunk"] is not None

    # drive s0 ahead: redeliveries of empty batches at high ids commit
    # nothing, so emulate a lagging s1 by applying extra s0 batches
    t = LakeTable.load(spark, tmp_table)
    m0 = feed_mod.read_manifest(f0)
    df = feed_mod.read_chunks(spark, f0, m0["chunks"][:1])
    last = last_applied_batch_id(t, "s0")
    for b in range(last + 1, last + 4):
        apply_batch(t, df, b, source="s0")
    fan2 = monitor(spark, tmp_table)["fanin"]
    assert fan2["batch_lag"] == 3 and fan2["status"] == "LAGGING"

    single = str(tmp_path / "single")
    runner.replay(spark, f0, single, chunks_per_batch=4, num_buckets=4)
    assert monitor(spark, single)["fanin"] is None


def test_two_concurrent_replay_jobs_fanin_one_table(spark, shard_feeds, tmp_table):
    """The independent-process deployment: one `replay(source=...)` job per
    upstream connector, racing on ONE table.  Base-snapshot OCC makes
    simultaneous commits conflict; occ_retries re-merges losers; the final
    state must equal the union oracle with both fences complete."""
    import threading

    f0, f1 = shard_feeds
    errors: list[BaseException] = []

    def job(name, feed):
        try:
            runner.replay(
                spark, feed, tmp_table,
                chunks_per_batch=2, num_buckets=4,
                source=name, occ_retries=16,
            )
        except BaseException as e:  # pragma: no cover - surface below
            errors.append(e)

    ts = [threading.Thread(target=job, args=(n, f))
          for n, f in (("s0", f0), ("s1", f1))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    assert _final(spark, tmp_table) == [
        (c, t_, x) for c, t_, x in oracle_sorted_rows(FULL, normalize=False)
    ]
    t = LakeTable.load(spark, tmp_table)
    fences = t.current().summary.get("fences")
    assert set(fences) == {"s0", "s1"}
    # the fan-in monitor reads the same artifacts these jobs wrote
    from credix_data_pipeline_spark.streaming.monitoring import monitor

    fan = monitor(spark, tmp_table)["fanin"]
    assert set(fan["sources"]) == {"s0", "s1"}


def test_stream_mode_fanin_sources(spark, shard_feeds, tmp_table):
    """Genuine Structured Streaming fan-in: one stream() per shard (its own
    SS checkpoint under _ss_checkpoint_<name>), per-source fences, lineage
    rows tagged with the shard name."""
    from credix_data_pipeline_spark.streaming.lineage import LineageLog

    f0, f1 = shard_feeds
    for name, feed in (("s0", f0), ("s1", f1)):
        q = runner.stream(spark, feed, tmp_table, num_buckets=4,
                          transform=None, source=name)
        q.awaitTermination()
    assert _final(spark, tmp_table) == [
        (c, t, x) for c, t, x in oracle_sorted_rows(FULL, normalize=False)
    ]
    t = LakeTable.load(spark, tmp_table)
    fences = t.current().summary.get("fences")
    assert set(fences) == {"s0", "s1"}
    assert os.path.isdir(os.path.join(tmp_table, "_ss_checkpoint_s0"))
    srcs = {
        r.source
        for r in LineageLog(tmp_table).read(spark).select("source").collect()
    }
    assert srcs == {"s0", "s1"}


def test_fanin_table_relays_to_replica(spark, shard_feeds, tmp_table, tmp_path):
    """Composition: a fan-in table is a normal relay SOURCE — its net
    changes publish and a downstream replica (single-feed, scalar fence)
    converges to the same clean state.  Proves the per-source fence map is
    invisible to the changelog/relay machinery."""
    from credix_data_pipeline_spark.operators.relay import publish_changes

    f0, f1 = shard_feeds
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tmp_table,
                        chunks_per_batch=2, num_buckets=4)
    relay_dir = str(tmp_path / "relay")
    replica = str(tmp_path / "replica")
    publish_changes(LakeTable.load(spark, tmp_table), relay_dir)
    runner.replay(spark, relay_dir, replica, chunks_per_batch=4,
                  num_buckets=4)
    assert _final(spark, replica) == _final(spark, tmp_table)
