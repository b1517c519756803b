"""Dead-letter requeue: quarantine → human repair → redrive through the
normal feed (the Kafka-Connect DLQ-redrive pattern).

Flow under test: a poisoned chunk (null key) quarantines at replay; a
``--set`` SQL repair re-validates and re-enters the rows as a fresh tail
chunk with its own schema-registry entry; the next replay ingests them
through the standard exactly-once path; a half-fixed requeue is refused
whole (no partial redrive)."""

from __future__ import annotations

import datetime
import json
import os

import pytest

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA
from credix_data_pipeline_spark.sources import feed as feed_mod
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=1_200,
    n_conversations=20,
    turns_per_conversation=6,
    delete_pct=5,
    duplicate_pct=3,
    events_per_chunk=300,
)
TS = datetime.datetime(2024, 1, 1)


def _poison_rows(spark, n=3, lsn0=10_000):
    from pyspark.sql import types as T

    lax = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA]
    )
    rows = [
        ("U", lsn0 + i, TS, f"convP{i}", None, "user", f"repaired {i}",
         None, TS)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, lax)


@pytest.fixture()
def poisoned(spark, tmp_feed, tmp_table):
    write_feed(spark, tmp_feed, SPEC)
    feed_mod.append_chunk(spark, tmp_feed, _poison_rows(spark))
    stats = runner.replay(spark, tmp_feed, tmp_table,
                          chunks_per_batch=2, num_buckets=4)
    assert stats.rows_in > 0
    return tmp_feed, tmp_table


def test_requeue_redrives_repaired_rows_through_replay(spark, poisoned):
    feed, table = poisoned
    failed = os.path.join(table, runner.FAILED_DIR)
    assert spark.read.parquet(failed).count() == 3
    before = read_clean(LakeTable.load(spark, table)).count()

    out = runner.requeue_failed(
        spark, table, feed,
        fixes={"turn_idx": "5"},
    )
    assert out["requeued"] == 3 and out["chunk"].startswith("requeue")
    # quarantine cleared, audit copy kept
    assert not os.path.isdir(failed)
    arch = os.path.join(table, "_failed_requeued")
    assert os.path.isdir(arch) and os.listdir(arch)
    # the manifest grew a tail chunk with its own schema entry
    man = feed_mod.read_manifest(feed)
    assert man["chunks"][-1] == out["chunk"]
    assert out["chunk"].split("/")[0] in man["schemas"]

    # the repaired rows arrive through a NORMAL incremental replay
    runner.replay(spark, feed, table, chunks_per_batch=2, num_buckets=4)
    t = LakeTable.load(spark, table)
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in read_clean(t)
        .filter("conv_id like 'convP%'")
        .collect()
    }
    assert got == {(f"convP{i}", 5): f"repaired {i}" for i in range(3)}
    assert read_clean(t).count() == before + 3


def test_requeue_refuses_half_fixed_batches(spark, poisoned):
    feed, table = poisoned
    man_before = feed_mod.read_manifest(feed)
    with pytest.raises(RuntimeError, match="requeue refused"):
        runner.requeue_failed(spark, table, feed)  # no fixes at all
    # quarantine and manifest untouched on refusal
    failed = os.path.join(table, runner.FAILED_DIR)
    assert spark.read.parquet(failed).count() == 3
    assert feed_mod.read_manifest(feed)["chunks"] == man_before["chunks"]


def test_requeue_noop_without_quarantine(spark, tmp_feed, tmp_table):
    write_feed(spark, tmp_feed, SPEC)
    runner.replay(spark, tmp_feed, tmp_table,
                  chunks_per_batch=2, num_buckets=4)
    out = runner.requeue_failed(spark, tmp_table, tmp_feed)
    assert out == {"requeued": 0, "chunk": None, "still_bad": 0}


def test_requeue_cli(spark, poisoned, capsys):
    from credix_data_pipeline_spark import main as cli

    feed, table = poisoned
    rc = cli.main([
        "--master", "local[4]",
        "requeue", "--table", table, "--feed", feed,
        "--set", "turn_idx=coalesce(turn_idx, 9)",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["requeued"] == 3
    runner.replay(spark, feed, table, chunks_per_batch=2, num_buckets=4)
    got = read_clean(LakeTable.load(spark, table)).filter(
        "conv_id like 'convP%' and turn_idx = 9"
    )
    assert got.count() == 3


def test_fanin_requeue_per_shard(spark, tmp_path):
    """On a fan-in table, quarantined rows are tagged with their shard;
    --source redrives each shard's rows into ITS OWN feed and leaves the
    other shard's rows parked."""
    from dataclasses import replace as dc_replace

    from credix_data_pipeline_spark.operators.apply import apply_batch

    full = FeedSpec(n_events=1_200, n_conversations=20,
                    turns_per_conversation=6, events_per_chunk=300)
    f0, f1, tp = (str(tmp_path / d) for d in ("f0", "f1", "t"))
    write_feed(spark, f0, dc_replace(full, n_shards=2, shard=0))
    write_feed(spark, f1, dc_replace(full, n_shards=2, shard=1))
    # poison each shard's feed with shard-owned null-turn rows
    feed_mod.append_chunk(spark, f0, _poison_rows(spark, n=2, lsn0=20_000))
    feed_mod.append_chunk(spark, f1, _poison_rows(spark, n=3, lsn0=30_000))
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tp,
                        chunks_per_batch=2, num_buckets=4)
    failed = os.path.join(tp, runner.FAILED_DIR)
    qdf = spark.read.parquet(failed)
    assert qdf.count() == 5
    assert {r._source for r in qdf.select("_source").collect()} == {"s0", "s1"}

    out = runner.requeue_failed(spark, tp, f0,
                                fixes={"turn_idx": "1"}, source="s0")
    assert out["requeued"] == 2
    # s1's rows stay parked with their tags
    left = spark.read.parquet(failed)
    assert left.count() == 3
    assert {r._source for r in left.select("_source").collect()} == {"s1"}
    out1 = runner.requeue_failed(spark, tp, f1,
                                 fixes={"turn_idx": "2"}, source="s1")
    assert out1["requeued"] == 3
    assert not os.path.isdir(failed)

    # the redriven rows arrive through the shards' OWN feeds
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tp,
                        chunks_per_batch=2, num_buckets=4)
    t = LakeTable.load(spark, tp)
    got = {
        (r.conv_id, r.turn_idx)
        for r in read_clean(t).filter("conv_id like 'convP%'").collect()
    }
    assert got == {(f"convP{i}", 1) for i in range(2)} | {
        (f"convP{i}", 2) for i in range(3)
    }


def test_requeue_sourceless_on_tagged_quarantine_refused(spark, tmp_path):
    """Redriving EVERY shard's rows into one feed would break per-shard
    key ownership — must refuse (review finding)."""
    from dataclasses import replace as dc_replace

    full = FeedSpec(n_events=1_200, n_conversations=20,
                    turns_per_conversation=6, events_per_chunk=300)
    f0, f1, tp = (str(tmp_path / d) for d in ("f0", "f1", "t"))
    write_feed(spark, f0, dc_replace(full, n_shards=2, shard=0))
    write_feed(spark, f1, dc_replace(full, n_shards=2, shard=1))
    feed_mod.append_chunk(spark, f0, _poison_rows(spark, n=1, lsn0=20_000))
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tp,
                        chunks_per_batch=2, num_buckets=4)
    with pytest.raises(RuntimeError, match="without --source"):
        runner.requeue_failed(spark, tp, f0, fixes={"turn_idx": "1"})


def test_requeue_recovers_stranded_park_dir(spark, tmp_path):
    """Crash between archive move and park rename leaves failed-park-<hex>;
    the next requeue restores it as the quarantine (review finding)."""
    from dataclasses import replace as dc_replace

    full = FeedSpec(n_events=1_200, n_conversations=20,
                    turns_per_conversation=6, events_per_chunk=300)
    f0, f1, tp = (str(tmp_path / d) for d in ("f0", "f1", "t"))
    write_feed(spark, f0, dc_replace(full, n_shards=2, shard=0))
    write_feed(spark, f1, dc_replace(full, n_shards=2, shard=1))
    feed_mod.append_chunk(spark, f0, _poison_rows(spark, n=1, lsn0=20_000))
    feed_mod.append_chunk(spark, f1, _poison_rows(spark, n=2, lsn0=30_000))
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tp,
                        chunks_per_batch=2, num_buckets=4)
    runner.requeue_failed(spark, tp, f0, fixes={"turn_idx": "1"},
                          source="s0")
    # simulate the crash window: park restored already happened in the
    # healthy path — recreate it by moving _failed to a park name
    failed = os.path.join(tp, runner.FAILED_DIR)
    park = os.path.join(tp, "failed-park-deadbeef")
    os.rename(failed, park)
    out = runner.requeue_failed(spark, tp, f1, fixes={"turn_idx": "2"},
                                source="s1")
    assert out["requeued"] == 2
    assert not os.path.isdir(park)


def test_append_chunk_lock_refuses_concurrent_append(spark, tmp_feed):
    write_feed(spark, tmp_feed, SPEC)
    lock = os.path.join(tmp_feed, "_feed.lock")
    open(lock, "w").close()
    with pytest.raises(RuntimeError, match="in progress"):
        feed_mod.append_chunk(spark, tmp_feed, _poison_rows(spark))
    os.remove(lock)
    rel = feed_mod.append_chunk(spark, tmp_feed, _poison_rows(spark))
    assert not os.path.exists(lock)  # released after success
    assert feed_mod.read_manifest(tmp_feed)["chunks"][-1] == rel


def test_stale_park_superseded_by_intact_quarantine(spark, tmp_path):
    """A crash AFTER the park write but BEFORE the archive rename leaves
    both _failed and a park holding duplicate rows; the next requeue must
    DELETE the stale park (the intact quarantine supersedes it) so a later
    drain can never resurrect already-requeued rows (review finding)."""
    from dataclasses import replace as dc_replace

    full = FeedSpec(n_events=1_200, n_conversations=20,
                    turns_per_conversation=6, events_per_chunk=300)
    f0, f1, tp = (str(tmp_path / d) for d in ("f0", "f1", "t"))
    write_feed(spark, f0, dc_replace(full, n_shards=2, shard=0))
    write_feed(spark, f1, dc_replace(full, n_shards=2, shard=1))
    feed_mod.append_chunk(spark, f0, _poison_rows(spark, n=1, lsn0=20_000))
    feed_mod.append_chunk(spark, f1, _poison_rows(spark, n=2, lsn0=30_000))
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tp,
                        chunks_per_batch=2, num_buckets=4)
    # simulate the crash residue: a stale park beside an intact _failed
    failed = os.path.join(tp, runner.FAILED_DIR)
    stale = os.path.join(tp, "failed-park-00stale")
    import shutil
    shutil.copytree(failed, stale)

    out0 = runner.requeue_failed(spark, tp, f0, fixes={"turn_idx": "1"},
                                 source="s0")
    assert out0["requeued"] == 1
    assert not os.path.isdir(stale)  # superseded residue removed
    out1 = runner.requeue_failed(spark, tp, f1, fixes={"turn_idx": "2"},
                                 source="s1")
    assert out1["requeued"] == 2
    # fully drained: nothing left to resurrect
    assert not os.path.isdir(failed)
    assert not any(
        p.startswith("failed-park-") for p in os.listdir(tp)
    )
    out = runner.requeue_failed(spark, tp, f0, fixes={"turn_idx": "3"},
                                source="s0")
    assert out == {"requeued": 0, "chunk": None, "still_bad": 0}
