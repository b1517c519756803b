"""Relay rebase + vacuum (the compacted-topic pattern): a full-state
re-anchor chunk bounds relay storage — fresh replicas bootstrap there,
existing replicas cross it idempotently, stragglers fail loudly."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark import main as cli
from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.operators.relay import (
    publish_changes,
    vacuum_relay,
)
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=3_000,
    n_conversations=40,
    turns_per_conversation=8,
    delete_pct=8,
    duplicate_pct=3,
    events_per_chunk=500,
)


def _state(spark, path):
    t = LakeTable.load(spark, path)
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text)
        for r in read_clean(t)
        .select("conv_id", "turn_idx", "role", "text")
        .collect()
    }


def _upstream_with_relay(spark, tmp_path, publishes=3):
    """Replay the feed in stages, publishing after each stage."""
    feed, tp, relay = (str(tmp_path / d) for d in ("feed", "t", "relay"))
    write_feed(spark, feed, SPEC)
    for i in range(publishes):
        runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                      max_batches=1)
        publish_changes(LakeTable.load(spark, tp), relay)
    return feed, tp, relay


def test_rebase_then_vacuum_fresh_replica_bootstraps(spark, tmp_path):
    feed, tp, relay = _upstream_with_relay(spark, tmp_path)
    t = LakeTable.load(spark, tp)

    res = publish_changes(t, relay, rebase=True)
    assert res["bootstrap_full_state"] and not res["skipped"]
    man = json.load(open(os.path.join(relay, "_feed.json")))
    assert man["rebase_chunk"] == 3

    vac = vacuum_relay(relay)
    assert vac["vacuumed_chunks"] == 3 and vac["first_live_chunk"] == 3
    man = json.load(open(os.path.join(relay, "_feed.json")))
    assert man["chunks"][:3] == [None, None, None]
    # dropped chunk dirs are physically gone
    assert not any(
        d.startswith("pub0000") and d < "pub00003"
        for d in os.listdir(relay)
        if os.path.isdir(os.path.join(relay, d))
    )

    # fresh replica: bootstraps at the rebase chunk, equals upstream
    rep = str(tmp_path / "replica")
    runner.replay(spark, relay, rep, chunks_per_batch=4, num_buckets=4)
    assert _state(spark, rep) == _state(spark, tp)
    # deletes tombstoned upstream BEFORE the rebase never reach the fresh
    # replica at all (the rebase carries live rows only)
    rt = LakeTable.load(spark, rep)
    df = rt.read()
    if "_deleted" in df.columns:
        assert df.filter(F.coalesce("_deleted", F.lit(False))).count() == 0

    # incremental continues after the rebase: more upstream data, publish,
    # replica catches up
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    publish_changes(LakeTable.load(spark, tp), relay)
    runner.replay(spark, relay, rep, chunks_per_batch=4, num_buckets=4)
    assert _state(spark, rep) == _state(spark, tp)


def test_existing_replica_crosses_rebase_idempotently(spark, tmp_path):
    feed, tp, relay = _upstream_with_relay(spark, tmp_path, publishes=2)
    rep = str(tmp_path / "replica")
    # replica fully caught up BEFORE the rebase
    runner.replay(spark, relay, rep, chunks_per_batch=4, num_buckets=4)
    t = LakeTable.load(spark, tp)
    publish_changes(t, relay, rebase=True)
    # crossing the rebase chunk re-upserts the full state: state unchanged
    runner.replay(spark, relay, rep, chunks_per_batch=4, num_buckets=4)
    assert _state(spark, rep) == _state(spark, tp)
    # and stays incremental afterwards
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    publish_changes(LakeTable.load(spark, tp), relay)
    runner.replay(spark, relay, rep, chunks_per_batch=4, num_buckets=4)
    assert _state(spark, rep) == _state(spark, tp)


def test_straggler_replica_behind_vacuum_horizon_fails(spark, tmp_path):
    feed, tp, relay = _upstream_with_relay(spark, tmp_path)
    rep = str(tmp_path / "replica")
    # replica consumed only chunk 0 of 3
    runner.replay(spark, relay, rep, chunks_per_batch=1, num_buckets=4,
                  max_batches=1)
    publish_changes(LakeTable.load(spark, tp), relay, rebase=True)
    vacuum_relay(relay)
    with pytest.raises(RuntimeError, match="vacuumed past"):
        runner.replay(spark, relay, rep, chunks_per_batch=1, num_buckets=4)


def test_vacuum_without_rebase_is_refused(spark, tmp_path):
    _, _, relay = _upstream_with_relay(spark, tmp_path, publishes=1)
    out = vacuum_relay(relay)
    assert out["skipped"] and out["vacuumed_chunks"] == 0


def test_cli_publish_rebase_and_vacuum(spark, tmp_path, capsys):
    feed, tp, relay = _upstream_with_relay(spark, tmp_path, publishes=2)
    assert cli.main(["publish", "--table", tp, "--out", relay,
                     "--rebase"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["bootstrap_full_state"]
    assert cli.main(["vacuum-relay", "--out", relay]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["vacuumed_chunks"] == 2


def test_policy_auto_rebase_and_vacuum(spark, tmp_path):
    """`relay.rebase-every` + `relay.auto-vacuum` table properties bound
    relay storage with no operator intervention: every Nth publish
    escalates to a rebase and sweeps the pre-rebase chunks; a replica
    bootstrapping afterwards converges; a no-movement publish never
    triggers a spurious rebase."""
    feed, tp, relay = (str(tmp_path / d) for d in ("feed", "t", "relay"))
    write_feed(spark, feed, SPEC)
    t_first = None
    for i in range(2):
        runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4,
                      max_batches=1)
        t = LakeTable.load(spark, tp)
        if t_first is None:
            t.alter_properties({"relay.rebase-every": "2",
                                "relay.auto-vacuum": "true"})
            t_first = t
        res = publish_changes(t, relay)
        assert not res["rebase"], f"publish {i} should be incremental"

    # third data publish is the 2nd past chunk 0's bootstrap -> rebase
    runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4,
                  max_batches=1)
    t = LakeTable.load(spark, tp)
    res = publish_changes(t, relay)
    assert res["rebase"] and res["vacuum"] is not None
    assert res["vacuum"]["vacuumed_chunks"] == 2
    man = json.load(open(os.path.join(relay, "_feed.json")))
    assert man["rebase_chunk"] == 2 and man["chunks"][:2] == [None, None]

    # fresh replica bootstraps at the rebase and matches upstream
    rep = str(tmp_path / "rep")
    runner.replay(spark, relay, rep, chunks_per_batch=8, num_buckets=4)
    assert _state(spark, rep) == _state(spark, tp)

    # no movement: the policy never fabricates a rebase out of a skip
    res = publish_changes(t, relay)
    assert res["skipped"] is True
