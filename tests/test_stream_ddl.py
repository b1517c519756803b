"""Structured Streaming over DDL-bearing relay feeds (runner.stream_ddl).

SS pins the source schema at query start, so one long-lived query cannot
apply a mid-stream rename/widen/drop at the right chunk boundary — plain
``stream()`` refuses such feeds.  ``stream_ddl`` is the restart-on-schema-
change pattern (Delta streaming's schemaTrackingLocation contract): split
the feed at DDL chunks, one availableNow query per segment, DDL applied to
the replica between queries, per-segment checkpoints + offset batch ids
keeping the fence monotone.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import (
    apply_batch,
    last_applied_batch_id,
    read_clean,
)
from credix_data_pipeline_spark.operators.relay import publish_changes
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=2_000,
    n_conversations=40,
    turns_per_conversation=8,
    delete_pct=8,
    duplicate_pct=4,
    events_per_chunk=500,
)


def _state(t: LakeTable, cols=("role", "text", "tool")) -> dict:
    sel = ["conv_id", "turn_idx", *cols]
    return {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in cols)
        for r in read_clean(t).select(*sel).collect()
    }


def _ddl_burst(spark, t1: LakeTable) -> None:
    """Upstream rename+widen+drop plus one post-DDL batch (new layout)."""
    t1.rename_column("role", "speaker")
    t1.widen_column("turn_idx", T.LongType())
    t1.drop_column("tool")
    base = datetime(2024, 6, 1, tzinfo=timezone.utc)
    new_schema = T.StructType(
        [
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
            T.StructField("commit_ts", T.TimestampType(), True),
            T.StructField("conv_id", T.StringType(), True),
            T.StructField("turn_idx", T.LongType(), True),
            T.StructField("speaker", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    batch = spark.createDataFrame(
        [
            ("U", 50_000_001, base, "conv00000001", 0, "assistant",
             "post-ddl update", base),
            ("I", 50_000_002, base, "convDDLNEW", 7, "user",
             "post-ddl insert", base),
        ],
        new_schema,
    )
    apply_batch(t1, batch, last_applied_batch_id(t1) + 1, collect_stats=False)


def test_stream_ddl_converges_after_rename_widen_drop(spark, tmp_path):
    """A replica tailing via stream_ddl converges byte-equal through an
    upstream rename+widen+drop with NO manual alter."""
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)

    # replica consumes the pre-DDL segment via SS
    res1 = runner.stream_ddl(spark, relay, t2p, num_buckets=4)
    assert res1["segments_run"] == 1 and res1["ddl_applied"] == 0
    assert res1["batches"] >= 1
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2) == _state(t1)

    _ddl_burst(spark, t1)
    publish_changes(t1, relay)
    man = json.load(open(os.path.join(relay, "_feed.json")))
    assert man["chunks"][1] in man["ddl"]

    # replica catches up: one closed (drained, skipped incrementally) +
    # one new DDL-opened segment; ALTERs land before the chunk merges
    res2 = runner.stream_ddl(spark, relay, t2p, num_buckets=4)
    assert res2["ddl_applied"] >= 3  # rename + widen + drop
    t2 = LakeTable.load(spark, t2p)
    c1, c2 = read_clean(t1), read_clean(t2)
    assert c1.columns == c2.columns
    assert "speaker" in c2.columns and "tool" not in c2.columns
    assert dict(c2.dtypes)["turn_idx"] == "bigint"
    assert _state(t2, ("speaker", "text")) == _state(t1, ("speaker", "text"))
    assert _state(t2, ("speaker", "text"))[("convDDLNEW", 7)] == (
        "user", "post-ddl insert",
    )

    # consumed prefix recorded (chunk END ordinal — stable under vacuum);
    # re-drain is a no-op (marker + fence + SS checkpoint)
    marker = json.load(open(os.path.join(t2p, "_ss_ddl_segments.json")))
    assert marker["drained_through"] == 2
    res3 = runner.stream_ddl(spark, relay, t2p, num_buckets=4)
    assert res3["batches"] == 0
    assert _state(t2, ("speaker", "text")) == _state(t1, ("speaker", "text"))


def test_stream_ddl_plain_feed_matches_replay(spark, tmp_path):
    """No DDL channel: one segment, result equal to a replay of the same
    feed — including an in-flight column ADD (the superset reader schema
    aligns pre-add files exactly like read_chunks' unionByName)."""
    feed, ta, tb = (str(tmp_path / d) for d in ("feed", "ta", "tb"))
    spec = FeedSpec(
        n_events=2_000,
        n_conversations=40,
        turns_per_conversation=8,
        delete_pct=8,
        duplicate_pct=4,
        events_per_chunk=500,
        evolution_frac=0.5,
    )
    write_feed(spark, feed, spec)
    runner.replay(spark, feed, ta, chunks_per_batch=2, num_buckets=4)
    res = runner.stream_ddl(spark, feed, tb, num_buckets=4)
    assert res["segments_run"] == 1 and res["ddl_applied"] == 0
    a, b = LakeTable.load(spark, ta), LakeTable.load(spark, tb)
    assert read_clean(a).columns == read_clean(b).columns
    cols = tuple(
        c for c in read_clean(a).columns if c not in ("conv_id", "turn_idx")
    )
    assert _state(a, cols) == _state(b, cols)


def test_stream_ddl_upgrade_from_plain_stream(spark, tmp_path):
    """A replica that started on plain stream() upgrades seamlessly when
    DDL first appears: segment 0 reuses stream()'s SS checkpoint, so
    already-consumed files are never re-read (no loss, no double-apply)."""
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)

    q = runner.stream(spark, relay, t2p, num_buckets=4)
    q.awaitTermination()
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2) == _state(t1)
    v_before = t2.current().version

    _ddl_burst(spark, t1)
    publish_changes(t1, relay)

    res = runner.stream_ddl(spark, relay, t2p, num_buckets=4)
    assert res["ddl_applied"] >= 3
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2, ("speaker", "text")) == _state(t1, ("speaker", "text"))
    # segment 0 contributed no new merge commit (its files were consumed
    # by the plain stream's checkpoint) — only DDL + the post-DDL chunk
    merges = sum(
        1
        for s in t2.history()
        if s.version > v_before
        and "batch_id" in s.summary
        and s.summary.get("rows_applied", 0) > 0
    )
    assert merges == 1


def test_stream_refuses_ddl_feed_pointing_at_stream_ddl(spark, tmp_path):
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    _ddl_burst(spark, t1)
    publish_changes(t1, relay)
    import pytest

    with pytest.raises(RuntimeError, match="stream_ddl"):
        runner.stream(spark, relay, t2p, num_buckets=4)

    # per-shard DDL on a fan-in table is refused in BOTH modes (the
    # replay_fanin rule: N upstream DDL streams have no merge order)
    with pytest.raises(RuntimeError, match="fan-in source"):
        runner.replay(spark, relay, t2p, num_buckets=4, source="s0")
    with pytest.raises(RuntimeError, match="fan-in source"):
        runner.stream_ddl(spark, relay, t2p, num_buckets=4, source="s0")


def _post_ddl_batch(spark, t1: LakeTable, lsn: int, conv: str, text: str):
    """One post-DDL-layout upsert batch for t1 (speaker/bigint/no tool)."""
    base = datetime(2024, 6, 2, tzinfo=timezone.utc)
    schema = T.StructType(
        [
            T.StructField("op", T.StringType(), False),
            T.StructField("lsn", T.LongType(), False),
            T.StructField("commit_ts", T.TimestampType(), True),
            T.StructField("conv_id", T.StringType(), True),
            T.StructField("turn_idx", T.LongType(), True),
            T.StructField("speaker", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    batch = spark.createDataFrame(
        [("I", lsn, base, conv, 1, "user", text, base)], schema
    )
    apply_batch(t1, batch, last_applied_batch_id(t1) + 1, collect_stats=False)


def test_stream_ddl_survives_vacuum_and_rebase(spark, tmp_path):
    """After a caught-up replica's feed is re-anchored (publish rebase) and
    vacuumed — which DROPS the DDL boundary chunk and merges segments —
    the replica keeps consuming new chunks and converges.  Regression: the
    original marker stored segment-START ordinals; vacuum shifted the
    boundaries, the merged segment inherited 'drained', and every chunk
    after the vacuum was silently skipped with a success result."""
    from credix_data_pipeline_spark.operators.relay import vacuum_relay

    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)                      # chunk 0
    runner.stream_ddl(spark, relay, t2p, num_buckets=4)
    _ddl_burst(spark, t1)
    publish_changes(t1, relay)                      # chunk 1 (DDL boundary)
    runner.stream_ddl(spark, relay, t2p, num_buckets=4)
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2, ("speaker", "text")) == _state(t1, ("speaker", "text"))

    # upstream re-anchors and vacuums: chunks 0-1 drop, boundary at 1 gone
    _post_ddl_batch(spark, t1, 60_000_001, "convVAC1", "post-vacuum row 1")
    publish_changes(t1, relay, rebase=True)         # chunk 2 (re-anchor)
    assert vacuum_relay(relay)["vacuumed_chunks"] == 2
    _post_ddl_batch(spark, t1, 60_000_002, "convVAC2", "post-vacuum row 2")
    publish_changes(t1, relay)                      # chunk 3

    res = runner.stream_ddl(spark, relay, t2p, num_buckets=4)
    assert res["segments_run"] >= 1 and res["batches"] >= 1
    t2 = LakeTable.load(spark, t2p)
    got = _state(t2, ("speaker", "text"))
    assert got == _state(t1, ("speaker", "text"))
    assert got[("convVAC2", 1)] == ("user", "post-vacuum row 2")


def test_stream_ddl_fresh_bootstrap_then_resume(spark, tmp_path):
    """A fresh replica bootstrapped at the rebase chunk of a vacuumed feed
    keeps consuming on later calls.  Regression: the bootstrap recorded the
    ADJUSTED segment start in the marker while resume segmented from 0, so
    the second call raised 'vacuumed past this replica's progress' on a
    perfectly healthy replica."""
    from credix_data_pipeline_spark.operators.relay import vacuum_relay

    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)                      # chunk 0
    _ddl_burst(spark, t1)
    publish_changes(t1, relay)                      # chunk 1 (DDL)
    publish_changes(t1, relay, rebase=True)         # chunk 2 (re-anchor)
    vacuum_relay(relay)

    res1 = runner.stream_ddl(spark, relay, t2p, num_buckets=4)
    assert res1["segments_run"] == 1 and res1["ddl_applied"] == 0
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2, ("speaker", "text")) == _state(t1, ("speaker", "text"))

    _post_ddl_batch(spark, t1, 61_000_001, "convBOOT", "after bootstrap")
    publish_changes(t1, relay)                      # chunk 3
    res2 = runner.stream_ddl(spark, relay, t2p, num_buckets=4)  # raised pre-fix
    assert res2["batches"] >= 1
    t2 = LakeTable.load(spark, t2p)
    got = _state(t2, ("speaker", "text"))
    assert got == _state(t1, ("speaker", "text"))
    assert got[("convBOOT", 1)] == ("user", "after bootstrap")


def test_stream_ddl_legacy_marker_migration(spark, tmp_path):
    """A legacy drained_starts marker migrates when its boundaries still
    exist; one referencing vanished boundaries (feed vacuumed under the old
    format) fails loudly instead of guessing."""
    import pytest

    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    runner.stream_ddl(spark, relay, t2p, num_buckets=4)
    _ddl_burst(spark, t1)
    publish_changes(t1, relay)
    runner.stream_ddl(spark, relay, t2p, num_buckets=4)

    marker = os.path.join(t2p, "_ss_ddl_segments.json")
    with open(marker, "w") as f:
        json.dump({"drained_starts": [0]}, f)  # the pre-fix format
    _post_ddl_batch(spark, t1, 62_000_001, "convLEG", "post-migration")
    publish_changes(t1, relay)
    res = runner.stream_ddl(spark, relay, t2p, num_buckets=4)
    assert res["batches"] >= 1
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2, ("speaker", "text")) == _state(t1, ("speaker", "text"))
    assert "drained_through" in json.load(open(marker))

    # a legacy marker naming a boundary that no longer exists = unknowable
    # progress -> refuse
    with open(marker, "w") as f:
        json.dump({"drained_starts": [99]}, f)
    with pytest.raises(RuntimeError, match="legacy stream_ddl marker"):
        runner.stream_ddl(spark, relay, t2p, num_buckets=4)


def test_rebase_publish_carries_span_ddl(spark, tmp_path):
    """Hypothesis-found: publish -> widen -> REBASE publish emitted the
    re-anchor chunk with NO DDL boundary, so the reader saw one column
    under two types in one segment (fresh drains crashed) and a continuing
    replica could never converge its layout.  A rebase publish must record
    the span's DDL events exactly like a normal publish — a fresh replica
    re-applies them as no-ops (apply_ddl is idempotent)."""
    from datetime import datetime, timezone

    from pyspark.sql import types as T

    from credix_data_pipeline_spark.operators.apply import apply_batch
    from credix_data_pipeline_spark.schema import (
        CHANGE_SCHEMA,
        target_schema_for,
    )

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    up = LakeTable.create(
        spark, str(tmp_path / "up"), target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=4, bucket_by=["conv_id"],
    )
    relay = str(tmp_path / "relay")
    apply_batch(up, spark.createDataFrame(
        [("I", 1, base, "c0", 0, "user", "t0", None, base)], CHANGE_SCHEMA),
        0, collect_stats=False)
    publish_changes(up, relay)

    # a continuing replica consumes the pre-DDL span under the old layout
    down = str(tmp_path / "down")
    runner.stream_ddl(spark, relay, down, num_buckets=2)

    up.widen_column("turn_idx", T.LongType())
    up = LakeTable.load(spark, up.path)
    apply_batch(up, spark.createDataFrame(
        [("I", 2, base, "c1", 0, "user", "t1", None, base)], CHANGE_SCHEMA),
        1, collect_stats=False)
    publish_changes(up, relay, rebase=True)

    # fresh replica bootstraps at the rebase chunk (no type-mix crash)
    fresh = str(tmp_path / "fresh")
    runner.stream_ddl(spark, relay, fresh, num_buckets=2)
    tf = LakeTable.load(spark, fresh)
    assert dict((f.name, f.dataType.simpleString())
                for f in tf.current().schema.fields)["turn_idx"] == "bigint"

    # the continuing replica converges layout AND values through the DDL
    runner.stream_ddl(spark, relay, down, num_buckets=2)
    td = LakeTable.load(spark, down)
    assert dict((f.name, f.dataType.simpleString())
                for f in td.current().schema.fields)["turn_idx"] == "bigint"
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in read_clean(td).select("conv_id", "turn_idx", "text").collect()
    }
    want = {
        (r.conv_id, r.turn_idx): r.text
        for r in read_clean(up).select("conv_id", "turn_idx", "text").collect()
    }
    assert got == want
