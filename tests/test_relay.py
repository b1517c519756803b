"""CDC relay: a LakeTable as a change-feed SOURCE (operators/relay.py).

The chained-pipeline property: replay a feed into T1, publish T1's changes
as a new feed, replay that into T2 — T2's clean state must equal T1's.
Incremental publishes append chunks and the downstream replay catches up
through its own checkpoint, exactly like tailing a live WAL.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from credix_data_pipeline_spark.functions.normalize import with_normalized_text
from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.operators.relay import publish_changes
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=3_000,
    n_conversations=50,
    turns_per_conversation=8,
    delete_pct=8,
    duplicate_pct=4,
    events_per_chunk=500,
)


def _state(t: LakeTable) -> dict:
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in read_clean(t)
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .collect()
    }


def test_publish_then_replay_reproduces_state(spark, tmp_path):
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(
        spark, feed, t1p, chunks_per_batch=2, num_buckets=8,
        transform=with_normalized_text,
    )
    t1 = LakeTable.load(spark, t1p)
    rep = publish_changes(t1, relay)
    assert rep["published_rows"] > 0 and rep["chunk"] == 0

    # downstream replays the published feed with NO transform: text was
    # already normalized upstream, the relay carries final row images
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2) == _state(t1)

    # no new upstream commits -> publish is a no-op
    rep2 = publish_changes(t1, relay)
    assert rep2["skipped"] and rep2["published_rows"] == 0


def test_incremental_publish_and_downstream_catchup(spark, tmp_path):
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)

    # phase 1: apply half the feed upstream, publish, sync downstream
    runner.replay(
        spark, feed, t1p, chunks_per_batch=1, num_buckets=8, max_batches=3,
        transform=with_normalized_text,
    )
    t1 = LakeTable.load(spark, t1p)
    rep1 = publish_changes(t1, relay)
    assert rep1["chunk"] == 0 and rep1["published_rows"] > 0
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2) == _state(t1)

    # phase 2: rest of the feed upstream, second publish appends chunk 1,
    # the SAME downstream checkpoint replays only the new chunk
    runner.replay(
        spark, feed, t1p, chunks_per_batch=1, num_buckets=8,
        transform=with_normalized_text,
    )
    rep2 = publish_changes(t1, relay)
    assert rep2["chunk"] == 1 and not rep2["skipped"]
    stats = runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    assert stats.batches == 1  # only the new chunk
    assert _state(t2) == _state(t1)


def test_relayed_deletes_carry_deleting_lsn(spark, tmp_path):
    """A key deleted upstream must disappear downstream — only works if the
    relayed D event's LSN beats the key's earlier relayed upsert."""
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8,
                  max_batches=3)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    t2 = LakeTable.load(spark, t2p)
    live_before = set(_state(t2))

    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8)
    publish_changes(t1, relay)

    # some keys live after phase 1 were deleted by the rest of the feed
    deleted = live_before - set(_state(t1))
    assert deleted, "feed spec must delete at least one phase-1 key"
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    after = set(_state(t2))
    assert not (deleted & after)
    assert after == set(_state(t1))


def test_relay_manifest_and_state_shape(spark, tmp_path):
    feed, t1p, relay = (str(tmp_path / d) for d in ("feed", "t1", "relay"))
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    with open(os.path.join(relay, "_feed.json")) as f:
        man = json.load(f)
    # one chunk, under a uuid-suffixed attempt dir (ADVICE r3: unique dir
    # per publish attempt so a concurrent loser can't clobber the winner)
    assert len(man["chunks"]) == 1
    chunk0 = man["chunks"][0]
    sub0 = chunk0.split(os.sep, 1)[0]
    assert sub0.startswith("pub00000-") and chunk0.endswith("chunk=0")
    assert man["format"] == "parquet"
    assert sub0 in man["schemas"]
    span = man["chunk_snapshots"][chunk0]
    assert span["to"] == t1.current().snapshot_id
    assert span["from"] == t1.history()[0].snapshot_id
    # every published op is I/U/D with a non-null lsn (replay-applicable)
    df = spark.read.parquet(os.path.join(relay, sub0))
    assert df.filter(
        F.col("lsn").isNull() | ~F.col("op").isin("I", "U", "D")
    ).count() == 0
    # deletes carry null payload but real keys
    d = df.filter(F.col("op") == "D")
    if d.count():
        assert d.filter(F.col("conv_id").isNull()).count() == 0
        assert d.filter(F.col("text").isNotNull()).count() == 0


def test_relay_through_upstream_evolution(spark, tmp_path):
    """Upstream feed evolves mid-stream (tool_meta); publishes before and
    after the boundary carry different schemas and the downstream table
    evolves in-flight, ending equal to upstream."""
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    spec = FeedSpec(
        n_events=2_000, n_conversations=40, turns_per_conversation=8,
        events_per_chunk=500, evolution_frac=0.5,
    )
    write_feed(spark, feed, spec)
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8,
                  max_batches=2)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)

    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8)
    publish_changes(t1, relay)
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    t2 = LakeTable.load(spark, t2p)
    assert "tool_meta" in [f.name for f in t2.current().schema.fields]
    up = {
        (r.conv_id, r.turn_idx): (r.text, r.tool_meta)
        for r in read_clean(t1)
        .select("conv_id", "turn_idx", "text", "tool_meta").collect()
    }
    down = {
        (r.conv_id, r.turn_idx): (r.text, r.tool_meta)
        for r in read_clean(t2)
        .select("conv_id", "turn_idx", "text", "tool_meta").collect()
    }
    assert down == up


def test_cli_publish(spark, tmp_path, capsys):
    from credix_data_pipeline_spark import main as cli

    feed, t1p, relay = (str(tmp_path / d) for d in ("feed", "t1", "relay"))
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    assert cli.main(["publish", "--table", t1p, "--out", relay]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["published_rows"] > 0 and out["chunk"] == 0


def test_replay_publish_to_chains_per_batch(spark, tmp_path):
    """replay(publish_to=...) relays after every checkpoint advance: the
    downstream feed accumulates one chunk per batch and a downstream replay
    converges to the upstream state."""
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)  # 6 chunks at 500/chunk (+dups)
    stats = runner.replay(
        spark, feed, t1p, chunks_per_batch=2, num_buckets=8,
        transform=with_normalized_text, publish_to=relay,
    )
    with open(os.path.join(relay, "_feed.json")) as f:
        man = json.load(f)
    assert len(man["chunks"]) == stats.batches
    runner.replay(spark, relay, t2p, chunks_per_batch=2, num_buckets=4)
    t1 = LakeTable.load(spark, t1p)
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2) == _state(t1)


def test_stream_mode_publish_to(spark, tmp_path):
    """Structured Streaming mode relays inside foreachBatch; the downstream
    replay converges to the upstream streaming table."""
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    q = runner.stream(
        spark, feed, t1p, num_buckets=8, max_files_per_trigger=3,
        publish_to=relay,
    )
    q.awaitTermination(300)
    runner.replay(spark, relay, t2p, chunks_per_batch=2, num_buckets=4)
    t1 = LakeTable.load(spark, t1p)
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2) == _state(t1)


def test_publish_crash_residue_left_unreferenced_then_swept(spark, tmp_path):
    """A crash after the chunk write but before the manifest swap leaves an
    UNREFERENCED uuid chunk dir (never overwritten — ADVICE r3); the next
    publish covers the full span under a fresh dir, downstream state is
    correct, and the residue is swept once past the age grace."""
    import shutil

    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8,
                  max_batches=3)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    man0 = json.load(open(os.path.join(relay, "_feed.json")))
    sub0 = man0["chunks"][0].split(os.sep, 1)[0]

    # simulate the crashed second publish: a chunk-1 attempt dir exists,
    # manifest not updated (exactly the write-then-swap window)
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8,
                  max_batches=1)
    residue = "pub00001-deadbeef"
    shutil.copytree(
        os.path.join(relay, sub0), os.path.join(relay, residue)
    )
    assert json.load(open(os.path.join(relay, "_feed.json"))) == man0

    # more upstream progress, then a clean publish: chunk 1 covers the
    # WHOLE span since chunk 0 under a NEW dir; the residue dir is fresh
    # (inside the grace window) so it is left alone, just unreferenced
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8)
    rep = publish_changes(t1, relay)
    assert rep["chunk"] == 1
    man = json.load(open(os.path.join(relay, "_feed.json")))
    assert len(man["chunks"]) == 2
    sub1 = man["chunks"][1].split(os.sep, 1)[0]
    assert sub1.startswith("pub00001-") and sub1 != residue
    assert man["chunk_snapshots"][man["chunks"][1]]["from"] == \
        man["chunk_snapshots"][man["chunks"][0]]["to"]
    assert os.path.isdir(os.path.join(relay, residue))
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    assert _state(LakeTable.load(spark, t2p)) == _state(t1)

    # a later publish with grace 0 sweeps the residue, keeps the committed
    # chunks intact
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8)
    t1.append(
        spark.createDataFrame(
            [("convXRES", 0, "user", "late", None, None, 10_000_001, False)],
            t1.current().schema,
        )
    )
    publish_changes(t1, relay, residue_grace_sec=0.0)
    assert not os.path.isdir(os.path.join(relay, residue))
    man2 = json.load(open(os.path.join(relay, "_feed.json")))
    for c in man2["chunks"]:
        assert os.path.isdir(
            os.path.join(relay, c.split(os.sep, 1)[0])
        )


def test_publish_propagates_upstream_rollback(spark, tmp_path):
    """An upstream rollback_to publishes as the compensating diff: the
    downstream replica converges to the rolled-back state."""
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8,
                  max_batches=3)
    t1 = LakeTable.load(spark, t1p)
    good = t1.current().snapshot_id
    publish_changes(t1, relay)
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)

    # a bad span lands upstream and gets published downstream
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8)
    publish_changes(t1, relay)
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2) == _state(t1)

    # roll the upstream back; the next publish emits the compensation
    t1.rollback_to(good)
    rep = publish_changes(t1, relay)
    assert not rep["skipped"] and rep["published_rows"] > 0
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    assert _state(t2) == _state(t1)


def test_publish_from_mor_upstream(spark, tmp_path):
    """Relaying from a merge-on-read upstream collapses delta versions to
    LWW winners before diffing; the downstream (CoW) replica matches."""
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8,
                  merge_mode="mor")
    t1 = LakeTable.load(spark, t1p)
    rep = publish_changes(t1, relay)
    assert rep["published_rows"] > 0
    runner.replay(spark, relay, t2p, chunks_per_batch=2, num_buckets=4)
    t2 = LakeTable.load(spark, t2p)
    from credix_data_pipeline_spark.operators.apply import read_current

    up = {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in read_current(t1)
        .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        .select("conv_id", "turn_idx", "role", "text", "tool").collect()
    }
    assert _state(t2) == up


def test_concurrent_publish_loses_cleanly(spark, tmp_path):
    """Two publishers racing on one relay dir: the loser's manifest CAS
    (exclusive link of the next version) raises CommitConflict instead of
    silently dropping the winner's span from the chunk chain."""
    import pytest

    from credix_data_pipeline_spark.lakehouse.table import CommitConflict
    from credix_data_pipeline_spark.operators.relay import (
        _commit_manifest,
        _load_manifest,
    )

    feed, t1p, relay = (str(tmp_path / d) for d in ("feed", "t1", "relay"))
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    man, v = _load_manifest(relay)
    assert v == 1 and len(man["chunks"]) == 1

    # both publishers loaded v1; the winner commits v2 first...
    _commit_manifest(relay, {**man, "winner": True}, v + 1)
    # ...so the loser's CAS on the same next version must fail loudly
    with pytest.raises(CommitConflict):
        _commit_manifest(relay, {**man, "winner": False}, v + 1)
    got, v2 = _load_manifest(relay)
    assert v2 == 2 and got.get("winner") is True


def test_publish_crash_between_versioned_and_plain_manifest(spark, tmp_path):
    """_feed.json lagging one publish behind the versioned manifest (crash
    window) still resumes from the versioned state — no span doubled — and
    the next successful publish repairs the plain copy."""
    from pyspark.sql import functions as F2

    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8,
                  max_batches=3)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    man_v1 = json.load(open(os.path.join(relay, "_feed.v1.json")))

    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8)
    publish_changes(t1, relay)
    # simulate the crash: roll the PLAIN manifest back to v1 (stale), keep v2
    with open(os.path.join(relay, "_feed.json"), "w") as f:
        json.dump(man_v1, f)

    # no new upstream commits: resume state is the VERSIONED v2 -> no-op
    assert publish_changes(t1, relay)["skipped"]

    # a real new span -> v3 commits and the plain manifest is repaired
    extra = t1.read(buckets=[]).sparkSession.createDataFrame(
        [("convZ", 0, "user", "late row", None, None, 10**9, False)],
        t1.current().schema,
    )
    t1.append(extra)
    rep = publish_changes(t1, relay)
    assert not rep["skipped"] and rep["chunk"] == 2
    man = json.load(open(os.path.join(relay, "_feed.json")))
    assert man["chunks"] == json.load(
        open(os.path.join(relay, "_feed.v3.json")))["chunks"]
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    assert _state(LakeTable.load(spark, t2p)) == _state(t1)


def test_relay_base_survives_aggressive_retention(spark, tmp_path):
    """Each publish tags its base snapshot (retention-exempt), so
    expire_snapshots between publishes can never break the relay chain."""
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8,
                  max_batches=3)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    assert any(n.startswith("relay-") for n in t1.tags())

    # lots of churn, then the most aggressive retention possible
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8)
    t1.compact()
    t1.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)

    # the pinned base is still resolvable -> incremental publish succeeds
    rep = publish_changes(t1, relay)
    assert not rep["skipped"] and rep["chunk"] == 1
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    assert _state(LakeTable.load(spark, t2p)) == _state(t1)
    # the old pin was superseded; exactly one relay tag remains
    relay_tags = [n for n in t1.tags() if n.startswith("relay-")]
    assert len(relay_tags) == 1 and relay_tags[0].endswith("-v2")


def test_downstream_stream_tails_live_publishes(spark, tmp_path):
    """A downstream Structured Streaming query tails the relay dir LIVE:
    chunks published while the query runs are picked up by the file source
    without a restart — true multi-hop streaming."""
    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8,
                  max_batches=3)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)

    q = runner.stream(spark, relay, t2p, num_buckets=4,
                      available_now=False, processing_time="1 seconds")
    try:
        q.processAllAvailable()
        t2 = LakeTable.load(spark, t2p)
        assert _state(t2) == _state(t1)

        # live: more upstream progress published while the query runs
        runner.replay(spark, feed, t1p, chunks_per_batch=1, num_buckets=8)
        publish_changes(t1, relay)
        q.processAllAvailable()
        assert _state(t2) == _state(t1)
    finally:
        q.stop()


def test_relay_ddl_channel_rename_widen_drop(spark, tmp_path):
    """VERDICT r3 #1: upstream rename + widen + drop mid-stream replicate
    through the DDL channel — the downstream replica converges to the
    upstream layout byte-equal WITHOUT any manual alter."""
    from datetime import datetime, timezone

    from pyspark.sql import types as T

    from credix_data_pipeline_spark.operators.apply import (
        apply_batch,
        last_applied_batch_id,
    )

    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8,
                  transform=with_normalized_text)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    runner.replay(spark, relay, t2p, chunks_per_batch=2, num_buckets=4)

    # upstream DDL burst + more data under the NEW layout
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
    rep = publish_changes(t1, relay)
    assert not rep["skipped"]

    man = json.load(open(os.path.join(relay, "_feed.json")))
    ddl = man["ddl"][man["chunks"][1]]
    assert {e["op"] for e in ddl} == {"rename", "widen", "drop"}

    # replica catches up: DDL applies before the chunk merges, no manual
    # alter — layouts AND values converge
    runner.replay(spark, relay, t2p, chunks_per_batch=2, num_buckets=4)
    t2 = LakeTable.load(spark, t2p)
    c1 = read_clean(t1)
    c2 = read_clean(t2)
    assert c1.columns == c2.columns
    assert "speaker" in c2.columns and "tool" not in c2.columns
    assert dict(c2.dtypes)["turn_idx"] == "bigint"
    s1 = {
        (r["conv_id"], r["turn_idx"]): (r["speaker"], r["text"])
        for r in c1.select("conv_id", "turn_idx", "speaker", "text").collect()
    }
    s2 = {
        (r["conv_id"], r["turn_idx"]): (r["speaker"], r["text"])
        for r in c2.select("conv_id", "turn_idx", "speaker", "text").collect()
    }
    assert s1 == s2
    assert s1[("convDDLNEW", 7)] == ("user", "post-ddl insert")

    # second hop: the replica's own relay re-derives the DDL from its own
    # snapshots — a bronze→silver→gold chain converges end-to-end
    relay2, t3p = str(tmp_path / "relay2"), str(tmp_path / "t3")
    publish_changes(t2, relay2)
    runner.replay(spark, relay2, t3p, chunks_per_batch=1, num_buckets=2)
    t3 = LakeTable.load(spark, t3p)
    assert read_clean(t3).columns == c1.columns
    s3 = {
        (r["conv_id"], r["turn_idx"]): (r["speaker"], r["text"])
        for r in read_clean(t3)
        .select("conv_id", "turn_idx", "speaker", "text")
        .collect()
    }
    assert s3 == s1


def test_relay_ddl_idempotent_on_redelivery(spark, tmp_path):
    """A crash between apply and checkpoint re-delivers the DDL-bearing
    chunk: re-applying its DDL must be a no-op and the replica still
    converges (the exactly-once fence covers the data; apply_ddl covers
    the ALTERs)."""
    from credix_data_pipeline_spark.operators.relay import apply_ddl

    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    t1.rename_column("role", "speaker")
    t1.append(
        spark.createDataFrame(
            [("convIDEM", 0, "user", "idem", None, None, 60_000_000, False)],
            t1.current().schema,
        )
    )
    publish_changes(t1, relay)

    man = json.load(open(os.path.join(relay, "_feed.json")))
    ddl = man["ddl"][man["chunks"][1]]

    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    t2 = LakeTable.load(spark, t2p)
    v = t2.current().version
    # redelivery: applying the same DDL again must change nothing
    assert apply_ddl(t2, ddl) == 0
    assert t2.current().version == v

    def _s(t):
        return {
            (r.conv_id, r.turn_idx): (r.speaker, r.text)
            for r in read_clean(t)
            .select("conv_id", "turn_idx", "speaker", "text")
            .collect()
        }

    assert _s(t2) == _s(t1)


def test_stream_refuses_ddl_bearing_relay_feed(spark, tmp_path):
    """SS pins the source schema at query start, so stream() must refuse a
    relay feed that carries DDL events instead of silently mis-aligning;
    replay() owns the DDL channel."""
    import pytest

    from credix_data_pipeline_spark.sources import feed as feed_mod

    feed, t1p, relay = (
        str(tmp_path / d) for d in ("feed", "t1", "relay")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    up = LakeTable.load(spark, t1p)
    publish_changes(up, relay)
    up.rename_column("text", "body")
    publish_changes(up, relay)
    man = feed_mod.read_manifest(relay)
    assert man.get("ddl")  # the rename shipped as a DDL event
    with pytest.raises(RuntimeError, match="DDL channel"):
        runner.stream(
            spark, relay, str(tmp_path / "down_ss"), num_buckets=2
        )
