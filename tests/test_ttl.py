"""Row TTL / retention delete (``LakeTable.delete_older_than`` — the
Iceberg ``DELETE FROM t WHERE ts < X`` partition-expiry pattern).

The contract under test: rows with event time before the cutoff vanish
from the clean read; rows with NULL ``ts`` (tombstones, unparsed events)
survive; files wholly below the cutoff drop by manifest stats alone (no
data read, no new files); only boundary buckets rewrite; the whole TTL is
ONE atomic commit; and under blind-append MoR a dropped newest version can
never resurrect an older one."""

from __future__ import annotations

import datetime
import json
import os

import pytest

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.main import main as cli_main
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.sources.feed import (
    BASE_EPOCH_S,
    FeedSpec,
    write_feed,
)
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=3_000,
    n_conversations=60,
    turns_per_conversation=6,
    delete_pct=8,
    duplicate_pct=3,
    shuffle_window=32,
    events_per_chunk=500,
)


def _ms(epoch_s: int) -> int:
    return epoch_s * 1000


def _clean_rows(t, **kw):
    df = read_clean(t, **kw) if kw else read_clean(t)
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def _replay(spark, tmp_path, name="t", spec=SPEC, **kw):
    feed = str(tmp_path / f"feed_{name}")
    write_feed(spark, feed, spec)
    path = str(tmp_path / name)
    runner.replay(spark, feed, path, chunks_per_batch=2, num_buckets=8,
                  collect_stats=False, **kw)
    return LakeTable.load(spark, path)


def test_ttl_correctness_and_idempotence(spark, tmp_path):
    t = _replay(spark, tmp_path)
    before = read_clean(t).collect()
    # LWW winners cluster late in event time — take the observed median
    ts_vals = sorted(
        int(r["ts"].replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
        for r in before if r["ts"] is not None
    )
    cutoff = ts_vals[len(ts_vals) // 2]
    expected = sorted(
        tuple(str(r[c]) for c in sorted(before[0].asDict()))
        for r in before
        if r["ts"] is not None
        and int(r["ts"].replace(tzinfo=datetime.timezone.utc).timestamp()
                * 1000) >= cutoff
    )
    pre_sid = t.current().snapshot_id

    snap = t.delete_older_than(cutoff)
    assert snap.summary["operation"] == "ttl-delete"
    # tombstones carry NULL ts, so replayed buckets take the rewrite path
    assert snap.summary["buckets_rewritten"] >= 1
    assert _clean_rows(t) == expected
    # tombstones (NULL ts) survived the rewrite — LWW shielding intact
    tomb = t.current_versions().filter("_deleted").count()
    assert tomb > 0

    # fence carried: the TTL commit must not bury exactly-once resume
    assert "batch_id" in snap.summary

    # idempotent: the same cutoff finds nothing left to do
    again = t.delete_older_than(cutoff)
    assert again.snapshot_id == snap.snapshot_id

    # time travel: the pre-TTL snapshot still shows the expired rows
    old = t.read(snapshot_id=pre_sid).count()
    assert old > read_clean(t).count()


def test_ttl_drops_whole_files_metadata_only(spark, tmp_path):
    """Day-appended layout (each commit = one day, so per-bucket files are
    ts-disjoint): TTL at a day boundary is METADATA-ONLY — whole files drop
    from the manifest, zero rewrites, zero new files.  A mid-day cutoff
    additionally rewrites ONLY the straddling day's buckets while later
    days' files survive untouched — the O(affected) contract."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ])
    DAY_MS = 86_400_000
    t0 = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    t0_ms = int(t0.timestamp() * 1000)
    t = LakeTable.create(spark, str(tmp_path / "t"), schema,
                         key=["conv_id", "turn_idx"], num_buckets=4)
    for d in range(4):  # disjoint conv ranges: appends never duplicate keys
        rows = [(f"conv{c:04d}", i, f"d{d}",
                 t0 + datetime.timedelta(days=d, minutes=c * 10 + i),
                 1 + d * 1000 + c * 4 + i, False)
                for c in range(d * 20, d * 20 + 20) for i in range(4)]
        t.append(spark.createDataFrame(rows, schema))
    snap0 = t.current()
    assert set(snap0.ts_stats) == set(snap0.all_files())

    # --- day-boundary cutoff: pure metadata drop ---
    cutoff = t0_ms + 2 * DAY_MS  # days 0 and 1 expire whole
    expect_drop = {p for p, s in snap0.ts_stats.items() if s[1] < cutoff}
    assert len(expect_drop) >= 4
    snap = t.delete_older_than(cutoff)
    assert snap.summary["files_dropped"] == len(expect_drop)
    assert snap.summary["buckets_rewritten"] == 0
    # no data read, no data written: the file set only SHRANK
    assert set(snap.all_files()) == set(snap0.all_files()) - expect_drop
    assert t.read().filter(
        F.col("ts") < F.timestamp_millis(F.lit(cutoff))).count() == 0
    assert t.read().count() == 2 * 20 * 4  # days 2 and 3 intact

    # --- straddling cutoff: lands strictly INSIDE one file's bounds, so
    # that file's bucket rewrites while provably-later files survive
    wide_p, wide_s = max(snap.ts_stats.items(),
                         key=lambda kv: kv[1][1] - kv[1][0])
    cutoff2 = wide_s[0] + (wide_s[1] - wide_s[0]) // 2 + 1
    assert wide_s[0] < cutoff2 <= wide_s[1]
    snap2 = t.delete_older_than(cutoff2)
    assert snap2.summary["buckets_rewritten"] >= 1
    assert wide_p not in snap2.all_files()  # the straddler was rewritten
    # not O(table): some prior files survive byte-identical
    assert set(snap2.all_files()) & set(snap.all_files())
    want = [r for r in t.read(snapshot_id=snap.snapshot_id).collect()
            if int(r["ts"].replace(tzinfo=datetime.timezone.utc)
                   .timestamp() * 1000) >= cutoff2]
    got = t.read().collect()
    assert sorted(map(str, got)) == sorted(map(str, want))

    # retention ages the dropped files off disk; reads keep working
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    for p in expect_drop:
        assert not os.path.exists(os.path.join(t.path, p))
    assert t.read().count() == len(want)


def test_ttl_mor_append_never_resurrects(spark, tmp_path):
    """Blind-append MoR: the latest version of a key can sit in a file
    whose ts bounds are OLDER than a surviving file holding a superseded
    version.  TTL must delete the key, not resurrect the old version —
    i.e. the metadata-drop shortcut is forbidden there."""
    t = _replay(spark, tmp_path, merge_mode="mor-append")
    fence = t.carry_fence()["batch_id"]
    hi_ts = BASE_EPOCH_S + 50_000
    lo_ts = BASE_EPOCH_S - 50_000

    def _batch(lsn, ts_s, text):
        return spark.createDataFrame(
            [("U", lsn, datetime.datetime.fromtimestamp(
                ts_s, datetime.timezone.utc),
              "convXresurrect", 0, "user", text, None,
              datetime.datetime.fromtimestamp(
                  ts_s, datetime.timezone.utc))],
            "op string, lsn long, commit_ts timestamp, conv_id string, "
            "turn_idx int, role string, text string, tool string, "
            "ts timestamp",
        )

    # v1: recent ts; v2 (newer LSN = the LWW winner): ancient ts
    apply_batch(t, _batch(900_001, hi_ts, "v1-new-ts"), fence + 1,
                collect_stats=False)
    apply_batch(t, _batch(900_002, lo_ts, "v2-old-ts"), fence + 2,
                collect_stats=False)
    vis = read_clean(t).filter("conv_id = 'convXresurrect'").collect()
    assert [r["text"] for r in vis] == ["v2-old-ts"]

    cutoff = _ms(BASE_EPOCH_S)  # kills v2, would expose v1 if dropped
    snap = t.delete_older_than(cutoff)
    # no metadata drops on a broken-invariant table — everything rewrote
    assert snap.summary["files_dropped"] == 0
    assert read_clean(t).filter("conv_id = 'convXresurrect'").count() == 0


def test_ttl_propagates_as_changelog_deletes(spark, tmp_path):
    from credix_data_pipeline_spark.operators.changelog import read_changes

    t = _replay(spark, tmp_path)
    pre = t.current()
    rows = read_clean(t).collect()
    visible_before = {
        r["conv_id"] + "/" + str(r["turn_idx"]) for r in rows
    }
    ts_vals = sorted(
        int(r["ts"].replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
        for r in rows if r["ts"] is not None
    )
    cutoff = ts_vals[len(ts_vals) // 2]
    t.delete_older_than(cutoff)
    visible_after = {
        r["conv_id"] + "/" + str(r["turn_idx"])
        for r in read_clean(t).collect()
    }
    gone = visible_before - visible_after
    assert gone

    ch = read_changes(t, pre.snapshot_id).collect()
    dels = {
        r["conv_id"] + "/" + str(r["turn_idx"])
        for r in ch
        if r["_change_type"] == "delete"
    }
    assert gone <= dels  # every TTL'd key reaches downstream as a delete


def test_ttl_cli_and_guardrails(spark, tmp_path, capsys):
    t = _replay(spark, tmp_path)
    ts_vals = sorted(
        r["ts"] for r in read_clean(t).collect() if r["ts"] is not None
    )
    iso = ts_vals[len(ts_vals) // 2].replace(
        tzinfo=datetime.timezone.utc
    ).isoformat()
    rc = cli_main(["ttl", "--table", t.path, "--older-than", iso])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["operation"] == "ttl-delete" and not out["noop"]

    rc = cli_main(["ttl", "--table", t.path, "--older-than", iso])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["noop"]

    # a table without a timestamp ts column refuses
    snap = LakeTable.load(spark, t.path).current()
    assert "ts" in [f.name for f in snap.schema.fields]
    t2 = LakeTable.load(spark, t.path)
    t2.rename_column("ts", "event_ts")
    with pytest.raises(ValueError):
        t2.delete_older_than(0)


def test_ttl_maintenance_policy(spark, tmp_path):
    """retention.ttl-ms drives TTL from maintain(): the policy lives with
    the table, TTL runs before compaction, and a second run is a no-op."""
    import time

    from credix_data_pipeline_spark.operators.maintenance import (
        maintain,
        plan_maintenance,
    )

    t = _replay(spark, tmp_path)
    rows = read_clean(t).collect()
    ts_vals = sorted(
        int(r["ts"].replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
        for r in rows if r["ts"] is not None
    )
    target_cutoff = ts_vals[len(ts_vals) // 2]
    now_ms = int(time.time() * 1000)
    t.alter_properties({"retention.ttl-ms": str(now_ms - target_cutoff)})

    plan = plan_maintenance(t)
    assert plan["ttl"] is not None
    assert abs(plan["ttl"]["cutoff_ms"] - target_cutoff) < 60_000

    rep = maintain(t)
    assert rep["ttl"]["applied"]
    assert rep["ttl"]["buckets_rewritten"] >= 1
    kept = read_clean(t).collect()
    assert all(
        r["ts"] is None
        or int(r["ts"].replace(tzinfo=datetime.timezone.utc).timestamp()
               * 1000) >= rep["ttl"]["cutoff_ms"]
        for r in kept
    )
    assert 0 < len(kept) < len(rows)

    # the cutoff is wall-clock anchored, so it drifts forward run over
    # run (dense 1s-granular data may legitimately expire a few more
    # rows); the invariant is monotonicity + the kept-rows bound, and
    # re-running at the SAME cutoff is a strict no-op
    rep2 = maintain(t)
    assert rep2["ttl"]["cutoff_ms"] >= rep["ttl"]["cutoff_ms"]
    sid = t.current().snapshot_id
    assert t.delete_older_than(rep2["ttl"]["cutoff_ms"]).snapshot_id == sid


def test_ttl_skips_all_null_ts_files(spark, tmp_path):
    """A stats-less file whose ts is entirely NULL can never expire a row:
    TTL must leave it alone (no rewrite churn run after run)."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema,
                         key=["conv_id", "turn_idx"], num_buckets=2)
    t.append(spark.createDataFrame(
        [(f"c{i}", 0, "x", None, i + 1, False) for i in range(20)], schema))
    assert not t.current().ts_stats  # all-null: no bounds recorded
    before = t.current().snapshot_id
    snap = t.delete_older_than(9_999_999_999_999)
    assert snap.snapshot_id == before  # pure no-op, no churn
    assert t.read().count() == 20


def test_ttl_backlog_in_monitor(spark, tmp_path):
    """The monitor's maintenance signal surfaces the TTL backlog: a table
    whose policy cutoff has rows waiting reads PENDING_WORK; running
    maintain drains it back to HEALTHY."""
    import time

    from credix_data_pipeline_spark.operators.maintenance import maintain
    from credix_data_pipeline_spark.streaming.monitoring import (
        maintenance_pressure,
    )

    t = _replay(spark, tmp_path)
    rows = read_clean(t).collect()
    ts_vals = sorted(
        int(r["ts"].replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
        for r in rows if r["ts"] is not None
    )
    cutoff = ts_vals[len(ts_vals) // 2]
    sig0 = maintenance_pressure(spark, t.path)
    assert sig0["ttl"] is None  # no policy, no signal

    t.alter_properties({
        "retention.ttl-ms": str(int(time.time() * 1000) - cutoff)})
    sig1 = maintenance_pressure(spark, t.path)
    assert sig1["status"] == "PENDING_WORK"
    assert (sig1["ttl"]["files_droppable"]
            or sig1["ttl"]["straddling_buckets"])

    maintain(t)
    sig2 = maintenance_pressure(spark, t.path)
    assert sig2["ttl"]["files_droppable"] == 0


def test_ttl_propagates_through_relay(spark, tmp_path):
    """Upstream TTL reaches a downstream relay replica as ordinary delete
    events: after the next publish + replay, the replica's clean state
    equals the upstream's byte-for-byte."""
    from credix_data_pipeline_spark.operators.relay import publish_changes

    def _state(tb):  # payload only: the relay mints its own LSN space
        return {
            (r.conv_id, r.turn_idx): (r.role, r.text, r.tool, str(r.ts))
            for r in read_clean(tb)
            .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
            .collect()
        }

    t = _replay(spark, tmp_path)
    relay, t2p = str(tmp_path / "relay"), str(tmp_path / "t2")
    publish_changes(t, relay)
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2) == _state(t)

    rows = read_clean(t).collect()
    ts_vals = sorted(
        int(r["ts"].replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
        for r in rows if r["ts"] is not None
    )
    t.delete_older_than(ts_vals[len(ts_vals) // 2])
    rep = publish_changes(t, relay)
    assert rep["published_rows"] > 0  # the TTL's deletes are in the feed
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=4)
    t2 = LakeTable.load(spark, t2p)
    assert _state(t2) == _state(t)
    assert len(_state(t2)) < len(rows)


def test_ttl_mor_posdel_equals_cow(spark, tmp_path):
    """Position-delete MoR: the TTL's file-subset rewrite must apply the
    outstanding position deletes while reading (a rewritten file can hold
    superseded row versions) — the post-TTL clean state must equal the CoW
    table's for the same feed and cutoff."""
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    cow_p, mor_p = str(tmp_path / "cow"), str(tmp_path / "mor")
    runner.replay(spark, feed, cow_p, chunks_per_batch=2, num_buckets=8,
                  collect_stats=False)
    runner.replay(spark, feed, mor_p, chunks_per_batch=2, num_buckets=8,
                  collect_stats=False, merge_mode="mor")
    cow, mor = LakeTable.load(spark, cow_p), LakeTable.load(spark, mor_p)
    assert mor.current().mor_deletes
    assert mor.current().all_delete_files()  # deltas actually outstanding

    rows = read_clean(cow).collect()
    ts_vals = sorted(
        int(r["ts"].replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
        for r in rows if r["ts"] is not None
    )
    cutoff = ts_vals[len(ts_vals) // 2]
    cow.delete_older_than(cutoff)
    snap = mor.delete_older_than(cutoff)
    assert snap.summary["operation"] == "ttl-delete"

    def _payload(tb):
        return sorted(
            (r.conv_id, r.turn_idx, r.role, r.text, r.tool, str(r.ts))
            for r in read_clean(tb)
            .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
            .collect()
        )

    assert _payload(mor) == _payload(cow)
    assert len(_payload(mor)) < len(rows)
    # compaction after TTL still collapses cleanly
    mor.compact()
    assert _payload(mor) == _payload(cow)


def test_ttl_policy_requires_ts_column(spark, tmp_path):
    """retention.ttl-* is refused at DECLARATION on a table with no
    timestamp ``ts`` column, and a policy stranded by a later
    drop_column('ts') makes maintain() SKIP the TTL (surfaced in the
    plan) instead of crashing mid-run and aborting the compaction and
    retention work it also owns."""
    from pyspark.sql import types as T

    from credix_data_pipeline_spark.operators.maintenance import (
        maintain,
        plan_maintenance,
    )

    # (a) no ts column at all -> refused when SET
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("note", T.StringType(), True),
            T.StructField("_lsn", T.LongType(), True),
        ]
    )
    t0 = LakeTable.create(
        spark, str(tmp_path / "nots"), schema,
        key=["conv_id", "turn_idx"], num_buckets=2,
    )
    with pytest.raises(ValueError, match="timestamp 'ts' column"):
        t0.alter_properties({"retention.ttl-days": "30"})

    # (b) policy set while ts existed, then ts dropped -> skip, not crash
    t = _replay(spark, tmp_path, name="drop_ts")
    t.alter_properties({"retention.ttl-days": "30"})
    t.drop_column("ts")
    plan = plan_maintenance(t)
    assert plan["ttl"] is not None and "skipped" in plan["ttl"]
    rep = maintain(t)  # pre-fix: ValueError aborted the whole run
    assert "skipped" in rep["ttl"]
    assert "compacted" in rep  # the rest of the policy still evaluated
