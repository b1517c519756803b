"""Structured Streaming mode (ST5), dead-letter (ST6), no-change batches (P8),
and commit-conflict safety."""

from __future__ import annotations

import datetime
import os

import pyspark.sql.functions as F
import pytest

from credix_data_pipeline_spark.lakehouse import CommitConflict, LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner
from credix_data_pipeline_spark.streaming.lineage import LineageLog
from tests.oracle_cdc import oracle_sorted_rows

SPEC = FeedSpec(
    n_events=1_500,
    n_conversations=20,
    turns_per_conversation=6,
    delete_pct=5,
    duplicate_pct=3,
    shuffle_window=16,
    events_per_chunk=500,
)


def test_structured_streaming_available_now(spark, tmp_feed, tmp_table):
    """Genuine readStream → foreachBatch MERGE reaches the oracle state."""
    write_feed(spark, tmp_feed, SPEC)
    q = runner.stream(
        spark, tmp_feed, tmp_table, num_buckets=4, max_files_per_trigger=8
    )
    q.awaitTermination(300)
    t = LakeTable.load(spark, tmp_table)
    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in read_clean(t).select("conv_id", "turn_idx", "text").collect()
    )
    assert got == [
        (c, ti, x) for c, ti, x in oracle_sorted_rows(SPEC, normalize=False)
    ]


def _mk_table(spark, path):
    return LakeTable.create(
        spark,
        path,
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
    )


def _events_df(spark, rows):
    # Parquet files don't enforce nullability — mirror that in the fixture.
    from pyspark.sql import types as T

    lax = T.StructType([T.StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA])
    return spark.createDataFrame(rows, lax)


TS = datetime.datetime(2024, 1, 1)


def test_malformed_events_quarantined_not_applied(spark, tmp_table):
    t = _mk_table(spark, tmp_table)
    lin = LineageLog(tmp_table)
    captured = []
    rows = [
        ("I", 1, TS, "c1", 0, "user", "hello", None, TS),
        ("X", 2, TS, "c1", 1, "user", "bad-op", None, TS),  # unknown op
        ("I", 3, TS, None, 0, "user", "null-key", None, TS),  # null conv_id
        ("U", 4, TS, "c1", 2, "user", "fine", None, TS),
    ]
    res = apply_batch(
        t,
        _events_df(spark, rows),
        0,
        lineage=lin,
        dead_letter=lambda df: captured.append(df.count()),
    )
    assert res.rows_quarantined == 2
    assert captured == [2]
    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in read_clean(t).select("conv_id", "turn_idx", "text").collect()
    )
    assert got == [("c1", 0, "hello"), ("c1", 2, "fine")]


def test_empty_batch_no_commit_but_lineage_row(spark, tmp_table):
    t = _mk_table(spark, tmp_table)
    lin = LineageLog(tmp_table)
    n_snaps = len(t.history())
    res = apply_batch(t, _events_df(spark, []), 0, lineage=lin)
    assert not res.skipped and res.snapshot_id is None
    assert len(t.history()) == n_snaps  # P8: snapshot unchanged
    notes = [r["note"] for r in lin.read(spark).collect()]
    assert "no_changes" in notes


def test_concurrent_commit_conflict_detected(spark, tmp_table):
    """Two writers race the same version: exactly one wins (optimistic CC)."""
    t = _mk_table(spark, tmp_table)
    df = _events_df(
        spark, [("I", 1, TS, "c1", 0, "user", "a", None, TS)]
    ).select("conv_id", "turn_idx", "role", "text", "tool", "ts",
             F.col("lsn").alias("_lsn"), F.lit(False).alias("_deleted"))
    snap = t.current()
    t.append(df)
    # Second writer still holding the old snapshot tries to commit version 2.
    with pytest.raises(CommitConflict):
        t._commit(
            parent=snap,
            schema=snap.schema,
            key=snap.key,
            bucket_by=snap.bucket_by,
            num_buckets=snap.num_buckets,
            files=snap.files,
            summary={"operation": "race"},
        )


def test_quarantine_dir_written_by_replay(spark, tmp_feed, tmp_table, tmp_path):
    """End-to-end: a poisoned chunk lands rows in <table>/_failed/."""
    write_feed(spark, tmp_feed, SPEC)
    t = _mk_table(spark, tmp_table)
    dead = runner.quarantine_writer(tmp_table)
    rows = [("Z", 99, TS, "cX", 0, "user", "poison", None, TS)]
    apply_batch(t, _events_df(spark, rows), 0, dead_letter=dead)
    failed = os.path.join(tmp_table, runner.FAILED_DIR)
    assert spark.read.parquet(failed).count() == 1


def test_auto_compaction_bounds_files_per_bucket(spark, tmp_path):
    """Replay's auto_compact_threshold collapses buckets fattened by
    append-mode loads (the S8 small-file accumulation path — CoW merge
    batches replace their buckets' file sets, so merge alone never
    accumulates) without changing table contents."""
    from pyspark.sql import functions as F

    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.apply import (
        last_applied_batch_id,
        read_clean,
    )
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
    from credix_data_pipeline_spark.streaming import runner

    spec = FeedSpec(n_events=1_600, n_conversations=30,
                    turns_per_conversation=8, delete_pct=5,
                    events_per_chunk=400)
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, spec)
    tablep = str(tmp_path / "table")

    # first half of the feed, no compaction; CoW merge batches replace
    # their buckets' file sets, so only buckets the feed never touches can
    # accumulate files
    runner.replay(spark, feed, tablep, chunks_per_batch=1, num_buckets=64,
                  max_batches=2, collect_stats=False)
    table = LakeTable.load(spark, tablep)

    # find a conv_id hashing to a bucket the feed never dirties
    used = {int(b) for b in table.current().files}
    cands = spark.range(200).select(
        F.concat(F.lit("appended-"), F.col("id")).alias("conv_id"),
        F.pmod(
            F.xxhash64(F.concat(F.lit("appended-"), F.col("id"))), F.lit(64)
        ).cast("int").alias("b"),
    ).collect()
    free = next(r for r in cands if r["b"] not in used)

    # a parallel append loader drops 1-row files into that bucket
    base = read_clean(table).limit(1).drop("_lsn")
    for i in range(4):
        extra = base.select(
            F.lit(free["conv_id"]).alias("conv_id"),
            *[F.col(c) for c in base.columns if c != "conv_id"],
        ).withColumn("turn_idx", F.lit(1000 + i)).withColumn(
            "_lsn", F.lit(10_000_000 + i)
        ).withColumn("_deleted", F.lit(False))
        table.append(extra.select(*[f.name for f in table.current().schema.fields]))
    fat_bucket = str(free["b"])
    assert len(table.current().files[fat_bucket]) == 4

    # rest of the feed with the threshold on -> the fat bucket compacts
    runner.replay(spark, feed, tablep, chunks_per_batch=1, num_buckets=64,
                  collect_stats=False, auto_compact_threshold=2)
    assert len(table.current().files[fat_bucket]) == 1
    ops = [s.summary.get("operation") for s in table.history()]
    assert "compact" in ops
    assert last_applied_batch_id(table) == 3  # 4 batches, fence intact
    # appended rows survive compaction
    appended = {
        (r["conv_id"], r["turn_idx"])
        for r in read_clean(table)
        .filter(F.col("conv_id") == free["conv_id"])
        .collect()
    }
    assert appended == {(free["conv_id"], 1000 + i) for i in range(4)}


def test_stream_mode_writes_listener_progress(spark, tmp_path):
    """The Structured Streaming mode attaches a StreamingQueryListener that
    logs per-batch progress JSON next to the lineage sidecar (ST7)."""
    import json
    import os
    import time

    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
    from credix_data_pipeline_spark.streaming import runner
    from credix_data_pipeline_spark.streaming.listener import PROGRESS_FILE

    feed, table = str(tmp_path / "feed"), str(tmp_path / "table")
    write_feed(spark, feed, FeedSpec(n_events=1_000, n_conversations=20,
                                     turns_per_conversation=8,
                                     events_per_chunk=500))
    q = runner.stream(spark, feed, table, num_buckets=4,
                      available_now=True, collect_stats=False)
    q.awaitTermination()
    progress = os.path.join(table, "_lineage", PROGRESS_FILE)

    # listener events are delivered asynchronously AND per-batch: wait for
    # the FULL row count to land, not just the first progress line — under
    # host load the earlier batches' events can trail the query stop by
    # seconds (observed flake: only the final batch's 34 rows recorded)
    def _progress_rows():
        if not os.path.exists(progress):
            return []
        return [
            json.loads(l) for l in open(progress)
            if l.strip() and json.loads(l)["event"] == "progress"
        ]

    prog = []
    for _ in range(120):
        prog = _progress_rows()
        if sum(p["numInputRows"] for p in prog) >= 1_000:
            break
        time.sleep(0.25)
    assert prog and sum(p["numInputRows"] for p in prog) >= 1_000

    # regression (ADVICE r2): the progress log lives inside _lineage/ but is
    # `_`-prefixed, so every parquet read of the lineage sidecar still works
    from credix_data_pipeline_spark.streaming.lineage import LineageLog

    lin = LineageLog(table)
    assert lin.read(spark).count() >= 1
    assert lin.throughput(spark)["events_in"] >= 1_000


def test_stream_mode_wap_violation_fails_query_then_clean_restart(
    spark, tmp_path
):
    """WAP inside foreachBatch: a violating batch fails the streaming query
    with the published table unchanged; a fixed restart (same SS
    checkpoint) re-delivers the batch and completes to the oracle state."""
    feed, table_path = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(spark, feed, SPEC)

    def corrupt(df):
        return df.withColumn(
            "role",
            F.when(F.col("lsn") >= 700, F.lit("alien")).otherwise(
                F.col("role")
            ),
        )

    q = runner.stream(
        spark, feed, table_path, num_buckets=4, max_files_per_trigger=1,
        transform=corrupt, wap=True,
    )
    with pytest.raises(Exception, match="ContractViolation|accepted_role"):
        q.awaitTermination(300)
        q.processAllAvailable()
    t = LakeTable.load(spark, table_path)
    assert t.staged_snapshot() is None
    assert read_clean(t).filter(F.col("role") == "alien").count() == 0

    # fixed upstream: same checkpoint, the failed batch re-delivers clean
    q2 = runner.stream(
        spark, feed, table_path, num_buckets=4, max_files_per_trigger=1,
        wap=True,
    )
    q2.awaitTermination(300)
    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in read_clean(t).select("conv_id", "turn_idx", "text").collect()
    )
    assert got == [
        (c, ti, x) for c, ti, x in oracle_sorted_rows(SPEC, normalize=False)
    ]


def test_stream_available_now_ignores_uncommitted_chunk_residue(
    spark, tmp_path
):
    """availableNow stream() reads exactly the chunks COMMITTED to the
    feed manifest (brace glob).  Regression: the old open `feed/*` glob
    also consumed chunk dirs whose manifest link never landed — the
    data-before-link residue of a crashed or OCC-losing publish — applying
    rows the feed never committed."""
    from credix_data_pipeline_spark.operators.relay import publish_changes

    feed, t1p, relay, t2p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)

    # simulate a crashed publish: a chunk dir with valid data, NO manifest
    # entry (copy the committed chunk's files under a stray uuid dir and
    # doctor one row so a leak is detectable)
    import json as _json
    import shutil as _shutil

    man = _json.load(open(os.path.join(relay, "_feed.json")))
    committed_sub = [c for c in man["chunks"] if c][0].split("/", 1)[0]
    stray = os.path.join(relay, "deadbeef-crashed-publish")
    _shutil.copytree(os.path.join(relay, committed_sub), stray)
    df = spark.read.parquet(stray)
    doctored = df.limit(1).withColumn(
        "conv_id", F.lit("convSTRAY")
    ).withColumn("lsn", F.lit(99_000_001).cast("long"))
    doctored.write.mode("overwrite").parquet(stray + "_w")
    _shutil.rmtree(stray)
    os.rename(stray + "_w", stray)

    q = runner.stream(spark, relay, t2p, num_buckets=4)
    q.awaitTermination()
    t2 = LakeTable.load(spark, t2p)
    convs = {
        r.conv_id for r in read_clean(t2).select("conv_id").collect()
    }
    assert "convSTRAY" not in convs
    # and the committed rows all arrived
    assert read_clean(t2).count() == read_clean(t1).count()


def test_stream_vacuumed_feed_refused_with_checkpoint_fresh_bootstraps(
    spark, tmp_path
):
    """stream() cannot prove an existing replica consumed a vacuumed span
    (its progress is inside the SS checkpoint) — refuse; a FRESH replica
    bootstraps at the rebase chunk."""
    from credix_data_pipeline_spark.operators.relay import (
        publish_changes,
        vacuum_relay,
    )

    feed, t1p, relay, t2p, t3p = (
        str(tmp_path / d) for d in ("feed", "t1", "relay", "t2", "t3")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)
    q = runner.stream(spark, relay, t2p, num_buckets=4)
    q.awaitTermination()

    publish_changes(t1, relay, rebase=True)
    vacuum_relay(relay)

    with pytest.raises(RuntimeError, match="vacuumed"):
        runner.stream(spark, relay, t2p, num_buckets=4)

    # fresh replica: live chunks start at the rebase re-anchor
    q = runner.stream(spark, relay, t3p, num_buckets=4)
    q.awaitTermination()
    t3 = LakeTable.load(spark, t3p)
    a = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in read_clean(t1).select("conv_id", "turn_idx", "text").collect()
    )
    b = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in read_clean(t3).select("conv_id", "turn_idx", "text").collect()
    )
    assert a == b


def test_guard_continuous_batch(spark, tmp_path):
    """The per-batch gate continuous streams run: DDL channel, mid-stream
    schema adds, and uncommitted chunk dirs all raise; a clean batch passes
    with the helper column dropped."""
    from credix_data_pipeline_spark.operators.relay import publish_changes
    from credix_data_pipeline_spark.streaming.runner import (
        _guard_continuous_batch,
    )

    feed, t1p, relay = (str(tmp_path / d) for d in ("feed", "t1", "relay"))
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, t1p, chunks_per_batch=2, num_buckets=8)
    t1 = LakeTable.load(spark, t1p)
    publish_changes(t1, relay)

    import json as _json

    man = _json.load(open(os.path.join(relay, "_feed.json")))
    pinned = {f["name"] for f in man["schema"]["fields"]}
    sub = [c for c in man["chunks"] if c][0].split("/", 1)[0]
    committed_file = "file://" + os.path.join(
        os.path.abspath(relay), sub, "part-0.parquet"
    )
    stray_file = "file://" + os.path.join(
        os.path.abspath(relay), "deadbeef-stray", "part-0.parquet"
    )
    batch_ok = spark.createDataFrame(
        [("a", committed_file)], "conv_id string, _graft_src_file string"
    )
    out = _guard_continuous_batch(relay, pinned, batch_ok)
    assert "_graft_src_file" not in out.columns

    batch_bad = spark.createDataFrame(
        [("a", stray_file)], "conv_id string, _graft_src_file string"
    )
    with pytest.raises(RuntimeError, match="not committed"):
        _guard_continuous_batch(relay, pinned, batch_bad)

    # feed schema gained a column after the stream pinned its own
    with pytest.raises(RuntimeError, match="evolved mid-stream"):
        _guard_continuous_batch(relay, pinned - {"text"}, batch_ok)

    # feed gained a DDL channel
    t1.rename_column("role", "speaker")
    publish_changes(t1, relay)
    with pytest.raises(RuntimeError, match="DDL channel"):
        _guard_continuous_batch(relay, pinned, batch_ok)
