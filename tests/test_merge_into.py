"""General conditional MERGE INTO (operators/merge.py): Delta-style
update/delete/insert clauses compiled onto replace_buckets, coexisting
with the CDC replay's LWW + fence discipline."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import (
    ContractViolation,
    apply_batch,
    read_clean,
)
from credix_data_pipeline_spark.operators.merge import merge_into
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=2_000,
    n_conversations=30,
    turns_per_conversation=6,
    delete_pct=5,
    duplicate_pct=3,
    events_per_chunk=500,
)


def _seed(spark, tmp_path, name="t", mode="cow"):
    feed = str(tmp_path / f"feed_{name}")
    path = str(tmp_path / name)
    write_feed(spark, feed, SPEC)
    runner.replay(
        spark, feed, path, chunks_per_batch=2, num_buckets=4,
        merge_mode=mode,
    )
    return LakeTable.load(spark, path), feed


def _clean_state(t):
    return {
        (r.conv_id, r.turn_idx): (r.text, r.role)
        for r in read_clean(t).collect()
    }


def _src(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, role string"
    )


def test_update_delete_insert_cow(spark, tmp_path):
    t, feed = _seed(spark, tmp_path)
    before = _clean_state(t)
    some = sorted(before)[:4]
    upd_key, del_key = some[0], some[1]
    new_key = ("convNEW", 1)
    snap0 = t.current()

    res = merge_into(
        t,
        _src(spark, [
            (*upd_key, "corrected", None),
            (*del_key, None, None),
            (*new_key, "fresh row", "user"),
        ]),
        when_matched_update={"text": "s.text"},
        when_matched_delete="s.text IS NULL",
        when_not_matched_insert=True,
    )
    assert (res["updated"], res["deleted"], res["inserted"]) == (1, 1, 1)

    after = _clean_state(t)
    want = dict(before)
    want[upd_key] = ("corrected", before[upd_key][1])  # role carried
    del want[del_key]
    want[new_key] = ("fresh row", "user")
    assert after == want

    # untouched buckets keep their files byte-identical
    snap1 = t.current()
    dirty = {str(b) for b in res["buckets"]}
    for b, fl in snap0.files.items():
        if b not in dirty:
            assert snap1.files[b] == fl

    # the exactly-once fence survived: a re-replay applies nothing
    stats = runner.replay(spark, feed, t.path, chunks_per_batch=2)
    assert stats.batches == 0
    assert _clean_state(t) == want


def test_minted_lsn_guards_resurrection(spark, tmp_path):
    t, _ = _seed(spark, tmp_path)
    key = sorted(_clean_state(t))[0]
    res = merge_into(
        t,
        _src(spark, [(*key, None, None)]),
        when_matched_delete="s.text IS NULL",
        when_not_matched_insert=False,
    )
    assert res["deleted"] == 1
    # a straggling feed event with a LOWER lsn than the minted tombstone
    # must lose LWW — the key stays deleted
    fence = t.current().summary["batch_id"]
    late = spark.createDataFrame(
        [("U", res["minted_lsn"] - 1, datetime.datetime(2024, 1, 1),
          key[0], key[1], "user", "zombie", None,
          datetime.datetime(2024, 1, 1))],
        "op string, lsn long, commit_ts timestamp, conv_id string, "
        "turn_idx int, role string, text string, tool string, ts timestamp",
    )
    apply_batch(t, late, fence + 1)
    assert key not in _clean_state(t)


def test_insert_revives_tombstoned_key(spark, tmp_path):
    t, _ = _seed(spark, tmp_path)
    key = sorted(_clean_state(t))[0]
    merge_into(
        t, _src(spark, [(*key, None, None)]),
        when_matched_delete="s.text IS NULL",
        when_not_matched_insert=False,
    )
    assert key not in _clean_state(t)
    res = merge_into(
        t, _src(spark, [(*key, "back", "user")]),
        when_not_matched_insert=True,
    )
    assert res["inserted"] == 1
    assert _clean_state(t)[key] == ("back", "user")


def test_mor_matches_cow(spark, tmp_path):
    tc, _ = _seed(spark, tmp_path, "c", "cow")
    tm, _ = _seed(spark, tmp_path, "m", "mor")
    keys = sorted(_clean_state(tc))[:3]
    src_rows = [
        (*keys[0], "X", None),
        (*keys[1], None, None),
        ("convNEW", 9, "Y", "tool"),
    ]
    for t in (tc, tm):
        merge_into(
            t, _src(spark, src_rows),
            when_matched_update={"text": "upper(s.text)"},
            when_matched_delete="s.text IS NULL",
            when_not_matched_insert=True,
        )
    assert _clean_state(tc) == _clean_state(tm)


def test_duplicate_source_keys_refused(spark, tmp_path):
    t, _ = _seed(spark, tmp_path)
    key = sorted(_clean_state(t))[0]
    with pytest.raises(ValueError, match="multiple rows"):
        merge_into(
            t,
            _src(spark, [(*key, "a", None), (*key, "b", None)]),
            when_matched_update={"text": "s.text"},
        )


def test_check_constraint_refuses_whole(spark, tmp_path):
    t, _ = _seed(spark, tmp_path)
    t.alter_properties(
        {"contracts.check.text_nonempty": "length(text) > 0"}
    )
    v0 = t.current().version
    key = sorted(_clean_state(t))[0]
    with pytest.raises(ContractViolation):
        merge_into(
            t, _src(spark, [(*key, "", None)]),
            when_matched_update={"text": "s.text"},
        )
    assert t.current().version == v0  # nothing committed


def test_expressions_see_both_sides(spark, tmp_path):
    t, _ = _seed(spark, tmp_path)
    before = _clean_state(t)
    key = sorted(before)[0]
    res = merge_into(
        t, _src(spark, [(*key, "suffix", None)]),
        when_matched_update={"text": "concat(t.text, ':', s.text)"},
        when_not_matched_insert=False,
    )
    assert res["updated"] == 1
    assert _clean_state(t)[key][0] == f"{before[key][0]}:suffix"


def test_noop_and_changelog(spark, tmp_path):
    from credix_data_pipeline_spark.operators.changelog import read_changes

    t, _ = _seed(spark, tmp_path)
    v0 = t.current().version
    # no clause fires: unmatched key with insert disabled
    res = merge_into(
        t, _src(spark, [("convNOPE", 0, "x", None)]),
        when_matched_update={"text": "s.text"},
        when_not_matched_insert=False,
    )
    assert res.get("noop") is True
    assert t.current().version == v0

    key = sorted(_clean_state(t))[0]
    sid0 = t.current().snapshot_id
    merge_into(
        t, _src(spark, [(*key, "changed", None), ("convNEW", 3, "n", None)]),
        when_matched_update={"text": "s.text"},
        when_not_matched_insert=True,
    )
    ch = read_changes(t, from_snapshot_id=sid0)
    kinds = {
        (r.conv_id, r.turn_idx): r._change_type
        for r in ch.collect()
        if r._change_type in ("insert", "update_after")
    }
    assert kinds[key] == "update_after"
    assert kinds[("convNEW", 3)] == "insert"


def test_null_source_key_refused(spark, tmp_path):
    """A NULL-key source row would never match the join and would insert
    an unfindable ghost that LWW-collapses with every other NULL key —
    refused loudly like every other write path (review batch 4)."""
    t, _ = _seed(spark, tmp_path)
    src = _src(spark, [(None, 0, "ghost", "user")])
    with pytest.raises(ValueError, match="NULL key"):
        merge_into(t, src, when_not_matched_insert=True)
    src2 = _src(spark, [("conv-0", None, "ghost", "user")])
    with pytest.raises(ValueError, match="NULL key"):
        merge_into(t, src2, when_not_matched_insert=True)


def test_plain_table_without_engine_columns(spark, tmp_path):
    """Tables created outside the CDC path (no _lsn/_deleted) must still
    take inserts and updates; deletes are refused with a pointer at
    delete_keys (a tombstone cannot be expressed without _deleted)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "plain"), schema,
        key=["conv_id", "turn_idx"], num_buckets=4, bucket_by=["conv_id"],
    )
    t.append(spark.createDataFrame([("c1", 0, "old")], schema))
    res = merge_into(
        t,
        spark.createDataFrame([("c1", 0, "new"), ("c2", 0, "ins")], schema),
        when_matched_update={"text": "s.text"},
        when_not_matched_insert=True,
    )
    assert res["updated"] == 1 and res["inserted"] == 1
    assert res["minted_lsn"] is None
    got = sorted((r.conv_id, r.text) for r in read_clean(t).collect())
    assert got == [("c1", "new"), ("c2", "ins")]
    with pytest.raises(ValueError, match="delete_keys"):
        merge_into(
            t, spark.createDataFrame([("c1", 0, "x")], schema),
            when_matched_delete="true",
        )
