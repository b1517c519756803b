"""Partial-update (patch) change events — op="P" rows carrying only the
columns listed in the envelope's ``patch_cols`` array (the Postgres-TOAST /
Debezium unavailable-column reality: an UPDATE whose row image omits
unchanged big columns).

Engine semantics = the sequential global-LSN fold: each column takes the
value of the LAST event that SET it (full events / deletes set every
column, patches only their listed ones), under ANY batching or reordering.
The mechanism is column-level LWW with a SPARSE per-column version map
(``_col_lsn``) persisted on rows whose columns were last set at different
LSNs — what row-level LWW cannot express once updates are partial.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import (
    apply_batch,
    read_clean,
    read_current,
)
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner
from tests.oracle_cdc import replay_oracle

SPEC = FeedSpec(
    n_events=3_000,
    n_conversations=40,
    turns_per_conversation=6,
    delete_pct=6,
    duplicate_pct=4,
    patch_pct=35,
    shuffle_window=48,
    events_per_chunk=500,
)

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _state(spark, tp):
    t = LakeTable.load(spark, tp)
    return sorted(
        tuple(r[c] for c in COLS)
        for r in read_clean(t).select(*COLS).collect()
    )


def _oracle(normalize=False):
    st = replay_oracle(SPEC, normalize=normalize)
    return sorted(
        (k[0], k[1], v["role"], v["text"], v["tool"],
         v["ts"].replace(tzinfo=None) if v["ts"] else None)
        for k, v in st.items()
    )


def test_patch_replay_cow_equals_fold_oracle(spark, tmp_path):
    feed, tp = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    assert _state(spark, tp) == _oracle()
    # the sparse map exists only where a column lags the row LSN
    t = LakeTable.load(spark, tp)
    n_maps = read_current(t).filter(F.col("_col_lsn").isNotNull()).count()
    assert n_maps > 0  # patches actually exercised the mechanism


def test_patch_replay_posdel_equals_cow(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)
    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    runner.replay(spark, feed, cow, chunks_per_batch=3, num_buckets=4)
    runner.replay(spark, feed, mor, chunks_per_batch=3, num_buckets=4,
                  merge_mode="mor")
    assert _state(spark, mor) == _state(spark, cow) == _oracle()


def test_patch_refused_on_blind_append_mor(spark, tmp_path):
    feed, tp = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(spark, feed, SPEC)
    with pytest.raises(RuntimeError, match="write-time arbitration"):
        runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                      merge_mode="mor-append")


def test_cross_batch_late_patch_folds_by_column(spark, tmp_path):
    """THE case the map exists for: a patch arriving in a later batch,
    older than the stored row's LSN but newer than the stored value of
    ITS column, must win that column and only that column."""
    sch = ("op string, lsn long, conv_id string, turn_idx int, "
           "role string, text string, tool string, ts timestamp, "
           "patch_cols array<string>")

    def ev(op, lsn, role=None, text=None, pcols=None):
        return ("c1", 0, op, lsn, role, text, pcols)

    def df(rows):
        return spark.createDataFrame(
            [(op, lsn, c, t, r, x, None, None, p)
             for (c, t, op, lsn, r, x, p) in rows], sch)

    tp = str(tmp_path / "t")
    from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for
    table = LakeTable.create(
        spark, tp, target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    # batch 0: full@1 (role=r1 text=a), patch@5 (role=r2)
    apply_batch(table, df([
        ev("I", 1, role="r1", text="a"),
        ev("P", 5, role="r2", pcols=["role"]),
    ]), 0)
    row = read_clean(table).collect()[0]
    assert (row.role, row.text) == ("r2", "a")
    cl = {r["_lsn"]: r["_col_lsn"] for r in read_current(table).collect()}
    assert cl[5]["text"] == 1  # text lags the row LSN
    # batch 1: patch@3 (text=z) — older than the row (5), newer than text (1)
    apply_batch(table, df([ev("P", 3, text="z", pcols=["text"])]), 1)
    row = read_clean(table).collect()[0]
    assert (row.role, row.text, row._lsn) == ("r2", "z", 5)
    cl = read_current(table).collect()[0]["_col_lsn"]
    # tool/ts were SET (to null) by the full event@1 — still lagging
    assert cl == {"text": 3, "tool": 1, "ts": 1}
    # batch 2: a full event@7 resets every column to the row LSN
    apply_batch(table, df([ev("U", 7, role="r3", text="full")]), 2)
    row = read_current(table).collect()[0]
    assert (row.role, row.text, row._lsn, row._col_lsn) == (
        "r3", "full", 7, None)


def test_patch_revives_tombstone_with_partial_row(spark, tmp_path):
    sch = ("op string, lsn long, conv_id string, turn_idx int, "
           "role string, text string, tool string, ts timestamp, "
           "patch_cols array<string>")

    def df(rows):
        return spark.createDataFrame(rows, sch)

    tp = str(tmp_path / "t")
    from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for
    table = LakeTable.create(
        spark, tp, target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    apply_batch(table, df([
        ("I", 1, "c1", 0, "user", "hello", None, None, None),
        ("D", 2, "c1", 0, None, None, None, None, None),
    ]), 0)
    assert read_clean(table).count() == 0
    # a patch AFTER the delete revives with only its carried columns
    apply_batch(table, df([
        ("P", 3, "c1", 0, None, "revived", None, None, ["text"]),
    ]), 1)
    row = read_clean(table).collect()[0]
    assert (row.text, row.role) == ("revived", None)
    # a patch OLDER than a tombstone stays dead
    apply_batch(table, df([
        ("D", 9, "c1", 0, None, None, None, None, None),
        ("P", 5, "c1", 0, None, "late", None, None, ["text"]),
    ]), 2)
    assert read_clean(table).count() == 0


def test_patch_without_patch_cols_quarantined(spark, tmp_path):
    """ADVICE r4 #2: op='P' rows in a batch with NO patch_cols column are
    structurally malformed (set-vs-unchanged unrecoverable) — they
    dead-letter like null-key events instead of raising and re-failing the
    whole pipeline on every retry."""
    sch = ("op string, lsn long, conv_id string, turn_idx int, "
           "role string, text string, tool string, ts timestamp")
    tp = str(tmp_path / "t")
    from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for
    table = LakeTable.create(
        spark, tp, target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    bad = spark.createDataFrame(
        [("P", 1, "c1", 0, None, "x", None, None)], sch)
    res = apply_batch(table, bad, 0)
    assert res.rows_quarantined == 1 and res.rows_applied == 0
    assert read_clean(table).count() == 0


def test_patch_rows_exempt_from_payload_checks(spark, tmp_path):
    """A CHECK over a column a patch doesn't carry reads NULL on the event
    row — that must not quarantine the patch (its post-image is what WAP
    audits)."""
    feed, tp = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                  max_batches=1)
    LakeTable.load(spark, tp).alter_properties(
        {"contracts.check.role_known":
         "role in ('user','assistant','system','tool')"}
    )
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    assert _state(spark, tp) == _oracle()


def test_patched_table_relays_full_rows(spark, tmp_path):
    """Downstream replicas receive FOLDED full rows — patches are an
    upstream-ingest concern; the relay chain stays unchanged and the
    replica matches the upstream payload byte-for-byte."""
    from credix_data_pipeline_spark.operators.relay import publish_changes

    feed, up, rep = (str(tmp_path / d) for d in ("feed", "up", "rep"))
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, up, chunks_per_batch=2, num_buckets=4)
    relay = str(tmp_path / "relay")
    publish_changes(LakeTable.load(spark, up), relay)
    runner.replay(spark, relay, rep, chunks_per_batch=4, num_buckets=4)
    assert _state(spark, rep) == _state(spark, up) == _oracle()


def test_patches_through_fanin(spark, tmp_path):
    """N sharded patch-bearing feeds into one table: the per-column fold
    composes with per-source fences (disjoint keys, so each key's patch
    history lives in one shard's feed) — final state equals the unsharded
    sequential fold oracle."""
    from dataclasses import replace

    s0 = replace(SPEC, n_shards=2, shard=0)
    s1 = replace(SPEC, n_shards=2, shard=1)
    f0, f1, tp = (str(tmp_path / d) for d in ("f0", "f1", "t"))
    write_feed(spark, f0, s0)
    write_feed(spark, f1, s1)
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tp,
                        chunks_per_batch=2, num_buckets=4)
    assert _state(spark, tp) == _oracle()


def test_checks_bind_patches_that_carry_the_columns(spark, tmp_path):
    """Review batch 5: a patch that CARRIES every column a CHECK references
    is validated like a full update (value=-5 quarantines); a patch that
    leaves the checked column unchanged is exempt; an op='P' with an empty
    patch_cols (sets nothing, would still win row-level LWW) is malformed."""
    sch = ("op string, lsn long, conv_id string, turn_idx int, "
           "role string, text string, tool string, ts timestamp, "
           "patch_cols array<string>")
    tp = str(tmp_path / "t")
    from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for
    table = LakeTable.create(
        spark, tp, target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    apply_batch(table, spark.createDataFrame(
        [("I", 1, "c1", 0, "user", "ok", None, None, None)], sch), 0)
    table.alter_properties(
        {"contracts.check.known_role":
         "coalesce(role in ('user','assistant'), false)"})
    table = LakeTable.load(spark, tp)
    batch = spark.createDataFrame([
        # carries role AND violates -> quarantined
        ("P", 5, "c1", 0, "alien", None, None, None, ["role"]),
        # does not carry role -> exempt, applies
        ("P", 6, "c1", 0, None, "patched", None, None, ["text"]),
        # empty patch_cols -> malformed, quarantined
        ("P", 7, "c1", 0, None, None, None, None, []),
    ], sch)
    res = apply_batch(table, batch, 1)
    assert res.rows_quarantined == 2
    row = read_clean(table).collect()[0]
    # the exempt patch applied; the violating one and the empty one did
    # not touch the row (role unchanged, _lsn from the text patch)
    assert (row.role, row.text, row._lsn) == ("user", "patched", 6)


def test_blind_fallback_refused_on_patch_history_table(spark, tmp_path):
    """Review batch 5: a posdel table with patch history whose invariant a
    blind append cleared must REFUSE further merges (row-level collapse
    would ignore the stored per-column versions) until compact()."""
    feed, tp = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, tp, chunks_per_batch=3, num_buckets=4,
                  merge_mode="mor", max_batches=1)
    t = LakeTable.load(spark, tp)
    assert "_col_lsn" in {f.name for f in t.current().schema.fields}
    # warehouse blind append clears the invariant
    t.append(t.read().limit(0))
    assert not t.current().mor_deletes
    with pytest.raises(RuntimeError, match="write-time arbitration"):
        runner.replay(spark, feed, tp, chunks_per_batch=3, num_buckets=4,
                      merge_mode="mor")
    # compact() restores the invariant; the replay then completes exactly
    t.compact()
    runner.replay(spark, feed, tp, chunks_per_batch=3, num_buckets=4,
                  merge_mode="mor")
    assert _state(spark, tp) == _oracle()


def test_fold_fast_path_admission(spark, tmp_path):
    """Map-freeness is proven per FILE from parquet footers (map leaves:
    zero non-null values), so a patch-history table whose patched rows
    were overwritten with full events drops back to the classic plan —
    and a bucket holding live maps keeps the fold."""
    sch = ("op string, lsn long, conv_id string, turn_idx int, "
           "role string, text string, tool string, ts timestamp, "
           "patch_cols array<string>")

    def df(rows):
        return spark.createDataFrame(rows, sch)

    tp = str(tmp_path / "t")
    from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for
    from pyspark.sql import types as T
    table = LakeTable.create(
        spark, tp, target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    table.add_columns([T.StructField(
        "_col_lsn", T.MapType(T.StringType(), T.LongType()), True)])
    # full-only batch on an empty patch-armed table: classic plan
    r0 = apply_batch(table, df(
        [("I", 1, "c1", 0, "user", "a", None, None, None)]), 0)
    assert not r0.fold_path
    # a patch batch folds and leaves a map in the bucket's file
    r1 = apply_batch(table, df(
        [("P", 3, "c1", 0, "r2", None, None, None, ["role"])]), 1)
    assert r1.fold_path
    assert not all(table.current().map_stats.values())
    # full-only batch over a map-bearing bucket: fold (must honor the map)
    r2 = apply_batch(table, df(
        [("U", 2, "c1", 0, "late", "late", None, None, None)]), 2)
    assert r2.fold_path
    row = read_clean(table).collect()[0]
    assert (row.role, row.text) == ("r2", "late")  # per-column fold held
    # the full overwrite at a newer LSN resets the map; the rewrite is
    # provably map-free, so the NEXT merge takes the classic plan again
    r3 = apply_batch(table, df(
        [("U", 9, "c1", 0, "fresh", "fresh", None, None, None)]), 3)
    assert r3.fold_path  # admission decided on the PRE-merge files
    assert all(table.current().map_stats.values())
    r4 = apply_batch(table, df(
        [("U", 10, "c1", 0, "next", "next", None, None, None)]), 4)
    assert not r4.fold_path
    assert read_clean(table).collect()[0].role == "next"


def test_monitor_reports_fold_pressure(spark, tmp_path):
    """The layout signal surfaces patch-fold pressure from manifest
    map_stats alone (zero scan): share of live files proven map-free and
    the buckets whose merges still fold."""
    from credix_data_pipeline_spark.streaming.monitoring import layout_health

    feed, tp = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    sig = layout_health(spark, tp)["patch_fold"]
    assert sig["live_files"] > 0
    assert sig["map_bearing_buckets"]  # patches left live maps
    assert 0 <= sig["map_free_bp"] <= 10000
    # a patch-free table has no signal at all
    feed2, tp2 = str(tmp_path / "f2"), str(tmp_path / "t2")
    from dataclasses import replace as _r
    write_feed(spark, feed2, _r(SPEC, patch_pct=0))
    runner.replay(spark, feed2, tp2, chunks_per_batch=2, num_buckets=4)
    assert "patch_fold" not in layout_health(spark, tp2)


def test_fold_prunes_per_column_aggs_to_patched_set(spark, tmp_path):
    """r4 verdict ask #3: a patch batch touching one column against a
    map-free store folds ONE column (the rest ride the shared non-patch
    winner) — and the result still equals the sequential fold."""
    sch = ("op string, lsn long, conv_id string, turn_idx int, "
           "role string, text string, tool string, ts timestamp, "
           "patch_cols array<string>")

    def df(rows):
        return spark.createDataFrame(rows, sch)

    tp = str(tmp_path / "t")
    from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for
    table = LakeTable.create(
        spark, tp, target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    r0 = apply_batch(table, df([
        ("I", 1, "c1", 0, "user", "orig", "toolA", None, None),
        ("I", 2, "c2", 0, "asst", "other", None, None, None),
    ]), 0)
    assert r0.fold_path is False and r0.fold_cols_active is None
    # first patch: stored files predate _col_lsn -> proven map-free, so
    # active == exactly the batch's patched set
    r1 = apply_batch(table, df([
        ("P", 10, "c1", 0, None, "patched", None, None, ["text"]),
    ]), 1)
    assert r1.fold_path is True and r1.fold_cols_active == 1
    row = read_clean(table).filter(F.col("conv_id") == "c1").collect()[0]
    assert (row.role, row.text, row.tool, row._lsn) == (
        "user", "patched", "toolA", 10
    )
    # a later FULL event older than the patch but newer than the stored
    # column versions must still win the columns the patch left alone —
    # the pruned fold's shared winner honors stored map bounds
    r2 = apply_batch(table, df([
        ("U", 5, "c1", 0, "admin", "mid", "toolB", None, None),
    ]), 2)
    assert r2.fold_path is True
    row = read_clean(table).filter(F.col("conv_id") == "c1").collect()[0]
    # text stays at LSN 10 (patch), role/tool move to LSN 5 (full update)
    assert (row.role, row.text, row.tool, row._lsn) == (
        "admin", "patched", "toolB", 10
    )


def test_fold_patchfree_batch_against_map_bearing_store(spark, tmp_path):
    """A batch with ZERO patches merging into buckets whose stored rows
    carry live sparse maps folds with NO per-column aggregation at all
    (candidates: stored row + best full event) and still honors the
    stored per-column versions exactly."""
    sch = ("op string, lsn long, conv_id string, turn_idx int, "
           "role string, text string, tool string, ts timestamp, "
           "patch_cols array<string>")

    def df(rows):
        return spark.createDataFrame(rows, sch)

    tp = str(tmp_path / "t")
    from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for
    table = LakeTable.create(
        spark, tp, target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    apply_batch(table, df([
        ("I", 1, "c1", 0, "user", "orig", "toolA", None, None),
    ]), 0)
    apply_batch(table, df([
        ("P", 10, "c1", 0, None, "patched", None, None, ["text"]),
    ]), 1)
    t2 = LakeTable.load(spark, tp)
    r = apply_batch(t2, df([
        ("U", 5, "c1", 0, "admin", "mid", "toolB", None, None),
    ]), 2)
    # no patches in the batch -> zero per-column aggregation states; the
    # stored map still arbitrates through the candidate compare
    assert r.fold_path is True and r.fold_cols_active == 0
    row = read_clean(t2).collect()[0]
    assert (row.role, row.text, row.tool, row._lsn) == (
        "admin", "patched", "toolB", 10
    )
