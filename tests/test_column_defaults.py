"""Column DEFAULT values (Iceberg v3 initial + write defaults):
``add_columns(..., defaults={col: <constant SQL>})`` makes rows written
BEFORE the add read the default (zero rewrite — the projection fills it
where the file's write schema lacks the field id), and writers whose batch
schema omits the column write it, so replay results do not depend on when
the DDL landed relative to a batch.  Defaults are schema-bound: rename
re-keys, drop removes, a later re-add mints a fresh id with no default.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.operators.merge import merge_into
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for

TS = datetime.datetime(2024, 1, 1)


def _mk(spark, tmp_path, name="t"):
    t = LakeTable.create(
        spark, str(tmp_path / name), target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    df = spark.createDataFrame(
        [("I", 1, TS, "c1", 0, "user", "hello", None, TS),
         ("I", 2, TS, "c2", 0, "user", "bye", None, TS)],
        CHANGE_SCHEMA,
    )
    apply_batch(t, df, 0, collect_stats=False)
    return t


def test_initial_default_fills_pre_add_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_columns([T.StructField("lang", T.StringType(), True)],
                  defaults={"lang": "'und'"})
    got = {r.conv_id: r.lang for r in read_clean(t).collect()}
    assert got == {"c1": "und", "c2": "und"}
    # no rewrite happened: the add was metadata-only
    assert t.current().files == t.snapshot(t.current().parent_id).files
    # a post-add batch CARRYING the column writes what it says — including
    # an explicit NULL (write-default applies to absent columns, not nulls)
    sch = T.StructType([*CHANGE_SCHEMA.fields,
                        T.StructField("lang", T.StringType(), True)])
    apply_batch(t, spark.createDataFrame(
        [("U", 3, TS, "c1", 0, "user", "hi", None, TS, "en"),
         ("U", 4, TS, "c3", 0, "user", "new", None, TS, None)], sch),
        1, collect_stats=False)
    got = {r.conv_id: r.lang for r in read_clean(t).collect()}
    assert got == {"c1": "en", "c2": "und", "c3": None}


def test_write_default_for_pre_add_schema_batches(spark, tmp_path):
    """An old-schema batch arriving AFTER the add writes the default, so
    the result equals what it would have been had the batch arrived
    BEFORE the add (whose rows would read the initial default)."""
    t = _mk(spark, tmp_path)
    t.add_columns([T.StructField("lang", T.StringType(), True)],
                  defaults={"lang": "'und'"})
    apply_batch(t, spark.createDataFrame(
        [("U", 5, TS, "c2", 0, "user", "updated", None, TS)],
        CHANGE_SCHEMA), 1, collect_stats=False)
    got = {r.conv_id: (r.text, r.lang) for r in read_clean(t).collect()}
    assert got["c2"] == ("updated", "und")
    # tombstones stay all-NULL even with a default declared
    apply_batch(t, spark.createDataFrame(
        [("D", 6, TS, "c1", 0, None, None, None, None)],
        CHANGE_SCHEMA), 2, collect_stats=False)
    from credix_data_pipeline_spark.operators.apply import read_current
    tomb = read_current(t).filter(F.col("_deleted")).collect()[0]
    assert tomb.lang is None


def test_declaration_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="constant"):
        t.add_columns([T.StructField("lang", T.StringType(), True)],
                      defaults={"lang": "upper(role)"})  # column ref
    with pytest.raises(ValueError, match="not being added"):
        t.add_columns([T.StructField("lang", T.StringType(), True)],
                      defaults={"text": "'x'"})


def test_defaults_are_schema_bound(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_columns([T.StructField("lang", T.StringType(), True)],
                  defaults={"lang": "'und'"})
    t.rename_column("lang", "language")
    assert t.current().column_defaults == {"language": "'und'"}
    assert {r.language for r in read_clean(t).collect()} == {"und"}
    t.drop_column("language")
    assert t.current().column_defaults == {}
    # re-add same name WITHOUT a default: fresh id, NULL semantics
    t.add_columns([T.StructField("language", T.StringType(), True)])
    assert {r.language for r in read_clean(t).collect()} == {None}


def test_default_survives_projection_path_and_compaction(spark, tmp_path):
    """A rename forces the field-id projection path for old dirs — the
    default must fill there too; compact() then materializes it."""
    t = _mk(spark, tmp_path)
    t.add_columns([T.StructField("lang", T.StringType(), True)],
                  defaults={"lang": "'und'"})
    t.rename_column("text", "body")  # old dirs now take _project_dir
    assert {r.lang for r in read_clean(t).collect()} == {"und"}
    t.compact()
    assert {r.lang for r in read_clean(t).collect()} == {"und"}


def test_changelog_emits_nothing_for_a_pure_default_add(spark, tmp_path):
    """The add changes every pre-add row's READ value NULL→default, but
    the aligned before-image uses the TO-snapshot's default too — zero
    spurious update pairs (O(table) relay churn otherwise)."""
    from credix_data_pipeline_spark.operators.changelog import read_changes

    t = _mk(spark, tmp_path)
    mid = t.current().snapshot_id
    t.add_columns([T.StructField("lang", T.StringType(), True)],
                  defaults={"lang": "'und'"})
    assert read_changes(t, mid, None).count() == 0


def test_relay_ships_default_bearing_adds(spark, tmp_path):
    """THE divergence scenario defaults introduce: a pre-add key never
    updated again reads the default upstream — the replica must learn the
    default through the DDL channel or silently diverge forever."""
    from credix_data_pipeline_spark.operators.relay import publish_changes
    from credix_data_pipeline_spark.streaming import runner

    t = _mk(spark, tmp_path)
    relay, rep = str(tmp_path / "relay"), str(tmp_path / "rep")
    publish_changes(t, relay)
    runner.replay(spark, relay, rep, chunks_per_batch=4, num_buckets=2)
    # upstream: default-bearing add + one unrelated data change
    t.add_columns([T.StructField("lang", T.StringType(), True)],
                  defaults={"lang": "'und'"})
    apply_batch(t, spark.createDataFrame(
        [("U", 7, TS, "c1", 0, "user", "touched", None, TS)],
        CHANGE_SCHEMA), 1, collect_stats=False)
    publish_changes(t, relay)
    runner.replay(spark, relay, rep, chunks_per_batch=4, num_buckets=2)
    r = LakeTable.load(spark, rep)
    assert r.current().column_defaults == {"lang": "'und'"}
    up = {x.conv_id: (x.text, x.lang) for x in read_clean(t).collect()}
    dn = {x.conv_id: (x.text, x.lang) for x in read_clean(r).collect()}
    assert dn == up
    # c2 is the never-touched pre-add key: default on BOTH sides
    assert dn["c2"] == ("bye", "und")


def test_merge_into_insert_takes_default(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_columns([T.StructField("lang", T.StringType(), True)],
                  defaults={"lang": "'und'"})
    merge_into(
        t,
        spark.createDataFrame([("c9", 0, "inserted")],
                              "conv_id string, turn_idx int, text string"),
        when_not_matched_insert=True,
    )
    got = {r.conv_id: r.lang for r in read_clean(t).collect()}
    assert got["c9"] == "und"


def test_stream_ddl_ships_defaults(spark, tmp_path):
    """The SS restart-on-schema-change path: a default-bearing add crosses
    the relay as an `add` DDL event and the streaming replica converges,
    including pre-add keys never updated again."""
    from credix_data_pipeline_spark.operators.relay import publish_changes
    from credix_data_pipeline_spark.streaming import runner

    t = _mk(spark, tmp_path)
    relay, rep = str(tmp_path / "relay"), str(tmp_path / "rep")
    publish_changes(t, relay)
    runner.stream_ddl(spark, relay, rep, num_buckets=2)
    t.add_columns([T.StructField("lang", T.StringType(), True)],
                  defaults={"lang": "'und'"})
    apply_batch(t, spark.createDataFrame(
        [("U", 7, TS, "c1", 0, "user", "touched", None, TS)],
        CHANGE_SCHEMA), 1, collect_stats=False)
    publish_changes(t, relay)
    runner.stream_ddl(spark, relay, rep, num_buckets=2)
    r = LakeTable.load(spark, rep)
    assert r.current().column_defaults == {"lang": "'und'"}
    up = {x.conv_id: (x.text, x.lang) for x in read_clean(t).collect()}
    dn = {x.conv_id: (x.text, x.lang) for x in read_clean(r).collect()}
    assert dn == up
    assert dn["c2"] == ("bye", "und")


def test_checks_path_keeps_tombstones_and_patches_null(spark, tmp_path):
    """Review batch 5: align_for_checks fills batch-predating columns for
    CHECK evaluation — but D (and P) rows must stay NULL there, or the
    fill leaks into the merge and a delete contributes the DEFAULT to the
    column fold where the sequential fold says NULL."""
    t = _mk(spark, tmp_path)
    t.alter_properties(
        {"contracts.check.role_ok": "coalesce(role <> 'zz', true)"})
    t = LakeTable.load(spark, t.path)
    t.add_columns([T.StructField("lang", T.StringType(), True)],
                  defaults={"lang": "'und'"})
    # old-schema batch WITH checks declared: U writes the default, the
    # tombstone stays all-NULL
    apply_batch(t, spark.createDataFrame(
        [("U", 5, TS, "c2", 0, "user", "upd", None, TS),
         ("D", 6, TS, "c1", 0, None, None, None, None)],
        CHANGE_SCHEMA), 1, collect_stats=False)
    from credix_data_pipeline_spark.operators.apply import read_current
    rows = {r.conv_id: r for r in read_current(t).collect()}
    assert rows["c2"].lang == "und"
    assert rows["c1"]._deleted and rows["c1"].lang is None


def test_default_fills_unregistered_legacy_dirs(spark, tmp_path):
    """Review batch 5: dirs without a registry record (pre-registry
    manifests) predate every DDL — the fast path must treat them as
    missing all defaulted columns, and the add must register them with
    their PRE-add schema (not the post-add one _commit would backfill)."""
    import json as _json
    import os

    t = _mk(spark, tmp_path)
    # surgically strip the registry, simulating a legacy manifest
    v = t.current().version
    from credix_data_pipeline_spark.lakehouse.table import _manifest_name
    mp = os.path.join(t.meta_path, _manifest_name(v))
    m = _json.load(open(mp))
    m["dir_schemas"] = {}
    _json.dump(m, open(mp, "w"))
    t = LakeTable.load(spark, t.path)
    assert t.current().dir_schemas == {}
    t.add_columns([T.StructField("lang", T.StringType(), True)],
                  defaults={"lang": "'und'"})
    t = LakeTable.load(spark, t.path)
    # the add registered the legacy dirs with the PRE-add schema
    assert all("lang" not in rec["ids"]
               for rec in t.current().dir_schemas.values())
    assert {r.lang for r in read_clean(t).collect()} == {"und"}
