"""Nested-struct DDL: rename / drop / widen of fields INSIDE a struct
column, by dotted path (Iceberg nested field ids).

Round-3 proved nested columns through the CDC path only for whole-column
ADDs (test_nested_types.py); transcript tool metadata also evolves
*inside* the struct (a provider renames ``name`` → ``tool_name``, widens
``call_id``, retires ``latency``).  Depth-1 struct fields carry their own
stable field ids (dotted: ``tool_meta.call_id``), so nested DDL is the
same metadata-only commit as top-level DDL, and old dirs project
field-by-field: rename re-aliases, widen casts, a dropped id never
resurrects.  The relay DDL channel ships the same events with dotted
paths, so downstream replicas converge without manual ALTERs.

Reference parity note: the reference tolerates only missing columns
(credix_pipeline/credix_pipeline/assets/installments_assets.py:151-156);
nested DDL is engine-forward capability from the round-3 verdict (#6).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.table import _dir_compatible

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)

TOOL = T.StructType(
    [
        T.StructField("call_id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("latency", T.FloatType(), True),
    ]
)
SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool_meta", TOOL, True),
        T.StructField("_lsn", T.LongType(), True),
    ]
)


def make_table(spark, path) -> LakeTable:
    t = LakeTable.create(
        spark, str(path), SCHEMA, key=["conv_id", "turn_idx"], num_buckets=2
    )
    t.append(
        spark.createDataFrame(
            [
                ("c1", 0, "hi", (7, "calc", 1.5), 1),
                ("c2", 0, "yo", None, 2),
            ],
            SCHEMA,
        )
    )
    return t


def _tm(t, col="tool_meta"):
    return {
        r.conv_id: None if r[col] is None else tuple(r[col])
        for r in t.read().collect()
    }


def _upsert(t, rows_df):
    """Minimal CoW MERGE: replace the dirty buckets with current-minus-
    matching-keys plus the new rows (the apply core's shape, inline)."""
    snap = t.current()
    dirty = sorted(
        {
            r["_b"]
            for r in rows_df.select(t.bucket_expr(snap).alias("_b"))
            .distinct()
            .collect()
        }
    )
    key = ["conv_id", "turn_idx"]
    merged = (
        t.read(buckets=dirty)
        .join(rows_df.select(*key), on=key, how="left_anti")
        .unionByName(rows_df)
    )
    t.replace_buckets(dirty, merged, summary={"operation": "merge"})


def test_create_mints_dotted_ids_for_struct_fields(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    ids = t.current().column_ids
    assert {"tool_meta", "tool_meta.call_id", "tool_meta.name",
            "tool_meta.latency"} <= set(ids)
    assert len(set(ids.values())) == len(ids)  # all distinct


def test_nested_rename_projects_old_files(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    files_before = dict(t.current().files)
    t.rename_column("tool_meta.name", "tool_name")
    # metadata-only: no rewrite
    assert t.current().files == files_before
    assert _tm(t) == {"c1": (7, "calc", 1.5), "c2": None}
    assert [sf.name for sf in
            t.current().schema["tool_meta"].dataType.fields] == [
        "call_id", "tool_name", "latency"
    ]
    # writes after the rename mix with pre-rename dirs
    t.append(
        spark.createDataFrame(
            [("c3", 0, "new", (9, "browse", 0.5), 3)], t.current().schema
        )
    )
    assert _tm(t) == {
        "c1": (7, "calc", 1.5), "c2": None, "c3": (9, "browse", 0.5)
    }


def test_nested_widen_casts_old_files(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.widen_column("tool_meta.call_id", T.LongType())
    t.widen_column("tool_meta.latency", T.DoubleType())
    dt = t.current().schema["tool_meta"].dataType
    assert dt["call_id"].dataType == T.LongType()
    assert dt["latency"].dataType == T.DoubleType()
    assert _tm(t) == {"c1": (7, "calc", 1.5), "c2": None}
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("tool_meta.name", T.LongType())


def test_nested_drop_never_resurrects(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.drop_column("tool_meta.latency")
    assert _tm(t) == {"c1": (7, "calc"), "c2": None}
    # a later rename claiming the retired NAME gets the renamed field's id;
    # old files' physical `latency` floats must NOT resurrect under it —
    # the rows show the renamed field's own (id-projected) data instead
    t.rename_column("tool_meta.name", "latency")
    assert _tm(t) == {"c1": (7, "calc"), "c2": None}
    got = t.read().filter(F.col("conv_id") == "c1").collect()[0]
    assert got.tool_meta.latency == "calc"  # the renamed STRING field


def test_nested_null_structs_stay_null_across_boundary(spark, tmp_path):
    """The field-id rebuild wraps struct() in a NULL guard: a NULL struct
    in an old file must not become a struct of NULLs."""
    t = make_table(spark, tmp_path / "t")
    t.rename_column("tool_meta.name", "tool_name")
    rows = {r.conv_id: r.tool_meta for r in t.read().collect()}
    assert rows["c2"] is None


def test_parent_rename_keeps_children_ids(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    ids_before = dict(t.current().column_ids)
    t.rename_column("tool_meta", "tmeta")
    ids = t.current().column_ids
    assert ids["tmeta"] == ids_before["tool_meta"]
    assert ids["tmeta.call_id"] == ids_before["tool_meta.call_id"]
    assert _tm(t, "tmeta") == {"c1": (7, "calc", 1.5), "c2": None}
    # nested DDL keeps working under the new parent name
    t.rename_column("tmeta.name", "tool_name")
    got = t.read().filter(F.col("conv_id") == "c1").collect()[0]
    assert got.tmeta.tool_name == "calc"


def test_nested_ddl_validation(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="not a struct"):
        t.rename_column("text.foo", "bar")
    with pytest.raises(KeyError, match="no field"):
        t.rename_column("tool_meta.nope", "bar")
    with pytest.raises(KeyError, match="no column"):
        t.rename_column("nope.field", "bar")
    with pytest.raises(ValueError, match="one level"):
        t.rename_column("tool_meta.a.b", "bar")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("tool_meta.name", "latency")
    with pytest.raises(ValueError, match="across structs"):
        t.rename_column("tool_meta.name", "other.name")
    with pytest.raises(ValueError, match="invalid field name"):
        t.rename_column("tool_meta.name", "_reserved")
    t.drop_column("tool_meta.latency")
    t.drop_column("tool_meta.name")
    with pytest.raises(ValueError, match="last field"):
        t.drop_column("tool_meta.call_id")


def test_nested_boundary_takes_projection_path_until_compact(
    spark, tmp_path
):
    """A nested rename makes pre-DDL dirs by-name INcompatible (the struct
    type differs), post-DDL writes compatible; compact() migrates back to
    the single-scan fast path."""
    t = make_table(spark, tmp_path / "t")
    t.rename_column("tool_meta.name", "tool_name")
    snap = t.current()
    compat = [
        _dir_compatible(snap, snap.dir_schemas.get(d))
        for d in sorted(snap.live_dirs())
    ]
    assert compat == [False]  # the pre-DDL dir needs projection
    t.append(
        spark.createDataFrame(
            [("c3", 0, "new", (9, "browse", 0.5), 3)], t.current().schema
        )
    )
    snap = t.current()
    compat = {
        d: _dir_compatible(snap, snap.dir_schemas.get(d))
        for d in sorted(snap.live_dirs())
    }
    assert sorted(compat.values()) == [False, True]
    t.compact()
    snap = t.current()
    assert all(
        _dir_compatible(snap, snap.dir_schemas.get(d))
        for d in snap.live_dirs()
    )
    assert _tm(t) == {
        "c1": (7, "calc", 1.5), "c2": None, "c3": (9, "browse", 0.5)
    }


def test_legacy_manifest_without_dotted_ids_evolves(spark, tmp_path):
    """A manifest written before nested field ids (struct column present,
    only top-level ids recorded) still supports nested DDL: dotted ids are
    minted at the DDL commit and pre-dotted dirs patch onto them (no
    mechanism could have changed struct internals before nested DDL
    existed, so the patch is sound)."""
    t = make_table(spark, tmp_path / "t")
    # strip dotted ids from every manifest: simulate the pre-nested-DDL era
    for fn in os.listdir(t.meta_path):
        if not fn.endswith(".json") or not fn.startswith("v"):
            continue
        p = os.path.join(t.meta_path, fn)
        with open(p) as f:
            m = json.load(f)
        m["column_ids"] = {
            k: v for k, v in m.get("column_ids", {}).items() if "." not in k
        }
        m["dir_schemas"] = {
            d: {
                **info,
                "ids": {
                    k: v for k, v in info["ids"].items() if "." not in k
                },
            }
            for d, info in m.get("dir_schemas", {}).items()
        }
        with open(p, "w") as f:
            json.dump(m, f)

    t = LakeTable.load(spark, t.path)
    assert not any("." in k for k in t.current().column_ids)
    t.rename_column("tool_meta.name", "tool_name")
    t.widen_column("tool_meta.call_id", T.LongType())
    assert _tm(t) == {"c1": (7, "calc", 1.5), "c2": None}
    ids = t.current().column_ids
    assert "tool_meta.tool_name" in ids and "tool_meta.call_id" in ids


def test_changelog_before_images_project_across_nested_ddl(
    spark, tmp_path
):
    """read_changes across a nested DDL boundary: before-images align to
    the TO schema BY FIELD ID — the renamed field's before-value appears
    under its new name, the widened field casts."""
    from credix_data_pipeline_spark.operators.changelog import read_changes

    t = make_table(spark, tmp_path / "t")
    pre = t.current().snapshot_id
    t.rename_column("tool_meta.name", "tool_name")
    t.widen_column("tool_meta.call_id", T.LongType())
    # update c1 so its bucket is dirty across the boundary
    _upsert(
        t,
        spark.createDataFrame(
            [("c1", 0, "hi2", (8, "calc2", 1.5), 10)], t.current().schema
        ),
    )
    ch = {
        (r.conv_id, r._change_type): r.tool_meta
        for r in read_changes(t, pre).collect()
    }
    before = ch[("c1", "update_before")]
    assert (before.call_id, before.tool_name) == (7, "calc")
    after = ch[("c1", "update_after")]
    assert (after.call_id, after.tool_name) == (8, "calc2")


def test_changelog_top_level_rename_keeps_before_values(spark, tmp_path):
    """Same field-id alignment at the top level: a renamed column's
    before-image carries the old data under the new name (previously it
    read as NULL, spuriously flagging untouched co-bucketed keys)."""
    from credix_data_pipeline_spark.operators.changelog import read_changes

    t = make_table(spark, tmp_path / "t")
    pre = t.current().snapshot_id
    t.rename_column("text", "body")
    _upsert(
        t,
        spark.createDataFrame(
            [("c1", 0, "hi2", (7, "calc", 1.5), 10)], t.current().schema
        ),
    )
    ch = read_changes(t, pre)
    rows = {(r.conv_id, r._change_type): r.body for r in ch.collect()}
    assert rows[("c1", "update_before")] == "hi"
    assert rows[("c1", "update_after")] == "hi2"
    # c2 shares no change: it must not appear at all, even if co-bucketed
    assert not any(k[0] == "c2" for k in rows)


def test_relay_ddl_channel_nested(spark, tmp_path):
    """Upstream nested rename + widen + drop mid-stream replicate through
    the relay DDL channel with dotted paths — the downstream replica
    converges byte-equal without manual ALTERs, and redelivered DDL is a
    no-op."""
    from credix_data_pipeline_spark.operators.apply import (
        apply_batch,
        last_applied_batch_id,
        read_clean,
    )
    from credix_data_pipeline_spark.operators.relay import (
        apply_ddl,
        publish_changes,
    )
    from credix_data_pipeline_spark.schema import (
        CHANGE_SCHEMA,
        target_schema_for,
    )
    from credix_data_pipeline_spark.streaming import runner

    nested = T.StructType(
        [*CHANGE_SCHEMA.fields, T.StructField("tool_meta", TOOL, True)]
    )
    t1p, relay, t2p = (str(tmp_path / d) for d in ("t1", "relay", "t2"))
    t1 = LakeTable.create(
        spark, t1p, target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    apply_batch(
        t1,
        spark.createDataFrame(
            [
                ("I", 1, BASE, "c0", 0, "user", "hello", None, BASE,
                 (7, "calc", 1.5)),
                ("I", 2, BASE, "c1", 0, "tool", "calc", "calculator",
                 BASE, None),
            ],
            nested,
        ),
        0,
        collect_stats=False,
    )
    publish_changes(t1, relay)
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=2)

    # upstream nested DDL burst + more data under the new layout
    t1.rename_column("tool_meta.name", "tool_name")
    t1.widen_column("tool_meta.call_id", T.LongType())
    t1.drop_column("tool_meta.latency")
    new_tool = t1.current().schema["tool_meta"].dataType
    apply_batch(
        t1,
        spark.createDataFrame(
            [("U", 3, BASE, "c0", 0, "user", "hello2", None, BASE,
              (8, "calc2"))],
            T.StructType(
                [*CHANGE_SCHEMA.fields,
                 T.StructField("tool_meta", new_tool, True)]
            ),
        ),
        last_applied_batch_id(t1) + 1,
        collect_stats=False,
    )
    publish_changes(t1, relay)
    man = json.load(open(os.path.join(relay, "_feed.json")))
    ddl = man["ddl"][man["chunks"][1]]
    assert {(e["op"], e.get("column") or e.get("from")) for e in ddl} == {
        ("drop", "tool_meta.latency"),
        ("rename", "tool_meta.name"),
        ("widen", "tool_meta.call_id"),
    }

    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=2)
    t2 = LakeTable.load(spark, t2p)

    def _s(t):
        return {
            (r.conv_id, r.turn_idx): (
                r.text,
                None if r.tool_meta is None else tuple(r.tool_meta),
            )
            for r in read_clean(t)
            .select("conv_id", "turn_idx", "text", "tool_meta")
            .collect()
        }

    assert _s(t2) == _s(t1)
    assert _s(t2)[("c0", 0)] == ("hello2", (8, "calc2"))
    assert (
        read_clean(t2).schema["tool_meta"].dataType
        == read_clean(t1).schema["tool_meta"].dataType
    )
    # redelivery: re-applying the same DDL changes nothing
    v = t2.current().version
    assert apply_ddl(t2, ddl) == 0
    assert t2.current().version == v


def test_schema_ddl_normalizes_nested_paths(spark, tmp_path):
    """schema_ddl event derivation: a parent drop implies its children
    (no child events), a parent rename re-bases surviving children's
    dotted paths (apply order is parents-first), and a struct column's
    own type change emits NO top-level widen (the nested diffs carry it).
    """
    from credix_data_pipeline_spark.operators.relay import schema_ddl

    t = make_table(spark, tmp_path / "t")
    base = t.current()

    # parent rename + nested rename together
    t.rename_column("tool_meta", "tmeta")
    t.rename_column("tmeta.name", "tool_name")
    ev = schema_ddl(base, t.current())
    assert {(e["op"], e.get("from") or e.get("column")) for e in ev} == {
        ("rename", "tool_meta"),
        ("rename", "tmeta.name"),  # post-parent-rename path
    }
    to_by_from = {e["from"]: e["to"] for e in ev if e["op"] == "rename"}
    assert to_by_from["tmeta.name"] == "tmeta.tool_name"
    # no widen events: the struct column's own type change is implied
    assert not any(e["op"] == "widen" for e in ev)


def test_schema_ddl_parent_drop_implies_children(spark, tmp_path):
    from credix_data_pipeline_spark.operators.relay import schema_ddl

    t = make_table(spark, tmp_path / "t")
    base = t.current()
    t.drop_column("tool_meta")
    ev = schema_ddl(base, t.current())
    assert ev == [
        {"op": "drop", "column": "tool_meta",
         "field_id": base.column_ids["tool_meta"]}
    ]


def test_nested_ddl_through_merge_and_time_travel(spark, tmp_path):
    """MERGE keeps working across a nested boundary, and time travel shows
    the struct layout as of each snapshot."""
    t = make_table(spark, tmp_path / "t")
    pre = t.current().snapshot_id
    t.rename_column("tool_meta.name", "tool_name")
    _upsert(
        t,
        spark.createDataFrame(
            [
                ("c1", 0, "hi2", (8, "calc2", 2.5), 10),
                ("c4", 1, "new", (9, "browse", 0.25), 11),
            ],
            t.current().schema,
        ),
    )
    assert _tm(t) == {
        "c1": (8, "calc2", 2.5), "c2": None, "c4": (9, "browse", 0.25)
    }
    old_fields = [
        sf.name
        for sf in t.snapshot(pre).schema["tool_meta"].dataType.fields
    ]
    assert old_fields == ["call_id", "name", "latency"]


def test_inflight_nested_add_keeps_fast_path(spark, tmp_path):
    """A batch whose struct column GAINS a field evolves the table in
    flight (add_struct_fields, fresh dotted id), a later batch from an
    OLDER producer (narrower struct) still applies with typed NULL, and
    every pre-add dir stays on the by-name single-scan fast path — the
    parquet reader fills missing nested fields as NULL, exactly like a
    top-level add-column."""
    from credix_data_pipeline_spark.operators.apply import (
        apply_batch,
        read_clean,
    )
    from credix_data_pipeline_spark.schema import (
        CHANGE_SCHEMA,
        target_schema_for,
    )

    two = T.StructType(
        [
            T.StructField("call_id", T.IntegerType()),
            T.StructField("name", T.StringType()),
        ]
    )
    three = T.StructType([*two.fields, T.StructField("latency",
                                                     T.FloatType())])
    one = T.StructType([T.StructField("call_id", T.IntegerType())])

    def env(tt):
        return T.StructType(
            [*CHANGE_SCHEMA.fields, T.StructField("tool_meta", tt, True)]
        )

    t = LakeTable.create(
        spark, str(tmp_path / "t"), target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    apply_batch(
        t,
        spark.createDataFrame(
            [("I", 1, BASE, "c0", 0, "u", "a", None, BASE, (1, "x"))],
            env(two),
        ),
        0, collect_stats=False,
    )
    apply_batch(
        t,
        spark.createDataFrame(
            [("I", 2, BASE, "c1", 0, "u", "b", None, BASE, (2, "y", 0.5))],
            env(three),
        ),
        1, collect_stats=False,
    )
    assert [
        sf.name for sf in t.current().schema["tool_meta"].dataType.fields
    ] == ["call_id", "name", "latency"]
    assert "tool_meta.latency" in t.current().column_ids
    # older producer still on the two-field shape — aligns by name
    apply_batch(
        t,
        spark.createDataFrame(
            [("I", 3, BASE, "c2", 0, "u", "c", None, BASE, (3,))],
            env(one),
        ),
        2, collect_stats=False,
    )
    got = {
        r.conv_id: None if r.tool_meta is None else tuple(r.tool_meta)
        for r in read_clean(t).collect()
    }
    assert got == {
        "c0": (1, "x", None), "c1": (2, "y", 0.5), "c2": (3, None, None)
    }
    snap = t.current()
    assert all(
        _dir_compatible(snap, snap.dir_schemas.get(d))
        for d in snap.live_dirs()
    )


def test_nested_add_relays_via_registry(spark, tmp_path):
    """A nested ADD needs no DDL event: the chunk's registry schema
    carries the wider struct and the replica's own in-flight evolution
    converges — the same path as top-level adds."""
    from credix_data_pipeline_spark.operators.apply import (
        apply_batch,
        last_applied_batch_id,
        read_clean,
    )
    from credix_data_pipeline_spark.operators.relay import (
        publish_changes,
        schema_ddl,
    )
    from credix_data_pipeline_spark.schema import (
        CHANGE_SCHEMA,
        target_schema_for,
    )
    from credix_data_pipeline_spark.streaming import runner

    two = T.StructType(
        [
            T.StructField("call_id", T.IntegerType()),
            T.StructField("name", T.StringType()),
        ]
    )
    three = T.StructType([*two.fields, T.StructField("latency",
                                                     T.FloatType())])

    def env(tt):
        return T.StructType(
            [*CHANGE_SCHEMA.fields, T.StructField("tool_meta", tt, True)]
        )

    t1p, relay, t2p = (str(tmp_path / x) for x in ("t1", "relay", "t2"))
    t1 = LakeTable.create(
        spark, t1p, target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    apply_batch(
        t1,
        spark.createDataFrame(
            [("I", 1, BASE, "c0", 0, "u", "a", None, BASE, (1, "x"))],
            env(two),
        ),
        0, collect_stats=False,
    )
    base = t1.current()
    publish_changes(t1, relay)
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=2)

    apply_batch(
        t1,
        spark.createDataFrame(
            [
                ("U", 2, BASE, "c0", 0, "u", "a2", None, BASE,
                 (9, "x2", 0.5)),
                ("I", 3, BASE, "c1", 0, "u", "b", None, BASE,
                 (2, "y", 1.5)),
            ],
            env(three),
        ),
        last_applied_batch_id(t1) + 1, collect_stats=False,
    )
    # the add emits NO DDL events (registry handles it)
    assert schema_ddl(base, t1.current()) == []
    publish_changes(t1, relay)
    runner.replay(spark, relay, t2p, chunks_per_batch=1, num_buckets=2)
    t2 = LakeTable.load(spark, t2p)

    def _s(t):
        return {
            (r.conv_id, r.turn_idx): (
                r.text,
                None if r.tool_meta is None else tuple(r.tool_meta),
            )
            for r in read_clean(t)
            .select("conv_id", "turn_idx", "text", "tool_meta")
            .collect()
        }

    assert _s(t2) == _s(t1)
    assert _s(t2)[("c0", 0)] == ("a2", (9, "x2", 0.5))
    assert (
        read_clean(t2).schema["tool_meta"].dataType
        == read_clean(t1).schema["tool_meta"].dataType
    )


def test_add_struct_fields_validation(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    with pytest.raises(KeyError, match="no column"):
        t.add_struct_fields("nope", [T.StructField("x", T.LongType())])
    with pytest.raises(ValueError, match="not a struct"):
        t.add_struct_fields("text", [T.StructField("x", T.LongType())])
    with pytest.raises(ValueError, match="invalid field name"):
        t.add_struct_fields(
            "tool_meta", [T.StructField("_bad", T.LongType())]
        )
    # no-op on already-present names: same snapshot, no commit
    v = t.current().version
    assert (
        t.add_struct_fields(
            "tool_meta", [T.StructField("name", T.StringType())]
        ).version
        == v
    )
