"""Field-id schema evolution: rename / drop / widen (Iceberg v2 DDL).

The reference tolerates only missing columns (installments_assets.py:151-156);
real lake tables also rename, drop and widen in place.  These are
metadata-only commits: the manifest carries stable field ids per column plus
each commit dir's write-time schema, and the read path projects old dirs to
the current schema BY ID (rename re-aliases, widen casts, dropped/new ids
read as typed NULL).  Dirs that never crossed an evolution boundary keep the
single-scan by-name fast path.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.table import _dir_compatible


SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("score", T.FloatType(), True),
        T.StructField("_lsn", T.LongType(), True),
    ]
)


def make_table(spark, path) -> LakeTable:
    t = LakeTable.create(
        spark, str(path), SCHEMA, key=["conv_id", "turn_idx"], num_buckets=4
    )
    t.append(
        spark.createDataFrame(
            [("c1", 0, "hello", 1.5, 1), ("c2", 0, "world", 2.5, 2)], SCHEMA
        )
    )
    return t


def test_rename_projects_old_files_and_mixes_new_writes(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.rename_column("text", "body")
    got = {r.conv_id: r.body for r in t.read().collect()}
    assert got == {"c1": "hello", "c2": "world"}
    # writes after the rename land under the new name; a read spans dirs
    # from both sides of the boundary
    t.append(
        spark.createDataFrame(
            [("c3", 0, "post-rename", 3.5, 3)], t.current().schema
        )
    )
    got = {r.conv_id: r.body for r in t.read().collect()}
    assert got == {"c1": "hello", "c2": "world", "c3": "post-rename"}
    # key/bucket handling: rename of a non-bucket column leaves pruning
    # intact; point lookup still works
    assert t.read_keys(["c3"]).collect()[0].body == "post-rename"


def test_rename_bucket_column_keeps_layout_and_pruning(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    files_before = dict(t.current().files)
    t.rename_column("conv_id", "conversation_id")
    snap = t.current()
    # metadata-only: identical file sets, bucketing hashes values so the
    # layout is still valid under the new name
    assert snap.files == files_before
    assert snap.bucket_by == ["conversation_id"]
    assert snap.key == ["conversation_id", "turn_idx"]
    assert t.read_keys(["c1"]).collect()[0].text == "hello"


def test_widen_int_to_long_casts_old_files(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.widen_column("turn_idx", T.LongType())
    assert dict(t.read().dtypes)["turn_idx"] == "bigint"
    assert {r.turn_idx for r in t.read().collect()} == {0}
    # disallowed promotion fails loudly
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("body" if "body" in t.read().columns else "text",
                       T.LongType())


def test_widen_float_to_double(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.widen_column("score", T.DoubleType())
    got = {r.conv_id: r.score for r in t.read().collect()}
    assert got == {"c1": 1.5, "c2": 2.5}


def test_drop_then_readd_same_name_reads_null_for_old_files(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.drop_column("score")
    assert "score" not in t.read().columns
    # re-add the SAME name with a different type: gets a fresh field id, so
    # the old physical float data must NOT resurrect
    t.add_columns([T.StructField("score", T.StringType(), True)])
    got = {r.conv_id: r.score for r in t.read().collect()}
    assert got == {"c1": None, "c2": None}
    t.append(
        spark.createDataFrame(
            [("c4", 0, "fresh", "graded", 9)], t.current().schema
        )
    )
    got = {r.conv_id: r.score for r in t.read().collect()}
    assert got == {"c1": None, "c2": None, "c4": "graded"}


def test_drop_key_or_engine_column_refused(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="key/bucket"):
        t.drop_column("conv_id")
    with pytest.raises(ValueError, match="engine column"):
        t.drop_column("_lsn")
    with pytest.raises(KeyError):
        t.drop_column("nope")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("text", "score")


def test_fast_path_single_group_until_evolution_boundary(spark, tmp_path):
    """A table that never renamed/dropped/widened keeps every dir by-name
    compatible (ONE vectorized scan); the boundary introduces exactly the
    incompatible group and compact() migrates back to full fast path."""
    t = make_table(spark, tmp_path / "t")
    snap = t.current()
    assert all(
        _dir_compatible(snap, snap.dir_schemas.get(d))
        for d in snap.live_dirs()
    )
    t.rename_column("text", "body")
    snap = t.current()
    compat = [
        _dir_compatible(snap, snap.dir_schemas.get(d))
        for d in sorted(snap.live_dirs())
    ]
    assert compat == [False]  # the pre-rename dir now needs projection
    t.append(
        spark.createDataFrame([("c9", 1, "x", 0.5, 9)], t.current().schema)
    )
    t.compact()
    snap = t.current()
    assert all(
        _dir_compatible(snap, snap.dir_schemas.get(d))
        for d in snap.live_dirs()
    )
    got = {r.conv_id: r.body for r in t.read().collect()}
    assert got == {"c1": "hello", "c2": "world", "c9": "x"}


def test_time_travel_shows_schema_as_of_snapshot(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    pre = t.current().snapshot_id
    t.rename_column("text", "body")
    t.drop_column("score")
    old = t.read(snapshot_id=pre)
    assert "text" in old.columns and "score" in old.columns
    assert "body" not in old.columns
    assert {r.text for r in old.collect()} == {"hello", "world"}


def test_rollback_restores_schema_and_never_reuses_ids(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    pre = t.current()
    t.drop_column("score")
    t.rollback_to(pre.snapshot_id)
    snap = t.current()
    assert "score" in [f.name for f in snap.schema.fields]
    assert {r.conv_id: r.score for r in t.read().collect()} == {
        "c1": 1.5,
        "c2": 2.5,
    }
    # the id counter stays monotone across rollback: a new column after the
    # rollback must not collide with any id ever retired
    before_ids = set(snap.column_ids.values())
    t.add_columns([T.StructField("extra", T.StringType(), True)])
    new_id = t.current().column_ids["extra"]
    assert new_id not in before_ids


def test_legacy_manifest_without_field_ids_still_reads(spark, tmp_path):
    """Manifests written before this feature (no column_ids/dir_schemas
    keys) load with positional ids and read by-name — then a rename pins
    the legacy dirs to the pre-DDL schema before changing anything."""
    t = make_table(spark, tmp_path / "t")
    # strip the new keys from every manifest, simulating an old table
    for fn in os.listdir(t.meta_path):
        if not fn.endswith(".json") or not fn.startswith("v"):
            continue
        p = os.path.join(t.meta_path, fn)
        with open(p) as f:
            m = json.load(f)
        for k in ("column_ids", "next_column_id", "dir_schemas"):
            m.pop(k, None)
        with open(p, "w") as f:
            json.dump(m, f)
    t2 = LakeTable.load(spark, t.path)
    assert {r.text for r in t2.read().collect()} == {"hello", "world"}
    t2.rename_column("text", "body")
    got = {r.conv_id: r.body for r in t2.read().collect()}
    assert got == {"c1": "hello", "c2": "world"}


def test_merge_continues_after_rename(spark, tmp_path):
    """The apply core MERGEs into a renamed table: dirty-bucket CoW reads
    old dirs through the field-id projection and writes under the current
    names."""
    t = make_table(spark, tmp_path / "t")
    t.rename_column("text", "body")
    snap = t.current()
    dirty = [
        r["_b"]
        for r in t.read()
        .select(t.bucket_expr(snap).alias("_b"))
        .distinct()
        .collect()
    ]
    merged = t.read(buckets=dirty).withColumn(
        "body", F.upper(F.col("body"))
    )
    t.replace_buckets(dirty, merged, summary={"batch_id": 1})
    got = {r.conv_id: r.body for r in t.read().collect()}
    assert got == {"c1": "HELLO", "c2": "WORLD"}


def test_mor_table_rename_and_read_current(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "m"),
        SCHEMA,
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        merge_mode="mor",
    )
    t.append(
        spark.createDataFrame(
            [("c1", 0, "v1", 1.0, 1), ("c1", 0, "v2", 1.0, 2)], SCHEMA
        )
    )
    t.rename_column("text", "body")
    collapsed = t._lww_collapse(t.read())
    got = {(r.conv_id, r.turn_idx): r.body for r in collapsed.collect()}
    assert got == {("c1", 0): "v2"}


def test_ddl_interplay_with_rebucket(spark, tmp_path):
    """Rename of the bucket column, then rebucket, then widen, then
    rebucket again: every rewrite projects old dirs by field id and lands
    under the current schema/layout."""
    t = make_table(spark, tmp_path / "t")
    t.append(
        spark.createDataFrame(
            [(f"c{i}", 1, f"x{i}", 0.5, 10 + i) for i in range(10)], SCHEMA
        )
    )
    t.rename_column("conv_id", "cid")
    t.rebucket(8)
    assert t.current().num_buckets == 8 and t.current().bucket_by == ["cid"]
    got = {r.cid: r.text for r in t.read().filter("turn_idx = 1").collect()}
    assert got == {f"c{i}": f"x{i}" for i in range(10)}
    assert t.read_keys(["c7"]).count() == 1

    t.widen_column("turn_idx", T.LongType())
    t.rebucket(2)
    got = {
        (r.cid, r.turn_idx): r.text for r in t.read().collect()
    }
    assert got[("c7", 1)] == "x7" and got[("c1", 0)] == "hello"


def test_widen_bucket_column_refused(spark, tmp_path):
    """xxhash64 is type-sensitive (int 5 and long 5 hash differently), so
    widening a bucketing column would desync stored bucket ids from
    bucket_expr — the engine refuses."""
    schema = T.StructType(
        [
            T.StructField("uid", T.IntegerType(), False),
            T.StructField("v", T.StringType(), True),
            T.StructField("_lsn", T.LongType(), True),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, key=["uid"], num_buckets=4
    )
    t.append(spark.createDataFrame([(1, "a", 1), (2, "b", 2)], schema))
    with pytest.raises(ValueError, match="bucketing column"):
        t.widen_column("uid", T.LongType())
    # values unaffected; a non-bucket widen on the same table still works
    assert {r.uid for r in t.read().collect()} == {1, 2}


def test_manifest_lsn_file_stats_prune_incremental_reads(spark, tmp_path):
    """Per-file _lsn bounds in the manifest (Iceberg column-stats analogue):
    an incremental read with lsn_above skips cold files entirely — the
    planned file set shrinks, values stay exact."""
    t = make_table(spark, tmp_path / "t")  # rows with _lsn 1, 2
    t.append(
        spark.createDataFrame(
            [("c5", 0, "late", 0.5, 100), ("c6", 0, "later", 0.5, 200)],
            SCHEMA,
        )
    )
    snap = t.current()
    # every live file carries bounds
    assert set(snap.file_stats) == set(snap.all_files())
    assert all(lo <= hi for lo, hi in snap.file_stats.values())

    # incremental read above the old high-water: only late rows
    got = {r.conv_id for r in t.read(lsn_above=2)
           .filter(F.col("_lsn") > 2).collect()}
    assert got == {"c5", "c6"}
    # and the pruned plan reads strictly fewer files than the full read
    full = t.read().inputFiles()
    pruned = t.read(lsn_above=2).inputFiles()
    assert len(pruned) < len(full)
    # a threshold past everything plans an empty scan
    assert t.read(lsn_above=200).inputFiles() == []


def test_file_stats_survive_compact_and_rollback(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    pre = t.current()
    t.append(
        spark.createDataFrame([("c9", 0, "x", 0.1, 50)], SCHEMA)
    )
    t.compact()
    snap = t.current()
    assert set(snap.file_stats) == set(snap.all_files())
    # compacted files carry merged bounds spanning their rows
    assert max(hi for _, hi in snap.file_stats.values()) == 50
    t.rollback_to(pre.snapshot_id)
    snap = t.current()
    assert set(snap.file_stats) == set(snap.all_files())
    assert max(hi for _, hi in snap.file_stats.values()) == 2
