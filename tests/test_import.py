"""Zero-copy dataset import (Delta CONVERT TO DELTA / Iceberg add_files):
adopt foreign parquet in place with ONE metadata commit — no data read or
rewritten — then behave like any LakeTable (merge, rebucket, purge, clone,
branch, retention-safe against the source).

The LWW seam these tests pin: adopted files predate the ``_lsn`` column and
read as LSN 0 (the file_seq=0 legacy convention extended to row LSNs), so
feed events always win over imported rows, exactly the bootstrap contract
without the rewrite.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean


def _src(spark, tmp_path, rows=None, parts=4):
    rows = rows or [(i, f"doc {i}", "en") for i in range(100)]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    p = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).repartition(parts).write.parquet(p)
    return p


_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def test_import_is_metadata_only_and_reads_equal_source(spark, tmp_path):
    src = _src(spark, tmp_path)
    t = LakeTable.import_dataset(spark, src, str(tmp_path / "t"), key=["doc_id"])
    cur = t.current()
    assert cur.summary["operation"] == "import"
    assert cur.summary["files_imported"] >= 4
    assert cur.num_buckets == 1
    # zero-copy: nothing under the table's own data dir
    assert (
        sum(len(f) for _, _, f in os.walk(os.path.join(t.path, "data"))) == 0
    )
    got = {(r.doc_id, r.text) for r in read_clean(t).collect()}
    want = {
        (r.doc_id, r.text)
        for r in spark.read.parquet(src).collect()
    }
    assert got == want
    # adopted rows read as LSN 0 (the seam) and file_seq 0 (purge rule)
    assert t.read().agg(F.max("_lsn")).collect()[0][0] == 0
    assert set(cur.file_seq.values()) == {0}


def test_import_then_merge_feed_events_win(spark, tmp_path):
    src = _src(spark, tmp_path)
    t = LakeTable.import_dataset(spark, src, str(tmp_path / "t"), key=["doc_id"])
    batch = spark.createDataFrame(
        [
            ("U", 5, 7, "replaced", "en"),
            ("D", 6, 8, None, None),      # tombstone an imported row
            ("I", 7, 999, "new", "fr"),
        ],
        _BATCH_SCHEMA,
    )
    apply_batch(t, batch, 0, collect_stats=False)
    rows = {r.doc_id: r.text for r in read_clean(t).collect()}
    assert rows[7] == "replaced"
    assert 8 not in rows
    assert rows[999] == "new"
    assert len(rows) == 100  # 100 - 1 deleted + 1 inserted


def test_import_rebucket_purge_and_source_safety(spark, tmp_path):
    src = _src(spark, tmp_path)
    t = LakeTable.import_dataset(spark, src, str(tmp_path / "t"), key=["doc_id"])
    src_n = spark.read.parquet(src).count()
    t.rebucket(8)
    assert t.current().num_buckets == 8
    assert read_clean(t).count() == src_n
    # equality-delete purge over the (now local) state
    t = LakeTable.load(spark, t.path)
    t.delete_keys([3, 4])
    assert read_clean(t).count() == src_n - 2
    # aggressive retention never deletes the foreign source files
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert spark.read.parquet(src).count() == src_n


def test_import_purge_before_rebucket_covers_adopted_files(spark, tmp_path):
    """Equality deletes on a freshly imported table: adopted files carry
    file_seq 0, every purge entry seq exceeds it — covered."""
    src = _src(spark, tmp_path)
    t = LakeTable.import_dataset(spark, src, str(tmp_path / "t"), key=["doc_id"])
    t.delete_keys([0, 1])
    assert read_clean(t).count() == 98
    # re-insert after the purge is visible (sequence rule)
    apply_batch(
        t,
        spark.createDataFrame([("I", 9, 0, "reborn", "en")], _BATCH_SCHEMA),
        0,
        collect_stats=False,
    )
    rows = {r.doc_id: r.text for r in read_clean(t).collect()}
    assert rows[0] == "reborn" and 1 not in rows


def test_import_refusals(spark, tmp_path):
    src = _src(spark, tmp_path)
    # duplicate keys under the chosen key column
    with pytest.raises(ValueError, match="duplicate keys"):
        LakeTable.import_dataset(spark, src, str(tmp_path / "t1"), key=["lang"])
    # missing key column
    with pytest.raises(ValueError, match="not in source schema"):
        LakeTable.import_dataset(spark, src, str(tmp_path / "t2"), key=["nope"])
    # reserved engine column in the source
    p = str(tmp_path / "src2")
    spark.createDataFrame(
        [(1, 2)],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("_lsn", T.LongType(), True),
            ]
        ),
    ).write.parquet(p)
    with pytest.raises(ValueError, match="reserved"):
        LakeTable.import_dataset(spark, p, str(tmp_path / "t3"), key=["doc_id"])
    # null keys
    p2 = str(tmp_path / "src3")
    spark.createDataFrame(
        [(None, "x"), (1, "y")],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), True),
                T.StructField("text", T.StringType(), True),
            ]
        ),
    ).write.parquet(p2)
    with pytest.raises(ValueError, match="NULL key"):
        LakeTable.import_dataset(spark, p2, str(tmp_path / "t4"), key=["doc_id"])
    # multi-bucket import refused (zero-copy placement needs one bucket)
    with pytest.raises(ValueError, match="num_buckets=1"):
        LakeTable.import_dataset(
            spark, src, str(tmp_path / "t5"), key=["doc_id"], num_buckets=8
        )
    # empty dir
    os.makedirs(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        LakeTable.import_dataset(
            spark, str(tmp_path / "empty"), str(tmp_path / "t6"), key=["doc_id"]
        )


def test_import_cli(spark, tmp_path, capsys):
    from credix_data_pipeline_spark import main as cli

    src = _src(spark, tmp_path)
    table = str(tmp_path / "t")
    assert cli.main(["import", "--src", src, "--table", table,
                     "--key", "doc_id"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["files_imported"] >= 4 and rep["num_buckets"] == 1
    assert read_clean(LakeTable.load(spark, table)).count() == 100
    # duplicate-key refusal surfaces as rc 1 + error json
    assert cli.main(["import", "--src", src, "--table",
                     str(tmp_path / "t2"), "--key", "lang"]) == 1


def test_import_clone_and_branch_compose(spark, tmp_path):
    """Adopted abs-path files survive the other zero-copy surfaces:
    clone of an imported table, branch + fast-forward over it."""
    src = _src(spark, tmp_path)
    t = LakeTable.import_dataset(spark, src, str(tmp_path / "t"), key=["doc_id"])
    c = t.clone_to(str(tmp_path / "c"))
    assert read_clean(c).count() == 100
    br = t.create_branch("dev")
    apply_batch(
        br,
        spark.createDataFrame([("U", 4, 7, "branched", "en")], _BATCH_SCHEMA),
        0,
        collect_stats=False,
    )
    t.fast_forward("dev")
    rows = {r.doc_id: r.text for r in read_clean(t).collect()}
    assert rows[7] == "branched" and len(rows) == 100


def test_import_skips_hidden_dir_residue(spark, tmp_path):
    """Files under `_`/`.`-prefixed DIRECTORIES (crashed-Spark-job
    `_temporary` residue) are excluded from adoption, matching the
    Hadoop hidden-path rule the validation/schema pass applies.
    Regression: only basenames were filtered, so residue duplicating
    committed keys was adopted PAST the duplicate-key validation —
    un-arbitrated duplicates at a shared LSN 0."""
    src = _src(spark, tmp_path)
    resid = os.path.join(src, "_temporary", "0", "task_1")
    os.makedirs(resid)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    spark.createDataFrame(
        [(5, "residue duplicate of doc 5", "en")], schema
    ).coalesce(1).write.parquet(os.path.join(resid, "dup"))
    # move the parquet part up so only the _temporary ancestor is hidden
    import glob as _glob
    import shutil as _shutil

    part = _glob.glob(os.path.join(resid, "dup", "*.parquet"))[0]
    _shutil.move(part, os.path.join(resid, "part-00000.parquet"))
    _shutil.rmtree(os.path.join(resid, "dup"))

    t = LakeTable.import_dataset(
        spark, src, str(tmp_path / "t"), key=["doc_id"], validate=True
    )
    rows = read_clean(t).where(F.col("doc_id") == 5).collect()
    assert len(rows) == 1
    assert rows[0].text == "doc 5"
    assert read_clean(t).count() == 100
