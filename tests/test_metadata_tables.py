"""Metadata tables (Iceberg ``snapshots`` / ``history`` / ``files``).

``files_df`` must be a FOOTER-only distributed metadata scan: row counts and
key min/max come from parquet footers via mapInPandas, never a data read —
the row-group-skip evidence for sorted maintenance rewrites surfaced as a
queryable table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.metadata import (
    files_df,
    history_df,
    snapshots_df,
)
from credix_data_pipeline_spark.operators.apply import last_applied_batch_id
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=1_200,
    n_conversations=20,
    turns_per_conversation=6,
    delete_pct=6,
    duplicate_pct=5,
    events_per_chunk=300,
)


def _setup(spark, tmp_path):
    feed, tp = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4)
    return feed, LakeTable.load(spark, tp)


def test_snapshots_df_mirrors_manifests(spark, tmp_path):
    _, t = _setup(spark, tmp_path)
    sdf = snapshots_df(t)
    rows = {r["version"]: r for r in sdf.collect()}
    assert len(rows) == len(t.history())
    cur = t.current()
    assert [v for v, r in rows.items() if r["is_current"]] == [cur.version]
    assert rows[cur.version]["file_count"] == len(cur.all_files())
    # the newest batch_id in the metadata table IS the exactly-once fence
    fence = (
        sdf.filter(F.col("batch_id").isNotNull())
        .orderBy(F.col("version").desc())
        .first()["batch_id"]
    )
    assert fence == last_applied_batch_id(t)


def test_files_df_footer_stats_match_table(spark, tmp_path):
    _, t = _setup(spark, tmp_path)
    fdf = files_df(t).persist()
    snap = t.current()
    assert fdf.count() == len(snap.all_files())
    # footer row counts sum to the physical row count (incl. tombstones)
    total = fdf.agg(F.sum("row_count").alias("n")).first()["n"]
    assert total == t.read().count()
    agg = fdf.agg(
        F.sum(F.when(F.col("size_bytes") <= 0, 1).otherwise(0)).alias("bad_sz"),
        F.sum(F.when(F.col("key_min").isNull(), 1).otherwise(0)).alias("no_min"),
        F.sum(F.when(F.col("key_min") > F.col("key_max"), 1).otherwise(0)).alias(
            "inverted"
        ),
    ).first()
    assert agg["bad_sz"] == 0 and agg["no_min"] == 0 and agg["inverted"] == 0
    # bucket column matches the manifest's bucket assignment
    by_bucket = {
        r["bucket"]: r["n"]
        for r in fdf.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert by_bucket == {int(b): len(fl) for b, fl in snap.files.items() if fl}
    fdf.unpersist()


def test_files_df_key_ranges_after_sorted_compaction(spark, tmp_path):
    """After compact(sort=True) each bucket is one file whose footer key
    range covers its rows — the sorted-rewrite layout surfaced as data."""
    _, t = _setup(spark, tmp_path)
    t.compact()
    fdf = files_df(t)
    per_bucket = (
        fdf.groupBy("bucket").agg(F.count("*").alias("files")).collect()
    )
    assert all(r["files"] == 1 for r in per_bucket)
    assert fdf.filter(F.col("key_min").isNull()).count() == 0


def test_history_df_flags_abandoned_commits_after_rollback(spark, tmp_path):
    _, t = _setup(spark, tmp_path)
    target = next(s for s in t.history() if s.summary.get("batch_id") == 1)
    abandoned = [
        s.snapshot_id
        for s in t.history()
        if s.version > target.version
    ]
    t.rollback_to(target.snapshot_id)
    hdf = history_df(t)
    anc = {r["snapshot_id"]: r["is_ancestor_of_current"] for r in hdf.collect()}
    assert all(not anc[sid] for sid in abandoned)
    assert anc[target.snapshot_id]
    assert anc[t.current().snapshot_id]
    # the target's own ancestry (create .. batch 1) stays reachable
    assert anc[t.history()[0].snapshot_id]


def test_cli_history(spark, tmp_path, capsys):
    from credix_data_pipeline_spark import main as cli

    _, t = _setup(spark, tmp_path)
    assert cli.main(["history", "--table", t.path]) == 0
    out = capsys.readouterr().out
    assert "is_ancestor_of_current" in out
    assert cli.main(["history", "--table", t.path, "--files"]) == 0
    out = capsys.readouterr().out
    assert "row_group_count" in out


def test_tags_pin_snapshots_through_retention(spark, tmp_path):
    """Iceberg-refs semantics: a tagged snapshot survives expire_snapshots
    (manifest + data files) until the tag is dropped."""
    from credix_data_pipeline_spark.lakehouse.table import CommitConflict

    _, t = _setup(spark, tmp_path)
    target = next(s for s in t.history() if s.summary.get("batch_id") == 0)
    t.tag("model-v1", snapshot_id=target.snapshot_id)
    assert t.tags() == {"model-v1": target.snapshot_id}
    with pytest.raises(CommitConflict):
        t.tag("model-v1")
    with pytest.raises(ValueError):
        t.tag("bad/name")

    # churn + retention that would normally expire the tagged snapshot
    t.compact()
    rows_at_tag = t.read(snapshot_id=target.snapshot_id).count()
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    assert t.read(snapshot_id=target.snapshot_id).count() == rows_at_tag

    # refs surface in the snapshots metadata table
    refs = {
        r["snapshot_id"]: r["refs"] for r in snapshots_df(t).collect()
    }
    assert refs[target.snapshot_id] == ["model-v1"]

    # dropping the tag releases the pin: next expire collects it
    t.untag("model-v1")
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    with pytest.raises(KeyError):
        t.snapshot(target.snapshot_id)


def test_cli_tag(spark, tmp_path, capsys):
    import json as _json

    from credix_data_pipeline_spark import main as cli

    _, t = _setup(spark, tmp_path)
    out = _run_cli(capsys, cli, "tag", "--table", t.path, "--name", "rc1")
    assert _json.loads(out)["tags"] == {"rc1": t.current().snapshot_id}
    out = _run_cli(capsys, cli, "tag", "--table", t.path, "--name", "rc1",
                   "--drop")
    assert _json.loads(out)["tags"] == {}


def _run_cli(capsys, cli, *argv):
    assert cli.main(list(argv)) == 0
    return capsys.readouterr().out.strip().splitlines()[-1]


def test_partitions_df_aggregates_layout_health(spark, tmp_path):
    from credix_data_pipeline_spark.lakehouse.metadata import partitions_df
    from credix_data_pipeline_spark.operators.apply import read_clean

    _, t = _setup(spark, tmp_path)
    pdf = partitions_df(t).persist()
    snap = t.current()
    rows = {r["bucket"]: r for r in pdf.collect()}
    assert set(rows) == {int(b) for b, fl in snap.files.items() if fl}
    # per-bucket file counts mirror the manifest; totals mirror the data
    for b, r in rows.items():
        assert r["file_count"] == len(snap.files[str(b)])
        assert r["avg_file_bytes"] > 0
    assert sum(r["row_count"] for r in rows.values()) == t.read().count()
    assert read_clean(t).count() <= sum(r["row_count"] for r in rows.values())
    pdf.unpersist()


def test_cli_history_partitions(spark, tmp_path, capsys):
    from credix_data_pipeline_spark import main as cli

    _, t = _setup(spark, tmp_path)
    assert cli.main(["history", "--table", t.path, "--partitions"]) == 0
    out = capsys.readouterr().out
    assert "avg_file_bytes" in out
