"""Snapshot export (operators/export.py): unload one consistent snapshot
as plain parquet — governed by default, pinned by snapshot/as-of, never
overwriting, summary manifest written after the data."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark import main as cli
from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.operators.export import export_snapshot
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner


@pytest.fixture()
def table(spark, tmp_path):
    feed, tp = str(tmp_path / "feed"), str(tmp_path / "table")
    write_feed(spark, feed, FeedSpec(
        n_events=1_500, n_conversations=30, turns_per_conversation=6,
        delete_pct=5, events_per_chunk=750,
    ))
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    return LakeTable.load(spark, tp)


def _rows(df):
    cols = sorted(c for c in df.columns if not c.startswith("_"))
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


def test_export_equals_clean_state(spark, table, tmp_path):
    dest = str(tmp_path / "out")
    s = export_snapshot(table, dest)
    got = spark.read.parquet(dest)
    assert _rows(got) == _rows(read_clean(table))
    assert not any(c.startswith("_") for c in got.columns)
    summary = json.load(open(os.path.join(dest, "_export.json")))
    assert summary["rows"] == got.count() == s["rows"]
    assert summary["snapshot_id"] == table.current().snapshot_id
    assert summary["governed"] is False
    # exports never overwrite
    with pytest.raises(FileExistsError):
        export_snapshot(table, dest)


def test_export_pins_a_past_state_and_partitions(spark, table, tmp_path):
    pre = table.current().snapshot_id
    victims = [
        r["conv_id"]
        for r in read_clean(table).select("conv_id").distinct().limit(3).collect()
    ]
    table.delete_keys(victims)
    table = LakeTable.load(spark, table.path)
    dest = str(tmp_path / "asof")
    s = export_snapshot(table, dest, snapshot_id=pre, partition_by=["role"])
    got = spark.read.parquet(dest)
    # the purge happened AFTER the pin: exported state still has the keys
    assert got.filter(F.col("conv_id").isin(victims)).count() > 0
    assert s["partition_by"] == ["role"]
    roles = [d for d in os.listdir(dest) if d.startswith("role=")]
    assert len(roles) >= 2  # hive layout for consumer-side pruning
    with pytest.raises(ValueError, match="partition_by"):
        export_snapshot(table, str(tmp_path / "bad"), partition_by=["nope"])


def test_export_is_governed_by_default(spark, table, tmp_path):
    table.alter_properties({
        "governance.mask.text":
            "case when {col} is null then null else '***' end",
        "governance.row-filter": "role <> 'tool'",
    })
    table = LakeTable.load(spark, table.path)
    dest = str(tmp_path / "gov")
    s = export_snapshot(table, dest)
    got = spark.read.parquet(dest)
    assert s["governed"] is True
    assert got.filter(F.col("role") == "tool").count() == 0
    assert {r["text"] for r in got.select("text").distinct().collect()} <= {
        "***", None,
    }
    # the privileged export is the true state
    pdest = str(tmp_path / "priv")
    export_snapshot(table, pdest, privileged=True)
    assert _rows(spark.read.parquet(pdest)) == _rows(read_clean(table))


def test_cli_export(spark, table, tmp_path, capsys):
    dest = str(tmp_path / "cli_out")
    rc = cli.main(["export", "--table", table.path, "--dest", dest,
                   "--partition-by", "role"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["rows"] > 0 and os.path.isdir(dest)
    rc = cli.main(["export", "--table", table.path, "--dest", dest])
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and "exists" in err["error"]


def test_sliced_export(spark, table, tmp_path, capsys):
    """A range-sliced unload ("export last N turns for the vendor"):
    between slices through the stats-pruned read, summary marks it."""
    table.alter_properties({"stats.columns": "turn_idx"})
    table = LakeTable.load(spark, table.path)
    dest = str(tmp_path / "slice")
    s = export_snapshot(table, dest, between={"turn_idx": (0, 2)})
    got = spark.read.parquet(dest)
    assert s["sliced"] is True
    want = read_clean(table).filter(F.col("turn_idx") <= 2)
    assert got.count() == s["rows"] == want.count() > 0
    assert got.agg(F.max("turn_idx")).first()[0] == 2
    rc = cli.main(["export", "--table", table.path,
                   "--dest", str(tmp_path / "slice2"),
                   "--between", "turn_idx:0:2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["rows"] == s["rows"] and out["sliced"] is True
