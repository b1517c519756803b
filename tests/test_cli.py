"""CLI surface (SURVEY §2.10): generate → replay → metrics/gold/compact
drive the whole engine through the spark-submit entry point."""

from __future__ import annotations

import json

from credix_data_pipeline_spark import main as cli
from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean


def _run(capsys, *argv) -> str:
    assert cli.main(list(argv)) == 0
    return capsys.readouterr().out.strip().splitlines()[-1]


def test_cli_end_to_end(spark, tmp_path, capsys):
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "table")

    out = _run(
        capsys, "generate", "--feed", feed, "--events", "2000",
        "--conversations", "40", "--events-per-chunk", "500",
    )
    assert json.loads(out)["chunks"] >= 4

    out = _run(
        capsys, "replay", "--feed", feed, "--table", table,
        "--chunks-per-batch", "2", "--buckets", "8",
    )
    rep = json.loads(out)
    assert rep["batches"] >= 2 and rep["rows_in"] >= 2000

    n_before = read_clean(LakeTable.load(spark, table)).count()
    assert n_before > 0

    _run(capsys, "metrics", "--table", table)
    _run(capsys, "gold", "--table", table, "--limit", "5")

    out = _run(capsys, "compact", "--table", table)
    snap = json.loads(out)
    assert snap["version"] > 1
    assert read_clean(LakeTable.load(spark, table)).count() == n_before
