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

    out = _run(capsys, "rebucket", "--table", table, "--num-buckets", "16")
    snap = json.loads(out)
    assert snap["num_buckets"] == 16
    assert read_clean(LakeTable.load(spark, table)).count() == n_before


def test_cli_validate_contracts(spark, tmp_path, capsys):
    """`validate` passes on a clean replay and fails (exit 1) once a
    contract is violated."""
    import json

    from credix_data_pipeline_spark import main as cli
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
    from credix_data_pipeline_spark.streaming import runner

    feed, table = str(tmp_path / "feed"), str(tmp_path / "table")
    write_feed(spark, feed, FeedSpec(n_events=1_000, n_conversations=20,
                                     turns_per_conversation=8,
                                     events_per_chunk=500))
    runner.replay(spark, feed, table, chunks_per_batch=1, num_buckets=4,
                  collect_stats=False)
    assert cli.main(["--master", "local[2]", "validate", "--table", table]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["passed"] and all(v == 0 for v in rep["violations"].values())

    # inject a bad row (invalid role, duplicate key) via raw append
    t = LakeTable.load(spark, table)
    from credix_data_pipeline_spark.operators.apply import read_clean
    import pyspark.sql.functions as F

    bad = (read_clean(t).limit(1)
           .withColumn("role", F.lit("robot"))
           .withColumn("_lsn", F.col("_lsn") + 1)
           .withColumn("_deleted", F.lit(False)))
    t.append(bad.select(*[f.name for f in t.current().schema.fields]))
    assert cli.main(["--master", "local[2]", "validate", "--table", table]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert rep["violations"]["accepted_role"] == 1
    assert rep["violations"]["unique_key"] == 1


def test_cli_replay_validate_and_gold_contracts(spark, tmp_path, capsys):
    """`replay --validate` gates ingestion like `dbt build`; `validate` on a
    GOLD table runs the gold rule set and exits non-zero on an injected
    violation."""
    import pyspark.sql.functions as F

    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed

    feed, table = str(tmp_path / "feed"), str(tmp_path / "table")
    gold = str(tmp_path / "gold")
    write_feed(spark, feed, FeedSpec(n_events=1_000, n_conversations=20,
                                     turns_per_conversation=8,
                                     events_per_chunk=500))
    # ingest + in-line contract gate in one invocation
    assert cli.main(["replay", "--feed", feed, "--table", table,
                     "--buckets", "4", "--fast", "--validate"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["contracts"]["passed"]

    # gold table: clean refresh passes the GOLD rule set
    assert cli.main(["gold-refresh", "--table", table, "--gold", gold]) == 0
    capsys.readouterr()
    assert cli.main(["validate", "--table", gold]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["passed"] and "accepted_activity_tier" in rep["violations"]

    # inject a violation (bad tier + score out of range) via raw append
    g = LakeTable.load(spark, gold)
    bad = (g.read().limit(1)
           .withColumn("activity_tier", F.lit("TURBO"))
           .withColumn("engagement_score", F.lit(250.0)))
    g.append(bad.select(*[f.name for f in g.current().schema.fields]))
    assert cli.main(["validate", "--table", gold]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert rep["violations"]["accepted_activity_tier"] == 1
    assert rep["violations"]["engagement_score_range"] == 1
    assert rep["violations"]["unique_key"] == 1

    # fact-grain gold model via the CLI
    gold2 = str(tmp_path / "gold_turns")
    assert cli.main(["gold-refresh", "--table", table, "--gold", gold2,
                     "--model", "turns"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["refreshed_turns"] > 0


def test_cli_changes(spark, tmp_path, capsys):
    """`changes` prints / writes the CDF envelope between two snapshots."""
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
    from credix_data_pipeline_spark.streaming import runner

    feed, table = str(tmp_path / "feed"), str(tmp_path / "table")
    write_feed(spark, feed, FeedSpec(n_events=1_000, n_conversations=20,
                                     turns_per_conversation=8,
                                     events_per_chunk=250))
    runner.replay(spark, feed, table, chunks_per_batch=1, num_buckets=4,
                  collect_stats=False)
    t = LakeTable.load(spark, table)
    merges = [s for s in t.history() if s.summary.get("operation") == "merge"]
    assert len(merges) >= 2
    out_dir = str(tmp_path / "cdf")
    out = _run(capsys, "changes", "--table", table,
               "--from-snapshot", str(merges[0].snapshot_id),
               "--out", out_dir)
    rep = json.loads(out)
    assert rep["rows"] > 0
    cdf = spark.read.parquet(out_dir)
    assert "_change_type" in cdf.columns
    kinds = {r["_change_type"] for r in cdf.select("_change_type").distinct().collect()}
    assert kinds <= {"insert", "delete", "update_before", "update_after"}
    assert "insert" in kinds or "update_after" in kinds

    # the timestamp form resolves the same span via snapshot_as_of
    out_ts = str(tmp_path / "cdf_ts")
    rep_ts = json.loads(_run(
        capsys, "changes", "--table", table,
        "--from-ts", str(merges[0].committed_at_ms), "--out", out_ts,
    ))
    assert rep_ts["rows"] == rep["rows"]
    # exactly one of --from-snapshot / --from-ts
    assert cli.main(["changes", "--table", table, "--out", out_ts]) == 2
    assert cli.main(["changes", "--table", table,
                     "--from-snapshot", str(merges[0].snapshot_id),
                     "--from-ts", "0", "--out", out_ts]) == 2


def test_cli_wap_and_rollback(spark, tmp_path, capsys):
    """`replay --wap` gates each batch pre-publish; `rollback` restores a
    past snapshot and its fence through the CLI."""
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed

    feed, table = str(tmp_path / "feed"), str(tmp_path / "table")
    write_feed(spark, feed, FeedSpec(n_events=1_000, n_conversations=20,
                                     turns_per_conversation=8,
                                     events_per_chunk=250))
    out = _run(capsys, "replay", "--feed", feed, "--table", table,
               "--buckets", "4", "--fast", "--wap")
    assert json.loads(out)["batches"] >= 1
    t = LakeTable.load(spark, table)
    assert t.staged_snapshot() is None
    n_full = read_clean(t).count()

    merges = [s for s in t.history() if s.summary.get("operation") == "merge"]
    target = merges[0]
    out = _run(capsys, "rollback", "--table", table,
               "--snapshot", str(target.snapshot_id))
    rep = json.loads(out)
    assert rep["rolled_back_to"] == target.snapshot_id
    assert rep["batch_id"] == target.summary["batch_id"]
    n_rolled = read_clean(t).count()
    assert 0 < n_rolled <= n_full
    assert n_rolled == read_clean(t, snapshot_id=target.snapshot_id).count()


def test_cli_alter_rename_drop_widen(spark, tmp_path, capsys):
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed

    feed, table = str(tmp_path / "feed"), str(tmp_path / "table")
    write_feed(spark, feed, FeedSpec(n_events=500, n_conversations=10,
                                     turns_per_conversation=6,
                                     events_per_chunk=250))
    _run(capsys, "replay", "--feed", feed, "--table", table,
         "--buckets", "4", "--fast")
    t = LakeTable.load(spark, table)
    n = read_clean(t).count()
    texts = {(r.conv_id, r.turn_idx): r.text
             for r in t.read().select("conv_id", "turn_idx", "text").collect()}

    out = _run(capsys, "alter", "--table", table, "--rename", "text:body")
    assert "body" in json.loads(out)["columns"]
    out = _run(capsys, "alter", "--table", table, "--widen", "turn_idx:long")
    assert json.loads(out)["version"] > 1
    t = LakeTable.load(spark, table)
    got = {(r.conv_id, r.turn_idx): r.body
           for r in t.read().select("conv_id", "turn_idx", "body").collect()}
    assert got == texts and read_clean(t).count() == n

    out = _run(capsys, "alter", "--table", table, "--drop", "tool")
    assert "tool" not in json.loads(out)["columns"]

def test_cli_purge(spark, tmp_path, capsys):
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "table")
    _run(capsys, "generate", "--feed", feed, "--events", "1500",
         "--conversations", "30", "--events-per-chunk", "500")
    _run(capsys, "replay", "--feed", feed, "--table", table,
         "--chunks-per-batch", "3", "--buckets", "8")
    t = LakeTable.load(spark, table)
    victims = [
        r.conv_id
        for r in read_clean(t).select("conv_id").distinct().limit(2).collect()
    ]
    before = read_clean(t).count()
    out = _run(capsys, "purge", "--table", table,
               "--values", ",".join(victims))
    rep = json.loads(out)
    assert rep["operation"] == "delete-keys" and rep["purged_keys"] == 2
    df = read_clean(LakeTable.load(spark, table))
    assert df.filter(df["conv_id"].isin(victims)).count() == 0
    assert df.count() < before
    # compact materializes; logical state unchanged
    _run(capsys, "compact", "--table", table)
    assert read_clean(LakeTable.load(spark, table)).count() == df.count()


def test_cli_lookup_as_of(spark, tmp_path, capsys):
    """`lookup --as-of` answers "what did this conversation look like at
    time T" — the purge is invisible at a pre-purge probe, gone at now."""
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "table")
    _run(capsys, "generate", "--feed", feed, "--events", "1500",
         "--conversations", "30", "--events-per-chunk", "500")
    _run(capsys, "replay", "--feed", feed, "--table", table,
         "--chunks-per-batch", "3", "--buckets", "8")
    t = LakeTable.load(spark, table)
    conv = read_clean(t).select("conv_id").first()[0]
    pre_purge_ms = t.current().committed_at_ms
    t.delete_keys([conv])

    assert cli.main(["lookup", "--table", table, "--conv", conv,
                     "--as-of", str(pre_purge_ms)]) == 0
    assert conv in capsys.readouterr().out  # rows shown at the old state
    assert cli.main(["lookup", "--table", table, "--conv", conv]) == 0
    assert conv not in capsys.readouterr().out  # purged at now

    # ISO-8601 form parses too
    from datetime import datetime, timezone
    iso = datetime.fromtimestamp(
        pre_purge_ms / 1000, tz=timezone.utc
    ).isoformat()
    assert cli.main(["lookup", "--table", table, "--conv", conv,
                     "--as-of", iso]) == 0


def test_cli_clone(spark, tmp_path, capsys):
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "table")
    dev = str(tmp_path / "dev")
    _run(capsys, "generate", "--feed", feed, "--events", "1200",
         "--conversations", "25", "--events-per-chunk", "400")
    _run(capsys, "replay", "--feed", feed, "--table", table,
         "--chunks-per-batch", "3", "--buckets", "4")
    rep = json.loads(_run(capsys, "clone", "--table", table, "--dest", dev))
    assert rep["files_referenced"] > 0 and rep["pinned_tag"]

    src = LakeTable.load(spark, table)
    dst = LakeTable.load(spark, dev)
    assert read_clean(dst).count() == read_clean(src).count()
    assert rep["pinned_tag"] in src.tags()
    # the clone answers lookups like any table
    conv = read_clean(dst).select("conv_id").first()[0]
    assert cli.main(["lookup", "--table", dev, "--conv", conv]) == 0


def test_cli_branch_lifecycle(spark, tmp_path, capsys):
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "table")
    _run(capsys, "generate", "--feed", feed, "--events", "1200",
         "--conversations", "25", "--events-per-chunk", "300")
    _run(capsys, "replay", "--feed", feed, "--table", table,
         "--chunks-per-batch", "2", "--buckets", "4", "--max-batches", "1")

    rep = json.loads(_run(capsys, "branch", "create", "--table", table,
                          "--name", "audit"))
    assert rep["branch"] == "audit"
    assert json.loads(
        _run(capsys, "branch", "list", "--table", table)
    )["branches"] == ["audit"]

    # resume the same feed INTO the branch (carried fence), then publish
    _run(capsys, "replay", "--feed", feed, "--table", rep["path"],
         "--chunks-per-batch", "2", "--buckets", "4")
    t = LakeTable.load(spark, table)
    n_branch = read_clean(t.branch("audit")).count()
    assert read_clean(t).count() != n_branch

    ff = json.loads(_run(capsys, "branch", "ff", "--table", table,
                         "--name", "audit"))
    assert ff["operation"] == "fast-forward"
    assert read_clean(LakeTable.load(spark, table)).count() == n_branch

    res = json.loads(_run(capsys, "branch", "drop", "--table", table,
                          "--name", "audit"))
    assert res["files_kept"] > 0
    assert json.loads(
        _run(capsys, "branch", "list", "--table", table)
    )["branches"] == []
    assert read_clean(LakeTable.load(spark, table)).count() == n_branch
