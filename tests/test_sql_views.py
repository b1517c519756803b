"""SQL read surface: registered temp views over a table (the dbt-model
relation a SQL consumer queries), snapshot-pinned, time-travelable, with a
CLI `sql` command."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from credix_data_pipeline_spark import main as cli
from credix_data_pipeline_spark.functions.normalize import with_normalized_text
from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import (
    read_clean,
    register_sql_views,
)
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

import pytest


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sqlviews")
    feed, tp = str(base / "feed"), str(base / "table")
    write_feed(spark, feed, FeedSpec(
        n_events=3_000, n_conversations=50, turns_per_conversation=8,
        delete_pct=5, events_per_chunk=1_000,
    ))
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=8,
                  transform=with_normalized_text)
    return LakeTable.load(spark, tp)


def test_clean_and_raw_views_match_read_paths(spark, table):
    register_sql_views(table, "tv")
    n_clean = spark.sql("SELECT COUNT(*) AS n FROM tv").first()["n"]
    assert n_clean == read_clean(table).count()
    # raw exposes bookkeeping and includes tombstones
    raw_cols = set(spark.table("tv_raw").columns)
    assert {"_lsn", "_deleted"} <= raw_cols
    n_raw = spark.sql("SELECT COUNT(*) AS n FROM tv_raw").first()["n"]
    assert n_raw >= n_clean
    # a real SQL aggregation over the clean view
    by_role = {
        r["role"]: r["n"]
        for r in spark.sql(
            "SELECT role, COUNT(*) AS n FROM tv GROUP BY role"
        ).collect()
    }
    want = {
        r["role"]: r["n"]
        for r in read_clean(table).groupBy("role")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_role == want


def test_view_pins_snapshot_until_reregistered(spark, table):
    register_sql_views(table, "pinned")
    conv = spark.sql(
        "SELECT conv_id FROM pinned ORDER BY conv_id LIMIT 1"
    ).first()["conv_id"]
    n0 = spark.sql("SELECT COUNT(*) AS n FROM pinned").first()["n"]
    pre_purge_ms = table.current().committed_at_ms
    table.delete_keys([conv])
    # the registered view still reads the snapshot it was pinned to
    assert spark.sql("SELECT COUNT(*) AS n FROM pinned").first()["n"] == n0
    assert spark.sql(
        f"SELECT COUNT(*) AS n FROM pinned WHERE conv_id = '{conv}'"
    ).first()["n"] > 0
    # re-registering advances to the post-purge state
    register_sql_views(table, "pinned")
    assert spark.sql(
        f"SELECT COUNT(*) AS n FROM pinned WHERE conv_id = '{conv}'"
    ).first()["n"] == 0
    # FOR SYSTEM_TIME AS OF: the pre-purge probe sees the conv again
    register_sql_views(table, "asof", as_of_ms=pre_purge_ms)
    assert spark.sql(
        f"SELECT COUNT(*) AS n FROM asof WHERE conv_id = '{conv}'"
    ).first()["n"] > 0


def test_cli_sql_json(spark, table, capsys):
    rc = cli.main([
        "sql", "--table", table.path, "--view", "t", "--json",
        "--query",
        "SELECT role, COUNT(*) AS n FROM t GROUP BY role ORDER BY role",
    ])
    assert rc == 0
    lines = [
        json.loads(x)
        for x in capsys.readouterr().out.strip().splitlines()
        if x.startswith("{")
    ]
    got = {d.get("role"): d["n"] for d in lines if "n" in d}
    want = {
        r["role"]: r["n"]
        for r in read_clean(table).groupBy("role")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want and sum(got.values()) == read_clean(table).count()


def test_cli_sql_event_time_slice(spark, table, capsys):
    """`sql --ts-from/--ts-to` registers views over the event-time slice
    (manifest-stats pruned) — counts match the API-side slice."""
    import datetime as dt

    lo_dt, hi_dt = read_clean(table).agg(
        F.min("ts"), F.max("ts")
    ).first()
    lo = int(lo_dt.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    hi = int(hi_dt.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    mid = (lo + hi) // 2
    rc = cli.main([
        "sql", "--table", table.path, "--json",
        "--ts-from", str(mid), "--ts-to", str(hi),
        "--query", "SELECT COUNT(*) AS n FROM t",
    ])
    assert rc == 0
    out = [
        json.loads(x)
        for x in capsys.readouterr().out.strip().splitlines()
        if x.startswith("{")
    ][-1]
    want = read_clean(table, ts_between=(mid, hi)).count()
    assert out["n"] == want and 0 < want < read_clean(table).count()
