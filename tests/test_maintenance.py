"""Policy-driven maintenance (table properties + maintain()): targeting is
manifest-first and scoped, policy lives with the table, a healthy table
maintains as a no-op."""

from __future__ import annotations

import json

from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark import main as cli
from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.maintenance import (
    maintain,
    plan_maintenance,
)
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("_lsn", T.LongType(), True),
    ]
)


def _mk(spark, path, **kw):
    return LakeTable.create(
        spark, path, SCHEMA, key=["conv_id", "turn_idx"], num_buckets=4, **kw
    )


def _fill(spark, t, n_appends=3, convs=8):
    for a in range(n_appends):
        t.append(
            spark.createDataFrame(
                [
                    (f"c{i}", a, f"t{a}-{i}", a * 100 + i)
                    for i in range(convs)
                ],
                SCHEMA,
            )
        )


def test_properties_roundtrip_and_rollback_semantics(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"),
            properties={"retention.keep-last": "3"})
    assert t.current().properties == {"retention.keep-last": "3"}
    pre = t.current().snapshot_id
    t.alter_properties({"maintenance.small-files-per-bucket": "2"})
    t.alter_properties(unset=["retention.keep-last"])
    assert t.current().properties == {
        "maintenance.small-files-per-bucket": "2"
    }
    # no-op alter commits nothing
    v = t.current().version
    t.alter_properties({"maintenance.small-files-per-bucket": "2"})
    assert t.current().version == v
    # properties do NOT time-travel: rollback keeps the current config
    t.rollback_to(pre)
    assert t.current().properties == {
        "maintenance.small-files-per-bucket": "2"
    }
    # ...but ride ordinary commits forward
    _fill(spark, t, n_appends=1)
    assert t.current().properties == {
        "maintenance.small-files-per-bucket": "2"
    }


def test_maintain_targets_only_built_up_buckets(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    _fill(spark, t, n_appends=4)  # every bucket has 4 small files
    # compact two buckets by hand so only the REST are built up
    t.compact(target_buckets=[0, 1])
    plan = plan_maintenance(t)
    assert set(plan["reasons"]) == {"small_files"}
    assert 0 not in plan["compact_buckets"] and 1 not in plan["compact_buckets"]

    before = t.read().count()
    rep = maintain(t)
    assert rep["compacted"]
    assert LakeTable.load(spark, t.path).read().count() == before
    snap = t.current()
    assert all(len(fl) == 1 for fl in snap.files.values())
    # healthy table: second maintain is a no-op, no new snapshot
    v = snap.version
    rep2 = maintain(t)
    assert not rep2["compacted"] and rep2["compact_buckets"] == []
    assert t.current().version == v


def test_maintain_materializes_purges_and_expires(spark, tmp_path):
    t = _mk(
        spark,
        str(tmp_path / "t"),
        properties={"retention.auto": "true", "retention.keep-last": "2"},
    )
    _fill(spark, t, n_appends=2)
    t.compact()
    t.delete_keys(["c1"])
    plan = plan_maintenance(t)
    assert "equality_deletes" in plan["reasons"] and plan["expire"]
    rep = maintain(t)
    assert rep["compacted"] and "retention" in rep
    snap = t.current()
    assert snap.eq_deletes == []
    df = t.read()
    assert df.filter(df["conv_id"] == "c1").count() == 0
    assert rep["retention"]["snapshots_expired"] >= 1


def test_maintain_size_policy_uses_footer_scan(spark, tmp_path):
    t = _mk(
        spark,
        str(tmp_path / "t"),
        # absurdly high avg-size floor: every bucket is "too small"
        properties={"maintenance.min-avg-file-mb": "64"},
    )
    _fill(spark, t, n_appends=1)
    t.compact()  # one file per bucket -> below the small-files trigger
    plan = plan_maintenance(t)
    assert plan["reasons"].get("small_avg_file_size")
    assert maintain(t)["compacted"] is True or plan["compact_buckets"]


def test_maintain_restores_mor_invariant_fully(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), merge_mode="mor-append")
    _fill(spark, t, n_appends=2)  # blind appends -> invariant broken
    assert not t.current().mor_deletes
    plan = plan_maintenance(t)
    assert "mor_invariant" in plan["reasons"]
    maintain(t)
    assert t.current().mor_deletes  # full compaction attested it


def test_replayed_table_is_healthy_by_default(spark, tmp_path):
    """CoW MERGE rewrites dirty buckets wholesale, so a replayed table has
    no small-file buildup — maintain() must see nothing to do."""
    feed, table = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(
        spark, feed,
        FeedSpec(n_events=1200, n_conversations=24, events_per_chunk=300),
    )
    runner.replay(spark, feed, table, chunks_per_batch=1, num_buckets=4)
    t = LakeTable.load(spark, table)
    assert plan_maintenance(t)["compact_buckets"] == []
    assert maintain(t)["compacted"] is False


def test_cli_maintain(spark, tmp_path, capsys):
    table = str(tmp_path / "t")
    t = _mk(spark, table)
    _fill(spark, t, n_appends=5)  # blind appends -> small-file buildup
    assert cli.main([
        "maintain", "--table", table,
        "--set-property", "retention.auto=true",
        "--set-property", "retention.keep-last=3",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["compacted"] and rep["retention"]["snapshots_expired"] >= 0
    t = LakeTable.load(spark, table)
    assert t.current().properties["retention.auto"] == "true"
    assert cli.main(["maintain", "--table", table, "--dry-run"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["dry_run"] and rep["compact_buckets"] == []


def test_sort_order_property_follows_column_ddl(spark, tmp_path):
    """compaction.sort-order is validated at DECLARATION, follows a
    rename, and blocks a drop of a referenced column.  Regression: a
    rename left the property naming a vanished column, so every scheduled
    maintain()/compact() raised ValueError forever."""
    import pytest

    t = _mk(spark, str(tmp_path / "t"))

    _fill(spark, t, n_appends=2)

    with pytest.raises(ValueError, match="unknown column"):
        t.alter_properties({"compaction.sort-order": "zorder(nope,text)"})

    t.alter_properties({"compaction.sort-order": "zorder(conv_id,turn_idx)"})
    t.rename_column("conv_id", "conversation_id")
    assert (
        t.current().properties["compaction.sort-order"]
        == "zorder(conversation_id,turn_idx)"
    )
    t.compact()  # raised 'unknown column(s)' pre-fix

    # plain-list form follows a rename and blocks a drop too
    t.alter_properties({"compaction.sort-order": "text"})
    with pytest.raises(ValueError, match="referenced by compaction"):
        t.drop_column("text")
    t.rename_column("text", "body")
    assert t.current().properties["compaction.sort-order"] == "body"
    t.alter_properties(unset=["compaction.sort-order"])
    t.drop_column("body")  # allowed once the property is gone
