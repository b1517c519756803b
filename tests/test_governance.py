"""Table-carried governance: ``governance.mask.<col>`` column masks and a
``governance.row-filter`` row filter (the BigQuery column-level-security /
Delta-Unity masking-policy analogue).  Declared once as table properties,
they bind the SQL read surface — ``register_sql_views`` / ``main.py sql`` —
for every consumer; engine paths stay privileged.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark import main as cli
from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import (
    read_clean,
    register_sql_views,
)
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


def _govern(table):
    table.alter_properties({
        "governance.mask.text":
            "case when {col} is null then null else '***' end",
        "governance.mask.turn_idx": "{col} % 2",
        "governance.row-filter": "role <> 'tool'",
    })
    return LakeTable.load(spark=table.spark, path=table.path)


def test_masks_and_filter_bind_the_sql_surface(spark, table):
    truth = read_clean(table)
    n_tool = truth.filter(F.col("role") == "tool").count()
    assert n_tool > 0  # the filter must actually hide something
    t = _govern(table)

    register_sql_views(t, "gv")
    got = spark.sql("SELECT * FROM gv")
    assert got.filter(F.col("role") == "tool").count() == 0
    assert got.count() == truth.count() - n_tool
    texts = {r["text"] for r in got.select("text").distinct().collect()}
    assert texts <= {"***", None}
    # mask result is cast back to the column's type
    assert dict(got.dtypes)["turn_idx"] == dict(truth.dtypes)["turn_idx"]
    parity = {r["turn_idx"] for r in got.select("turn_idx").distinct().collect()}
    assert parity <= {0, 1}
    # the raw view is governed too (bookkeeping visible, payload masked)
    raw = spark.sql("SELECT * FROM gv_raw")
    assert "_lsn" in raw.columns
    raw_texts = {r["text"] for r in raw.select("text").distinct().collect()}
    assert raw_texts <= {"***", None}

    # privileged registration = the old, ungoverned surface
    register_sql_views(t, "pv", privileged=True)
    pv = spark.sql("SELECT * FROM pv")
    assert pv.count() == truth.count()
    assert {r["text"] for r in pv.select("text").distinct().collect()} == {
        r["text"] for r in truth.select("text").distinct().collect()
    }
    # the library/engine read path is never governed
    assert read_clean(t).count() == truth.count()


def test_policy_is_live_even_for_time_travel(spark, table):
    pre_snapshot = table.current().snapshot_id
    t = _govern(table)
    # the mask was declared AFTER pre_snapshot; an as-of read must still
    # be governed, else time travel bypasses the policy
    register_sql_views(t, "hv", snapshot_id=pre_snapshot)
    texts = {
        r["text"]
        for r in spark.sql("SELECT DISTINCT text FROM hv").collect()
    }
    assert texts <= {"***", None}


def test_declaration_validation(spark, table):
    with pytest.raises(ValueError, match="no column"):
        table.alter_properties({"governance.mask.nope": "'x'"})
    with pytest.raises(ValueError, match="engine column"):
        table.alter_properties({"governance.mask._lsn": "0"})
    with pytest.raises(ValueError, match="invalid governance"):
        table.alter_properties({"governance.mask.text": "no_such_col || 'x'"})
    with pytest.raises(ValueError, match="invalid governance"):
        table.alter_properties({"governance.row-filter": "SELECT FROM"})
    with pytest.raises(ValueError, match="invalid governance"):
        table.alter_properties({"governance.row-filter": "ghost_col = 1"})


def test_ddl_interplay(spark, table):
    t = _govern(table)
    # rename re-keys the mask; the {col} placeholder needs no rewrite
    t.rename_column("text", "body")
    t = LakeTable.load(spark, t.path)
    props = t.current().properties
    assert "governance.mask.text" not in props
    assert props["governance.mask.body"].startswith("case when {col}")
    register_sql_views(t, "rv")
    vals = {r["body"] for r in spark.sql("SELECT DISTINCT body FROM rv").collect()}
    assert vals <= {"***", None}
    # renaming/dropping a row-filter column is refused until unset
    with pytest.raises(ValueError, match="governance.row-filter"):
        t.rename_column("role", "speaker")
    with pytest.raises(ValueError, match="governance.row-filter"):
        t.drop_column("role")
    # dropping a masked column drops its mask property with it
    t.drop_column("body")
    t = LakeTable.load(spark, t.path)
    assert "governance.mask.body" not in t.current().properties
    # after unsetting the filter, the rename goes through
    t.alter_properties(unset=["governance.row-filter"])
    LakeTable.load(spark, t.path).rename_column("role", "speaker")


def test_cli_sql_governed_and_privileged(spark, table, capsys):
    t = _govern(table)
    rc = cli.main([
        "sql", "--table", t.path, "--view", "t",
        "--query", "SELECT DISTINCT text FROM t", "--json",
    ])
    assert rc == 0
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert {r.get("text") for r in rows} <= {"***", None}
    rc = cli.main([
        "sql", "--table", t.path, "--view", "t", "--privileged",
        "--query", "SELECT COUNT(DISTINCT text) AS n FROM t", "--json",
    ])
    out = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert rc == 0 and out[0]["n"] > 1


def test_nested_mask_and_consumer_cli_surfaces(spark, tmp_path, capsys):
    """Nested struct-field masks (governance.mask.tool_meta.name), and the
    lookup/changes consumer commands honoring governance: lookup applies
    masks + filter, changes applies masks ONLY (a hidden DELETE would
    strand rows on consumer replicas)."""
    from datetime import datetime, timezone

    from pyspark.sql import types as T

    from credix_data_pipeline_spark.operators.apply import apply_batch
    from credix_data_pipeline_spark.schema import (
        CHANGE_SCHEMA,
        target_schema_for,
    )

    BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)
    TOOL_META_T = T.StructType([
        T.StructField("call_id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
    ])
    NESTED = T.StructType([
        *CHANGE_SCHEMA.fields,
        T.StructField("tool_meta", TOOL_META_T, True),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "nt"), target_schema_for(NESTED),
        key=["conv_id", "turn_idx"], num_buckets=2, bucket_by=["conv_id"],
    )
    create_sid = t.current().snapshot_id
    apply_batch(t, spark.createDataFrame([
        ("I", 1, BASE, "c0", 0, "user", "hi", None, BASE, (7, "secret_fn")),
        ("I", 2, BASE, "c0", 1, "tool", "calc", "calculator", BASE, None),
        ("I", 3, BASE, "c1", 0, "user", "yo", None, BASE, (9, "other_fn")),
    ], NESTED), 0, collect_stats=False)
    pre = t.current().snapshot_id
    t.alter_properties({
        "governance.mask.tool_meta.name": "'<fn>'",
        "governance.row-filter": "role <> 'tool'",
    })
    t = LakeTable.load(spark, t.path)

    register_sql_views(t, "nv")
    rows = {
        (r.conv_id, r.turn_idx): (
            None if r.tool_meta is None
            else (r.tool_meta.call_id, r.tool_meta.name)
        )
        for r in spark.sql("SELECT * FROM nv").collect()
    }
    # filter hid the tool turn; nested name masked, sibling field + NULL
    # struct untouched
    assert rows == {("c0", 0): (7, "<fn>"), ("c1", 0): (9, "<fn>")}

    # declaration validation for nested paths
    with pytest.raises(KeyError, match="no field"):
        t.alter_properties({"governance.mask.tool_meta.ghost": "'x'"})

    # lookup (consumer) masks + filters; --privileged shows the truth
    rc = cli.main(["lookup", "--table", t.path, "--conv", "c0"])
    out = capsys.readouterr().out
    assert rc == 0 and "<fn>" in out and "secret_fn" not in out
    assert "calc" not in out  # the tool turn is filtered
    rc = cli.main(["lookup", "--table", t.path, "--conv", "c0",
                   "--privileged"])
    out = capsys.readouterr().out
    assert rc == 0 and "secret_fn" in out and "calc" in out

    # changes masks payload but NEVER hides events: the tool turn's
    # insert must appear, with the nested field masked
    rc = cli.main(["changes", "--table", t.path,
                   "--from-snapshot", str(create_sid), "--limit", "50"])
    out = capsys.readouterr().out
    assert rc == 0 and "calc" in out and "secret_fn" not in out
    assert "<fn>" in out

    # nested DDL interplay: rename re-keys the nested mask; dropping the
    # struct drops it; renaming a filter-referenced parent refuses
    t.rename_column("tool_meta.name", "fn_name")
    t = LakeTable.load(spark, t.path)
    props = t.current().properties
    assert "governance.mask.tool_meta.name" not in props
    assert props["governance.mask.tool_meta.fn_name"] == "'<fn>'"
    with pytest.raises(ValueError, match="governance.row-filter"):
        t.rename_column("role", "speaker")
    t.drop_column("tool_meta.fn_name")
    t = LakeTable.load(spark, t.path)
    assert not any(
        k.startswith("governance.mask.") for k in t.current().properties
    )
    assert pre  # pinned earlier state still loads (no property rewrite)


def test_masks_evaluate_over_true_values(spark, table):
    """A mask referencing ANOTHER masked column must see the TRUE value
    (all masks compute from the pre-mask row in one projection), not the
    other mask's output — no alphabetical-order dependence."""
    table.alter_properties({
        # 'role' sorts before 'text': with a withColumn chain the text
        # mask would see the MASKED role
        "governance.mask.role": "'?'",
        "governance.mask.text": "concat(role, ':', 'x')",
    })
    t = LakeTable.load(spark, table.path)
    register_sql_views(t, "tv2")
    got = {
        r["text"]
        for r in spark.sql(
            "SELECT DISTINCT text FROM tv2 WHERE text IS NOT NULL"
        ).collect()
    }
    roles = {
        r["role"]
        for r in read_clean(table).select("role").distinct().collect()
    }
    assert got == {f"{x}:x" for x in roles}  # true roles, not '?:x'


def test_masked_column_slicing_refused(spark, table):
    """A range slice on a masked column evaluates over TRUE values before
    the mask projects — per-window row counts would let a governed
    consumer binary-search every masked value (review batch 4)."""
    t = _govern(table)  # masks text + turn_idx
    with pytest.raises(PermissionError, match="binary-search"):
        register_sql_views(t, "gvs", between={"turn_idx": (0, 2)})
    # privileged escape and unmasked columns still slice
    register_sql_views(t, "gvs", between={"turn_idx": (0, 2)},
                       privileged=True)
    register_sql_views(t, "gvs2", between={"_lsn": (0, 10**12)},
                       privileged=True)
    # ts_between counts as slicing on ts
    t.alter_properties({"governance.mask.ts": "cast(null as timestamp)"})
    t2 = LakeTable.load(spark=t.spark, path=t.path)
    with pytest.raises(PermissionError):
        register_sql_views(t2, "gvs3", ts_between=(0, 10**13))


def test_raw_view_keeps_tombstones_through_row_filter(spark, table):
    """Tombstones have payload nulled, so any row filter evaluates NULL on
    them — the raw (tombstones-included) view must exempt deletes or a
    consumer replicating from it strands every deleted key forever (the
    cmd_changes rule, review batch 4)."""
    from credix_data_pipeline_spark.operators.apply import read_current

    n_tomb = read_current(table).filter(
        F.coalesce(F.col("_deleted"), F.lit(False))
    ).count()
    assert n_tomb > 0
    t = _govern(table)
    register_sql_views(t, "gvr")
    raw = spark.sql("SELECT * FROM gvr_raw")
    assert raw.filter(
        F.coalesce(F.col("_deleted"), F.lit(False))
    ).count() == n_tomb
    # live filtered rows stay hidden and masks still bind the raw view
    live = raw.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    assert live.filter(F.col("role") == "tool").count() == 0
    texts = {r["text"] for r in live.select("text").distinct().collect()}
    assert texts <= {"***", None}


def test_mask_referencing_other_column_blocks_ddl(spark, table):
    """A mask whose EXPRESSION names another column must block that
    column's rename/drop — otherwise the dangling reference bricks every
    later governed read with an AnalysisException (review batch 4)."""
    table.alter_properties({
        "governance.mask.text": "concat({col}, role)",
    })
    t = LakeTable.load(spark=table.spark, path=table.path)
    with pytest.raises(ValueError, match="mask expression"):
        t.drop_column("role")
    with pytest.raises(ValueError, match="mask expression"):
        t.rename_column("role", "speaker")
    # dropping the MASKED column itself still works (the mask goes with it)
    t.drop_column("text")
    t2 = LakeTable.load(spark=t.spark, path=t.path)
    assert "governance.mask.text" not in t2.current().properties
    # and role is free to move now
    t2.rename_column("role", "speaker")
