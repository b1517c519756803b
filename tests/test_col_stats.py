"""Generalized per-file column statistics (``stats.columns`` property) and
range-pruned reads (``read(between=...)``) — the Delta data-skipping /
Iceberg column-stats analogue, one rung above the dedicated ts_stats."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _mk(spark, path, merge_mode="cow", props=None):
    t = LakeTable.create(
        spark,
        path,
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=8,
        bucket_by=["conv_id"],
        merge_mode=merge_mode,
    )
    if props:
        t.alter_properties(props)
        t = LakeTable.load(spark, path)
    return t


def _convs(spark, n):
    """n conversation ids hashing to n DISTINCT buckets (of 8), chosen
    deterministically — CoW rewrites per dirty bucket, so one conv per
    batch keeps earlier batches' files (and their footer bounds) alive."""
    cand = [f"c{i}" for i in range(40)]
    df = spark.createDataFrame([(c,) for c in cand], "conv_id string")
    b = F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int")
    rows = df.select("conv_id", b.alias("b")).collect()
    picked, seen = [], set()
    for r in rows:
        if r.b not in seen:
            picked.append(r.conv_id)
            seen.add(r.b)
        if len(picked) == n:
            return picked
    raise AssertionError("not enough distinct buckets")


def _batch(spark, lo, hi, batch, conv):
    """Inserts for ONE conversation with turn_idx in [lo, hi) and a text
    tag per batch — disjoint ranges per commit + one dirty bucket per
    batch mean disjoint per-file footer bounds that SURVIVE later
    copy-on-write commits."""
    rows = [
        ("I", batch * 1000 + i, BASE, conv, i, "user", f"b{batch}", None, BASE)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def test_declaration_validation(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="unknown or engine"):
        t.alter_properties({"stats.columns": "ghost"})
    with pytest.raises(ValueError, match="unknown or engine"):
        t.alter_properties({"stats.columns": "_lsn"})
    with pytest.raises(ValueError, match="dedicated"):
        t.alter_properties({"stats.columns": "ts"})


def test_skipping_prunes_files_and_matches_filter(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"),
            props={"stats.columns": "turn_idx,text"})
    convs = _convs(spark, 3)
    for b, (lo, hi) in enumerate([(0, 10), (10, 20), (20, 30)]):
        apply_batch(t, _batch(spark, lo, hi, b, convs[b]), b,
                    collect_stats=False)
    t = LakeTable.load(spark, t.path)
    snap = t.current()
    assert set(snap.col_stats) == {"turn_idx", "text"}

    full_files = set(t.read().inputFiles())
    sliced = t.read(between={"turn_idx": (12, 17)})
    assert len(set(sliced.inputFiles())) < len(full_files)
    want = sorted(
        (r.conv_id, r.turn_idx)
        for r in t.read()
        .filter((F.col("turn_idx") >= 12) & (F.col("turn_idx") <= 17))
        .collect()
    )
    got = sorted((r.conv_id, r.turn_idx) for r in sliced.collect())
    assert got == want and len(got) == 6  # 6 turns, one conv (batch 1)

    # string column skipping: batch tags are 'b0'/'b1'/'b2'
    s2 = t.read(between={"text": ("b2", "b2")})
    assert len(set(s2.inputFiles())) < len(full_files)
    assert {r.text for r in s2.collect()} == {"b2"}
    # an empty window plans zero files
    assert t.read(between={"turn_idx": (500, 600)}).count() == 0

    # validation: unknown column / type-mismatched bound fail loud
    with pytest.raises(KeyError, match="no column"):
        t.read(between={"ghost": (1, 2)})
    with pytest.raises(ValueError, match="does not match"):
        t.read(between={"turn_idx": ("a", "b")})


def test_declaring_the_property_backfills_existing_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    convs = _convs(spark, 2)
    apply_batch(t, _batch(spark, 0, 10, 0, convs[0]), 0, collect_stats=False)
    apply_batch(t, _batch(spark, 10, 20, 1, convs[1]), 1, collect_stats=False)
    t = LakeTable.load(spark, t.path)
    assert t.current().col_stats == {}
    # the property-declaration commit itself backfills from footers
    t.alter_properties({"stats.columns": "turn_idx"})
    t = LakeTable.load(spark, t.path)
    stats = t.current().col_stats["turn_idx"]
    assert len(stats) == len(t.current().all_files())
    assert len(set(t.read(between={"turn_idx": (0, 5)}).inputFiles())) < len(
        set(t.read().inputFiles())
    )


def test_rename_keeps_stats_and_drop_clears_them(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), props={"stats.columns": "turn_idx,text"})
    convs = _convs(spark, 2)
    for b, (lo, hi) in enumerate([(0, 10), (10, 20)]):
        apply_batch(t, _batch(spark, lo, hi, b, convs[b]), b,
                    collect_stats=False)
    t = LakeTable.load(spark, t.path)
    # key column rename is allowed; stats + property follow
    t.rename_column("text", "body")
    t = LakeTable.load(spark, t.path)
    snap = t.current()
    assert snap.properties["stats.columns"] == "turn_idx,body"
    assert "body" in snap.col_stats and "text" not in snap.col_stats
    s = t.read(between={"body": ("b1", "b1")})
    assert len(set(s.inputFiles())) < len(set(t.read().inputFiles()))

    # drop leaves the roster + clears bounds; re-add must NOT inherit the
    # old files' physical bounds (retired field id)
    t.drop_column("body")
    t = LakeTable.load(spark, t.path)
    assert t.current().properties["stats.columns"] == "turn_idx"
    assert "body" not in t.current().col_stats
    t.add_columns([T.StructField("body", T.StringType(), True)])
    t.alter_properties({"stats.columns": "turn_idx,body"})
    t = LakeTable.load(spark, t.path)
    # old files' physical 'body' is a retired id: no bounds, never skipped
    assert t.current().col_stats.get("body", {}) == {}
    s = t.read(between={"body": ("b1", "b1")})
    assert s.count() == 0  # logical body is NULL everywhere


def test_mor_blind_append_never_prunes(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), merge_mode="mor-append",
            props={"stats.columns": "turn_idx"})
    conv = _convs(spark, 1)[0]
    apply_batch(t, _batch(spark, 0, 10, 0, conv), 0, collect_stats=False)
    # an UPDATE of the same keys lands as a blind-append delta: pruning a
    # multi-version read could resurrect the stale version
    upd = _batch(spark, 0, 10, 1, conv).withColumn("op", F.lit("U"))
    apply_batch(t, upd, 1, collect_stats=False)
    t = LakeTable.load(spark, t.path)
    assert not t.current().mor_deletes  # blind appends: invariant broken
    full = set(t.read().inputFiles())
    sliced = t.read(between={"turn_idx": (0, 3)})
    assert set(sliced.inputFiles()) == full  # no skip without the invariant
    # the row predicate still applies after the LWW collapse
    got = {r.text for r in read_clean(t, between={"turn_idx": (0, 3)}).collect()}
    assert got == {"b1"}


def test_clone_carries_stats(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), props={"stats.columns": "turn_idx"})
    convs = _convs(spark, 2)
    for b, (lo, hi) in enumerate([(0, 10), (10, 20)]):
        apply_batch(t, _batch(spark, lo, hi, b, convs[b]), b,
                    collect_stats=False)
    t = LakeTable.load(spark, t.path)
    c = t.clone_to(str(tmp_path / "c"), pin=False)
    assert len(c.current().col_stats["turn_idx"]) == len(
        t.current().col_stats["turn_idx"]
    )
    s = c.read(between={"turn_idx": (0, 5)})
    assert len(set(s.inputFiles())) < len(set(c.read().inputFiles()))
    assert s.count() == t.read(between={"turn_idx": (0, 5)}).count()


def test_compaction_splits_oversized_single_file(spark, tmp_path):
    """A CoW bucket holding ONE file above compaction.target-file-rows must
    still rewrite (Iceberg rewrite_data_files splits too-large files) —
    otherwise a declared sort order / split target never reaches it, and
    with stats.columns the split is what makes per-file bounds disjoint."""
    t = _mk(spark, str(tmp_path / "t"), props={
        "stats.columns": "turn_idx",
        "compaction.sort-order": "turn_idx",
        "compaction.target-file-rows": "10",
    })
    conv = _convs(spark, 1)[0]
    apply_batch(t, _batch(spark, 0, 30, 0, conv), 0, collect_stats=False)
    t = LakeTable.load(spark, t.path)
    assert len(t.current().all_files()) == 1  # one 30-row file, one bucket
    t.compact()
    t = LakeTable.load(spark, t.path)
    files = t.current().all_files()
    assert len(files) == 3  # split into ~10-row clustered files (< the
    # maintenance small-files threshold of 4, so policy upkeep ignores it)
    # the split files carry disjoint bounds: a 10-row slice prunes
    part = set(t.read(between={"turn_idx": (0, 9)}).inputFiles())
    assert len(part) < len(files)
    # a second manual compact may rewrite (its contract) but the layout
    # and content are stable; the POLICY path (maintain) only targets
    # buckets at >= maintenance.small-files-per-bucket, so scheduled
    # upkeep does not churn a freshly split bucket
    before = sorted(map(tuple, t.read().select("conv_id", "turn_idx").collect()))
    t.compact()
    t = LakeTable.load(spark, t.path)
    assert len(t.current().all_files()) == len(files)
    after = sorted(map(tuple, t.read().select("conv_id", "turn_idx").collect()))
    assert after == before
    from credix_data_pipeline_spark.operators.maintenance import maintain
    rep = maintain(t, dry_run=True)
    assert not rep["compact_buckets"]


def test_monitor_reports_stats_coverage(spark, tmp_path):
    from credix_data_pipeline_spark.streaming.monitoring import layout_health

    t = _mk(spark, str(tmp_path / "t"), props={"stats.columns": "turn_idx"})
    conv = _convs(spark, 1)[0]
    apply_batch(t, _batch(spark, 0, 10, 0, conv), 0, collect_stats=False)
    rep = layout_health(spark, t.path)
    cov = rep["stats_coverage"]["turn_idx"]
    assert cov["coverage_bp"] == 10000 and cov["live_files"] >= 1
    # without the property the section is absent (no noise)
    t2 = _mk(spark, str(tmp_path / "t2"))
    apply_batch(t2, _batch(spark, 0, 5, 0, conv), 0, collect_stats=False)
    assert "stats_coverage" not in layout_health(spark, t2.path)
