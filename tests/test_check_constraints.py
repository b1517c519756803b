"""Table-carried CHECK constraints (``contracts.check.<name>`` table
properties, the Delta ``ADD CONSTRAINT CHECK`` analogue): declared once on
the table, they bind EVERY writer — violating events dead-letter exactly
like structurally-malformed ones, and a requeue repair must satisfy them
before it can redrive."""

from __future__ import annotations

import datetime
import os

import pytest

from pyspark.sql import types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA
from credix_data_pipeline_spark.sources import feed as feed_mod
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=900,
    n_conversations=15,
    turns_per_conversation=6,
    delete_pct=5,
    duplicate_pct=3,
    events_per_chunk=300,
)
TS = datetime.datetime(2024, 1, 1)
CHECK = "role IN ('user', 'assistant', 'tool', 'system')"


def _lax_rows(spark, rows):
    lax = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA]
    )
    return spark.createDataFrame(rows, lax)


def _setup(spark, tmp_path, check=CHECK):
    feed, tp = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(spark, feed, SPEC)
    # first batch creates the table; the constraint then rides the table
    runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4,
                  max_batches=1)
    t = LakeTable.load(spark, tp)
    t.alter_properties({"contracts.check.role_domain": check})
    return feed, tp


def test_check_violations_dead_letter(spark, tmp_path):
    feed, tp = _setup(spark, tmp_path)
    # two events violating the CHECK (bad role), one clean insert
    feed_mod.append_chunk(spark, feed, _lax_rows(spark, [
        ("U", 50_000, TS, "convCHK0", 1, "robot", "bad role", None, TS),
        ("U", 50_001, TS, "convCHK1", 1, None, "null role", None, TS),
        ("U", 50_002, TS, "convCHK2", 1, "user", "fine", None, TS),
    ]))
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    t = LakeTable.load(spark, tp)
    clean = read_clean(t)
    assert clean.filter("conv_id = 'convCHK2'").count() == 1
    assert clean.filter("conv_id IN ('convCHK0','convCHK1')").count() == 0
    failed = spark.read.parquet(os.path.join(tp, runner.FAILED_DIR))
    got = {r["conv_id"] for r in failed.collect()}
    assert {"convCHK0", "convCHK1"} <= got


def test_delete_events_exempt_from_checks(spark, tmp_path):
    feed, tp = _setup(spark, tmp_path)
    t = LakeTable.load(spark, tp)
    victim = read_clean(t).first()["conv_id"]
    # a delete carries no payload — a NULL role must not dead-letter it
    feed_mod.append_chunk(spark, feed, _lax_rows(spark, [
        ("D", 60_000, TS, victim, 0, None, None, None, None),
    ]))
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    t = LakeTable.load(spark, tp)
    assert read_clean(t).filter(
        f"conv_id = '{victim}' AND turn_idx = 0"
    ).count() == 0
    assert not os.path.isdir(os.path.join(tp, runner.FAILED_DIR))


def test_requeue_repair_must_satisfy_checks(spark, tmp_path):
    feed, tp = _setup(spark, tmp_path)
    feed_mod.append_chunk(spark, feed, _lax_rows(spark, [
        ("U", 70_000, TS, "convCHK9", 2, "robot", "bad", None, TS),
    ]))
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    # a repair that still violates the CHECK is refused whole
    with pytest.raises(RuntimeError, match="still fail"):
        runner.requeue_failed(spark, tp, feed, fixes={"role": "'droid'"})
    # a compliant repair redrives and the next replay ingests it
    out = runner.requeue_failed(spark, tp, feed, fixes={"role": "'tool'"})
    assert out["requeued"] == 1
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)
    row = read_clean(LakeTable.load(spark, tp)).filter(
        "conv_id = 'convCHK9'"
    ).first()
    assert row["role"] == "tool"


def test_invalid_check_expression_fails_loud(spark, tmp_path):
    feed, tp = _setup(spark, tmp_path, check="role IN ('user'")  # unbalanced
    feed_mod.append_chunk(spark, feed, _lax_rows(spark, [
        ("U", 80_000, TS, "convX", 1, "user", "x", None, TS),
    ]))
    with pytest.raises(Exception, match="role_domain"):
        runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)


def test_check_on_evolved_column_tolerates_lagging_chunks(spark, tmp_path):
    """A check referencing a column added by in-flight evolution must see
    NULL for batches from pre-evolution chunks, not halt the replay with
    an unresolved-column error (review finding)."""
    feed, tp = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4,
                  max_batches=1)
    t = LakeTable.load(spark, tp)
    # evolve: a chunk carrying a NEW column adds it to the table
    wide = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA]
        + [T.StructField("score", T.IntegerType(), True)]
    )
    feed_mod.append_chunk(spark, feed, spark.createDataFrame(
        [("U", 40_000, TS, "convEVO", 1, "user", "scored", None, TS, 7)],
        wide,
    ))
    runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4)
    t = LakeTable.load(spark, tp)
    assert "score" in {f.name for f in t.current().schema.fields}
    # the check references the evolved column; accept NULL explicitly
    t.alter_properties({
        "contracts.check.score_pos": "coalesce(score >= 0, true)",
    })
    # a LAGGING chunk without the column must still replay (score -> NULL)
    feed_mod.append_chunk(spark, feed, _lax_rows(spark, [
        ("U", 41_000, TS, "convLAG", 1, "user", "no score col", None, TS),
    ]))
    runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4)
    t = LakeTable.load(spark, tp)
    assert read_clean(t).filter("conv_id = 'convLAG'").count() == 1
    # and a violating value in the evolved column still dead-letters
    feed_mod.append_chunk(spark, feed, spark.createDataFrame(
        [("U", 42_000, TS, "convNEG", 1, "user", "bad score", None, TS, -5)],
        wide,
    ))
    runner.replay(spark, feed, tp, chunks_per_batch=1, num_buckets=4)
    t = LakeTable.load(spark, tp)
    assert read_clean(t).filter("conv_id = 'convNEG'").count() == 0
    failed = spark.read.parquet(os.path.join(tp, runner.FAILED_DIR))
    assert failed.filter("conv_id = 'convNEG'").count() == 1
