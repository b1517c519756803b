"""Regression tests for the round-4 advisor findings (ADVICE.md r4).

Each test pins one fixed failure mode:
* add_columns DEFAULT validation accepted non-deterministic (rand(),
  uuid()), query-start-time (current_timestamp()) and aggregate (max(1))
  expressions — non-repeatable snapshot reads / relay divergence, or an
  AnalysisException inside every later read projection
* a batch containing op='P' rows but no patch_cols column raised
  RuntimeError after profiling (halting the pipeline; every retry
  re-fails) instead of dead-lettering the malformed rows
* the blind-append-MoR refusal triggered on the _col_lsn column alone,
  even when the batch carried no patches and map_stats proved every
  dirty-bucket file map-free — one warehouse blind append bricked all
  later merges until compact()
* an op='P' whose patch_cols named a column absent from the batch's
  physical schema silently folded NULL as a deliberate set at the
  patch's LSN (losing the set-vs-unchanged distinction)
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import (
    apply_batch,
    read_clean,
)
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)

PATCH_SCHEMA = (
    "op string, lsn long, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp, patch_cols array<string>"
)


def _mk(spark, path, merge_mode="cow", num_buckets=4):
    return LakeTable.create(
        spark, path, target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"], num_buckets=num_buckets,
        bucket_by=["conv_id"], merge_mode=merge_mode,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


# --- ADVICE r4 #1: DEFAULT expression validation ---------------------------

@pytest.mark.parametrize("bad_default", [
    "rand()", "uuid()", "current_timestamp()", "max(1)", "now()",
    "current_date()",
])
def test_default_rejects_unrepeatable_expressions(
    spark, tmp_path, bad_default
):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="default for"):
        t.add_columns(
            [T.StructField("extra", T.StringType(), True)],
            defaults={"extra": bad_default},
        )
    # the failed declaration committed nothing
    assert "extra" not in {f.name for f in t.current().schema.fields}


def test_default_still_accepts_constants(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.add_columns(
        [T.StructField("lang", T.StringType(), True),
         T.StructField("score", T.IntegerType(), True)],
        defaults={"lang": "upper('und')", "score": "1 + 2"},
    )
    row = _mk_read_default_probe(spark, t)
    assert (row.lang, row.score) == ("UND", 3)


def _mk_read_default_probe(spark, t):
    b = spark.createDataFrame(
        [("I", 1, BASE, "c1", 0, "user", "hi", None, BASE)], CHANGE_SCHEMA
    )
    apply_batch(t, b, 0)
    return read_clean(t).collect()[0]


# --- ADVICE r4 #2: op='P' without patch_cols dead-letters ------------------

def test_patch_rows_without_envelope_column_quarantine(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    apply_batch(t, _batch(spark, [
        ("I", 1, BASE, "c1", 0, "user", "hi", None, BASE),
    ]), 0)
    parked = []
    res = apply_batch(t, _batch(spark, [
        # a stray misconfigured-feed patch row in a plain CHANGE_SCHEMA
        # batch (no patch_cols column exists at all)
        ("P", 5, BASE, "c1", 0, None, "poison", None, None),
        ("U", 3, BASE, "c1", 0, "user", "updated", None, BASE),
    ]), 1, dead_letter=lambda df: parked.append(df.count()))
    # the good row applied; the P row quarantined instead of raising
    assert res.rows_quarantined == 1 and parked == [1]
    assert res.rows_applied == 1
    row = read_clean(t).collect()[0]
    assert (row.text, row._lsn) == ("updated", 3)
    # and the retry path stays clean: a redelivery is fenced, not re-failed
    res2 = apply_batch(t, _batch(spark, [
        ("P", 5, BASE, "c1", 0, None, "poison", None, None),
    ]), 1)
    assert res2.skipped


# --- ADVICE r4 #3: blind append does not brick a map-free posdel table -----

def test_blind_append_allowed_when_all_files_map_free(spark, tmp_path):
    feed, tp = str(tmp_path / "feed"), str(tmp_path / "t")
    # patch-BEARING spec so the table carries _col_lsn history...
    write_feed(spark, feed, FeedSpec(
        n_events=800, n_conversations=20, turns_per_conversation=6,
        patch_pct=25, events_per_chunk=400,
    ))
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                  merge_mode="mor")
    t = LakeTable.load(spark, tp)
    assert "_col_lsn" in {f.name for f in t.current().schema.fields}
    # ...then overwrite EVERY key with a full update (a full event at max
    # LSN sets all columns at the row LSN → sparse map out is NULL) and
    # compact: every live file is then footer-proven map-free
    keys = read_clean(t).select("conv_id", "turn_idx").collect()
    apply_batch(t, _batch(spark, [
        ("U", 5_000_000 + i, BASE, k.conv_id, k.turn_idx, "user",
         f"full-{i}", None, BASE)
        for i, k in enumerate(keys)
    ]), 5_000)
    t.compact()
    snap = t.current()
    assert all(snap.map_stats.get(f, False)
               for fs in snap.files.values() for f in fs)
    before = read_clean(t).count()
    # warehouse blind append clears the posdel invariant
    t.append(t.read().limit(0))
    assert not t.current().mor_deletes
    # a PATCH-FREE merge must now be admitted (classic plan is provably
    # identical on a map-free table) instead of raising until compact()
    res = apply_batch(t, _batch(spark, [
        ("U", 10_000_000, BASE, "convFRESH", 0, "user", "post-append",
         None, BASE),
    ]), 10_000)
    assert res.rows_applied == 1
    assert read_clean(t).count() == before + 1
    # but a batch CARRYING patches still refuses on the blind path
    pb = spark.createDataFrame(
        [("P", 10_000_001, "convFRESH", 0, None, "patched", None, None,
          ["text"])],
        PATCH_SCHEMA,
    )
    with pytest.raises(RuntimeError, match="write-time arbitration"):
        apply_batch(t, pb, 10_001)


def test_blind_refusal_kept_while_stored_maps_live(spark, tmp_path):
    feed, tp = str(tmp_path / "feed"), str(tmp_path / "t")
    write_feed(spark, feed, FeedSpec(
        n_events=800, n_conversations=20, turns_per_conversation=6,
        patch_pct=25, events_per_chunk=400,
    ))
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4,
                  merge_mode="mor")
    t = LakeTable.load(spark, tp)
    # live sparse maps exist (no compact) — find a bucket that holds one
    snap = t.current()
    assert any(not snap.map_stats.get(f, False)
               for fs in snap.files.values() for f in fs)
    t.append(t.read().limit(0))  # clears the invariant
    # a patch-free single-row merge landing in a map-BEARING bucket still
    # refuses: row-level collapse would ignore stored per-column versions
    victim = read_clean(t).filter(F.col("_lsn").isNotNull()).first()
    with pytest.raises(RuntimeError, match="write-time arbitration"):
        apply_batch(t, _batch(spark, [
            ("U", 20_000_000, BASE, victim.conv_id, victim.turn_idx,
             "user", "late", None, BASE),
        ]), 20_000)


# --- ADVICE r4 #4: patch_cols naming an absent column dead-letters ---------

def test_patch_naming_absent_column_quarantines(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    apply_batch(t, _batch(spark, [
        ("I", 1, BASE, "c1", 0, "user", "hi", "toolA", BASE),
    ]), 0)
    # batch physically lacks `tool` — a patch claiming to set it would
    # fold NULL as a deliberate set at LSN 5
    sch = ("op string, lsn long, conv_id string, turn_idx int, "
           "role string, text string, ts timestamp, "
           "patch_cols array<string>")
    parked = []
    res = apply_batch(
        t,
        spark.createDataFrame([
            ("P", 5, "c1", 0, None, None, None, ["tool"]),      # absent col
            ("P", 6, "c1", 0, None, "patched", None, ["text"]),  # valid
            ("P", 7, "c1", 0, None, None, None, [None]),         # null entry
        ], sch),
        1,
        dead_letter=lambda df: parked.append(df.count()),
    )
    assert res.rows_quarantined == 2 and parked == [2]
    row = read_clean(t).collect()[0]
    # the valid patch applied; tool survived untouched
    assert (row.text, row.tool, row._lsn) == ("patched", "toolA", 6)
