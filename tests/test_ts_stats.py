"""Event-time manifest stats: per-file ``ts`` bounds recorded at commit;
``read(ts_between=...)`` prunes provably-cold files by metadata alone and
always applies the exact row predicate; blind-append MoR never skips."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)

DAY_MS = 86_400_000
T0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
T0_MS = int(T0.timestamp() * 1000)


def _day_rows(spark, day: int, convs, lsn0: int):
    rows = [
        (
            f"conv{c:04d}", i, f"d{day} {c} {i}",
            T0 + dt.timedelta(days=day, minutes=c * 10 + i),
            lsn0 + c * 4 + i, False,
        )
        for c in convs
        for i in range(4)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _mk_days(spark, path, n_days=4, merge_mode="cow"):
    t = LakeTable.create(
        spark, path, SCHEMA, key=["conv_id", "turn_idx"], num_buckets=4,
        merge_mode=merge_mode,
    )
    for d in range(n_days):
        t.append(_day_rows(spark, d, range(d * 20, d * 20 + 20),
                           lsn0=1 + d * 100))
    return t


def _win(day_lo: int, day_hi: int) -> tuple[int, int]:
    return (T0_MS + day_lo * DAY_MS, T0_MS + day_hi * DAY_MS - 1)


def test_ts_bounds_recorded_and_sane(spark, tmp_table):
    t = _mk_days(spark, tmp_table)
    snap = t.current()
    assert set(snap.ts_stats) == set(snap.all_files())
    for lo, hi in snap.ts_stats.values():
        assert T0_MS <= lo <= hi < T0_MS + 5 * DAY_MS
    # the global bounds match the data
    got_lo = min(s[0] for s in snap.ts_stats.values())
    want_lo = int(
        t.read().agg(F.min("ts")).first()[0]
        .replace(tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    assert got_lo == want_lo


def test_ts_between_matches_plain_filter_and_prunes_files(spark, tmp_table):
    t = _mk_days(spark, tmp_table)
    lo, hi = _win(1, 2)  # exactly day 1
    sliced = t.read(ts_between=(lo, hi))
    want = (
        t.read()
        .filter(
            F.col("ts").isNotNull()
            & (F.col("ts") >= F.timestamp_millis(F.lit(lo)))
            & (F.col("ts") <= F.timestamp_millis(F.lit(hi)))
        )
    )
    a = sorted((r["conv_id"], r["turn_idx"]) for r in sliced.collect())
    b = sorted((r["conv_id"], r["turn_idx"]) for r in want.collect())
    assert a == b and len(a) == 80  # 20 convs x 4 turns on day 1
    # metadata pruning: the slice plans strictly fewer files
    assert 0 < len(sliced.inputFiles()) < len(t.read().inputFiles())
    # half-open windows work too
    assert t.read(ts_between=(_win(3, 4)[0], None)).count() == 80
    assert t.read(ts_between=(None, _win(0, 1)[1])).count() == 80


def test_ts_between_empty_window_plans_zero_files(spark, tmp_table):
    t = _mk_days(spark, tmp_table)
    far = (T0_MS + 100 * DAY_MS, T0_MS + 101 * DAY_MS)
    df = t.read(ts_between=far)
    assert df.count() == 0
    assert df.inputFiles() == []


def test_mor_append_slice_is_filter_only_but_correct(spark, tmp_table):
    t = _mk_days(spark, tmp_table, merge_mode="mor-append")
    # a later version of a day-0 key lands with a DAY-3 timestamp: the
    # LWW winner for that key is OUTSIDE a day-0 slice
    upd = spark.createDataFrame(
        [("conv0000", 0, "rewritten",
          T0 + dt.timedelta(days=3, hours=1), 10_000, False)], SCHEMA
    )
    t.append_mor_delta(upd, None)
    lo, hi = _win(0, 1)
    # no file skipping on blind-append MoR (the correctness gate) ...
    assert len(t.read(ts_between=(lo, hi)).inputFiles()) == len(
        t.read().inputFiles()
    )
    # ... so the LWW collapse sees every version: the rewritten key's
    # day-0 version is superseded and must NOT appear as live in a
    # clean day-0 read
    from credix_data_pipeline_spark.operators.apply import read_current

    live = read_current(t).filter(
        F.col("ts").isNotNull()
        & (F.col("ts") >= F.timestamp_millis(F.lit(lo)))
        & (F.col("ts") <= F.timestamp_millis(F.lit(hi)))
    )
    keys = {(r["conv_id"], r["turn_idx"]) for r in live.collect()}
    assert ("conv0000", 0) not in keys
    assert len(keys) == 79


def test_ts_stats_survive_segments_rollback_and_compact(spark, tmp_table):
    t = _mk_days(spark, tmp_table, n_days=2)
    early = t.current()
    t.append(_day_rows(spark, 5, range(100, 110), lsn0=900))
    # fresh load: stats come back through the segment files
    t2 = LakeTable.load(spark, tmp_table)
    assert t2.current().ts_stats == t.current().ts_stats
    # rollback carries the target's stats verbatim
    t.rollback_to(early.snapshot_id)
    assert t.current().ts_stats == early.ts_stats
    # compact() recomputes bounds for the rewritten files
    t.compact()
    snap = t.current()
    assert set(snap.ts_stats) == set(snap.all_files())
    assert t.read(ts_between=_win(1, 2)).count() == 80


def test_read_clean_slice_applies_after_lww_on_mor_append(spark, tmp_table):
    """The clean-read event-time slice on a blind-append MoR table slices
    WINNERS, not versions: a key whose winner moved out of the window
    must vanish from the in-window slice."""
    from credix_data_pipeline_spark.operators.apply import read_clean

    t = _mk_days(spark, tmp_table, n_days=2, merge_mode="mor-append")
    upd = spark.createDataFrame(
        [("conv0000", 0, "moved", T0 + dt.timedelta(days=9), 99_999,
          False)],
        SCHEMA,
    )
    t.append_mor_delta(upd, None)
    lo, hi = _win(0, 1)
    keys = {
        (r["conv_id"], r["turn_idx"])
        for r in read_clean(t, ts_between=(lo, hi)).collect()
    }
    assert ("conv0000", 0) not in keys
    assert len(keys) == 79
    # and the moved winner shows up in ITS window
    later = read_clean(t, ts_between=(T0_MS + 9 * DAY_MS, None))
    assert {(r["conv_id"], r["turn_idx"]) for r in later.collect()} == {
        ("conv0000", 0)
    }


def test_read_clean_slice_prunes_on_cow(spark, tmp_table):
    from credix_data_pipeline_spark.operators.apply import read_clean

    t = _mk_days(spark, tmp_table)
    lo, hi = _win(2, 3)
    df = read_clean(t, ts_between=(lo, hi))
    assert df.count() == 80
    assert 0 < len(df.inputFiles()) < len(t.read().inputFiles())


def test_compaction_sort_order_ts_restores_file_pruning(spark, tmp_table):
    """After compaction, each bucket holds one file spanning ALL days —
    ts_between degrades to row-group pruning only.  With the
    ``compaction.sort-order=ts`` + ``compaction.target-file-rows``
    properties, the rewrite lays each bucket down as several ts-DISJOINT
    files, so the one-day slice prunes files again (the Iceberg
    sort-order + target-file-size pair)."""
    t = _mk_days(spark, tmp_table, n_days=4)

    # key-sorted default compaction: one fat file per bucket -> the slice
    # must scan every file (pruning lost), though results stay exact
    t.compact()
    want = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in t.read().filter(
            F.col("ts").between(
                F.timestamp_millis(F.lit(_win(1, 2)[0])),
                F.timestamp_millis(F.lit(_win(1, 2)[1])),
            )
        ).collect()
    )
    baseline = t.read(ts_between=_win(1, 2))
    assert len(baseline.inputFiles()) == len(t.read().inputFiles())

    # ts sort order + file splitting: re-compact rewrites every bucket
    # into ts-sliced files and the same slice now plans strictly fewer
    t.alter_properties({
        "compaction.sort-order": "ts",
        "compaction.target-file-rows": "40",
    })
    # force a rewrite (compact skips single-file buckets): append one more
    # day so each bucket has 2+ files again
    t.append(_day_rows(spark, 4, range(80, 100), lsn0=1 + 4 * 100))
    t.compact()
    t2 = LakeTable.load(spark, tmp_table)
    sliced = t2.read(ts_between=_win(1, 2))
    assert 0 < len(sliced.inputFiles()) < len(t2.read().inputFiles())
    got = sorted(
        (r.conv_id, r.turn_idx, r.text) for r in sliced.collect()
    )
    assert got == want


def test_compaction_sort_order_unknown_column_refused(spark, tmp_table):
    """Refused at DECLARATION now (hardening batch #3) — a bad sort order
    used to surface only when the next scheduled compact()/maintain()
    blew up.  compact() keeps its own check as defense-in-depth for
    properties written before the eager validation existed."""
    import pytest

    t = _mk_days(spark, tmp_table, n_days=2)
    with pytest.raises(ValueError, match="unknown"):
        t.alter_properties({"compaction.sort-order": "nope"})
    # defense-in-depth: a stale pre-validation property still fails loud
    # at use, not silently
    snap = t.current()
    t._commit(
        parent=snap,
        schema=snap.schema,
        key=snap.key,
        bucket_by=snap.bucket_by,
        num_buckets=snap.num_buckets,
        files=snap.files,
        summary={**t.carry_fence(), "operation": "set-properties"},
        properties={**snap.properties, "compaction.sort-order": "nope"},
    )
    with pytest.raises(ValueError, match="unknown"):
        t.compact()


def test_ts_rebinding_invalidates_stats(spark, tmp_table):
    """drop+re-add of ``ts`` retires the field id — old files' physical ts
    reads as typed NULL.  Regression: ts_stats were carried by PATH across
    the rebind, so delete_older_than metadata-dropped whole files whose
    every logical ts is NULL (the TTL contract says NULL-ts rows survive),
    and read(ts_between=…) skipped files by the retired column's bounds."""
    t = _mk_days(spark, tmp_table, n_days=3)
    n = t.read().count()
    assert t.current().ts_stats  # recorded pre-DDL

    t.drop_column("ts")
    t.add_columns([T.StructField("ts", T.TimestampType(), True)])
    snap = t.current()
    assert snap.ts_stats == {}  # rebind cleared every carried stat

    # a later commit must NOT backfill stats from the RETIRED physical
    # column (dir registry binds ts to a different id)
    t.alter_properties({"k": "v"})
    t.append(
        spark.createDataFrame(
            [("convNEW", 0, "fresh", T0 + dt.timedelta(days=10), 10**9,
              False)],
            SCHEMA,
        )
    )
    snap = t.current()
    old_files = set(t.snapshot(t.history()[0].snapshot_id).all_files())
    assert not (set(snap.ts_stats) & old_files)
    # the NEW file (written under the re-added binding) gets stats again
    assert snap.ts_stats

    # TTL at a cutoff far past every old (now NULL-ts) row: nothing drops
    cutoff = T0_MS + 100 * DAY_MS
    t.delete_older_than(cutoff)
    # every pre-DDL row survives (logical ts NULL — expiry unprovable);
    # only the fresh non-NULL-ts row (day 10 < cutoff) expires
    assert t.read().count() == n
    assert "convNEW" not in {r.conv_id for r in t.read().collect()}
