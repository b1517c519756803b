"""Data contracts (SURVEY §5.2.2 — the dbt schema-test analogues) plus
snapshot time travel and tombstone expiry over a replayed table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark.functions.normalize import with_normalized_text
from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import expire_tombstones, read_clean
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=6_000,
    n_conversations=80,
    turns_per_conversation=10,
    delete_pct=8,
    duplicate_pct=5,
    shuffle_window=48,
    events_per_chunk=1_500,
)


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("contracts")
    feed, table = str(base / "feed"), str(base / "table")
    write_feed(spark, feed, SPEC)
    runner.replay(
        spark, feed, table, chunks_per_batch=2, num_buckets=8,
        transform=with_normalized_text,
    )
    return LakeTable.load(spark, table)


def test_key_uniqueness_contract(spark, replayed):
    """dbt `unique_combination_of_columns` analogue (schema.yml:66-72)."""
    dups = (
        read_clean(replayed)
        .groupBy("conv_id", "turn_idx")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dups.isEmpty()


def test_not_null_and_accepted_values_contracts(spark, replayed):
    """dbt not_null + accepted_values analogues (schema.yml:9-29,74-98)."""
    df = read_clean(replayed)
    assert df.filter(F.col("conv_id").isNull()).isEmpty()
    assert df.filter(F.col("turn_idx").isNull()).isEmpty()
    assert df.filter(F.col("_lsn").isNull()).isEmpty()
    bad_roles = df.filter(
        ~F.col("role").isin("user", "assistant", "system", "tool")
        & F.col("role").isNotNull()
    )
    assert bad_roles.isEmpty()


def test_time_travel_reads_are_stable(spark, replayed):
    """Snapshot isolation: a past merge snapshot re-reads identically even
    after later commits (Iceberg time-travel analogue)."""
    merges = [s for s in replayed.history() if "batch_id" in s.summary]
    assert len(merges) >= 2
    early = merges[0]
    then_df = replayed.read(snapshot_id=early.snapshot_id)
    n_then = then_df.count()
    lsn_then = then_df.agg(F.max("_lsn")).first()[0]
    lsn_now = replayed.read().agg(F.max("_lsn")).first()[0]
    assert n_then > 0
    assert lsn_now > lsn_then  # the table moved on past the pinned snapshot
    # pinned read is reproducible after later commits
    pinned = replayed.read(snapshot_id=early.snapshot_id)
    assert pinned.count() == n_then
    assert pinned.agg(F.max("_lsn")).first()[0] == lsn_then


def test_expire_tombstones_preserves_live_rows(spark, replayed):
    live_before = read_clean(replayed).count()
    total_before = replayed.read().count()
    assert total_before > live_before  # deletes produced tombstones
    max_lsn = replayed.read().agg(F.max("_lsn")).first()[0]
    expire_tombstones(replayed, horizon_lsn=max_lsn + 1)
    assert read_clean(replayed).count() == live_before
    assert replayed.read().count() == live_before  # tombstones gone


def test_expire_snapshots_retention(spark, tmp_path):
    """Iceberg expire_snapshots analogue: old manifests + their exclusive
    data files go away; retained snapshots (incl. current) still read; an
    expired version is no longer time-travelable; fresh unreferenced files
    survive the orphan grace period."""
    import os

    feed, tablep = str(tmp_path / "feed"), str(tmp_path / "table")
    write_feed(spark, feed, FeedSpec(
        n_events=2_000, n_conversations=30, turns_per_conversation=8,
        delete_pct=5, events_per_chunk=250,
    ))
    runner.replay(spark, feed, tablep, chunks_per_batch=1, num_buckets=4,
                  collect_stats=False)
    table = LakeTable.load(spark, tablep)
    hist = table.history()
    assert len(hist) >= 8  # create + 8 batches
    before_rows = read_clean(table).count()
    oldest_kept_away = hist[1].snapshot_id  # an early snapshot, will expire

    res = table.expire_snapshots(keep_last=3)
    assert res["snapshots_expired"] == len(hist) - 3
    assert res["files_deleted"] > 0

    hist2 = table.history()
    assert len(hist2) == 3
    assert read_clean(table).count() == before_rows  # current unaffected
    # retained older snapshot still time-travels
    tt = table.read(snapshot_id=hist2[0].snapshot_id)
    assert tt.count() >= 0
    with pytest.raises(KeyError):
        table.snapshot(oldest_kept_away)
    # every retained file actually exists on disk
    for s in hist2:
        for f in s.all_files():
            assert os.path.exists(os.path.join(table.path, f)), f
    # a fresh unreferenced file survives (orphan grace)
    stray = os.path.join(table.path, "data", "strayfile.parquet")
    open(stray, "w").close()
    table.expire_snapshots(keep_last=3)
    assert os.path.exists(stray)
    # ...but an aged one is collected
    os.utime(stray, (1, 1))
    res3 = table.expire_snapshots(keep_last=3)
    assert res3["files_deleted"] >= 1 and not os.path.exists(stray)
    # idempotent re-run
    res4 = table.expire_snapshots(keep_last=3)
    assert res4 == {"snapshots_expired": 0, "files_deleted": 0,
                    "segments_deleted": 0}


def test_read_keys_prunes_to_key_buckets(spark, replayed):
    """Point-lookup path: read_keys returns exactly the full-scan filter
    result while scanning only the keys' buckets."""
    from credix_data_pipeline_spark.operators.apply import read_clean

    some = [r["conv_id"] for r in read_clean(replayed).select("conv_id")
            .distinct().orderBy("conv_id").limit(3).collect()]
    got = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in replayed.read_keys(some)
        .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        .collect()
    )
    want = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in read_clean(replayed)
        .filter(F.col("conv_id").isin(some))
        .collect()
    )
    assert got == want and got
    # pruning evidence: the lookup's input files are a strict subset
    snap = replayed.current()
    total_files = sum(len(fl) for fl in snap.files.values())
    vals = spark.createDataFrame([(c,) for c in some], "conv_id string")
    buckets = {
        r["b"]
        for r in vals.select(
            F.pmod(F.xxhash64("conv_id"), F.lit(snap.num_buckets))
            .cast("int").alias("b")
        ).collect()
    }
    pruned_files = sum(
        len(snap.files.get(str(b), [])) for b in buckets
    )
    assert pruned_files < total_files


def test_as_of_timestamp_time_travel(spark, replayed):
    """`snapshot_as_of` / `read(as_of_ms=...)` — Iceberg FOR SYSTEM_TIME
    AS OF: the latest retained commit at or before the wall-clock probe;
    pre-table timestamps refuse rather than guess."""
    hist = replayed.history()
    assert len(hist) >= 3
    early, cur = hist[1], hist[-1]

    # probing AT a commit's own timestamp returns that state (or a
    # same-millisecond successor — equally current at that instant)
    got = replayed.snapshot_as_of(early.committed_at_ms)
    assert got.committed_at_ms <= early.committed_at_ms
    assert got.version >= early.version
    assert (
        replayed.read(as_of_ms=early.committed_at_ms).count()
        == replayed.read(snapshot_id=got.snapshot_id).count()
    )

    # far future -> current; the create commit predates everything kept
    assert (
        replayed.snapshot_as_of(cur.committed_at_ms + 10_000).snapshot_id
        == cur.snapshot_id
    )
    with pytest.raises(KeyError):
        replayed.snapshot_as_of(hist[0].committed_at_ms - 1)
    with pytest.raises(ValueError):
        replayed.read(snapshot_id=cur.snapshot_id, as_of_ms=1)


def test_as_of_lookup_and_rollback_recency(spark, tmp_path):
    """A rollback commit is NEWER by wall clock than the bad commit it
    reverts, so an as-of probe after the rollback sees the reverted state;
    `read_keys(snap=...)` time-travels the point lookup the same way."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("_lsn", T.LongType(), True),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"),
                         schema, key=["conv_id", "turn_idx"], num_buckets=4)
    t.append(spark.createDataFrame([("c1", 0, "good", 1)], schema))
    good = t.current()
    t.append(spark.createDataFrame([("c9", 0, "bad", 2)], schema))
    rolled = t.rollback_to(good.snapshot_id)
    assert rolled.committed_at_ms >= good.committed_at_ms

    now = t.snapshot_as_of(rolled.committed_at_ms)
    assert now.snapshot_id == rolled.snapshot_id
    got = t.read_keys(["c1"], snap=now).select("text").collect()
    assert [r.text for r in got] == ["good"]
    assert t.read(as_of_ms=rolled.committed_at_ms).count() == 1
