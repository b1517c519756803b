"""Metadata-level commit rebase for additive commits (the Iceberg
"concurrent appends never conflict" validation, opt-in via the
``occ.additive-rebase`` table property).

Without it, every OCC conflict between concurrent fan-in shards re-runs
the losing merge's WHOLE data job (profile + LWW + write).  With it, an
additive commit (blind append / MoR merge-delta) that loses the version
CAS to an interloper that was ITSELF additive re-links onto the new head
at O(manifest) cost — no data re-read, no re-merge.  Admission is decided
by ``LakeTable._additive_since``: any file removal (compaction, CoW
replace), new equality delete, or schema/spec/property change between the
pinned base and the new head refuses the rebase and falls back to the
full-retry path.

The summary-fence hazard this suite pins: a rebased commit keeping its
pre-conflict ``fences`` map would ERASE the interloping source's fence
(the newest fence-declaring commit answers for all sources), silently
breaking per-source exactly-once on the next redelivery.  The rebase hook
must recompute the map against the head it actually lands on.
"""

from __future__ import annotations

import threading
from dataclasses import replace

import pytest

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.table import CommitConflict
from credix_data_pipeline_spark.operators.apply import (
    apply_batch,
    last_applied_batch_id,
    read_clean,
)
from credix_data_pipeline_spark.sources import feed as feed_mod
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner
from tests.oracle_cdc import oracle_sorted_rows

FULL = FeedSpec(
    n_events=2_400,
    n_conversations=40,
    turns_per_conversation=6,
    delete_pct=6,
    duplicate_pct=5,
    hot_pct=4,
    shuffle_window=24,
    events_per_chunk=300,
)
S0 = replace(FULL, n_shards=2, shard=0)
S1 = replace(FULL, n_shards=2, shard=1)


def _final(spark, table_path):
    t = LakeTable.load(spark, table_path)
    return sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in read_clean(t).select("conv_id", "turn_idx", "text").collect()
    )


def _rebase_commits(t: LakeTable) -> list[dict]:
    return [s.summary["occ_rebase"] for s in t.history()
            if "occ_rebase" in s.summary]


class InjectingTable(LakeTable):
    """Test double: runs ``inject`` exactly once at the START of the next
    ``_commit`` call — i.e. INSIDE the CAS window, after apply_batch has
    read the fence map and pinned its base snapshot.  The injected
    interloper commits through a plain handle on the same path, so the
    outer commit deterministically loses the version race."""

    def __init__(self, spark, path):
        super().__init__(spark, path)
        self.inject = None

    def _commit(self, *a, **k):
        if self.inject is not None:
            cb, self.inject = self.inject, None
            cb()
        return super()._commit(*a, **k)


@pytest.fixture()
def shard_feeds(spark, tmp_path):
    f0 = str(tmp_path / "feed_s0")
    f1 = str(tmp_path / "feed_s1")
    write_feed(spark, f0, S0)
    write_feed(spark, f1, S1)
    return f0, f1


def test_rebase_preserves_interloper_fence_at_cas_time(
    spark, shard_feeds, tmp_path
):
    """The CAS-window fence race: source b's merge reads the fence map,
    THEN source a's next batch commits, THEN b's commit loses the CAS.
    The rebased commit must carry a's new fence, not b's stale map."""
    f0, f1 = shard_feeds
    tp = str(tmp_path / "t")
    # bootstrap: a/batch0 creates the table (mor-append: pure-additive
    # merges), then declare the rebase policy
    runner.replay(spark, f0, tp, chunks_per_batch=1, num_buckets=4,
                  source="a", merge_mode="mor-append", max_batches=1)
    LakeTable.load(spark, tp).alter_properties(
        {"occ.additive-rebase": "true"}
    )

    m0, m1 = feed_mod.read_manifest(f0), feed_mod.read_manifest(f1)
    a_next = feed_mod.read_chunks(spark, f0, m0["chunks"][1:2])
    b_batch = feed_mod.read_chunks(spark, f1, m1["chunks"][:1])

    it = InjectingTable(spark, tp)

    def interloper():
        apply_batch(LakeTable.load(spark, tp), a_next, 1, source="a")

    it.inject = interloper
    res = apply_batch(it, b_batch, 0, source="b")

    assert res.occ_rebased == 1
    t = LakeTable.load(spark, tp)
    head = t.current()
    assert head.summary["occ_rebase"]["rebased_over"] == 1
    # THE assertion: b's rebased commit re-read the fences at the head it
    # landed on — a's CAS-window fence advance is preserved
    assert head.summary["fences"] == {"a": 1, "b": 0}
    assert last_applied_batch_id(t, "a") == 1
    assert last_applied_batch_id(t, "b") == 0
    # and the data from BOTH commits is present (no lost update)
    convs = {r.conv_id for r in read_clean(t).select("conv_id").collect()}
    assert any(int(c[4:]) % 2 == 0 for c in convs)  # a's shard
    assert any(int(c[4:]) % 2 == 1 for c in convs)  # b's shard


def test_rebase_refused_for_nonadditive_interloper(spark, shard_feeds,
                                                   tmp_path):
    """A compaction (file REWRITE) landing in the CAS window is not
    additive: the rebase must refuse and surface CommitConflict so the
    caller's full-retry loop re-merges against the rewritten state."""
    f0, _ = shard_feeds
    tp = str(tmp_path / "t")
    runner.replay(spark, f0, tp, chunks_per_batch=1, num_buckets=4,
                  source="a", merge_mode="mor-append", max_batches=2)
    LakeTable.load(spark, tp).alter_properties(
        {"occ.additive-rebase": "true"}
    )

    m0 = feed_mod.read_manifest(f0)
    nxt = feed_mod.read_chunks(spark, f0, m0["chunks"][2:3])
    it = InjectingTable(spark, tp)
    it.inject = lambda: LakeTable.load(spark, tp).compact()
    with pytest.raises(CommitConflict, match="cannot metadata-rebase"):
        apply_batch(it, nxt, 2, source="a")
    # the compaction survived; the losing merge left no trace
    t = LakeTable.load(spark, tp)
    assert t.current().summary.get("operation") == "compact"
    assert last_applied_batch_id(t, "a") == 1
    # the standard recovery: occ_retries re-runs the whole apply
    res = apply_batch(LakeTable.load(spark, tp), nxt, 2, source="a",
                      occ_retries=2)
    assert not res.skipped
    assert last_applied_batch_id(LakeTable.load(spark, tp), "a") == 2


def test_rebase_off_by_default(spark, shard_feeds, tmp_path):
    """Without the property, an additive interloper still conflicts — the
    pre-existing fail-fast semantics are unchanged."""
    f0, f1 = shard_feeds
    tp = str(tmp_path / "t")
    runner.replay(spark, f0, tp, chunks_per_batch=1, num_buckets=4,
                  source="a", merge_mode="mor-append", max_batches=1)
    m0, m1 = feed_mod.read_manifest(f0), feed_mod.read_manifest(f1)
    a_next = feed_mod.read_chunks(spark, f0, m0["chunks"][1:2])
    b_batch = feed_mod.read_chunks(spark, f1, m1["chunks"][:1])
    it = InjectingTable(spark, tp)
    it.inject = lambda: apply_batch(
        LakeTable.load(spark, tp), a_next, 1, source="a"
    )
    with pytest.raises(CommitConflict):
        apply_batch(it, b_batch, 0, source="b")
    assert _rebase_commits(LakeTable.load(spark, tp)) == []


def test_threaded_fanin_posdel_rebase_converges(spark, shard_feeds,
                                                tmp_path):
    """Position-delete MoR fan-in under the declared disjoint-key contract:
    two replay jobs race on one table with the rebase policy on.  The final
    state must equal the union oracle, fences complete, keys unique —
    whatever mix of rebases and full retries the interleaving produced."""
    f0, f1 = shard_feeds
    tp = str(tmp_path / "t")
    # sequential first batch creates the table, then declare the policy
    runner.replay(spark, f0, tp, chunks_per_batch=2, num_buckets=4,
                  source="s0", merge_mode="mor", max_batches=1)
    LakeTable.load(spark, tp).alter_properties(
        {"occ.additive-rebase": "true"}
    )
    errors: list[BaseException] = []

    def job(name, feed):
        try:
            runner.replay(spark, feed, tp, chunks_per_batch=2,
                          num_buckets=4, source=name, occ_retries=16,
                          merge_mode="mor")
        except BaseException as e:  # pragma: no cover - surface below
            errors.append(e)

    ts = [threading.Thread(target=job, args=(n, f))
          for n, f in (("s0", f0), ("s1", f1))]
    for th in ts:
        th.start()
    for th in ts:
        th.join(timeout=600)
    assert not errors, errors
    assert _final(spark, tp) == [
        (c, t_, x) for c, t_, x in oracle_sorted_rows(FULL, normalize=False)
    ]
    t = LakeTable.load(spark, tp)
    fences = t.current().summary.get("fences")
    assert set(fences) == {"s0", "s1"}
    # no key ever has two live versions, rebases or not
    from pyspark.sql import functions as F

    dup = (
        read_clean(t).groupBy("conv_id", "turn_idx")
        .agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1).count()
    )
    assert dup == 0


def test_table_level_append_rebase(spark, tmp_path):
    """Lowest-level contract: two appends from one pinned base both land
    (second rebases), files are the union, and the rebase marker records
    how many commits were jumped."""
    from pyspark.sql import types as T

    tp = str(tmp_path / "t")
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ])
    t = LakeTable.create(spark, tp, schema, key=["conv_id", "turn_idx"],
                         num_buckets=4, bucket_by=["conv_id"])
    base = t.current()
    df1 = spark.createDataFrame([("c1", 0, "one")], schema)
    df2 = spark.createDataFrame([("c2", 0, "two")], schema)
    t.append(df1, base=base)  # takes base+1
    # stale base, rebase on: must land as base+2 without conflict
    snap = t.append(df2, base=base, rebase=True)
    assert snap.version == base.version + 2
    assert snap.summary["occ_rebase"] == {
        "base_version": base.version, "rebased_over": 1,
    }
    got = sorted((r.conv_id, r.text) for r in t.read().collect())
    assert got == [("c1", "one"), ("c2", "two")]
    # stale base, rebase off: conflicts (unchanged default)
    with pytest.raises(CommitConflict):
        t.append(df2, base=base)


def test_rebase_refuses_concurrent_duplicate_delivery(spark, shard_feeds,
                                                      tmp_path):
    """A zombie runner applying the SAME (source, batch) concurrently: the
    interloper commit fences the batch, so a metadata rebase would append
    the same rows a second time — it must refuse, and the full retry must
    skip via the fence (exactly-once survives the race)."""
    f0, _ = shard_feeds
    tp = str(tmp_path / "t")
    runner.replay(spark, f0, tp, chunks_per_batch=1, num_buckets=4,
                  source="a", merge_mode="mor-append", max_batches=1)
    LakeTable.load(spark, tp).alter_properties(
        {"occ.additive-rebase": "true"}
    )
    m0 = feed_mod.read_manifest(f0)
    nxt = feed_mod.read_chunks(spark, f0, m0["chunks"][1:2])
    it = InjectingTable(spark, tp)
    it.inject = lambda: apply_batch(
        LakeTable.load(spark, tp), nxt, 1, source="a"
    )
    with pytest.raises(CommitConflict, match="duplicate delivery"):
        apply_batch(it, nxt, 1, source="a")
    rows_after_twin = LakeTable.load(spark, tp).read().count()
    # the standard recovery: the retry re-reads the fence and SKIPS
    res = apply_batch(LakeTable.load(spark, tp), nxt, 1, source="a",
                      occ_retries=2)
    assert res.skipped
    assert LakeTable.load(spark, tp).read().count() == rows_after_twin
    # and an older batch id can never roll the fence backwards
    assert last_applied_batch_id(LakeTable.load(spark, tp), "a") == 1
