"""Anti-entropy diff + repair (operators/repair.py): a relay replica that
an operator corrupted out-of-band is detected by per-bucket fingerprints
(no join when identical), diffed only on the divergent buckets, and
converged back onto the upstream via merge_into."""

from __future__ import annotations

import pytest

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.operators.merge import merge_into
from credix_data_pipeline_spark.operators.relay import publish_changes
from credix_data_pipeline_spark.operators.repair import (
    diff_tables,
    repair_replica,
)
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=2_000,
    n_conversations=30,
    turns_per_conversation=6,
    delete_pct=5,
    duplicate_pct=3,
    events_per_chunk=500,
)


@pytest.fixture()
def pair(spark, tmp_path):
    feed = str(tmp_path / "feed")
    up, rep = str(tmp_path / "up"), str(tmp_path / "rep")
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, up, chunks_per_batch=2, num_buckets=4)
    t1 = LakeTable.load(spark, up)
    relay = str(tmp_path / "relay")
    publish_changes(t1, relay)
    runner.replay(spark, relay, rep, chunks_per_batch=4, num_buckets=4)
    return t1, LakeTable.load(spark, rep)


def _state(t):
    return {
        (r.conv_id, r.turn_idx): (r.text, r.role)
        for r in read_clean(t).collect()
    }


def test_converged_replica_is_identical(spark, pair):
    up, rep = pair
    d = diff_tables(up, rep)
    assert d["identical"] is True
    assert d["divergent_buckets"] == []


def test_diff_classifies_and_scopes(spark, pair):
    up, rep = pair
    keys = sorted(_state(rep))
    k_mut, k_extra_gone = keys[0], keys[1]
    # corrupt the replica out-of-band: mutate one row, delete one row,
    # invent one row the upstream never had
    merge_into(
        rep,
        spark.createDataFrame(
            [(k_mut[0], k_mut[1], "CORRUPTED"),
             (k_extra_gone[0], k_extra_gone[1], None),
             ("convGHOST", 7, "phantom")],
            "conv_id string, turn_idx int, text string",
        ),
        when_matched_update={"text": "s.text"},
        when_matched_delete="s.text IS NULL",
        when_not_matched_insert=True,
    )
    d = diff_tables(up, rep)
    assert d["identical"] is False
    kinds = {
        (r.conv_id, r.turn_idx): r.kind for r in d["keys"].collect()
    }
    assert kinds[k_mut] == "differing"
    assert kinds[k_extra_gone] == "missing_right"  # upstream has, replica lost
    assert kinds[("convGHOST", 7)] == "missing_left"
    assert len(kinds) == 3
    # phase-2 scope: at most the buckets those three keys hash to
    assert 0 < len(d["divergent_buckets"]) <= 3


def test_repair_converges_and_is_idempotent(spark, pair):
    up, rep = pair
    keys = sorted(_state(rep))
    merge_into(
        rep,
        spark.createDataFrame(
            [(keys[0][0], keys[0][1], "BAD"),
             (keys[1][0], keys[1][1], None),
             ("convGHOST", 7, "phantom")],
            "conv_id string, turn_idx int, text string",
        ),
        when_matched_update={"text": "s.text"},
        when_matched_delete="s.text IS NULL",
        when_not_matched_insert=True,
    )
    assert _state(rep) != _state(up)
    res = repair_replica(rep, up)
    assert res["identical"] is False
    assert res["upserted"] == 2 and res["deleted"] == 1
    assert _state(rep) == _state(up)
    assert diff_tables(up, rep)["identical"] is True
    again = repair_replica(rep, up)
    assert again["identical"] is True


def test_cli_diff_and_repair(spark, pair, capsys):
    """`diff` exits 1 with a classified JSON report on divergence and 0
    once `repair` has converged the replica."""
    import json

    from credix_data_pipeline_spark import main as cli

    up, rep = pair
    assert cli.main(["diff", "--left", up.path, "--right", rep.path]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["identical"] is True

    k = sorted(_state(rep))[0]
    merge_into(
        rep,
        spark.createDataFrame(
            [(k[0], k[1], "CORRUPTED")],
            "conv_id string, turn_idx int, text string",
        ),
        when_matched_update={"text": "s.text"},
        when_not_matched_insert=False,
    )
    assert cli.main(["diff", "--left", up.path, "--right", rep.path]) == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["identical"] is False
    assert out["divergent_keys"] == {"differing": 1}
    assert len(out["sample"]) == 1

    assert cli.main(
        ["repair", "--replica", rep.path, "--upstream", up.path]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["upserted"] == 1 and out["deleted"] == 0
    assert cli.main(["diff", "--left", up.path, "--right", rep.path]) == 0
    capsys.readouterr()
    assert _state(rep) == _state(up)


def test_layout_mismatch_refused(spark, tmp_path, pair):
    up, _ = pair
    other = LakeTable.create(
        spark,
        str(tmp_path / "other"),
        up.current().schema,
        key=list(up.current().key),
        num_buckets=up.current().num_buckets * 2,
    )
    with pytest.raises(ValueError, match="bucket layout"):
        diff_tables(up, other)


def test_null_swap_between_columns_detected(spark, pair):
    """Spark's xxhash64 skips NULL inputs, so a value migrated between two
    same-typed columns (each NULL where the other is set) would hash
    identically without position anchoring — the fingerprint must still
    flag it (repair.py interleaves each column with its nullness)."""
    from pyspark.sql import functions as F

    up, rep = pair
    victim = read_clean(rep).select("conv_id", "turn_idx").limit(1).collect()[0]
    scope = lambda t: read_clean(t).filter(  # noqa: E731
        (F.col("conv_id") == victim.conv_id)
        & (F.col("turn_idx") == victim.turn_idx)
    )
    # Build the exact collision: upstream (role=NULL, text='v'), replica
    # (role='v', text=NULL) — plain xxhash64 hashes both to the SAME value
    # (the null column is skipped, 'v' slides into its position).
    merge_into(
        up,
        scope(up).withColumn("text", F.lit("v")),
        when_matched_update={"role": "cast(null as string)", "text": "s.text"},
    )
    merge_into(
        rep,
        scope(rep).withColumn("role", F.lit("v")),
        when_matched_update={"role": "s.role", "text": "cast(null as string)"},
    )

    d = diff_tables(up, rep)
    assert d["identical"] is False
    kinds = {r["kind"] for r in d["keys"].collect()}
    assert kinds == {"differing"}

    repair_replica(rep, up)
    assert diff_tables(up, LakeTable.load(spark, rep.path))["identical"]


def test_clone_diff_is_metadata_only(spark, pair, tmp_path):
    """Phase 0: a fresh zero-copy clone references the SAME data files, so
    the diff proves identity from manifests alone — and after corrupting
    one bucket, only that bucket loses its metadata proof (the others
    still share file references with the source)."""
    up, _ = pair
    c = up.clone_to(str(tmp_path / "clone"), pin=False)
    d = diff_tables(up, c)
    assert d["identical"] is True
    assert d["metadata_identical_buckets"] == d["buckets_compared"] > 0

    victim = read_clean(c).select("conv_id").limit(1).collect()[0].conv_id
    from pyspark.sql import functions as F

    row = (read_clean(c).filter(F.col("conv_id") == victim)
           .withColumn("text", F.lit("X")))
    merge_into(c, row, when_matched_update={"text": "s.text"})
    c = LakeTable.load(spark, c.path)
    d = diff_tables(up, c)
    assert d["identical"] is False
    # the CoW corruption rewrote ONE bucket; every other bucket still
    # proves identical by metadata and is never scanned
    assert len(d["divergent_buckets"]) == 1
    assert d["metadata_identical_buckets"] >= d["buckets_compared"] - 1 - 1
    repair_replica(c, up)
    assert diff_tables(up, LakeTable.load(spark, c.path))["identical"]


def test_phase2_plans_only_divergent_bucket_files(spark, pair):
    """The divergent-key join must FILE-prune to the divergent buckets
    (the module's O(divergent buckets) promise) — a post-scan row filter
    would read every file of both tables (review batch 4)."""
    up, rep = pair
    conv = next(iter(_state(rep)))[0]
    merge_into(
        rep,
        spark.createDataFrame(
            [(conv, 0, "corrupt", "user")],
            "conv_id string, turn_idx int, text string, role string",
        ),
        when_matched_update={"text": "s.text"},
        when_not_matched_insert=True,
    )
    d = diff_tables(up, rep)
    assert d["identical"] is False
    div = set(d["divergent_buckets"])
    assert len(div) < up.current().num_buckets  # partial divergence
    files = d["keys"].inputFiles()
    assert files
    for fp in files:
        assert any(f"_bucket={b}/" in fp for b in div), fp
