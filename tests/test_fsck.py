"""fsck — table integrity audit: clean tables pass (shallow + deep,
across CoW/MoR/purges/clones), and each corruption class is detected."""

from __future__ import annotations

import json
import os

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.fsck import fsck
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=1_500,
    n_conversations=25,
    turns_per_conversation=6,
    delete_pct=5,
    duplicate_pct=3,
    events_per_chunk=500,
)


def _mk(spark, tmp_feed, tmp_table, **kw):
    write_feed(spark, tmp_feed, SPEC)
    runner.replay(spark, tmp_feed, tmp_table, chunks_per_batch=2,
                  num_buckets=4, **kw)
    return LakeTable.load(spark, tmp_table)


def test_clean_table_passes_shallow_and_deep(spark, tmp_feed, tmp_table):
    t = _mk(spark, tmp_feed, tmp_table)
    t.delete_keys([["conv00000001"]])  # outstanding purge entry: still ok
    rep = fsck(t, deep=True)
    assert rep["ok"], rep
    assert rep["checked_files"] > 0
    assert rep["retained_snapshots"] == len(t.history())


def test_missing_and_empty_files_detected(spark, tmp_feed, tmp_table):
    t = _mk(spark, tmp_feed, tmp_table)
    files = [f for fl in t.current().files.values() for f in fl]
    victim = os.path.join(tmp_table, files[0])
    os.remove(victim)
    rep = fsck(t)
    assert not rep["ok"]
    assert any("missing" in e for e in rep["errors"])
    # restore as EMPTY -> detected as empty
    open(victim, "w").close()
    rep2 = fsck(t)
    assert any("empty" in e for e in rep2["errors"])


def test_orphans_warned_not_errored(spark, tmp_feed, tmp_table):
    t = _mk(spark, tmp_feed, tmp_table)
    stray_dir = os.path.join(tmp_table, "data", "deadbeef", "_bucket=0")
    os.makedirs(stray_dir)
    with open(os.path.join(stray_dir, "stray.parquet"), "w") as f:
        f.write("x")
    rep = fsck(t)
    assert rep["ok"]
    assert any("unreferenced" in w for w in rep["warnings"])


def test_deep_catches_hand_moved_bucket(spark, tmp_feed, tmp_table):
    """Corrupt through the REAL path: swap two bucket directories' files on
    disk while keeping names manifest-consistent (the classic hand-"repair"
    after a partial restore).  Shallow fsck sees every referenced file
    present; only --deep's recomputed bucket hash flags the rows."""
    import shutil

    t = _mk(spark, tmp_feed, tmp_table)
    t.compact()
    t = LakeTable.load(spark, tmp_table)
    snap = t.current()
    buckets = [b for b, fl in snap.files.items() if fl]
    b1, b2 = buckets[0], buckets[1]
    f1 = os.path.join(tmp_table, snap.files[b1][0])
    f2 = os.path.join(tmp_table, snap.files[b2][0])

    def _crc(p):  # hadoop LocalFS checksum sidecar rides along
        return os.path.join(os.path.dirname(p),
                            "." + os.path.basename(p) + ".crc")

    for a, b in ((f1, f2), (_crc(f1), _crc(f2))):
        tmp = a + ".swap"
        shutil.move(a, tmp)
        shutil.move(b, a)
        shutil.move(tmp, b)
    assert fsck(t)["ok"]  # shallow: all referenced names still exist
    rep = fsck(t, deep=True)
    assert not rep["ok"]
    assert any("different bucket" in e for e in rep["errors"])


def test_fsck_cli(spark, tmp_feed, tmp_table, capsys):
    from credix_data_pipeline_spark import main as cli

    _mk(spark, tmp_feed, tmp_table)
    rc = cli.main(["fsck", "--table", tmp_table])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["ok"] and out["checked_files"] > 0


def test_changes_summary_cli(spark, tmp_feed, tmp_table, capsys):
    from credix_data_pipeline_spark import main as cli

    t = _mk(spark, tmp_feed, tmp_table)
    first = t.history()[1].snapshot_id
    rc = cli.main(["changes", "--table", tmp_table,
                   "--from-snapshot", str(first), "--summary"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["from"] == first
    assert set(out["changes"]) <= {
        "insert", "delete", "update_before", "update_after"
    }
    assert sum(out["changes"].values()) > 0


def test_fsck_passes_on_fanin_table(spark, tmp_path):
    """Fan-in merge commits carry BOTH the scalar batch_id and the fences
    map by design — fsck must not call that corruption (review finding)."""
    from dataclasses import replace as dc_replace

    full = FeedSpec(n_events=1_200, n_conversations=20,
                    turns_per_conversation=6, events_per_chunk=300)
    f0, f1, tp = (str(tmp_path / d) for d in ("f0", "f1", "t"))
    write_feed(spark, f0, dc_replace(full, n_shards=2, shard=0))
    write_feed(spark, f1, dc_replace(full, n_shards=2, shard=1))
    runner.replay_fanin(spark, {"s0": f0, "s1": f1}, tp,
                        chunks_per_batch=2, num_buckets=4)
    rep = fsck(LakeTable.load(spark, tp), deep=True)
    assert rep["ok"], rep
