"""Named writable branches (Iceberg branch refs / Nessie merge): zero-copy
fork under ``_branches/<name>``, isolated writes, atomic ``fast_forward``
publish back to main, and drop with ownership transfer of adopted files.

The sequence-number subtlety these tests pin: a branch's commits mint
file/equality-delete sequence numbers ABOVE main's version counter, so a
fast-forward carries seqs > version.  ``Snapshot.max_seq()`` floors every
later mint above the carried values — otherwise an adopted purge entry
would wrongly cover files main adds afterwards.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.table import CommitConflict
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner


def _mk(spark, path):
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("_lsn", T.LongType(), True),
        ]
    )
    return LakeTable.create(
        spark, path, schema, key=["conv_id", "turn_idx"], num_buckets=4
    )


def _rows(n, lsn0=0):
    return [(f"c{i % 5}", i // 5, f"t{i}", lsn0 + i) for i in range(n)]


def _df(spark, t, rows):
    return spark.createDataFrame(rows, t.current().schema)


def _clean_set(t):
    return {
        (r.conv_id, r.turn_idx, r.text)
        for r in read_clean(t).collect()
    }


def test_branch_isolated_then_fast_forward(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(20)))
    main_before = _clean_set(t)

    br = t.create_branch("dev")
    assert t.list_branches() == ["dev"]
    assert _clean_set(br) == main_before  # zero-copy fork sees main state
    # branch data dir holds nothing yet (shared files)
    assert not any(
        files
        for _, _, files in os.walk(os.path.join(br.path, "data"))
    )

    br.append(_df(spark, br, [("c9", 0, "branch-only", 100)]))
    br.delete_keys(["c0"], cols=["conv_id"])
    br_state = _clean_set(br)
    assert _clean_set(t) == main_before  # main untouched by branch writes

    new = t.fast_forward("dev")
    assert new.summary["operation"] == "fast-forward"
    assert _clean_set(t) == br_state
    # re-publish with nothing new is a version-stable no-op
    assert t.fast_forward("dev").version == new.version


def test_fast_forward_seq_rule_reinsert_after_adopted_purge(spark, tmp_path):
    """The adopted purge entry (seq above main's version) must not cover
    rows main inserts AFTER the fast-forward."""
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(20)))
    br = t.create_branch("dev")
    # several branch commits push the branch's seq space well above main's
    for i in range(3):
        br.append(_df(spark, br, [("cx", i, f"v{i}", 50 + i)]))
    br.delete_keys(["c1"], cols=["conv_id"])
    new = t.fast_forward("dev")
    assert new.max_seq() > new.version  # carried seqs exceed the version
    assert read_clean(t).filter(F.col("conv_id") == "c1").count() == 0
    # re-insert the purged key on MAIN: minted seq must exceed the entry's
    t.append(_df(spark, t, [("c1", 0, "reborn", 999)]))
    reborn = read_clean(t).filter(F.col("conv_id") == "c1").collect()
    assert [r.text for r in reborn] == ["reborn"]
    # and a NEW purge on main covers everything current
    t.delete_keys(["c1"], cols=["conv_id"])
    assert read_clean(t).filter(F.col("conv_id") == "c1").count() == 0


def test_fast_forward_ancestor_rule(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(10)))
    br = t.create_branch("dev")
    br.append(_df(spark, br, [("cz", 0, "b", 1)]))
    t.append(_df(spark, t, [("cm", 0, "m", 2)]))  # main moves
    with pytest.raises(CommitConflict, match="moved"):
        t.fast_forward("dev")


def test_branch_feed_resume_and_fence_carry(spark, tmp_path):
    """The WAP-at-scale flow: replay half a feed into main, branch, resume
    the SAME feed into the branch (carried fence), audit, fast-forward —
    main then refuses re-replay (fence adopted) and equals a straight
    full replay."""
    feed = str(tmp_path / "feed")
    spec = FeedSpec(
        n_events=2_000,
        n_conversations=40,
        turns_per_conversation=10,
        events_per_chunk=250,
    )
    write_feed(spark, feed, spec)
    main = str(tmp_path / "t")
    runner.replay(spark, feed, main, chunks_per_batch=2, num_buckets=8,
                  max_batches=1)
    t = LakeTable.load(spark, main)
    n_half = read_clean(t).count()

    br = t.create_branch("audit")
    st = runner.replay(spark, feed, br.path, chunks_per_batch=2, num_buckets=8)
    assert st.batches > 0
    br = t.branch("audit")
    n_full = read_clean(br).count()
    assert n_full != n_half or n_full > 0
    assert read_clean(t).count() == n_half  # main still at the half state

    t.fast_forward("audit")
    assert read_clean(t).count() == n_full
    # adopted fence: main's own re-replay applies nothing
    st2 = runner.replay(spark, feed, main, chunks_per_batch=2, num_buckets=8)
    assert st2.batches == 0

    # equivalence with a straight full replay of the same feed
    ref = str(tmp_path / "ref")
    runner.replay(spark, feed, ref, chunks_per_batch=2, num_buckets=8)
    assert _sorted_rows(t) == _sorted_rows(LakeTable.load(spark, ref))


def _sorted_rows(t):
    df = read_clean(t)
    return sorted(tuple(r) for r in df.collect())


def test_drop_branch_refuses_unpublished_then_transfers_ownership(
    spark, tmp_path
):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(20)))
    br = t.create_branch("dev")
    br.append(_df(spark, br, [("cq", 0, "unpublished", 7)]))
    with pytest.raises(RuntimeError, match="unpublished"):
        t.drop_branch("dev")
    t.fast_forward("dev")
    state = _clean_set(t)
    res = t.drop_branch("dev")
    assert res["files_kept"] > 0  # adopted files survive in place
    assert t.list_branches() == []
    assert _clean_set(t) == state  # reads intact through adopted files
    # a full rewrite releases them; retention then sweeps the residue
    t.rebucket(8)
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert not os.path.exists(os.path.join(t.path, "_branches", "dev"))
    assert _clean_set(t) == state


def test_drop_unpublished_branch_force_discards(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(10)))
    before = _clean_set(t)
    br = t.create_branch("scratch")
    br.append(_df(spark, br, [("cz", 9, "discard-me", 1)]))
    res = t.drop_branch("scratch", force=True)
    assert res["files_deleted"] > 0
    assert _clean_set(t) == before
    # fork pin removed: full retention pass leaves a readable table
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert _clean_set(t) == before


def test_branch_retention_cannot_break_main_after_ff(spark, tmp_path):
    """The ff pin: aggressive retention ON THE BRANCH after a fast-forward
    must not delete files main adopted."""
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(20)))
    br = t.create_branch("dev")
    for i in range(4):
        br.append(_df(spark, br, [("cb", i, f"b{i}", 10 + i)]))
    t.fast_forward("dev")
    state = _clean_set(t)
    br = t.branch("dev")
    br.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert _clean_set(t) == state


def test_repeated_fast_forward_cycles(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(10)))
    br = t.create_branch("dev")
    for cycle in range(3):
        br.append(_df(spark, br, [("cyc", cycle, f"c{cycle}", 100 + cycle)]))
        t.fast_forward("dev")
        assert (
            read_clean(t)
            .filter(F.col("conv_id") == "cyc")
            .count()
            == cycle + 1
        )
    # seq monotonicity held across all cycles
    cur = t.current()
    assert cur.max_seq() >= cur.version


def test_two_branches_share_fork_pin_safely(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(10)))
    b1 = t.create_branch("b1")
    b2 = t.create_branch("b2")  # same fork snapshot — per-branch pins
    assert {"branch-pin-b1", "branch-pin-b2"} <= set(t.tags())
    state_b2 = _clean_set(b2)
    t.drop_branch("b1", force=True)
    # b2's protection survives b1's drop: its own pin is untouched
    assert "branch-pin-b2" in t.tags() and "branch-pin-b1" not in t.tags()
    # aggressive main retention between the drops cannot break b2
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert _clean_set(t.branch("b2")) == state_b2
    t.drop_branch("b2", force=True)
    assert not any(n.startswith("branch-pin-") for n in t.tags())


def test_branch_ddl_publishes_via_fast_forward(spark, tmp_path):
    """Schema evolution developed on a branch lands on main atomically."""
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(10)))
    br = t.create_branch("ddl")
    br.rename_column("text", "body")
    br.append(
        spark.createDataFrame(
            [("cn", 0, "new-shape", 55)], br.current().schema
        )
    )
    t.fast_forward("ddl")
    cols = [f.name for f in t.current().schema.fields]
    assert "body" in cols and "text" not in cols
    vals = {r.body for r in read_clean(t).collect()}
    assert "new-shape" in vals and "t0" in vals  # old files project by id


def test_invalid_branch_names_refused(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(5)))
    for bad in ("", "a/b", "a b", "../x"):
        with pytest.raises(ValueError):
            t.create_branch(bad)


def test_concurrent_fast_forwards_one_loses_cleanly(spark, tmp_path):
    """Two branches forked from the same main racing their publish: the
    version CAS lets exactly one in; the loser gets CommitConflict (its
    fork base is stale) and can rebase by recreating its branch."""
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(10)))
    b1 = t.create_branch("r1")
    b2 = t.create_branch("r2")
    b1.append(_df(spark, b1, [("r1", 0, "one", 1)]))
    b2.append(_df(spark, b2, [("r2", 0, "two", 2)]))
    t.fast_forward("r1")
    with pytest.raises(CommitConflict):
        t.fast_forward("r2")
    # rebase: recreate r2 from the new head and re-apply its work
    t.drop_branch("r2", force=True)
    b2 = t.create_branch("r2")
    b2.append(_df(spark, b2, [("r2", 0, "two", 2)]))
    t.fast_forward("r2")
    got = {r.conv_id for r in read_clean(t).collect()}
    assert {"r1", "r2"} <= got


def test_fsck_green_on_adopted_branch_files(spark, tmp_path):
    """A post-fast-forward table references branch-root files by absolute
    path; fsck (shallow + deep) must account for every one of them."""
    from credix_data_pipeline_spark.lakehouse.fsck import fsck

    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(20)))
    br = t.create_branch("dev")
    br.append(_df(spark, br, [("fz", 0, "adopted", 9)]))
    t.fast_forward("dev")
    rep = fsck(t, deep=True)
    assert rep["errors"] == [] and rep["checked_files"] > 0
    t.drop_branch("dev")
    rep2 = fsck(t, deep=True)
    assert rep2["errors"] == []


def test_monitor_branch_status(spark, tmp_path):
    """The monitor's branch view: READY (publishable), DIVERGED (main
    moved), PUBLISHED; None for branchless tables."""
    from credix_data_pipeline_spark.streaming.monitoring import branch_status

    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(10)))
    assert branch_status(spark, t.path) is None

    br = t.create_branch("dev")
    br.append(_df(spark, br, [("bm", 0, "x", 1)]))
    [st] = branch_status(spark, t.path)
    assert (st["name"], st["status"], st["unpublished"]) == (
        "dev", "READY", True,
    )
    t.append(_df(spark, t, [("mm", 0, "y", 2)]))  # main moves
    [st] = branch_status(spark, t.path)
    assert st["status"] == "DIVERGED" and not st["fast_forwardable"]
    # rebase + publish flips it to PUBLISHED
    t.drop_branch("dev", force=True)
    br = t.create_branch("dev")
    br.append(_df(spark, br, [("bm", 0, "x", 1)]))
    t.fast_forward("dev")
    [st] = branch_status(spark, t.path)
    assert st["status"] == "PUBLISHED" and not st["unpublished"]


def _mk_d(spark, path):
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("_lsn", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
    )
    return LakeTable.create(
        spark, path, schema, key=["conv_id", "turn_idx"], num_buckets=4
    )


def _dfd(spark, t, rows):
    return spark.createDataFrame(
        [(*r, False) for r in rows], t.current().schema
    )


def test_rebase_branch_replays_changes_onto_moved_main(spark, tmp_path):
    """The recovery path after the ancestor rule refuses: rebase recreates
    the branch from main's new head and replays the branch's net data
    changes; conflicting keys resolve by LWW on _lsn; a second ff then
    publishes cleanly."""
    from credix_data_pipeline_spark.operators.rebase import rebase_branch

    t = _mk_d(spark, str(tmp_path / "t"))
    t.append(_dfd(spark, t, _rows(10)))
    br = t.create_branch("dev")
    br.append(_dfd(spark, br, [("bb", 0, "branch-row", 50)]))
    br.delete_keys(["c0"], cols=["conv_id"])
    # main moves: a fresh key AND a conflicting write on c1/0 with a
    # HIGHER lsn than anything the branch wrote
    t.append(_dfd(spark, t, [("mm", 0, "main-row", 60),
                             ("c9", 9, "main-c9", 61)]))
    with pytest.raises(CommitConflict):
        t.fast_forward("dev")

    nb = rebase_branch(t, "dev")
    got = {(r.conv_id, r.turn_idx): r.text for r in read_clean(nb).collect()}
    assert got[("bb", 0)] == "branch-row"      # branch change replayed
    assert got[("mm", 0)] == "main-row"        # main's new rows present
    assert got[("c9", 9)] == "main-c9"
    # the branch's delete_keys purge is NOT part of the row changelog
    # replay? it IS: purge emits delete changes — c0 rows must be gone
    assert not any(k[0] == "c0" for k in got)
    new = t.fast_forward("dev")
    assert new.summary["operation"] == "fast-forward"
    assert {
        (r.conv_id, r.turn_idx): r.text for r in read_clean(t).collect()
    } == got


def test_rebase_noop_and_refusals(spark, tmp_path):
    from credix_data_pipeline_spark.operators.rebase import rebase_branch

    t = _mk_d(spark, str(tmp_path / "t"))
    t.append(_dfd(spark, t, _rows(10)))
    br = t.create_branch("dev")
    # not diverged: no-op, same branch back
    assert rebase_branch(t, "dev").current().snapshot_id == (
        t.branch("dev").current().snapshot_id
    )
    # DDL on the branch + a moved main: refuse with guidance
    br.rename_column("text", "body")
    t.append(_dfd(spark, t, [("mv", 0, "m", 1)]))
    with pytest.raises(RuntimeError, match="DDL"):
        rebase_branch(t, "dev")


def test_rebase_lww_conflict_resolution(spark, tmp_path):
    """Same key written on both sides since the fork: the higher _lsn wins
    after the rebase, whichever side wrote it."""
    from credix_data_pipeline_spark.operators.rebase import rebase_branch

    t = _mk_d(spark, str(tmp_path / "t"))
    t.append(_dfd(spark, t, [("k", 0, "orig", 1)]))
    br = t.create_branch("dev")
    br.append(_dfd(spark, br, [("k", 0, "branch-win", 100)]))  # higher lsn
    t.append(_dfd(spark, t, [("k", 0, "main-old", 50)]))       # lower lsn
    nb = rebase_branch(t, "dev")
    [row] = read_clean(nb).filter(F.col("conv_id") == "k").collect()
    assert row.text == "branch-win"
    # and the mirror case: main wrote the higher lsn
    t2 = _mk_d(spark, str(tmp_path / "t2"))
    t2.append(_dfd(spark, t2, [("k", 0, "orig", 1)]))
    b2 = t2.create_branch("dev")
    b2.append(_dfd(spark, b2, [("k", 0, "branch-old", 50)]))
    t2.append(_dfd(spark, t2, [("k", 0, "main-win", 100)]))
    nb2 = rebase_branch(t2, "dev")
    [row2] = read_clean(nb2).filter(F.col("conv_id") == "k").collect()
    assert row2.text == "main-win"


def test_create_branch_recovers_stale_pin_residue(spark, tmp_path):
    """A crash between the pin tag and the clone leaves a stale
    branch-pin tag; the next create of the same name must re-point it
    instead of wedging on the tag CAS."""
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(5)))
    t.tag("branch-pin-dev")  # simulate the crash residue
    t.append(_df(spark, t, [("zz", 0, "later", 9)]))
    br = t.create_branch("dev")  # must not raise CommitConflict
    assert t.tags()["branch-pin-dev"] == t.current().snapshot_id
    assert _clean_set(br) == _clean_set(t)


def test_trailing_set_properties_does_not_unpublish(spark, tmp_path):
    """A set-properties commit at the branch head must not break published
    detection.  Regression: fast_forward recorded the HEAD's snapshot id
    while every published check compares the EFFECTIVE head's (last data
    commit), so an alter_properties before the ff left the branch reading
    as unpublished forever — duplicate adoption commits on every ff,
    drop_branch refusing without force, monitor stuck on 'unpublished'."""
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(20)))

    br = t.create_branch("dev")
    br.append(_df(spark, br, _rows(5, lsn0=100)))
    br.alter_properties({"owner": "audit-team"})  # head != effective head
    new = t.fast_forward("dev")
    assert t.current().version == new.version
    assert LakeTable._is_published(t.branch("dev"))

    # second ff is a no-op (no duplicate adoption commit)
    again = t.fast_forward("dev")
    assert again.version == new.version

    # monitor agrees
    from credix_data_pipeline_spark.streaming.monitoring import branch_status

    st = {b["name"]: b for b in branch_status(spark, t.path)}
    assert st["dev"]["status"] == "PUBLISHED"
    assert not st["dev"]["unpublished"]

    # drop without force succeeds (nothing unpublished)
    t.drop_branch("dev")
    assert t.list_branches() == []


def test_fast_forward_crash_window_is_recoverable(spark, tmp_path, monkeypatch):
    """The ff pin lands on the branch BEFORE main's adoption commit, and a
    crash between the adoption commit and the bookkeeping (main tag
    re-point + published properties) is healed by the next fast_forward.
    Regression: the old order could leave main referencing branch files
    with no pin, and the retry wedged forever on the ancestor rule (main
    moved by the adoption commit itself)."""
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, t, _rows(20)))
    br0 = t.create_branch("dev")
    br0.append(_df(spark, br0, _rows(5, lsn0=100)))
    head_id = br0.current().snapshot_id

    real = LakeTable.alter_properties
    calls = {"n": 0}

    def crash_once(self, *a, **k):
        if "branch.published-snapshot-id" in (a[0] if a else k.get(
            "set_props", {}
        )) and calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("simulated crash before branch bookkeeping")
        return real(self, *a, **k)

    monkeypatch.setattr(LakeTable, "alter_properties", crash_once)
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.fast_forward("dev")
    monkeypatch.setattr(LakeTable, "alter_properties", real)

    # mid-crash invariants: adoption landed AND the branch head is pinned
    cur = t.current()
    assert cur.summary["operation"] == "fast-forward"
    assert f"ff-{head_id}" in t.branch("dev").tags()
    assert not LakeTable._is_published(t.branch("dev"))

    healed = t.fast_forward("dev")  # raised CommitConflict pre-fix
    assert healed.version == cur.version  # no duplicate adoption commit
    assert LakeTable._is_published(t.branch("dev"))
    assert t.tags()[f"branch-dev"] == cur.snapshot_id
    # branch lifecycle continues normally
    br = t.branch("dev")
    br.append(_df(spark, br, _rows(3, lsn0=200)))
    t.fast_forward("dev")
    assert LakeTable._is_published(t.branch("dev"))
