"""Atomic multi-table catalog: consistent cross-table snapshots
(lakehouse/catalog.py — the Nessie / catalog-level-commit analogue).

The guarantee under test: a consumer resolving ONE catalog version sees
silver AND gold at exactly the snapshots one publisher grouped together,
no matter how far the tables have advanced since — and table retention
cannot age out a state the catalog still serves."""

from __future__ import annotations

import os
import threading

import pytest

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.catalog import Catalog
from credix_data_pipeline_spark.lakehouse.table import CommitConflict
from credix_data_pipeline_spark.main import main as cli_main
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.operators.gold_incremental import (
    refresh_conversation_summary,
)
from credix_data_pipeline_spark.plans.gold import conversation_summary
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner

SPEC = FeedSpec(
    n_events=3_000,
    n_conversations=40,
    turns_per_conversation=8,
    delete_pct=8,
    duplicate_pct=3,
    shuffle_window=32,
    events_per_chunk=500,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def _pipeline(spark, tmp_path, max_batches=2):
    """feed -> silver (replay) -> gold (incremental refresh)."""
    feed, silverp, goldp = (
        str(tmp_path / d) for d in ("feed", "silver", "gold")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, silverp, chunks_per_batch=2, num_buckets=8,
                  max_batches=max_batches, collect_stats=False)
    silver = LakeTable.load(spark, silverp)
    refresh_conversation_summary(silver, goldp)
    gold = LakeTable.load(spark, goldp)
    return feed, silver, gold


def test_publish_pins_consistent_pair(spark, tmp_path):
    feed, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    # pin silver at the snapshot gold was computed FROM (recorded by the
    # refresh), gold at its current — the consistent pair
    src_sid = gold.current().summary["source_snapshot_id"]
    cv = cat.publish({"silver": (silver, src_sid), "gold": gold},
                     summary={"note": "first consistent publish"})
    assert cv.version == 2 and set(cv.tables) == {"silver", "gold"}

    pinned_silver = _rows(cat.read(spark, "silver"))
    pinned_gold = _rows(cat.read(spark, "gold"))

    # advance silver well past the pin WITHOUT republishing
    runner.replay(spark, feed, silver.path, chunks_per_batch=2,
                  num_buckets=8, collect_stats=False)
    silver = LakeTable.load(spark, silver.path)
    assert _rows(read_clean(silver)) != pinned_silver  # it really moved

    # the catalog still serves the OLD consistent pair
    assert _rows(cat.read(spark, "silver")) == pinned_silver
    assert _rows(cat.read(spark, "gold")) == pinned_gold
    # and gold is exactly the summary OF the pinned silver state
    assert pinned_gold == _rows(
        conversation_summary(read_clean(silver, snapshot_id=src_sid))
    )


def test_register_views_consistent_sql_join(spark, tmp_path):
    _, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    src_sid = gold.current().summary["source_snapshot_id"]
    cat.publish({"silver": (silver, src_sid), "gold": gold})
    names = cat.register_views(spark)
    assert names == ["gold", "silver"]
    # every gold conversation must exist in the pinned silver — the very
    # invariant that breaks when the two tables are read at mixed versions
    orphans = spark.sql(
        "SELECT g.conv_id FROM gold g LEFT ANTI JOIN "
        "(SELECT DISTINCT conv_id FROM silver) s ON g.conv_id = s.conv_id"
    ).count()
    assert orphans == 0
    assert spark.sql("SELECT count(*) c FROM silver_raw").first()["c"] > 0


def test_retention_cannot_expire_a_cataloged_snapshot(spark, tmp_path):
    feed, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    pin_sid = silver.current().snapshot_id
    cat.publish({"silver": silver})
    pinned = _rows(cat.read(spark, "silver"))

    # push many commits past the pin, then aggressive retention
    runner.replay(spark, feed, silver.path, chunks_per_batch=1,
                  num_buckets=8, collect_stats=False)
    silver = LakeTable.load(spark, silver.path)
    silver.expire_snapshots(keep_last=1, orphan_grace_sec=0)

    # the pinned snapshot survived (tag exemption) and reads byte-equal
    assert _rows(cat.read(spark, "silver")) == pinned
    assert pin_sid in {s.snapshot_id for s in silver.history()}

    # release the pin: expire the catalog down to the NEW current version
    cat.publish({"silver": silver})
    rep = cat.expire(keep_last=1, grace_ms=0)
    assert rep["dropped_tags"] == 1
    silver.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert pin_sid not in {s.snapshot_id for s in silver.history()}


def test_carried_pin_keeps_protection_across_catalog_expire(spark, tmp_path):
    _, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    cat.publish({"silver": silver})            # v2 pins silver@s
    pinned = _rows(cat.read(spark, "silver"))
    cat.publish({"gold": gold})                # v3 CARRIES silver@s
    rep = cat.expire(keep_last=1, grace_ms=0)  # drops v1+v2
    assert rep["expired_versions"] == [1, 2]
    assert rep["dropped_tags"] == 0            # carried pin keeps its tag
    # retention on the table still can't take the carried state
    silver_reloaded = LakeTable.load(spark, silver.path)
    silver_reloaded.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert _rows(cat.read(spark, "silver")) == pinned


def test_concurrent_publishers_both_land(spark, tmp_path):
    _, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    errs: list[Exception] = []
    barrier = threading.Barrier(2)

    def pub(name, t):
        try:
            barrier.wait()
            cat.publish({name: t}, retries=16)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    th = [threading.Thread(target=pub, args=("silver", silver)),
          threading.Thread(target=pub, args=("gold", gold))]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs
    cur = cat.current()
    assert set(cur.tables) == {"silver", "gold"}
    assert cur.version == 3  # two publishes, serialized by OCC
    # every tag referenced by a retained version exists; loser-cleaned tags
    # are gone (no orphan pins)
    for cv in cat.history():
        for name, ent in cv.tables.items():
            t = LakeTable.load(spark, ent["path"])
            live = set(t.tags().values())
            assert int(ent["snapshot_id"]) in live


def test_publish_without_retries_raises_on_race(spark, tmp_path, monkeypatch):
    from credix_data_pipeline_spark.lakehouse.catalog import CatalogVersion

    _, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    # deterministic race: an interloper commits the SAME ordinal between
    # publish's current() read and its _commit
    orig = Catalog._commit
    fired = {"done": False}

    def racy(self, cv):
        if not fired["done"]:
            fired["done"] = True
            orig(self, CatalogVersion(cv.version, cv.ts_ms, {},
                                      {"operation": "interloper"}))
        return orig(self, cv)

    monkeypatch.setattr(Catalog, "_commit", racy)
    with pytest.raises(CommitConflict):
        cat.publish({"silver": silver})
    # the loser cleaned its tag (the winner pinned nothing)
    assert not any(
        k.startswith("catalog-") for k in LakeTable.load(
            spark, silver.path).tags()
    )
    # with retries the same race self-heals
    fired["done"] = False
    cv = cat.publish({"silver": silver}, retries=2)
    assert cv.tables["silver"]["snapshot_id"] == silver.current().snapshot_id


def test_as_of_and_errors(spark, tmp_path):
    _, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    v2 = cat.publish({"silver": silver})
    v3 = cat.publish({"gold": gold})
    assert cat.as_of(v2.ts_ms).version == 2
    assert cat.as_of(v3.ts_ms + 10_000).version == 3
    with pytest.raises(KeyError, match="retention"):
        cat.as_of(0)
    with pytest.raises(KeyError, match="no table"):
        cat.resolve(spark, "nope")
    with pytest.raises(ValueError):
        cat.publish({})
    cat.publish({}, drop=["gold"])
    assert set(cat.current().tables) == {"silver"}
    with pytest.raises(KeyError):
        cat.publish({}, drop=["gold"])


def test_catalog_cli_roundtrip(spark, tmp_path, capsys):
    import json as _json

    _, silver, gold = _pipeline(spark, tmp_path)
    croot = str(tmp_path / "cat")
    src_sid = gold.current().summary["source_snapshot_id"]
    rc = cli_main([
        "catalog-publish", "--catalog", croot,
        "--pin", f"silver={silver.path}@{src_sid}",
        "--pin", f"gold={gold.path}",
    ])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 2 and set(out["tables"]) == {"silver", "gold"}

    rc = cli_main(["catalog-show", "--catalog", croot])
    assert rc == 0
    shown = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert shown["tables"]["silver"]["snapshot_id"] == src_sid

    rc = cli_main([
        "catalog-sql", "--catalog", croot, "--json", "--query",
        "SELECT count(*) AS n FROM gold",
    ])
    assert rc == 0
    n = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])["n"]
    assert n == gold.read().count()

    rc = cli_main(["catalog-expire", "--catalog", croot, "--keep-last", "1"])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["expired_versions"] == [1]


def test_gold_refresh_publishes_catalog(spark, tmp_path, capsys):
    import json as _json

    feed, silverp, goldp, croot = (
        str(tmp_path / d) for d in ("feed", "silver", "gold", "cat")
    )
    write_feed(spark, feed, SPEC)
    runner.replay(spark, feed, silverp, chunks_per_batch=2, num_buckets=8,
                  max_batches=2, collect_stats=False)
    rc = cli_main(["gold-refresh", "--table", silverp, "--gold", goldp,
                   "--catalog", croot])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["catalog_version"] == 2

    cat = Catalog.load(croot)
    gold = LakeTable.load(spark, goldp)
    cv = cat.current()
    # the pinned pair is the CONSISTENT one: silver at the snapshot the
    # refresh read, gold at the state it produced
    assert cv.tables["silver"]["snapshot_id"] == (
        gold.current().summary["source_snapshot_id"]
    )
    assert cv.tables["gold"]["snapshot_id"] == gold.current().snapshot_id

    # advance silver and refresh again: one new atomic version, both moved
    runner.replay(spark, feed, silverp, chunks_per_batch=2, num_buckets=8,
                  collect_stats=False)
    rc = cli_main(["gold-refresh", "--table", silverp, "--gold", goldp,
                   "--catalog", croot])
    assert rc == 0
    capsys.readouterr()
    cv2 = Catalog.load(croot).current()
    assert cv2.version == 3
    assert cv2.tables["silver"]["snapshot_id"] > (
        cv.tables["silver"]["snapshot_id"]
    )


def test_invalid_catalog_name_refused_no_tag_leak(spark, tmp_path):
    _, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    with pytest.raises(ValueError, match="invalid catalog table name"):
        cat.publish({"b/c": silver})
    assert not any(
        k.startswith("catalog-") for k in LakeTable.load(
            spark, silver.path).tags()
    )


def test_publish_failure_midway_cleans_created_tags(spark, tmp_path):
    """A failure AFTER some tags were created (second table's snapshot
    vanished) must clean the first table's tag — no orphan retention
    pins (review finding)."""
    _, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    with pytest.raises(KeyError):
        cat.publish({"a_silver": silver, "b_gold": (gold, 999_999_999)})
    for t in (silver, gold):
        assert not any(
            k.startswith("catalog-") for k in LakeTable.load(
                spark, t.path).tags()
        )


def test_expire_grace_spares_fresh_pins(spark, tmp_path):
    """The default grace window must not sweep a tag created moments ago
    (an in-flight publish tags BEFORE it commits)."""
    _, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    cat.publish({"silver": silver})
    cat.publish({"silver": (silver, silver.current().snapshot_id)})
    rep = cat.expire(keep_last=1)  # default grace: fresh tags survive
    assert rep["dropped_tags"] == 0
    rep = cat.expire(keep_last=1, grace_ms=0)
    assert rep["dropped_tags"] == 0  # same state still pinned -> kept


def test_create_race_loses_cleanly(spark, tmp_path, monkeypatch):
    """A concurrent creator winning v1 surfaces as FileExistsError and
    create_if_not_exists falls through to load — and the loser never
    overwrites the winner's _cid (review finding)."""
    from credix_data_pipeline_spark.lakehouse import catalog as cat_mod

    root = str(tmp_path / "cat")
    orig = Catalog._commit
    fired = {"done": False}

    def racy(self, cv):
        if not fired["done"] and cv.version == 1:
            fired["done"] = True
            winner = Catalog(root)
            orig(winner, cat_mod.CatalogVersion(
                1, cat_mod._now_ms(), {}, {"operation": "create"}))
        return orig(self, cv)

    monkeypatch.setattr(Catalog, "_commit", racy)
    cat = Catalog.create_if_not_exists(root)
    assert cat.current().version == 1
    assert len(cat.cid) == 8


def test_catalog_staleness_signal(spark, tmp_path, capsys):
    import json as _json

    from credix_data_pipeline_spark.streaming.monitoring import (
        catalog_staleness,
    )

    feed, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    src_sid = gold.current().summary["source_snapshot_id"]
    cat.publish({"silver": (silver, src_sid), "gold": gold})

    # silver pinned one commit behind its current (the refresh snapshot);
    # after the pin, advance silver further and the lag must grow
    before = catalog_staleness(spark, cat.root)
    runner.replay(spark, feed, silver.path, chunks_per_batch=1,
                  num_buckets=8, collect_stats=False)
    after = catalog_staleness(spark, cat.root)
    assert after["status"] == "STALE"
    assert (
        after["tables"]["silver"]["commits_behind"]
        > before["tables"]["silver"]["commits_behind"]
    )
    assert after["tables"]["silver"]["pin_resolvable"]
    assert after["tables"]["gold"]["commits_behind"] == 0

    # re-publish at current: FRESH again
    silver2 = LakeTable.load(spark, silver.path)
    cat.publish({"silver": silver2, "gold": gold})
    fresh = catalog_staleness(spark, cat.root)
    assert fresh["status"] == "FRESH"
    assert fresh["worst_commits_behind"] == 0

    # CLI surface: monitor --catalog carries the signal
    rc = cli_main(["monitor", "--table", silver.path,
                   "--catalog", cat.root])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out)
    assert rep["catalog"]["status"] == "FRESH"


def test_catalog_rollback(spark, tmp_path, capsys):
    import json as _json

    feed, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    src_sid = gold.current().summary["source_snapshot_id"]
    good = cat.publish({"silver": (silver, src_sid), "gold": gold})
    good_silver = _rows(cat.read(spark, "silver"))
    good_gold = _rows(cat.read(spark, "gold"))

    # a "bad" publish advances the catalog (silver moved, plus an extra
    # table), then rollback re-pins the good pair as a NEW version
    runner.replay(spark, feed, silver.path, chunks_per_batch=2,
                  num_buckets=8, collect_stats=False)
    silver2 = LakeTable.load(spark, silver.path)
    cat.publish({"silver": silver2, "extra": gold})
    assert _rows(cat.read(spark, "silver")) != good_silver

    cv = cat.rollback(spark, good.version)
    assert cv.version == good.version + 2  # roll-forward, nothing deleted
    assert cv.summary["operation"] == "rollback"
    assert cv.summary["to_version"] == good.version
    assert set(cv.tables) == {"silver", "gold"}  # 'extra' dropped from view
    assert _rows(cat.read(spark, "silver")) == good_silver
    assert _rows(cat.read(spark, "gold")) == good_gold
    # history keeps the excursion visible
    assert [v.version for v in cat.history()][:3] == [
        cv.version, cv.version - 1, good.version]

    # rollback pins survive expiry of the ORIGINAL version: its tags go,
    # the rollback version's own tags keep protecting the snapshots
    cat.expire(keep_last=1, grace_ms=0)
    assert _rows(cat.read(spark, "silver")) == good_silver
    silver3 = LakeTable.load(spark, silver.path)
    silver3.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert _rows(cat.read(spark, "silver")) == good_silver

    # guardrails: future version refuses; expired version refuses
    with pytest.raises(ValueError):
        cat.rollback(spark, cv.version + 5)
    with pytest.raises(KeyError):
        cat.rollback(spark, good.version - 1)

    # CLI surface
    rc = cli_main(["catalog-rollback", "--catalog", cat.root,
                   "--to-version", str(cv.version)])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["summary"]["to_version"] == cv.version
    assert out["tables"]["silver"]["snapshot_id"] == \
        cv.tables["silver"]["snapshot_id"]


def test_expire_sweeps_tags_of_tables_dropped_from_every_version(
    spark, tmp_path
):
    """Regression: a pin tag spared by the grace window whose last NAMING
    catalog version was expired in the same run could never be visited
    again (expire builds its path set from retained+doomed versions only)
    — the tag then pinned the table's snapshot forever.  The pinned-path
    registry closes the hole."""
    _, silver, gold = _pipeline(spark, tmp_path)
    cat = Catalog.create(str(tmp_path / "cat"))
    cat.publish({"silver": silver})          # v2 pins silver
    cat.publish({"gold": gold}, drop=["silver"])  # v3: silver dropped
    cat.publish({"gold": gold})              # v4
    cat.publish({"gold": gold})              # v5

    def _cat_tags(t):
        return [n for n in t.tags() if n.startswith(f"catalog-{cat.cid}-")]

    assert _cat_tags(silver)
    # first expire: versions naming silver are dropped, but the GRACE
    # window spares its fresh tag — the pre-fix path set never contains
    # silver again after this run
    cat.expire(keep_last=1, grace_ms=10**12)
    assert _cat_tags(silver), "grace must spare the young tag"
    # second expire past the grace: the registry still knows silver's
    # path, so the stale tag is swept (leaked forever pre-fix)
    rep = cat.expire(keep_last=1, grace_ms=0)
    assert not _cat_tags(silver)
    assert rep["dropped_tags"] >= 1
    # gold's live pin is untouched
    assert _cat_tags(gold)
