"""Initial-snapshot bootstrap (ST4, Datastream ``backfill_all``): seed a
fresh table from an existing dataset, then replay the change feed on top —
the LWW seam gives feed events precedence over seeded rows (snapshot at
LSN X, stream from X)."""

from __future__ import annotations

import datetime
import json

import pytest

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming import runner
from tests.oracle_cdc import oracle_sorted_rows

SPEC = FeedSpec(
    n_events=1_500,
    n_conversations=25,
    turns_per_conversation=6,
    delete_pct=6,
    duplicate_pct=3,
    events_per_chunk=500,
)
TS = datetime.datetime(2023, 6, 1)


def _seed_df(spark, n=40, dup_key=False):
    rows = [
        (f"seed{c:04d}", c % 5, "user", f"seeded {c}", None, TS, c + 1)
        for c in range(n)
    ]
    if dup_key:
        rows.append(("seed0000", 0, "user", "dup newer", None, TS, 999))
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, src_lsn long",
    )


def test_bootstrap_then_replay_lww_seam(spark, tmp_path):
    """Seeded rows survive where the feed never writes; feed events win on
    overlapping keys (seed _lsn=0 < any event lsn)."""
    src, feed, tp = (str(tmp_path / d) for d in ("src", "feed", "t"))
    # seed keys that overlap the feed's conv ids AND disjoint seed-only keys
    seed = _seed_df(spark).union(
        spark.createDataFrame(
            [("conv00000000", 0, "user", "seed overlap", None, TS, 1)],
            _seed_df(spark).schema,
        )
    )
    seed.drop("src_lsn").write.parquet(src)
    write_feed(spark, feed, SPEC)

    out = runner.bootstrap(spark, src, tp, num_buckets=4)
    assert out["rows"] == 41
    runner.replay(spark, feed, tp, chunks_per_batch=2, num_buckets=4)

    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in read_clean(LakeTable.load(spark, tp))
        .select("conv_id", "turn_idx", "text")
        .collect()
    }
    want = {
        (c, t): x for c, t, x in oracle_sorted_rows(SPEC, normalize=False)
    }
    for (c, t), x in want.items():
        assert got[(c, t)] == x  # feed events won every key they wrote
    # seed-only keys survive untouched
    assert got[("seed0003", 3)] == "seeded 3"
    # EXACT key set: oracle winners ∪ seed-only keys.  In particular the
    # overlapping seeded key ("conv00000000", 0) must follow the feed's
    # verdict — including a tombstone shadowing the seeded row entirely.
    seed_keys = {(f"seed{c:04d}", c % 5) for c in range(40)}
    assert set(got) == set(want) | seed_keys


def test_bootstrap_refuses_existing_table_null_keys_and_blind_dups(
    spark, tmp_path
):
    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    _seed_df(spark).drop("src_lsn").write.parquet(src)
    runner.bootstrap(spark, src, tp, num_buckets=4)
    with pytest.raises(RuntimeError, match="already exists"):
        runner.bootstrap(spark, src, tp, num_buckets=4)

    nulls = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(None, 0, "x", "y", None, TS, 1)], _seed_df(spark).schema
    ).drop("src_lsn").write.parquet(nulls)
    with pytest.raises(RuntimeError, match="null key"):
        runner.bootstrap(spark, nulls, str(tmp_path / "t2"), num_buckets=4)

    dups = str(tmp_path / "dups")
    _seed_df(spark, dup_key=True).drop("src_lsn").write.parquet(dups)
    with pytest.raises(RuntimeError, match="duplicate key"):
        runner.bootstrap(spark, dups, str(tmp_path / "t3"), num_buckets=4)


def test_bootstrap_lsn_col_collapses_dups_and_gates_the_seam(spark, tmp_path):
    """With lsn_col: source duplicates collapse to the highest-LSN row, and
    a feed event older than the snapshot LSN loses to the seeded row."""
    from credix_data_pipeline_spark.operators.apply import apply_batch
    from credix_data_pipeline_spark.schema import CHANGE_SCHEMA

    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    _seed_df(spark, dup_key=True).write.parquet(src)
    out = runner.bootstrap(spark, src, tp, num_buckets=4, lsn_col="src_lsn")
    assert out["rows"] == 40  # 41 rows, one dup collapsed
    t = LakeTable.load(spark, tp)
    seeded = {
        (r.conv_id, r.turn_idx): (r.text, r._lsn)
        for r in t.read().collect()
    }
    assert seeded[("seed0000", 0)][0] == "dup newer"  # max-LSN winner

    # stale event (lsn 5 < seeded 999) loses; fresh event (lsn 5000) wins
    ev = spark.createDataFrame(
        [
            ("U", 5, TS, "seed0000", 0, "user", "stale", None, TS),
            ("U", 5000, TS, "seed0001", 1, "user", "fresh", None, TS),
        ],
        CHANGE_SCHEMA,
    )
    apply_batch(t, ev, 0, collect_stats=False)
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in read_clean(t).collect()
    }
    assert got[("seed0000", 0)] == "dup newer"
    assert got[("seed0001", 1)] == "fresh"


def test_bootstrap_cli(spark, tmp_path, capsys):
    from credix_data_pipeline_spark import main as cli

    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    _seed_df(spark).drop("src_lsn").write.parquet(src)
    rc = cli.main([
        "bootstrap", "--src", src, "--table", tp, "--buckets", "4",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 40
    assert read_clean(LakeTable.load(spark, tp)).count() == 40


def test_bootstrap_refuses_reserved_engine_columns(spark, tmp_path):
    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    _seed_df(spark).withColumnRenamed("src_lsn", "_lsn").write.parquet(src)
    with pytest.raises(RuntimeError, match="engine column"):
        runner.bootstrap(spark, src, tp, num_buckets=4)
