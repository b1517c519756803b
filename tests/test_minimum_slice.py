"""SURVEY §7.1 minimum end-to-end slice + feed/oracle agreement.

Feed → dedup (W2) → CoW MERGE (J3) → final state equals the pure-Python LWW
oracle; a gold-style group-agg over the result matches a hand-checkable shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from credix_data_pipeline_spark.functions.normalize import with_normalized_text
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.sources.feed import FeedSpec, change_events_df, write_feed
from credix_data_pipeline_spark.streaming import runner
from tests.oracle_cdc import event_py, oracle_sorted_rows

SMALL = FeedSpec(
    n_events=3_000,
    n_conversations=40,
    turns_per_conversation=8,
    delete_pct=6,
    duplicate_pct=4,
    shuffle_window=32,
    events_per_chunk=500,
)


def test_generator_matches_python_oracle_events(spark):
    """The Spark column pipeline and the pure-Python event builder agree
    bit-for-bit (the determinism contract everything else rests on)."""
    df = change_events_df(spark, SMALL).orderBy("lsn")
    got = [r.asDict() for r in df.limit(200).collect()]
    for i, row in enumerate(got):
        exp = event_py(i, SMALL)
        for c in ("op", "lsn", "conv_id", "turn_idx", "role", "text", "tool"):
            assert row[c] == exp[c], f"event {i} col {c}: {row[c]!r} != {exp[c]!r}"
        # timestamps: compare as naive UTC
        for c in ("commit_ts", "ts"):
            e = exp[c]
            assert (row[c] is None) == (e is None)
            if e is not None:
                assert row[c] == e.replace(tzinfo=None)


def test_replay_matches_oracle(spark, tmp_feed, tmp_table):
    write_feed(spark, tmp_feed, SMALL)
    stats = runner.replay(
        spark,
        tmp_feed,
        tmp_table,
        chunks_per_batch=2,
        num_buckets=8,
        transform=with_normalized_text,
    )
    assert stats.batches > 0

    from credix_data_pipeline_spark.lakehouse import LakeTable

    table = LakeTable.load(spark, tmp_table)
    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in read_clean(table).select("conv_id", "turn_idx", "text").collect()
    )
    expected = oracle_sorted_rows(SMALL, normalize=True)
    assert len(got) == len(expected)
    assert got == expected

    # key-uniqueness contract (W3; reference dbt `unique` tests)
    dupes = (
        read_clean(table)
        .groupBy("conv_id", "turn_idx")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0


def test_gold_style_summary_over_result(spark, tmp_feed, tmp_table):
    write_feed(spark, tmp_feed, SMALL)
    runner.replay(spark, tmp_feed, tmp_table, chunks_per_batch=6, num_buckets=8)

    from credix_data_pipeline_spark.lakehouse import LakeTable

    table = LakeTable.load(spark, tmp_table)
    summary = (
        read_clean(table)
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("turns"), F.max("ts").alias("last_ts"))
        .orderBy("conv_id")
    )
    rows = summary.collect()
    state = {}
    for conv, turn, _ in oracle_sorted_rows(SMALL, normalize=False):
        state.setdefault(conv, 0)
        state[conv] += 1
    assert {r.conv_id: r.turns for r in rows} == state
