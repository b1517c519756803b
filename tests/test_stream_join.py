"""Stream-stream interval join (streaming/joins.py): the SS response-latency
pairing must converge to the batch join over the same feed, with matches
crossing micro-batch boundaries through the join state store; a watermark
tighter than the feed's disorder may only ever DROP matches, never invent
them."""

from __future__ import annotations

from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming.joins import (
    response_latency_batch,
    response_latency_stream,
)

SPEC = FeedSpec(
    n_events=4_000,
    n_conversations=50,
    turns_per_conversation=8,
    delete_pct=6,
    duplicate_pct=4,
    shuffle_window=32,
    events_per_chunk=500,  # 8 chunks → ≥4 micro-batches at 2 files/trigger
)


def _rows(df):
    return sorted(
        (r.conv_id, r.user_lsn, r.asst_lsn, r.latency_sec)
        for r in df.collect()
    )


def test_stream_join_converges_to_batch(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)

    q = response_latency_stream(
        spark,
        feed,
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="rl1",
        window_s=120,
        watermark="2 days",  # generous: nothing in the feed is that late
    )
    q.awaitTermination(timeout=180)
    # >1 micro-batch actually ran (matches crossed the state store)
    assert len(q.recentProgress) > 1

    got = _rows(spark.table("rl1"))
    want = _rows(response_latency_batch(spark, feed, window_s=120))
    assert len(want) > 0
    assert got == want
    # latency bounds follow from the join condition
    assert all(0 <= r[3] <= 120 for r in got)


def test_tight_watermark_drops_never_invents(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)

    q = response_latency_stream(
        spark,
        feed,
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="rl2",
        window_s=120,
        watermark="10 seconds",  # far below the feed's shuffle disorder
    )
    q.awaitTermination(timeout=180)

    got = set(_rows(spark.table("rl2")))
    want = set(_rows(response_latency_batch(spark, feed, window_s=120)))
    assert got <= want  # late rows may be evicted; nothing fabricated
