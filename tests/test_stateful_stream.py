"""applyInPandasWithState operator: running per-conversation counters over
the change feed must converge to the batch ground truth (SURVEY §2.8 —
custom stateful streaming the reference delegates to managed services)."""

from __future__ import annotations

from pyspark.sql import functions as F

from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
from credix_data_pipeline_spark.streaming.stateful import conversation_state_stream

SPEC = FeedSpec(
    n_events=4_000,
    n_conversations=50,
    turns_per_conversation=8,
    delete_pct=6,
    duplicate_pct=4,
    shuffle_window=32,
    events_per_chunk=1_000,
)


def test_stateful_counters_match_batch_truth(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_feed(spark, feed, SPEC)

    q = conversation_state_stream(
        spark, feed, checkpoint_dir=str(tmp_path / "ckpt"), query_name="cs1"
    )
    q.awaitTermination(timeout=180)

    # memory sink accumulates one row per (conversation, batch); the row with
    # the highest events_seen per conversation is the final state.
    final = (
        spark.table("cs1")
        .groupBy("conv_id")
        .agg(
            F.max_by(
                F.struct("events_seen", "max_lsn", "inserts", "updates", "deletes"),
                F.col("events_seen"),
            ).alias("s")
        )
        .select("conv_id", "s.*")
    )
    truth = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(feed + "/*")
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.max("lsn").alias("max_lsn"),
            F.count(F.when(F.col("op") == "I", 1)).alias("inserts"),
            F.count(F.when(F.col("op") == "U", 1)).alias("updates"),
            F.count(F.when(F.col("op") == "D", 1)).alias("deletes"),
        )
    )
    got = {r.conv_id: (r.events_seen, r.max_lsn, r.inserts, r.updates, r.deletes)
           for r in final.collect()}
    want = {r.conv_id: (r.events_seen, r.max_lsn, r.inserts, r.updates, r.deletes)
            for r in truth.collect()}
    assert got == want
    assert len(got) == SPEC.n_conversations
