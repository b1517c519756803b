"""Stream-stream interval join: response-latency pairing over the live feed.

The batch temporal operators (plans/temporal_ops.py) answer point-in-time
questions over data at rest; this is the STREAMING analogue — a genuine
Structured Streaming stream-stream join (two ``readStream`` sources, event
-time range condition, watermarks on both sides) pairing each user turn
with the assistant turns that answer it within a bounded window, emitting
``(conv_id, user_lsn, asst_lsn, latency_sec)`` as matches materialize.

Scale posture (the Spark stream-stream join contract):

* Both sides shuffle on the equi-key (``conv_id``) — co-partitioned state,
  shards across executors like any keyed stream.
* The RANGE condition (``user_ts <= asst_ts <= user_ts + window``) is what
  BOUNDS the join state: without it Spark must buffer both streams
  forever.  With it plus the watermarks, rows older than
  ``watermark + window`` are evicted from the state store each batch.
* The watermark is the correctness/state trade: a delay shorter than the
  feed's out-of-orderness silently DROPS late matches (tested), a generous
  one buffers more state.  Production guidance: set it to the observed
  p99 event lateness; the replay path (runner.replay) is the exact
  backfill for anything past it.

Deletes carry NULL role/ts in the feed and never enter either side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def _side(src: DataFrame, role: str, prefix: str, watermark: str) -> DataFrame:
    return (
        src.filter((F.col("op") != "D") & (F.col("role") == role))
        .select(
            F.col("conv_id").alias(f"{prefix}_conv"),
            F.col("turn_idx").alias(f"{prefix}_turn"),
            F.col("lsn").alias(f"{prefix}_lsn"),
            F.col("ts").alias(f"{prefix}_ts"),
        )
        .withWatermark(f"{prefix}_ts", watermark)
    )


def _joined(user: DataFrame, asst: DataFrame, window_s: int) -> DataFrame:
    cond = (
        (F.col("u_conv") == F.col("a_conv"))
        & (F.col("a_ts") >= F.col("u_ts"))
        & (F.col("a_ts") <= F.col("u_ts") + F.expr(f"INTERVAL {window_s} SECONDS"))
    )
    return user.join(asst, cond, "inner").select(
        F.col("u_conv").alias("conv_id"),
        F.col("u_lsn").alias("user_lsn"),
        F.col("a_lsn").alias("asst_lsn"),
        F.col("u_ts").alias("user_ts"),
        (F.unix_timestamp("a_ts") - F.unix_timestamp("u_ts")).alias(
            "latency_sec"
        ),
    )


def response_latency_stream(
    spark: SparkSession,
    feed_path: str,
    *,
    checkpoint_dir: str,
    query_name: str = "resp_latency",
    window_s: int = 120,
    watermark: str = "2 days",
    available_now: bool = True,
    max_files_per_trigger: int = 2,
):
    """Start the stream-stream join over a feed directory → in-memory sink
    (swap for a parquet/lakehouse sink in service mode).  Returns the
    StreamingQuery; with ``availableNow`` it drains the feed then stops."""
    from credix_data_pipeline_spark.sources import feed as feed_mod

    manifest = feed_mod.read_manifest(feed_path)
    schema = T.StructType.fromJson(manifest["schema"])

    def src() -> DataFrame:
        # maxFilesPerTrigger forces MULTIPLE micro-batches even under
        # availableNow, so matches genuinely cross batch boundaries through
        # the join state store (the property the test pins).
        return (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(feed_path + "/*")
        )

    out = _joined(
        _side(src(), "user", "u", watermark),
        _side(src(), "assistant", "a", watermark),
        window_s,
    )
    writer = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(checkpoint_dir, query_name))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def response_latency_batch(
    spark: SparkSession, feed_path: str, *, window_s: int = 120
) -> DataFrame:
    """The batch ground truth: the same pairing over the feed at rest."""
    src = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(feed_path + "/*")
    )
    u = src.filter((F.col("op") != "D") & (F.col("role") == "user")).select(
        F.col("conv_id").alias("u_conv"),
        F.col("turn_idx").alias("u_turn"),
        F.col("lsn").alias("u_lsn"),
        F.col("ts").alias("u_ts"),
    )
    a = src.filter(
        (F.col("op") != "D") & (F.col("role") == "assistant")
    ).select(
        F.col("conv_id").alias("a_conv"),
        F.col("turn_idx").alias("a_turn"),
        F.col("lsn").alias("a_lsn"),
        F.col("ts").alias("a_ts"),
    )
    return _joined(u, a, window_s)
