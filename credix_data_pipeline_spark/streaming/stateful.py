"""Custom stateful streaming operator: live per-conversation counters.

The reference's monitoring surface is batch-shaped (Elementary reports,
Dagster metadata — elementary_assets.py:9-75); the engine adds the streaming
analogue: an ``applyInPandasWithState`` operator that maintains running
per-conversation statistics (events seen, max LSN, deletes, per-op counts)
directly over the change feed, emitting an updated row per conversation per
micro-batch.  This is the Structured Streaming pattern for state that does
NOT belong in the target table — transient operational counters, freshness
probes — kept in the streaming state store (checkpointed, recoverable)
instead of the lakehouse.

Scale posture: state is keyed by ``conv_id`` so it shards across executors
with the shuffle; per-group state is O(1) (four counters); the pandas
callback is Arrow-batched per group (no per-row Python).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import SparkSession, types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("inserts", T.LongType()),
        T.StructField("updates", T.LongType()),
        T.StructField("deletes", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("events_seen", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("inserts", T.LongType()),
        T.StructField("updates", T.LongType()),
        T.StructField("deletes", T.LongType()),
    ]
)


def _update_conversation(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    ev = mx = ins = upd = dl = 0
    if state.exists:
        ev, mx, ins, upd, dl = state.get
    for pdf in pdfs:
        ev += len(pdf)
        if len(pdf):
            mx = max(mx, int(pdf["lsn"].max()))
            ops = pdf["op"].value_counts()
            ins += int(ops.get("I", 0))
            upd += int(ops.get("U", 0))
            dl += int(ops.get("D", 0))
    state.update((ev, mx, ins, upd, dl))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "events_seen": [ev],
            "max_lsn": [mx],
            "inserts": [ins],
            "updates": [upd],
            "deletes": [dl],
        }
    )


def conversation_state_stream(
    spark: SparkSession,
    feed_path: str,
    *,
    checkpoint_dir: str,
    query_name: str = "conv_state",
    available_now: bool = True,
):
    """Start the stateful stream over a feed directory → in-memory sink
    (swap for a parquet/lakehouse sink in service mode).  Returns the
    StreamingQuery; with ``availableNow`` it drains the feed then stops."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from credix_data_pipeline_spark.sources import feed as feed_mod

    manifest = feed_mod.read_manifest(feed_path)
    schema = T.StructType.fromJson(manifest["schema"])

    src = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(feed_path + "/*")
    )
    updated = src.groupBy("conv_id").applyInPandasWithState(
        _update_conversation,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(checkpoint_dir, query_name))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
