"""Lineage + throughput sidecar (SURVEY §2.8 ST7, FIXTURES §3).

The reference records per-run metadata on each Dagster materialization —
records_extracted, batch max watermark, landing URI, table refs
(credix_pipeline/utils/cdc_helpers.py:29-38, assets/cnpj_assets.py:103-108) —
and monitors with Elementary.  The engine writes the same facts as a
queryable parquet table next to the target: one small file per batch,
appended driver-side with pyarrow (no Spark job for a 1-row write), read back
with ``spark.read.parquet`` for metrics/resume tooling.

The *authoritative* exactly-once fence lives inside the table's snapshot
manifest (committed atomically with the data); this sidecar is observability
and is reconstructible from the manifest history (``rebuild``).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import TYPE_CHECKING

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:
    from credix_data_pipeline_spark.operators.apply import ApplyResult

LINEAGE_DIR = "_lineage"

_ARROW_SCHEMA = pa.schema(
    [
        ("batch_id", pa.int64()),
        ("source", pa.string()),  # fan-in shard name; NULL for single-feed
        ("rows_in", pa.int64()),
        ("lsn_min", pa.int64()),
        ("lsn_max", pa.int64()),
        ("snapshot_id", pa.int64()),
        ("rows_applied", pa.int64()),
        ("rows_deduped", pa.int64()),
        ("rows_quarantined", pa.int64()),
        ("partition_stats", pa.string()),
        ("wall_ms", pa.int64()),
        ("note", pa.string()),
        ("committed_at", pa.timestamp("us", tz="UTC")),
    ]
)


# The Spark-side schema of the sidecar (timestamps are TIMESTAMP, longs are
# LONG) — used only for the typed EMPTY frame when no batch ever recorded.
_ARROW_SPARK_SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": n, "type": t, "nullable": True, "metadata": {}}
            for n, t in [
                ("batch_id", "long"),
                ("source", "string"),
                ("rows_in", "long"),
                ("lsn_min", "long"),
                ("lsn_max", "long"),
                ("snapshot_id", "long"),
                ("rows_applied", "long"),
                ("rows_deduped", "long"),
                ("rows_quarantined", "long"),
                ("partition_stats", "string"),
                ("wall_ms", "long"),
                ("note", "string"),
                ("committed_at", "timestamp"),
            ]
        ],
    }
)


class LineageLog:
    def __init__(self, table_path: str):
        self.dir = os.path.join(os.path.abspath(table_path), LINEAGE_DIR)
        os.makedirs(self.dir, exist_ok=True)

    def record(self, res: "ApplyResult", note: str | None = None) -> None:
        row = {
            "batch_id": res.batch_id,
            "source": res.source,
            "rows_in": res.rows_in,
            "lsn_min": res.lsn_min,
            "lsn_max": res.lsn_max,
            "snapshot_id": res.snapshot_id,
            "rows_applied": res.rows_applied,
            "rows_deduped": res.rows_deduped,
            "rows_quarantined": res.rows_quarantined,
            "partition_stats": json.dumps(res.partition_stats, sort_keys=True),
            "wall_ms": res.wall_ms,
            "note": note,
            "committed_at": int(time.time() * 1_000_000),
        }
        tbl = pa.Table.from_pylist([row], schema=_ARROW_SCHEMA)
        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}.parquet")
        final = os.path.join(
            self.dir, f"batch-{res.batch_id:012d}-{uuid.uuid4().hex[:8]}.parquet"
        )
        pq.write_table(tbl, tmp)
        os.rename(tmp, final)

    def read(self, spark: SparkSession) -> DataFrame:
        # A table that never replayed a batch (zero-copy import, fresh
        # clone) has an empty sidecar — return a typed empty frame so the
        # monitor reports zeros instead of failing schema inference.
        if not any(
            f.endswith(".parquet") for f in os.listdir(self.dir)
        ):
            from pyspark.sql import types as T

            return spark.createDataFrame(
                [], T.StructType.fromJson(
                    json.loads(_ARROW_SPARK_SCHEMA_JSON)
                )
            )
        # mergeSchema: tables written before the `source` column existed
        # mix footer shapes with post-upgrade rows
        return spark.read.option("mergeSchema", "true").parquet(self.dir)

    def throughput(self, spark: SparkSession) -> dict:
        """Aggregate events/sec across recorded batches.

        ``rows_in`` is counted in the always-on profile pass, so throughput
        is correct even under ``collect_stats=False`` (the ``--fast`` path,
        where rows_applied/rows_deduped stay 0).
        """
        import pyspark.sql.functions as F

        df = self.read(spark).filter(F.col("snapshot_id").isNotNull())
        row = df.agg(
            F.sum("rows_in").alias("rows"),
            F.sum("wall_ms").alias("ms"),
        ).first()
        rows = row["rows"] or 0
        ms = row["ms"] or 1
        return {
            "events_in": rows,
            "wall_ms": ms,
            "events_per_sec": rows / (ms / 1000.0),
        }
