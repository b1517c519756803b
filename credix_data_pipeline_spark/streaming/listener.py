"""StreamingQueryListener → lineage-dir progress log (SURVEY §2.8 ST7).

The reference surfaces per-run throughput as Dagster materialization
metadata (records_extracted etc., credix_pipeline/utils/cdc_helpers.py:29-38);
the engine's replay mode records the same facts per batch in the lineage
sidecar.  This listener covers the genuine Structured Streaming mode: Spark
emits a ``QueryProgressEvent`` per micro-batch with input rows, batch
duration, and rows/sec — appended here as JSON lines next to the lineage
parquet so ``main.py metrics`` tooling and the monitoring report can read
engine-measured and Spark-measured throughput side by side.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.streaming import StreamingQueryListener

# Underscore prefix: Spark's file listing hides `_`-prefixed entries, so the
# progress log can live inside `_lineage/` without poisoning
# ``LineageLog.read``'s ``spark.read.parquet`` over that directory.
PROGRESS_FILE = "_stream_progress.jsonl"


class LineageProgressListener(StreamingQueryListener):
    """Append one JSON line per micro-batch progress event."""

    def __init__(self, table_path: str):
        from credix_data_pipeline_spark.streaming.lineage import LINEAGE_DIR

        self.dir = os.path.join(os.path.abspath(table_path), LINEAGE_DIR)
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, PROGRESS_FILE)

    def onQueryStarted(self, event) -> None:
        self._append({"event": "started", "id": str(event.id),
                      "runId": str(event.runId)})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._append(
            {
                "event": "progress",
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs or {}),
                "timestamp": p.timestamp,
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - cadence event
        pass

    def onQueryTerminated(self, event) -> None:
        self._append(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    def _append(self, row: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(row, default=str) + "\n")
