"""CDC relay: publish a LakeTable's net changes as a replayable change feed.

Closes the CDC loop — the engine is not only a change-feed SINK
(replay/stream → MERGE) but a change-feed SOURCE: the WAL-tail of its own
table.  Downstream tables chain bronze → silver → gold by replaying each
upstream table's published feed with the same ``runner.replay``/``stream``,
inheriting exactly-once, in-flight schema evolution, dead-lettering and
lineage unchanged.  The reference has no equivalent (its marts re-derive
from full silver tables every run); this is the Iceberg-CDC /
Debezium-outbox pattern that makes multi-hop pipelines incremental at
10^10 rows.

Mechanics:

* **Envelope parity** — published chunks carry the same ``op/lsn/commit_ts
  + payload`` envelope as ``sources/feed.py``, so a published feed is
  indistinguishable from a generated one to the replay runner.
* **After-image deletes** — a relayed ``D`` carries the DELETING event's
  ``_lsn`` (the stored tombstone's), so downstream LWW reproduces the
  upstream winner; the before-image's older LSN would lose the ordering.
* **One subdir per publish round** with its own schema in the manifest
  registry: upstream in-flight ADD-COLUMN evolution flows through
  ``read_chunks``' per-group schemas + ``unionByName`` alignment.  An
  upstream RENAME surfaces downstream as add-column (rows published before
  the DDL keep the old name) — DDL replication is a separate channel in
  every CDC system; apply the same ``alter`` downstream to converge
  layouts.
* **Resumable / incremental** — ``_relay.json`` pins the last published
  snapshot id; a publish with no new commits is a no-op.  Data files are
  written BEFORE the manifest + state swap, so a crash leaves an
  unreferenced chunk dir that the next publish simply overwrites (same
  chunk number — the replay checkpoint's chunk positions never move).
* **O(dirty)** — the underlying snapshot-diff changelog reads only buckets
  whose file lists differ between the endpoints, never the whole table.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse.table import LakeTable
from credix_data_pipeline_spark.operators.changelog import (
    CHANGE_COL,
    read_changes,
)
from credix_data_pipeline_spark.schema import ENVELOPE_COLS

STATE_FILE = "_relay.json"


def _load_state(out_dir: str) -> dict[str, Any] | None:
    p = os.path.join(out_dir, STATE_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _save_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def publish_changes(
    table: LakeTable,
    out_dir: str,
    to_snapshot_id: int | None = None,
) -> dict[str, Any]:
    """Publish the table's net changes since the last publish as one feed
    chunk under ``out_dir`` (creating a new feed on first call).

    Returns ``{"published_rows": n, "chunk": k, "from_snapshot_id": ...,
    "to_snapshot_id": ...}`` (``published_rows=0, skipped=True`` when the
    table hasn't moved).
    """
    spark = table.spark
    cur = (
        table.snapshot(to_snapshot_id)
        if to_snapshot_id is not None
        else table.current()
    )
    state = _load_state(out_dir)
    if state is None:
        base_id = table.history()[0].snapshot_id  # create commit (empty)
        next_chunk = 0
        manifest: dict[str, Any] = {
            "relay_source": table.path,
            "chunks": [],
            "n_chunks": 0,
            "format": "parquet",
            "schemas": {},
            "evolution_chunk": None,
        }
    else:
        base_id = state["snapshot_id"]
        next_chunk = state["next_chunk"]
        with open(os.path.join(out_dir, "_feed.json")) as f:
            manifest = json.load(f)
    if base_id == cur.snapshot_id:
        return {
            "published_rows": 0,
            "skipped": True,
            "to_snapshot_id": cur.snapshot_id,
        }

    ch = read_changes(
        table, base_id, cur.snapshot_id, delete_images="after"
    )
    # data columns in table order (everything but bookkeeping); the relay
    # envelope re-labels _lsn as the feed's lsn
    payload = [
        c for c in ch.columns if c not in (CHANGE_COL, "_lsn")
    ]
    t = F.col(CHANGE_COL)
    ev = ch.filter(t != "update_before").select(
        F.when(t == "insert", F.lit("I"))
        .when(t == "delete", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("_lsn").alias("lsn"),
        # commit_ts is only an equal-LSN tie-breaker downstream and relayed
        # LSNs are unique per key span; seconds-from-lsn keeps it monotone
        # and deterministic
        F.timestamp_seconds(F.col("_lsn")).alias("commit_ts"),
        *[F.col(c) for c in payload],
    )

    sub = f"pub{next_chunk:05d}"
    chunk_rel = os.path.join(sub, f"chunk={next_chunk}")
    out_abs = os.path.join(out_dir, chunk_rel)
    ev.write.mode("overwrite").parquet(out_abs)
    n = spark.read.schema(ev.schema).parquet(out_abs).count()

    manifest["chunks"] = [*manifest["chunks"], chunk_rel]
    manifest["n_chunks"] = len(manifest["chunks"])
    manifest["schemas"] = {
        **manifest.get("schemas", {}),
        sub: ev.schema.jsonValue(),
    }
    # the FIRST publish pins the downstream target's initial schema; later
    # columns arrive in-flight via the per-subdir registry (same contract
    # as the generator's evolution switch-point)
    manifest.setdefault("schema", ev.schema.jsonValue())
    _save_json(os.path.join(out_dir, "_feed.json"), manifest)
    _save_json(
        os.path.join(out_dir, STATE_FILE),
        {"snapshot_id": cur.snapshot_id, "next_chunk": next_chunk + 1},
    )
    return {
        "published_rows": n,
        "chunk": next_chunk,
        "from_snapshot_id": base_id,
        "to_snapshot_id": cur.snapshot_id,
        "skipped": False,
    }


__all__ = ["publish_changes", "ENVELOPE_COLS", "STATE_FILE"]
