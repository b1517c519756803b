"""Snapshot export (unload): write one consistent table state as PLAIN
parquet for consumers that don't speak the table format — the reverse of
``LakeTable.import_dataset`` (Iceberg/Delta have CTAS-unload patterns;
Snowflake calls it COPY INTO <location>).

Reference parity: the reference's final hop hands BigQuery marts to
consumers as plain tables (credix_pipeline dbt models); this is the same
handoff from the lakehouse side.

Semantics:

* The export reads ONE pinned snapshot (current, ``snapshot_id``, or
  ``as_of_ms``) through the normal clean path — LWW winners, tombstones
  and purges applied — so the output is exactly what a SQL consumer of
  the table sees, never a mix of generations.
* **Governance applies by default**: ``governance.mask.*`` /
  ``governance.row-filter`` table properties bind the exported data like
  any consumer surface; ``privileged=True`` is the pipeline-operator
  escape (the ``sql --privileged`` rule).  An export is the easiest way
  to leak a masked column — the default must be the governed one.
* ``partition_by`` columns produce a hive-layout directory per value
  (consumer-side partition pruning); bookkeeping columns are never
  exported.
* The destination must not already exist (no silent overwrite of a
  consumer's dataset), and a ``_export.json`` summary (source path,
  snapshot id/version, row count, columns, governed flag) is written
  AFTER the data so its presence marks a complete export — the
  write-audit-publish rule at the cheapest possible grain.  Row count
  comes from ``df.observe`` (free in the write job, no second scan).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import Observation, functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import (
    apply_governance,
    read_clean,
)

SUMMARY_FILE = "_export.json"


def export_snapshot(
    table: LakeTable,
    dest: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    partition_by: list[str] | None = None,
    privileged: bool = False,
    ts_between: tuple[int | None, int | None] | None = None,
    between: dict[str, tuple] | None = None,
) -> dict[str, Any]:
    """Unload one consistent snapshot to ``dest`` as plain parquet.
    Returns the summary dict (also persisted as ``dest/_export.json``).

    ``ts_between`` / ``between`` slice the unload (the "export last 7
    days for the vendor" shape) through the manifest-stats pruned read —
    a partial export of a 100 TB table plans only the warm files."""
    if as_of_ms is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or as_of_ms, not both")
        snapshot_id = table.snapshot_as_of(as_of_ms).snapshot_id
    dest = os.path.abspath(dest)
    if os.path.exists(dest):
        raise FileExistsError(
            f"export destination {dest!r} already exists — exports never "
            "overwrite a consumer's dataset; remove it or pick a new path"
        )
    snap = (
        table.current()
        if snapshot_id is None
        else table.snapshot(snapshot_id)
    )
    # pin the resolved snapshot for the DATA read too: without this, a
    # concurrent commit landing between the summary resolution and the
    # scan makes _export.json attest a different state than the parquet
    # holds — the one-consistent-snapshot promise is the whole point
    df = read_clean(
        table,
        snapshot_id=snap.snapshot_id,
        ts_between=ts_between,
        between=between,
    )
    governed = False
    if not privileged:
        cur = table.current()  # policy is LIVE, the register_sql_views rule
        from credix_data_pipeline_spark.operators.apply import (
            governance_rules,
            guard_governed_slice,
        )
        guard_governed_slice(cur, ts_between=ts_between, between=between)
        masks, row_filter = governance_rules(cur)
        governed = bool(masks or row_filter)
        df = apply_governance(df, cur)
    df = df.drop(*[c for c in df.columns if c.startswith("_")])
    for c in partition_by or []:
        if c not in df.columns:
            raise ValueError(f"partition_by column {c!r} not in export")

    obs = Observation("export")
    df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest)

    summary = {
        "source": table.path,
        "snapshot_id": snap.snapshot_id,
        "version": snap.version,
        "rows": int(obs.get["rows"]),
        "columns": [c for c in df.columns],
        "partition_by": list(partition_by or []),
        "governed": governed,
        "sliced": bool(ts_between or between),
        "exported_at_ms": int(time.time() * 1000),
    }
    with open(os.path.join(dest, SUMMARY_FILE), "w") as f:
        json.dump(summary, f, sort_keys=True)
    return summary
