"""Policy-driven table maintenance: one idempotent ``maintain()`` call an
operator (or a scheduler) points at a table, instead of hand-choosing
compact / expire targets.

The reference's maintenance is GCS lifecycle rules plus re-created BigQuery
tables (datastream_resources.tf:9-16, storage.tf); Iceberg ships the same
idea as table-properties-driven maintenance (``rewrite_data_files`` with
``min-input-files``, ``expire_snapshots`` with retention properties).  This
module is that loop for LakeTable:

* **Targeting is manifest-first, O(metadata)**: per-bucket file counts,
  position-delete buildup, equality-delete coverage and evolution-boundary
  dirs are all in the snapshot manifest — picking compact targets for a
  100 TB table reads zero footers and zero data.  The optional size-aware
  trigger (``maintenance.min-avg-file-mb``) adds ONE distributed
  footer-only scan (``partitions_df``), still never a data scan.
* **Work is scoped**: only flagged buckets are handed to ``compact()``
  (which itself rewrites only what needs rewriting) — a steady-state table
  maintains as a no-op with no new snapshot.
* **Policy lives with the table** (``Snapshot.properties``), so every
  ingest host runs the same rules without a side-channel config store.

Policy keys (all optional):

* ``maintenance.small-files-per-bucket`` — compact a bucket when its file
  count reaches this (default 4).
* ``maintenance.min-avg-file-mb`` — ALSO compact buckets whose average
  file size (footer scan) is below this many MB.  Unset = manifest-only.
* ``retention.auto`` — "true" runs ``expire_snapshots`` after compaction.
* ``retention.keep-last`` — snapshots to keep when expiring (default 5).
* ``retention.ttl-ms`` / ``retention.ttl-days`` — row TTL horizon: every
  ``maintain`` run deletes rows with event time older than now-horizon
  (``delete_older_than`` — whole files by manifest ts-stats, boundary
  buckets rewritten).  ms wins when both are set.  TTL runs FIRST, so
  compaction never rewrites rows about to be deleted and can then merge
  the TTL's own boundary rewrites.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import types as T

from credix_data_pipeline_spark.lakehouse.table import LakeTable


def plan_maintenance(table: LakeTable) -> dict[str, Any]:
    """Dry-run: what ``maintain`` would do, from the manifest (plus the
    footer scan iff the size policy is set).  Safe to call anywhere —
    commits nothing."""
    snap = table.current()
    props = snap.properties
    small_files = int(props.get("maintenance.small-files-per-bucket", "4"))

    targets: set[int] = set()
    reasons: dict[str, list[int]] = {}

    def flag(reason: str, buckets) -> None:
        bs = sorted(set(int(b) for b in buckets) - targets)
        if bs:
            reasons[reason] = bs
            targets.update(bs)

    # most severe reason first — ``flag`` attributes each bucket to the
    # FIRST reason that claims it, and ``maintain`` keys full-vs-targeted
    # compaction off the mor_invariant reason being present
    if snap.merge_mode == "mor" and not snap.mor_deletes:
        # broken one-version invariant: every non-empty bucket may hide
        # multiple key versions — compact() rewrites them all anyway
        flag("mor_invariant", (b for b, fl in snap.files.items() if fl))
    flag(
        "small_files",
        (b for b, fl in snap.files.items() if len(fl) >= small_files),
    )
    flag("position_deletes", (b for b in snap.delete_files if snap.delete_files[b]))
    flag(
        "equality_deletes",
        (b for e in snap.eq_deletes for b in e["buckets"]),
    )

    min_avg_mb = props.get("maintenance.min-avg-file-mb")
    if min_avg_mb is not None and snap.files:
        from credix_data_pipeline_spark.lakehouse.metadata import (
            partitions_df,
        )

        thresh_bytes = float(min_avg_mb) * (1 << 20)
        rows = (
            partitions_df(table)
            .select("bucket", "avg_file_bytes")
            .collect()
        )
        flag(
            "small_avg_file_size",
            (r["bucket"] for r in rows if r["avg_file_bytes"] < thresh_bytes),
        )

    ttl_ms = props.get("retention.ttl-ms")
    ttl_days = props.get("retention.ttl-days")
    ttl_cutoff = None
    if ttl_ms is not None or ttl_days is not None:
        horizon = (
            int(ttl_ms)
            if ttl_ms is not None
            else int(float(ttl_days) * 86_400_000)
        )
        ttl_cutoff = int(time.time() * 1000) - horizon
    ttl_report = None
    if ttl_cutoff is not None:
        tsf = next((f for f in snap.schema.fields if f.name == "ts"), None)
        if tsf is None or not isinstance(tsf.dataType, T.TimestampType):
            # the property predates a drop/retype of `ts`
            # (alter_properties refuses to SET it on such a schema):
            # surface the dead policy instead of crashing maintain()
            # mid-run and aborting the compaction/retention it also owns
            return {
                "compact_buckets": sorted(targets),
                "reasons": reasons,
                "expire": props.get("retention.auto", "").lower() == "true",
                "keep_last": int(props.get("retention.keep-last", "5")),
                "ttl": {
                    "cutoff_ms": ttl_cutoff,
                    "skipped": "table has no timestamp 'ts' column — "
                    "unset retention.ttl-* or restore the column",
                },
            }
        # manifest-only preview: what the cutoff would touch right now
        droppable = sum(
            1 for s in snap.ts_stats.values() if s[1] < ttl_cutoff
        )
        straddling = sorted({
            int(b)
            for b, fl in snap.files.items()
            for f in fl
            if (st := snap.ts_stats.get(f)) is not None
            and st[0] < ttl_cutoff <= st[1]
        })
        ttl_report = {
            "cutoff_ms": ttl_cutoff,
            "files_droppable": droppable,
            "straddling_buckets": straddling,
        }

    return {
        "compact_buckets": sorted(targets),
        "reasons": reasons,
        "expire": props.get("retention.auto", "").lower() == "true",
        "keep_last": int(props.get("retention.keep-last", "5")),
        "ttl": ttl_report,
    }


def maintain(table: LakeTable, dry_run: bool = False) -> dict[str, Any]:
    """Run the table's maintenance policy: targeted compaction, then
    (when ``retention.auto`` is set) snapshot expiry.  Idempotent — a
    healthy table returns with nothing committed."""
    plan = plan_maintenance(table)
    if dry_run:
        return {**plan, "dry_run": True}
    report: dict[str, Any] = dict(plan)
    if plan["ttl"] is not None and not plan["ttl"].get("skipped"):
        before = table.current()
        snap = table.delete_older_than(plan["ttl"]["cutoff_ms"])
        report["ttl"] = {
            **plan["ttl"],
            "applied": snap.snapshot_id != before.snapshot_id,
            "files_dropped": (
                snap.summary.get("files_dropped", 0)
                if snap.snapshot_id != before.snapshot_id else 0
            ),
            "buckets_rewritten": (
                snap.summary.get("buckets_rewritten", 0)
                if snap.snapshot_id != before.snapshot_id else 0
            ),
        }
    if plan["compact_buckets"]:
        before = table.current().version
        if "mor_invariant" in plan["reasons"]:
            # full compaction so the rewrite can attest the restored
            # one-version-per-key invariant (compact() only marks it on a
            # full pass)
            snap = table.compact()
        else:
            snap = table.compact(target_buckets=plan["compact_buckets"])
        report["compacted"] = snap.version > before
        report["snapshot_id"] = snap.snapshot_id
    else:
        report["compacted"] = False
    if plan["expire"]:
        report["retention"] = table.expire_snapshots(
            keep_last=plan["keep_last"]
        )
    return report


__all__ = ["maintain", "plan_maintenance"]
