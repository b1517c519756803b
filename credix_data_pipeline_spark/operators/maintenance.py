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
"""

from __future__ import annotations

from typing import Any

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

    return {
        "compact_buckets": sorted(targets),
        "reasons": reasons,
        "expire": props.get("retention.auto", "").lower() == "true",
        "keep_last": int(props.get("retention.keep-last", "5")),
    }


def maintain(table: LakeTable, dry_run: bool = False) -> dict[str, Any]:
    """Run the table's maintenance policy: targeted compaction, then
    (when ``retention.auto`` is set) snapshot expiry.  Idempotent — a
    healthy table returns with nothing committed."""
    plan = plan_maintenance(table)
    if dry_run:
        return {**plan, "dry_run": True}
    report: dict[str, Any] = dict(plan)
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
