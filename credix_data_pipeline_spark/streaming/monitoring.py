"""Freshness / volume-anomaly monitoring + static report publish
(SURVEY §3.4, §2.1 S11).

The reference runs Elementary over dbt artifacts (``edr monitor`` then
``edr send-report``, credix_pipeline/credix_pipeline/assets/elementary_assets.py:9-75)
and publishes the HTML report to a public GCS website bucket
(terraform/modules/gcs/storage.tf:43-66).  The engine already records the
underlying facts in the lineage sidecar (`streaming/lineage.py`); this module
computes the monitoring *signals* over it and renders the publishable report:

* **freshness** — wall-clock staleness of the last committed batch and the
  LSN high-water (Elementary freshness test analogue);
* **volume anomalies** — per-batch applied-row counts that deviate from the
  replay mean by more than a threshold, computed in exact integer basis
  points so the flag is engine-portable (Elementary volume anomaly analogue);
* **error rate** — quarantined rows vs total (the dead-letter path, ST6);
* **publish** — one self-contained HTML + JSON report written to an output
  directory (the public-bucket-website analogue of S11).

Everything here is a plain aggregation over the tiny lineage table (one row
per batch), so it is driver-cheap at any data scale: 10^10 events at 10^6
events/batch is a 10^4-row sidecar.
"""

from __future__ import annotations

import html
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from credix_data_pipeline_spark.streaming.lineage import LineageLog

# volume anomaly: batch deviates >= this many basis points from the mean
VOLUME_DEV_BP = 2500          # 25%
STALENESS_WARN_SEC = 3600     # freshness: warn after an hour without a commit


def batch_volume_anomalies(
    lineage: DataFrame, dev_bp: int = VOLUME_DEV_BP
) -> DataFrame:
    """Batches whose event volume deviates >= ``dev_bp`` basis points from
    the replay mean.  Deviation is exact integer arithmetic
    (``|batch*n - total| * 10⁴ DIV total``) — no float comparisons.

    Empty fence/no-change batches (rows 0) are kept: a zero-volume batch in
    a nonempty replay is exactly what volume monitoring must surface.
    ``rows_in`` comes from the always-on profile pass, so the signal works
    under ``collect_stats=False`` too.
    """
    rows = F.col("rows_in").alias("batch_events")
    per_batch = lineage.filter(F.col("snapshot_id").isNotNull()).select(
        "batch_id", rows, "rows_quarantined", "wall_ms"
    )
    totals = per_batch.agg(
        F.sum("batch_events").alias("total_events"),
        F.count(F.lit(1)).alias("n_batches"),
    )
    j = per_batch.crossJoin(F.broadcast(totals))
    dev = F.expr(
        "abs(batch_events * n_batches - total_events) * 10000 DIV total_events"
    ).alias("dev_bp")
    return j.select(
        "batch_id",
        "batch_events",
        "rows_quarantined",
        "wall_ms",
        "total_events",
        "n_batches",
        dev,
    ).withColumn("is_volume_anomaly", F.col("dev_bp") >= F.lit(dev_bp))


def freshness(
    spark: SparkSession, table_path: str, as_of_sec: float | None = None
) -> dict:
    """Staleness of the last commit; ``as_of_sec`` injectable for tests
    (F5 determinism rule)."""
    log = LineageLog(table_path)
    row = (
        log.read(spark)
        .filter(F.col("snapshot_id").isNotNull())
        .agg(
            F.max("committed_at").alias("last_committed_at"),
            F.max("lsn_max").alias("lsn_high_water"),
            F.max("batch_id").alias("last_batch_id"),
        )
        .first()
    )
    now = time.time() if as_of_sec is None else as_of_sec
    last = row["last_committed_at"]
    staleness = None if last is None else max(0.0, now - last.timestamp())
    # DATA freshness, distinct from pipeline freshness: the newest event
    # time in the table, read from the manifest ts_stats alone — zero data
    # scans at any table size (None on pre-feature tables).
    event_hw_ms = None
    try:
        from credix_data_pipeline_spark.lakehouse import LakeTable

        stats = LakeTable.load(spark, table_path).current().ts_stats
        event_hw_ms = max((s[1] for s in stats.values()), default=None)
    except FileNotFoundError:
        pass
    return {
        "last_batch_id": row["last_batch_id"],
        "lsn_high_water": row["lsn_high_water"],
        "last_committed_at": None if last is None else last.isoformat(),
        "staleness_sec": None if staleness is None else round(staleness, 3),
        "event_time_high_water_ms": event_hw_ms,
        "event_staleness_sec": (
            None
            if event_hw_ms is None
            else round(max(0.0, now - event_hw_ms / 1000.0), 3)
        ),
        "status": (
            "NO_COMMITS"
            if staleness is None
            else ("STALE" if staleness > STALENESS_WARN_SEC else "FRESH")
        ),
    }


def monitor(
    spark: SparkSession,
    table_path: str,
    as_of_sec: float | None = None,
    catalog_root: str | None = None,
) -> dict:
    """The full monitoring report as a JSON-able dict (``edr monitor``
    analogue).  ``catalog_root`` adds the consumer-lag view of the
    multi-table catalog (``catalog_staleness``)."""
    log = LineageLog(table_path)
    lineage = log.read(spark)
    anomalies = batch_volume_anomalies(lineage)
    rows = anomalies.orderBy("batch_id").collect()  # one row per batch: tiny
    total = sum(r["batch_events"] for r in rows)
    quarantined = sum(r["rows_quarantined"] or 0 for r in rows)
    flagged = [r for r in rows if r["is_volume_anomaly"]]
    return {
        "freshness": freshness(spark, table_path, as_of_sec),
        "throughput": log.throughput(spark),
        "volume": {
            "n_batches": len(rows),
            "total_events": total,
            "anomalous_batches": [
                {"batch_id": r["batch_id"], "batch_events": r["batch_events"],
                 "dev_bp": r["dev_bp"]}
                for r in flagged
            ],
            "anomaly_count": len(flagged),
        },
        "errors": {
            "rows_quarantined": quarantined,
            "error_bp": (quarantined * 10000 // total) if total else 0,
        },
        "layout": layout_health(spark, table_path),
        "maintenance": maintenance_pressure(spark, table_path),
        "fanin": fanin_progress(spark, table_path),
        "branches": branch_status(spark, table_path),
        "catalog": (
            catalog_staleness(spark, catalog_root) if catalog_root else None
        ),
    }


def branch_status(spark: SparkSession, table_path: str) -> list[dict] | None:
    """Per-branch divergence view: fork base vs main's current version,
    unpublished data commits, and wall-clock age of the branch head — a
    long-lived unpublished branch is pinned storage (its fork pin blocks
    retention on the shared files) and a merge conflict waiting to happen.
    Metadata-only: one manifest read per branch.  None when the table has
    no branches."""
    import time as _time

    from credix_data_pipeline_spark.lakehouse import LakeTable

    t = LakeTable.load(spark, table_path)
    names = t.list_branches()
    if not names:
        return None
    cur = t.current()
    out = []
    now_ms = int(_time.time() * 1000)
    for name in names:
        br = t.branch(name)
        head = br.current()
        props = head.properties
        published = LakeTable._is_published(br)
        base_version = int(props.get("branch.base-version", -1))
        out.append(
            {
                "name": name,
                "base_version": base_version,
                "main_version": cur.version,
                "fast_forwardable": cur.version == base_version,
                "unpublished": not published,
                "head_age_sec": max(0, (now_ms - head.committed_at_ms))
                // 1000,
                "status": (
                    "PUBLISHED"
                    if published
                    else (
                        "READY"
                        if cur.version == base_version
                        else "DIVERGED"  # main moved: needs a rebase
                    )
                ),
            }
        )
    return out


def catalog_staleness(spark: SparkSession, catalog_root: str) -> dict:
    """Consumer-lag view of the multi-table catalog: how far each table
    has advanced PAST the version the catalog still serves.

    Per-table freshness can't see this failure mode — writers keep
    committing (healthy tables) while nobody re-publishes the catalog, so
    consumers reading through it get an ever-older consistent view.  The
    signal is per-table ``commits_behind`` / ``ms_behind`` between the
    pinned snapshot and the table's current one, plus the age of the
    newest catalog version itself.  Metadata only — one snapshot-id
    lookup per table (O(retained snapshots) manifest reads, no data
    scan), no Spark job."""
    import time as _time

    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.lakehouse.catalog import Catalog

    cat = Catalog.load(catalog_root)
    cv = cat.current()
    now_ms = int(_time.time() * 1000)
    tables = {}
    worst_behind = 0
    for name, ent in sorted(cv.tables.items()):
        t = LakeTable.load(spark, ent["path"])
        cur = t.current()
        pin = int(ent["snapshot_id"])
        try:
            # one id lookup resolves BOTH signals: commits_behind is
            # version arithmetic (snapshot ids are not ordering-safe —
            # two same-millisecond commits can invert), and no separate
            # full-history count is needed
            pin_snap = t.snapshot(pin)
            pin_ms = pin_snap.committed_at_ms
            ms_behind = max(0, cur.committed_at_ms - pin_ms)
            commits_behind = max(0, cur.version - pin_snap.version)
        except KeyError:  # pin expired out from under the catalog
            pin_ms, ms_behind, commits_behind = None, None, None
        worst_behind = max(worst_behind, commits_behind or 0)
        tables[name] = {
            "pinned_snapshot_id": pin,
            "current_snapshot_id": cur.snapshot_id,
            "commits_behind": commits_behind,
            "ms_behind": ms_behind,
            "pin_resolvable": pin_ms is not None,
        }
    broken = [n for n, v in tables.items() if not v["pin_resolvable"]]
    return {
        "version": cv.version,
        "published_at_ms": cv.ts_ms,
        "age_sec": max(0, (now_ms - cv.ts_ms) // 1000),
        "tables": tables,
        "status": (
            "BROKEN_PIN" if broken
            else "STALE" if worst_behind > 0
            else "FRESH"
        ),
        "worst_commits_behind": worst_behind,
    }


def fanin_progress(spark: SparkSession, table_path: str) -> dict | None:
    """Per-source progress for fan-in tables (``runner.replay_fanin``):
    each shard's fence (last committed batch id) and checkpointed feed
    position, plus the batch-lag spread between the fastest and slowest
    source — one shard silently stalling behind the others is THE fan-in
    failure mode (a lagging Debezium connector), and it is invisible to
    whole-table freshness because the other shards keep committing.
    Metadata-only: one fence map read + the tiny checkpoint JSONs.
    Returns None for single-feed tables (no ``fences`` map)."""
    import glob as _glob
    import json as _json
    import os as _os

    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.apply import _fence_state

    table = LakeTable.load(spark, table_path)
    _scalar, fences = _fence_state(table)
    if not fences:
        return None
    ckpts = {}
    for p in _glob.glob(
        _os.path.join(table_path, "_checkpoint_fanin_*.json")
    ):
        name = _os.path.basename(p)[len("_checkpoint_fanin_"):-len(".json")]
        with open(p) as fh:
            ckpts[name] = _json.load(fh)
    sources = {
        s: {
            "fence_batch_id": fences.get(s),
            "next_chunk": (ckpts.get(s) or {}).get("next_chunk"),
        }
        for s in sorted(set(fences) | set(ckpts))
    }
    applied = [v for v in fences.values() if v is not None]
    lag = (max(applied) - min(applied)) if applied else 0
    return {
        "sources": sources,
        "batch_lag": lag,
        "status": "LAGGING" if lag > FANIN_LAG_WARN_BATCHES else "BALANCED",
    }


FANIN_LAG_WARN_BATCHES = 2


# layout health thresholds (per bucket)
SMALL_FILE_BYTES = 8 * 1024 * 1024   # files under this count as small
SKEW_WARN_BP = 30000                 # bucket >= 3x the mean row count


def layout_health(spark: SparkSession, table_path: str) -> dict:
    """Physical-layout signals from the ``partitions`` metadata table:
    small-file buildup (compaction pressure) and bucket row skew (a hot
    conversation key concentrating in one bucket).  The underlying scan is
    footer-only and distributed — O(files) metadata, no data pages — so the
    signal is cheap at any table size."""
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.lakehouse.metadata import partitions_df

    table = LakeTable.load(spark, table_path)
    parts = partitions_df(table).collect()  # one row per bucket: tiny
    if not parts:
        return {"buckets": 0, "small_file_buckets": [], "skewed_buckets": [],
                "max_skew_bp": 0}
    mean_rows = sum(p["row_count"] for p in parts) // max(1, len(parts))
    small = [
        {"bucket": p["bucket"], "file_count": p["file_count"],
         "avg_file_bytes": p["avg_file_bytes"]}
        for p in parts
        if p["file_count"] > 1 and p["avg_file_bytes"] < SMALL_FILE_BYTES
    ]
    skew = [
        {"bucket": p["bucket"], "row_count": p["row_count"],
         "skew_bp": p["row_count"] * 10000 // max(1, mean_rows)}
        for p in parts
        if mean_rows and p["row_count"] * 10000 // mean_rows >= SKEW_WARN_BP
    ]
    out = {
        "buckets": len(parts),
        "mean_rows_per_bucket": mean_rows,
        "small_file_buckets": sorted(small, key=lambda x: x["bucket"]),
        "skewed_buckets": sorted(skew, key=lambda x: -x["skew_bp"]),
        "max_skew_bp": max(
            (p["row_count"] * 10000 // max(1, mean_rows) for p in parts),
            default=0,
        ),
    }
    snap = table.current()
    scols = table._stats_cols(snap)
    if scols:
        # data-skipping coverage: share of live files carrying bounds per
        # stats column — low coverage means range slices stop pruning
        # (files without bounds are never skipped) until a compaction or
        # the per-commit backfill catches the stragglers
        live = len(snap.all_files())
        out["stats_coverage"] = {
            c: {
                "files_with_bounds": len(snap.col_stats.get(c, {})),
                "live_files": live,
                "coverage_bp": (
                    len(snap.col_stats.get(c, {})) * 10000 // max(1, live)
                ),
            }
            for c in scols
        }
    if any(f.name == "_col_lsn" for f in snap.schema.fields):
        # partial-update fold pressure (manifest-only, zero scan): share
        # of live files PROVEN map-free decides which merges take the
        # classic plan vs the column-level fold (BENCH/patch.json prices
        # the difference); buckets holding live maps are the ones whose
        # dirty batches still fold — the table decays back to classic as
        # full events overwrite patched keys and rewrites re-prove files
        live_all = snap.all_files()
        free = [f for f in live_all if snap.map_stats.get(f, False)]
        map_buckets = sorted(
            int(b) for b, fl in snap.files.items()
            if any(not snap.map_stats.get(f, False) for f in fl)
        )
        out["patch_fold"] = {
            "live_files": len(live_all),
            "map_free_files": len(free),
            "map_free_bp": len(free) * 10000 // max(1, len(live_all)),
            "map_bearing_buckets": map_buckets,
        }
    return out


def maintenance_pressure(spark: SparkSession, table_path: str) -> dict:
    """What the table's own maintenance policy would do right now — the
    manifest-only ``plan_maintenance`` dry-run (zero footers, zero data),
    plus the purge backlog: outstanding equality-delete entries are purges
    awaiting physical materialization (an auditor's first question)."""
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.maintenance import (
        plan_maintenance,
    )

    table = LakeTable.load(spark, table_path)
    snap = table.current()
    plan = plan_maintenance(table)
    return {
        "compact_buckets": plan["compact_buckets"],
        "reasons": plan["reasons"],
        "pending_purges": len(snap.eq_deletes),
        "pending_position_delete_files": sum(
            len(fl) for fl in snap.delete_files.values()
        ),
        # the TTL-policy preview (None when no retention.ttl-* property):
        # files the next maintain would drop + buckets it would rewrite
        "ttl": plan["ttl"],
        "status": (
            "PENDING_WORK"
            if plan["compact_buckets"]
            or (plan["ttl"] or {}).get("files_droppable")
            or (plan["ttl"] or {}).get("straddling_buckets")
            else "HEALTHY"
        ),
    }


def render_html(report: dict, title: str = "pipeline monitor") -> str:
    """Self-contained static HTML report (S11 publish shape)."""
    fresh = report["freshness"]
    vol = report["volume"]
    err = report["errors"]
    rows = "".join(
        f"<tr><td>{a['batch_id']}</td><td>{a['batch_events']}</td>"
        f"<td>{a['dev_bp']}</td></tr>"
        for a in vol["anomalous_batches"]
    ) or "<tr><td colspan=3>none</td></tr>"
    tp = report["throughput"]
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
td,th{{border:1px solid #999;padding:4px 10px}}.ok{{color:#070}}.bad{{color:#b00}}
</style></head><body>
<h1>{html.escape(title)}</h1>
<h2>Freshness: <span class="{'ok' if fresh['status'] == 'FRESH' else 'bad'}">
{html.escape(str(fresh['status']))}</span></h2>
<p>last batch {fresh['last_batch_id']} · LSN high-water {fresh['lsn_high_water']}
· staleness {fresh['staleness_sec']} s · committed {fresh['last_committed_at']}</p>
<h2>Throughput</h2>
<p>{tp['events_in']} events in {tp['wall_ms']} ms
({tp['events_per_sec']:.1f} events/s)</p>
<h2>Volume anomalies ({vol['anomaly_count']} of {vol['n_batches']} batches)</h2>
<table><tr><th>batch</th><th>events</th><th>deviation (bp)</th></tr>{rows}</table>
<h2>Errors</h2>
<p>{err['rows_quarantined']} quarantined rows ({err['error_bp']} bp)</p>
<h2>Maintenance: <span class="{
    'ok' if report['maintenance']['status'] == 'HEALTHY' else 'bad'}">
{html.escape(str(report['maintenance']['status']))}</span></h2>
<p>{len(report['maintenance']['compact_buckets'])} buckets flagged for
compaction · {report['maintenance']['pending_purges']} purges and
{report['maintenance']['pending_position_delete_files']} position-delete
files awaiting materialization</p>
{_render_fanin(report.get('fanin'))}</body></html>
"""


def _render_fanin(fan: dict | None) -> str:
    if not fan:
        return ""
    rows = "".join(
        f"<tr><td>{html.escape(s)}</td><td>{v['fence_batch_id']}</td>"
        f"<td>{v['next_chunk']}</td></tr>"
        for s, v in fan["sources"].items()
    )
    cls = "ok" if fan["status"] == "BALANCED" else "bad"
    return (
        f'<h2>Fan-in sources: <span class="{cls}">'
        f"{html.escape(str(fan['status']))}</span>"
        f" (batch lag {fan['batch_lag']})</h2>"
        f"<table><tr><th>source</th><th>fence batch</th>"
        f"<th>next chunk</th></tr>{rows}</table>"
    )


def publish_report(
    spark: SparkSession,
    table_path: str,
    out_dir: str,
    as_of_sec: float | None = None,
) -> dict:
    """``edr send-report`` analogue: write ``report.html`` + ``report.json``
    to ``out_dir`` (the public-bucket stand-in) and return the report dict."""
    report = monitor(spark, table_path, as_of_sec)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    with open(os.path.join(out_dir, "report.html"), "w") as f:
        f.write(render_html(report, title=os.path.basename(table_path) or "table"))
    return report
