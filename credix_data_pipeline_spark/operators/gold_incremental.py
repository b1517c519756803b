"""Incremental gold materialization (SURVEY §3.2 / A10 + J3 at the gold
layer).

The reference has TWO incremental gold models: the aggregate-grain
``company_payment_summary`` and the fact-grain ``payment_analytics_detailed``
(each run processes only source rows past the stored high-water,
``where _loaded_at > (select max(_loaded_at) from {{this}})``,
dbt/business_case/models/gold/payment_analytics_detailed.sql:39-41, and
MERGEs them on the model's unique key).  This module maintains the engine
equivalents of both from the transcripts LakeTable:

* ``refresh_conversation_summary`` — per-conversation aggregate (the
  company_payment_summary analogue);
* ``refresh_turn_analytics`` — per-turn detail keyed on the fact's
  composite key (the payment_analytics_detailed analogue; a deleted turn's
  gold row disappears, the MERGE-DELETE arm).

Shared mechanics (``_refresh``):

* **delta detection** — transcripts rows with ``_lsn`` greater than the
  high-water stored in the gold table's own snapshot summary (no extra
  state store; the fence rides the atomic commit, like the apply core);
* **scoped recompute** — only scope keys touched by the delta are
  re-derived, and because ``conv_id`` is the bucket key on BOTH tables
  (same bucket function, same bucket count — enforced) the source read,
  the gold read, and the gold rewrite all prune to the delta's buckets —
  O(dirty), not O(table), end to end;
* **apply** — per-bucket copy-on-write: untouched keys' gold rows are
  carried over, touched keys get freshly derived rows.

A refresh after no source changes is a no-op (P8 short-circuit): no new
snapshot is committed.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from credix_data_pipeline_spark.lakehouse.table import LakeTable
from credix_data_pipeline_spark.operators.apply import read_current
from credix_data_pipeline_spark.plans.gold import (
    conversation_summary,
    turn_analytics,
)


def _clean(df: DataFrame) -> DataFrame:
    return df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))


def _gold_highwater(gold: LakeTable) -> tuple[int, int | None]:
    """(lsn high-water, source snapshot id) from the newest gold commit that
    recorded them.  The snapshot id enables metadata-only delta discovery;
    older gold tables without it fall back to the scan path."""
    for snap in reversed(gold.history()):
        if "source_lsn_hw" in snap.summary:
            v = snap.summary["source_lsn_hw"]
            # a rollback commit declares a null high-water (fence reset)
            if v is None:
                return -1, None
            return int(v), snap.summary.get("source_snapshot_id")
    return -1, None


def _refresh(
    src: LakeTable,
    gold_path: str,
    plan: Callable[[DataFrame], DataFrame],
    scope_cols: list[str],
    gold_key: list[str],
    count_key: str,
) -> dict:
    spark = src.spark
    snap = src.current()
    # buckets=[] derives the gold schema from the table schema alone — an
    # empty DataFrame with zero files planned (no scan, even a limit-0 one)
    gold_schema = plan(_clean(src.read(buckets=[]))).schema
    gold = LakeTable.create_if_not_exists(
        spark,
        gold_path,
        gold_schema,
        key=gold_key,
        num_buckets=snap.num_buckets,
        bucket_by=["conv_id"],
    )
    gsnap = gold.current()
    if (
        gsnap.num_buckets != snap.num_buckets
        or gsnap.bucket_by != snap.bucket_by
        or snap.bucket_by != ["conv_id"]
    ):
        # A pre-existing gold table with a different bucket layout would make
        # the per-bucket CoW swap (keyed by the SOURCE bucket function) drop
        # or duplicate gold rows — fail loudly instead (ADVICE r2).
        raise ValueError(
            "gold table bucket layout mismatch: source has "
            f"{snap.num_buckets} buckets by {snap.bucket_by}, gold has "
            f"{gsnap.num_buckets} by {gsnap.bucket_by}; recreate the gold "
            "table with the source's bucket spec"
        )

    hw, src_sid = _gold_highwater(gold)

    # Delta-bucket discovery.  Preferred path: METADATA-ONLY — diff the
    # source's per-bucket file lists between the snapshot the gold table
    # last saw and now (immutable files ⇒ identical lists = untouched
    # bucket).  O(changed buckets) with zero data/footer reads, where the
    # scan path is O(table files) just to find the delta at 100 TB.  Falls
    # back to the scan when the gold predates the snapshot-id summary or
    # the source snapshot was expired by retention.
    scan_buckets: list[int] | None = None  # None = all buckets
    seen = None
    if src_sid is not None:
        try:
            seen = src.snapshot(src_sid)
        except KeyError:
            seen = None
    # Equality-delete commits change NO files, so the manifest diff alone
    # would miss a purge: entries new since the last-seen snapshot mark
    # their buckets dirty and their keys must drop from gold.  With no
    # last-seen snapshot (first refresh / expired), ALL outstanding entries
    # are considered — re-dropping an absent gold row is a no-op.
    seen_eq = (
        {tuple(e["paths"]) for e in seen.eq_deletes}
        if seen is not None
        else set()
    )
    new_eq = [
        e for e in snap.eq_deletes if tuple(e["paths"]) not in seen_eq
    ]
    eq_buckets = {int(b) for e in new_eq for b in e["buckets"]}
    if seen is not None:
        scan_buckets = sorted(
            int(b)
            for b in set(seen.files) | set(snap.files)
            if seen.files.get(b) != snap.files.get(b)
        )
        if not scan_buckets and not new_eq:
            return {
                count_key: 0,
                "dirty_buckets": [],
                "source_lsn_hw": hw,
                "skipped": True,
            }

    # lsn_above: manifest file-stats pruning — cold files inside a changed
    # bucket (e.g. the bucket's pre-existing data next to one new delta
    # file) plan zero scan tasks; the row filter stays for exactness
    delta = src.read(buckets=scan_buckets, lsn_above=hw).filter(
        F.col("_lsn") > F.lit(hw)
    )

    # One small driver-side profile (≤ num_buckets + 1 rows): the delta's
    # bucket set (the pruning key for every subsequent step) + new high-water.
    prof = (
        delta.groupBy(src.bucket_expr(snap).alias("_b"))
        .agg(F.max("_lsn").alias("hi"))
        .collect()
    )
    if not prof and not new_eq:
        return {
            count_key: 0,
            "dirty_buckets": [],
            "source_lsn_hw": hw,
            "skipped": True,
        }
    dirty = sorted({r["_b"] for r in prof} | eq_buckets)
    new_hw = max((r["hi"] for r in prof), default=hw)

    # Join strategy left to AQE: a small delta's key list broadcasts, a
    # backfill-sized one becomes a shuffle semi-join — both keyed, never
    # a cartesian.  ``touched`` includes tombstoned keys, so a delete drops
    # the key's gold row (it is absent from the clean recompute).
    touched = delta.select(*scope_cols).distinct()
    # read_current: on a merge-on-read source, collapse delta versions to
    # the LWW winner before deriving (a CoW source reads through as-is)
    affected = _clean(read_current(src, buckets=dirty)).join(
        touched, scope_cols, "semi"
    )
    new_rows = plan(affected)

    carried = gold.read(buckets=dirty).join(touched, scope_cols, "anti")
    # purged keys produce NO delta rows (the purge is pure metadata), so
    # their gold rows are dropped by an anti-join per entry — enforceable
    # only when the purge key is expressible in the gold schema
    gold_cols = {f.name for f in gold_schema.fields}
    for e in new_eq:
        pk = src.eq_entry_keys(e, snap=snap)
        if not set(pk.columns) <= gold_cols:
            raise ValueError(
                f"source purge on {sorted(pk.columns)} cannot be applied "
                f"to gold columns {sorted(gold_cols)}; recreate the gold "
                "table (full refresh) to converge"
            )
        carried = carried.join(pk, on=list(pk.columns), how="anti")
    out = carried.unionByName(new_rows)
    gold.replace_buckets(
        dirty,
        out,
        summary={
            "source_lsn_hw": int(new_hw),
            # pins the source snapshot this refresh saw: the next refresh
            # discovers its delta buckets by manifest diff (metadata-only)
            "source_snapshot_id": snap.snapshot_id,
            "operation": "gold-refresh",
        },
    )
    n = touched.count()
    return {
        count_key: n,
        "dirty_buckets": dirty,
        "source_lsn_hw": int(new_hw),
        "skipped": False,
    }


def refresh_conversation_summary(src: LakeTable, gold_path: str) -> dict:
    """Incrementally refresh the per-conversation gold summary table."""
    return _refresh(
        src,
        gold_path,
        conversation_summary,
        scope_cols=["conv_id"],
        gold_key=["conv_id"],
        count_key="refreshed_conversations",
    )


def refresh_turn_analytics(src: LakeTable, gold_path: str) -> dict:
    """Incrementally refresh the per-turn gold analytics table (fact grain,
    MERGE on the composite key — payment_analytics_detailed analogue)."""
    return _refresh(
        src,
        gold_path,
        turn_analytics,
        scope_cols=["conv_id", "turn_idx"],
        gold_key=["conv_id", "turn_idx"],
        count_key="refreshed_turns",
    )
