"""Snapshot-diff changelog scan: the Iceberg "changelog table" / Delta
Change-Data-Feed analogue for downstream incremental consumers.

``read_changes(table, from_id, to_id)`` returns the NET row-level changes
between two committed snapshots as a DataFrame of row images tagged with
``_change_type`` in {insert, update_before, update_after, delete} — the
standard CDF envelope, so a consumer can maintain its own copy (or a
downstream aggregate) without re-reading the table.

Reference parity: the reference's downstream marts re-derive from the full
silver tables every run (dbt ``table``-materialized gold models,
dbt/business_case/models/gold/payment_analytics_obt.sql); a changelog scan
is what lets that become incremental at 10^10 rows.

Scale posture — O(dirty data), never O(table):

* The two manifests are diffed per bucket; a bucket whose file list is
  byte-identical between the snapshots cannot have changed (data files are
  immutable) and is never read.  A micro-batch that touched 3 of 64 buckets
  yields a changelog scan that reads 3 buckets at two versions.
* Within dirty buckets the before/after states join on the table key —
  a co-partitioned equi-join (both sides are bucketed by the same hash),
  classified in ONE pass via an exploded change array (no triple-scan of
  the join output).
* Works on both merge modes: CoW states are plain reads; MoR states LWW-
  collapse first (same ``max_by`` hash-agg as the read path), so the diff
  sees row versions, not delta fragments.

Semantics notes:

* NET changes between the endpoints (Iceberg ``net_changes=true``): a key
  inserted then deleted between the snapshots emits nothing; per-commit
  attribution would need one diff per manifest step (compose this function
  over ``table.history()`` for that).
* Both row images are aligned to the TO-snapshot schema, so a column added
  in-flight between the endpoints reads as NULL in before-images — the
  same alignment rule as the table's own evolution reads.
* The comparison covers every non-key data column including ``_lsn``: two
  states holding the same logical payload from a different winning event
  are a real update (the stored row changed), mirroring what a physical
  CDF would emit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credix_data_pipeline_spark.lakehouse.table import LakeTable, Snapshot

CHANGE_COL = "_change_type"


def _live_state(table: LakeTable, snap: Snapshot, buckets: list[int],
                target_schema) -> DataFrame:
    """Live rows (tombstones dropped) of ``snap`` restricted to ``buckets``,
    aligned to ``target_schema``'s columns (missing → typed NULL)."""
    df = table.read(snapshot_id=snap.snapshot_id, buckets=buckets)
    if snap.merge_mode == "mor":
        cols = [f.name for f in snap.schema.fields]
        row = F.struct(*[F.col(c) for c in cols])
        order = (
            F.struct(F.col("_lsn"), F.coalesce(F.col("_seq"), F.lit(-1)))
            if "_seq" in cols
            else F.col("_lsn")
        )
        df = (
            df.groupBy(*[F.col(k) for k in snap.key])
            .agg(F.max_by(row, order).alias("_w"))
            .select("_w.*")
        )
    if "_deleted" in df.columns:
        df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    have = set(df.columns)
    aligned = [
        F.col(f.name) if f.name in have
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in target_schema.fields
        if f.name not in ("_deleted", "_seq")
    ]
    return df.select(*aligned)


def read_changes(
    table: LakeTable,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Net row-level changes between two snapshots (CDF envelope).

    Returns the TO-snapshot data columns (sans bookkeeping ``_deleted``)
    plus ``_change_type``: before-images for ``update_before``/``delete``,
    after-images for ``insert``/``update_after``.
    """
    s_from = table.snapshot(from_snapshot_id)
    s_to = (
        table.snapshot(to_snapshot_id)
        if to_snapshot_id is not None
        else table.current()
    )
    if s_from.version > s_to.version:
        raise ValueError(
            f"from-snapshot v{s_from.version} is newer than to-snapshot "
            f"v{s_to.version}; changelog reads go forward in history"
        )

    out_fields = [
        f for f in s_to.schema.fields if f.name not in ("_deleted", "_seq")
    ]
    out_cols = [f.name for f in out_fields]
    key = s_to.key
    payload = [c for c in out_cols if c not in key]

    # Immutable data files ⇒ identical per-bucket file lists ⇒ no change.
    dirty = sorted(
        int(b)
        for b in set(s_from.files) | set(s_to.files)
        if s_from.files.get(b) != s_to.files.get(b)
    )
    if s_from.snapshot_id == s_to.snapshot_id or not dirty:
        empty = table.spark.createDataFrame([], s_to.schema)
        return empty.select(*out_cols).withColumn(CHANGE_COL, F.lit(""))

    old = _live_state(table, s_from, dirty, s_to.schema)
    new = _live_state(table, s_to, dirty, s_to.schema)

    o = old.select(
        *key, F.struct(*[F.col(c) for c in payload]).alias("_op"),
        F.lit(True).alias("_oh"),
    )
    n = new.select(
        *key, F.struct(*[F.col(c) for c in payload]).alias("_np"),
        F.lit(True).alias("_nh"),
    )
    j = o.join(n, on=key, how="full_outer")

    def img(side: str, tag: str):
        return F.struct(
            *[F.col(f"{side}.{c}").alias(c) for c in payload],
            F.lit(tag).alias(CHANGE_COL),
        )

    changes = (
        F.when(F.col("_oh").isNull(), F.array(img("_np", "insert")))
        .when(F.col("_nh").isNull(), F.array(img("_op", "delete")))
        .when(
            ~F.col("_op").eqNullSafe(F.col("_np")),
            F.array(img("_op", "update_before"), img("_np", "update_after")),
        )
        # unchanged key: empty array of the branch element type (slice keeps
        # the struct type without inventing a parallel cast expression)
        .otherwise(F.slice(F.array(img("_np", "")), 1, 0))
    )
    exploded = j.select(*key, F.explode(changes).alias("_c"))
    return exploded.select(*key, *[F.col(f"_c.{c}") for c in payload],
                           F.col(f"_c.{CHANGE_COL}"))
