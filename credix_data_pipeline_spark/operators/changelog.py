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

from types import SimpleNamespace

from pyspark.sql import DataFrame, functions as F, types as T

from credix_data_pipeline_spark.lakehouse.table import (
    LakeTable,
    Snapshot,
    _project_dir,
    default_expr,
)

CHANGE_COL = "_change_type"


def _live_state(table: LakeTable, snap: Snapshot, buckets: list[int],
                s_to: Snapshot, keep_tombstones: bool = False) -> DataFrame:
    """Rows of ``snap`` restricted to ``buckets``, aligned to the TO
    snapshot's schema, with a ``_del`` marker.  Tombstones are dropped
    unless ``keep_tombstones`` (the after-image delete path needs them:
    the tombstone row carries the DELETING event's ``_lsn``).

    Alignment across a DDL boundary is BY FIELD ID — the same projection
    rule as the table's own evolution reads: a renamed column's before-
    image carries its old data under the new name, a widened column casts,
    and added/dropped ids read as typed NULL (including nested struct
    fields, whose dotted ids project field-by-field).  Positionally-
    backfilled legacy ids are not comparable across snapshots (an add
    shifts positions), so legacy pairs keep the by-name alignment."""
    # one CURRENT version per key under the snapshot's merge mode (CoW
    # plain read / MoR position-delete anti-join / legacy MoR LWW collapse)
    df = table.current_versions(snap=snap, buckets=buckets)
    flag = (
        F.coalesce(F.col("_deleted"), F.lit(False))
        if "_deleted" in df.columns
        else F.lit(False)
    )
    df = df.withColumn("_del", flag)
    if not keep_tombstones:
        df = df.filter(~F.col("_del"))
    out_fields = [
        f for f in s_to.schema.fields
        if f.name not in ("_deleted", "_seq", "_col_lsn")
    ]
    if (
        snap.snapshot_id != s_to.snapshot_id
        and snap.schema != s_to.schema
        and not (snap.ids_backfilled or s_to.ids_backfilled)
    ):
        dinfo = {
            "schema": snap.schema.jsonValue(),
            "ids": dict(snap.column_ids),
        }
        shim = SimpleNamespace(
            schema=T.StructType(out_fields),
            column_ids=s_to.column_ids,
            column_defaults=s_to.column_defaults,
        )
        return _project_dir(df, shim, dinfo)  # `_del` passes through
    have = set(df.columns)
    # columns added between the endpoints align to the TO-snapshot's
    # DEFAULT (else NULL): the live read of those same physical rows gives
    # the default, so a NULL before-image would fabricate an update pair
    # for every pre-add row — O(table) spurious relay churn
    aligned = [
        F.col(f.name) if f.name in have
        else default_expr(s_to, f.name).alias(f.name)
        for f in out_fields
    ]
    return df.select(*aligned, F.col("_del"))


def read_changes(
    table: LakeTable,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    delete_images: str = "before",
) -> DataFrame:
    """Net row-level changes between two snapshots (CDF envelope).

    Returns the TO-snapshot data columns (sans bookkeeping ``_deleted``)
    plus ``_change_type``: before-images for ``update_before``/``delete``,
    after-images for ``insert``/``update_after``.

    ``delete_images="after"``: a key live-before and TOMBSTONED-after emits
    ``delete`` with the stored tombstone's image instead of the before-image
    — payload NULLs but the DELETING event's ``_lsn``, which is what a relay
    needs so downstream LWW re-derives the same winner (the before-image's
    older ``_lsn`` would lose the downstream tie).  A tombstone physically
    expired between the endpoints still falls back to the before-image.
    """
    if delete_images not in ("before", "after"):
        raise ValueError(f"delete_images must be before|after, got "
                         f"{delete_images!r}")
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

    # `_col_lsn` (the partial-update per-column version map) is writer-side
    # bookkeeping like `_seq`: it never leaves the table — and a MAP is not
    # comparable, so it must not enter the change-detection struct either.
    # Downstream consumers receive FOLDED full rows; a map-only difference
    # is by construction value-identical and correctly emits nothing.
    out_fields = [
        f for f in s_to.schema.fields
        if f.name not in ("_deleted", "_seq", "_col_lsn")
    ]
    out_cols = [f.name for f in out_fields]
    key = s_to.key
    payload = [c for c in out_cols if c not in key]

    # Immutable data files ⇒ identical per-bucket file lists ⇒ no change.
    # Equality-delete commits change NO files (the purge is pure metadata +
    # one key file), so buckets covered by entries new in the TO snapshot
    # are dirty too — that is how a purge reaches downstream consumers as
    # delete events.  Position-delete lists are diffed for the same reason.
    from_eq = {tuple(e["paths"]) for e in s_from.eq_deletes}
    new_eq_buckets = {
        int(b)
        for e in s_to.eq_deletes
        if tuple(e["paths"]) not in from_eq
        for b in e["buckets"]
    }
    dirty = sorted(
        {
            int(b)
            for b in set(s_from.files) | set(s_to.files)
            if s_from.files.get(b) != s_to.files.get(b)
        }
        | {
            int(b)
            for b in set(s_from.delete_files) | set(s_to.delete_files)
            if s_from.delete_files.get(b) != s_to.delete_files.get(b)
        }
        | new_eq_buckets
    )
    if s_from.snapshot_id == s_to.snapshot_id or not dirty:
        empty = table.spark.createDataFrame([], s_to.schema)
        return empty.select(*out_cols).withColumn(CHANGE_COL, F.lit(""))

    old = _live_state(table, s_from, dirty, s_to)
    new = _live_state(
        table, s_to, dirty, s_to,
        keep_tombstones=(delete_images == "after"),
    )

    o = old.select(
        *key, F.struct(*[F.col(c) for c in payload]).alias("_op"),
        F.lit(True).alias("_oh"),
    )
    n = new.select(
        *key, F.struct(*[F.col(c) for c in payload]).alias("_np"),
        F.lit(True).alias("_nh"), F.col("_del").alias("_ndel"),
    )
    j = o.join(n, on=key, how="full_outer")

    def img(side: str, tag: str):
        return F.struct(
            *[F.col(f"{side}.{c}").alias(c) for c in payload],
            F.lit(tag).alias(CHANGE_COL),
        )

    ndel = F.coalesce(F.col("_ndel"), F.lit(False))
    changes = (
        F.when(F.col("_oh").isNull() & ~ndel, F.array(img("_np", "insert")))
        # never-visible key (tombstone only): nothing to emit
        .when(F.col("_oh").isNull(), F.slice(F.array(img("_np", "")), 1, 0))
        .when(F.col("_nh").isNull(), F.array(img("_op", "delete")))
        .when(ndel, F.array(img("_np", "delete")))  # after-image tombstone
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
