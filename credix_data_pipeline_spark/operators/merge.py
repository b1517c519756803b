"""General conditional MERGE INTO (the Delta/Iceberg ``MERGE`` statement).

The engine's CDC replay is a SPECIALIZED merge (LWW by source LSN over a
change feed, fenced per batch).  ``merge_into`` is the complementary
USER-INITIATED mutation — the ad-hoc ``MERGE INTO t USING s ON t.key =
s.key WHEN MATCHED [AND cond] THEN UPDATE SET … / DELETE WHEN NOT MATCHED
THEN INSERT …`` a warehouse operator runs for corrections, backfills, and
dimension maintenance — compiled onto the same lakehouse primitives:

* the table key IS the join condition (the engine's tables are keyed);
  the source must be key-unique — multiple source matches for one target
  row are REFUSED, mirroring Delta's multiple-matches error, because
  "last writer wins among my own batch" is not a meaning a correction
  should silently have.
* O(dirty buckets), never O(table): source keys hash to their buckets,
  only those buckets are read (``current_versions`` — one live row per
  key under any merge mode) and copy-on-write replaced; untouched
  buckets keep their files byte-identical.
* a deleted key writes the engine's usual TOMBSTONE row (payload nulled,
  ``_deleted=true``), so a straggling lower-LSN feed event cannot
  resurrect it; an insert onto a tombstoned key revives it.
* changed rows mint ``max(_lsn over dirty buckets) + 1`` — per-key LWW
  only ever compares versions of the SAME key, so one minted LSN above
  everything the merge read keeps feed-vs-merge arbitration exact.
* the commit pins ``base=`` (the snapshot the merge read) so a concurrent
  writer landing mid-merge surfaces as ``CommitConflict`` (the Iceberg
  validation rule), carries the exactly-once fence (a later replay resumes
  the feed exactly where it was), and flows through changelog/relay like
  any other commit.
* table CHECK constraints (``contracts.check.*``) bind this writer too:
  any post-image row a constraint rejects REFUSES the merge whole
  (``ContractViolation``) — an interactive correction has a human to fix
  it, so refuse-whole beats dead-lettering a partial mutation.

Expressions in ``when_matched_update`` / ``when_matched_delete`` /
``when_not_matched_insert`` are SQL strings over two row namespaces:
``t.<col>`` (the current target row) and ``s.<col>`` (the source row).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.table import default_expr
from credix_data_pipeline_spark.operators.apply import (
    ContractViolation,
    table_checks,
)
from credix_data_pipeline_spark.schema import ENGINE_COLS


def merge_into(
    table: LakeTable,
    source: DataFrame,
    *,
    when_matched_update: dict[str, str] | None = None,
    when_matched_delete: str | None = None,
    when_not_matched_insert: bool | dict[str, str] = True,
    collect_stats: bool = True,
) -> dict[str, Any]:
    """Run a conditional MERGE of ``source`` into ``table`` on the table
    key.  Returns a summary dict (rows inserted/updated/deleted, buckets
    touched, snapshot id) — ``{"noop": True}`` when nothing changed."""
    snap = table.current()
    key = list(snap.key)
    if not (when_matched_update or when_matched_delete
            or when_not_matched_insert):
        raise ValueError("merge_into needs at least one WHEN clause")
    missing = [k for k in key if k not in source.columns]
    if missing:
        raise ValueError(f"source lacks table key column(s) {missing}")

    payload_cols = [
        f.name for f in snap.schema.fields if f.name not in ENGINE_COLS
    ]
    upd = dict(when_matched_update or {})
    ins = (
        {c: f"s.{c}" for c in payload_cols
         if c in source.columns and c not in key}
        if when_not_matched_insert is True
        else dict(when_not_matched_insert or {})
    )
    for clause, d in (("update", upd), ("insert", ins)):
        unknown = [c for c in d if c not in payload_cols or c in key]
        if unknown:
            raise ValueError(
                f"{clause} clause targets non-payload column(s) {unknown}"
            )

    field_names = {f.name for f in snap.schema.fields}
    if when_matched_delete and "_deleted" not in field_names:
        raise ValueError(
            "when_matched_delete needs a table with a `_deleted` tombstone "
            "column (CDC-replay tables have one); for plain tables use "
            "delete_keys (an equality-delete purge) instead"
        )

    src = source.select(
        *[F.col(k).cast(snap.schema[k].dataType) for k in key],
        *[c for c in source.columns if c not in key],
    )
    # one probe job answers BOTH structural refusals: key-ambiguity
    # (Delta's multiple-matches rule) and NULL keys (keyed tables never
    # hold null keys — a NULL-key row would never match the join, insert
    # as an unfindable ghost, and collapse with every other NULL key
    # under LWW: silent corruption where every other write path refuses)
    nullk = None
    for k in key:
        c = F.col(k).isNull()
        nullk = c if nullk is None else (nullk | c)
    bad_key = (
        src.groupBy(*key).agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) | nullk).limit(1).collect()
    )
    if bad_key:
        if any(bad_key[0][k] is None for k in key):
            raise ValueError(
                "source has a NULL key column value — keyed tables never "
                "hold null keys; repair or filter the source first"
            )
        raise ValueError(
            "source has multiple rows for one key — an ambiguous merge "
            "(Delta's multiple-matches rule); de-duplicate the source first"
        )

    bexpr = table.bucket_expr(snap)
    dirty = sorted(
        r["_b"]
        for r in src.select(bexpr.alias("_b")).distinct().collect()
    )
    if not dirty:
        return {"noop": True}

    tgt = table.current_versions(snap=snap, buckets=dirty)
    if "_deleted" not in tgt.columns:
        tgt = tgt.withColumn("_deleted", F.lit(False))
    # plain tables (created outside the CDC path) carry no _lsn: there is
    # no feed arbitration to stay above, so no LSN to mint
    new_lsn = (
        (tgt.agg(F.max("_lsn").alias("m")).collect()[0]["m"] or 0) + 1
        if "_lsn" in field_names
        else None
    )

    t = tgt.withColumn("_t_present", F.lit(True)).alias("t")
    s = src.withColumn("_s_present", F.lit(True)).alias("s")
    cond = None
    for k in key:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    j = t.join(s, cond, "full_outer")

    live = F.coalesce(F.col("t._t_present"), F.lit(False)) & ~F.coalesce(
        F.col("t._deleted"), F.lit(False)
    )
    has_src = F.coalesce(F.col("s._s_present"), F.lit(False))
    action = (
        F.when(
            live & has_src & (
                F.expr(when_matched_delete)
                if when_matched_delete
                else F.lit(False)
            ),
            F.lit("D"),
        )
        .when(live & has_src & F.lit(bool(upd)), F.lit("U"))
        .when(~live & has_src & F.lit(bool(ins)), F.lit("I"))
        .when(F.coalesce(F.col("t._t_present"), F.lit(False)), F.lit("K"))
        .otherwise(F.lit(None))  # unmatched source row, no insert clause
    )
    j = j.withColumn("_action", action).filter(F.col("_action").isNotNull())

    def out_col(c):
        dt = snap.schema[c].dataType
        if c in key:
            return F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c)
        u = F.expr(upd[c]) if c in upd else F.col(f"t.{c}")
        # an INSERT with no value for the column takes the declared
        # DEFAULT (the Delta/Iceberg INSERT-default rule), else NULL
        i = F.expr(ins[c]) if c in ins else default_expr(snap, c)
        return (
            F.when(F.col("_action") == "U", u.cast(dt))
            .when(F.col("_action") == "I", i.cast(dt))
            .when(F.col("_action") == "D", F.lit(None).cast(dt))
            .otherwise(F.col(f"t.{c}"))  # K: carried verbatim
            .alias(c)
        )

    engine_exprs = []
    for c in ENGINE_COLS:
        if c not in {f.name for f in snap.schema.fields}:
            continue
        if c == "_lsn":
            e = F.when(
                F.col("_action") == "K", F.col("t._lsn")
            ).otherwise(F.lit(new_lsn))
        elif c == "_deleted":
            e = F.when(F.col("_action") == "K", F.col("t._deleted")).otherwise(
                F.col("_action") == "D"
            )
        else:  # _seq residue on legacy-MoR tables: internal, reset
            e = F.when(F.col("_action") == "K", F.col(f"t.{c}")).otherwise(
                F.lit(None).cast(snap.schema[c].dataType)
            )
        engine_exprs.append(e.alias(c))

    out = j.select(
        *[out_col(c) for c in payload_cols], *engine_exprs, "_action"
    )

    checks = table_checks(snap)
    # the merge plan (bucket-pruned scan + full-outer join) is consumed up
    # to three times — counts, check probe, the write itself; persist once
    # instead of recomputing the dominant join per consumer
    multi_use = collect_stats or bool(checks)
    if multi_use:
        out = out.persist()
    try:
        return _merge_commit(
            table, snap, dirty, out, checks, new_lsn, collect_stats
        )
    finally:
        if multi_use:
            out.unpersist()


def _merge_commit(table, snap, dirty, out, checks, new_lsn, collect_stats):
    counts = {r["_action"]: r["n"] for r in (
        out.groupBy("_action").agg(F.count(F.lit(1)).alias("n")).collect()
    )} if collect_stats else {}
    if collect_stats and not (
        counts.get("U") or counts.get("D") or counts.get("I")
    ):
        return {"noop": True, "buckets": dirty}

    if checks:
        bad = F.lit(False)
        for name, expr_s in checks:
            ok = F.coalesce(F.expr(expr_s), F.lit(False))
            bad = bad | ~ok
        # the post-image: new/updated live rows only — deletes and carried
        # rows were either validated when written or have no payload
        n_bad = (
            out.filter(F.col("_action").isin("U", "I"))
            .filter(bad)
            .limit(1)
            .count()
        )
        if n_bad:
            # refuse WHOLE: an interactive correction has a human to fix it
            raise ContractViolation(
                -1, {"violations": {"merge_into_check_constraints": n_bad}}
            )

    new_snap = table.replace_buckets(
        dirty,
        out.drop("_action"),
        base=snap,
        summary={
            **table.carry_fence(),
            "operation": "merge-into",
            "merge_inserted": counts.get("I", None),
            "merge_updated": counts.get("U", None),
            "merge_deleted": counts.get("D", None),
        },
    )
    return {
        "snapshot_id": new_snap.snapshot_id,
        "buckets": dirty,
        "inserted": counts.get("I", 0),
        "updated": counts.get("U", 0),
        "deleted": counts.get("D", 0),
        "minted_lsn": new_lsn,
    }
