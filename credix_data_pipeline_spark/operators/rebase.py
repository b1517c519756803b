"""Branch rebase — the recovery path after ``fast_forward`` refuses a moved
main (the ancestor rule's ``CommitConflict``).

``rebase_branch`` extracts the branch's own net data changes (changelog from
its fork commit to its head, delete after-images so downstream LWW re-derives
the same winners — the relay rule), recreates the branch from main's CURRENT
head, and replays those changes into it through the normal MERGE core.
Conflicting keys (touched on both sides since the fork) resolve by LWW on
``_lsn`` — the engine's one arbitration rule, applied here as merge
semantics (Nessie's content-aware merge with a last-writer policy).

Refusals, loud and early:
* a branch that performed DDL (rename/drop/widen) since the fork — a data
  replay cannot carry metadata changes; re-apply the DDL after rebasing
  (column ADDS are fine: in-flight evolution re-adds them);
* fan-in tables (per-source fences need per-shard replays, not one batch);
* a branch whose fork (clone) commit was retention-expired — the change
  span is gone (never silently diff against a later snapshot: the ADVICE-r4
  relay bootstrap rule).

The change set is SPILLED to a temp parquet under the table root before the
old branch is dropped (the lazy DataFrame would otherwise read files the
drop deletes), then applied with one fenced batch.  Cost: one write + one
merge over the branch's own delta — never the table.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import _fence_state, apply_batch
from credix_data_pipeline_spark.operators.changelog import read_changes
from credix_data_pipeline_spark.operators.relay import schema_ddl


def rebase_branch(table: LakeTable, name: str) -> LakeTable:
    """Recreate branch ``name`` from the table's current head, replaying the
    branch's unpublished data changes on top.  Returns the new branch.  A
    non-diverged branch is returned unchanged (nothing to rebase)."""
    br = table.branch(name)
    head = br.current()
    props = head.properties
    if props.get("branch.name") != name:
        raise ValueError(f"{br.path} is not a managed branch")
    cur = table.current()
    if cur.version == int(props["branch.base-version"]):
        return br  # fast-forwardable as-is

    clone_snap = next(
        (
            s
            for s in br.history()
            if s.summary.get("operation") == "clone"
        ),
        None,
    )
    if clone_snap is None:
        raise RuntimeError(
            f"branch {name!r}: the fork (clone) commit was retention-"
            "expired — the unpublished change span is unrecoverable; "
            "extract the branch state manually and re-apply"
        )
    ddl = schema_ddl(clone_snap, head)
    if ddl:
        raise RuntimeError(
            f"branch {name!r} performed DDL since the fork "
            f"({[e['op'] for e in ddl]}); rebase replays DATA changes only "
            "— recreate the branch and re-apply the DDL first"
        )
    _scalar, fmap = _fence_state(table)
    if fmap:
        raise RuntimeError(
            "rebase on fan-in tables is not supported (per-source fences "
            "need per-shard replays)"
        )

    changes = read_changes(
        br, clone_snap.snapshot_id, delete_images="after"
    ).filter(F.col("_change_type").isin("insert", "update_after", "delete"))
    payload = [
        c
        for c in changes.columns
        if c not in ("_change_type", "_lsn")
    ]
    batch = changes.select(
        F.when(F.col("_change_type") == "delete", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("_lsn").alias("lsn"),
        *[F.col(c) for c in payload],
    )
    # spill before dropping: the lazy plan reads branch files the drop
    # would delete from under it.  NOT dot/underscore-prefixed — Spark's
    # file listing hides those paths and would read the spill as empty.
    tmp = os.path.join(table.path, f"tmp-rebase-{uuid.uuid4().hex}")
    try:
        batch.write.parquet(tmp)
        spark = table.spark
        staged = spark.read.parquet(tmp)
        n = staged.count()
        table.drop_branch(name, force=True)
        nb = table.create_branch(name)
        if n:
            scalar, _ = _fence_state(nb)
            apply_batch(
                nb,
                staged,
                (scalar + 1) if scalar is not None else 0,
                collect_stats=False,
            )
            # apply_batch read the spilled files lazily inside its own jobs,
            # which complete before it returns — safe to delete below
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return table.branch(name)
