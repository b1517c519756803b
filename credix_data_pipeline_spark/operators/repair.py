"""Anti-entropy: cheap replica divergence detection + targeted repair.

A relay replica is PROVEN convergent by construction (fences, LWW,
oracle tests) — but a real fleet still wants the Dynamo-style
anti-entropy check: after an operator fat-fingers a manual write on a
replica, restores the wrong backup, or suspects bit rot, "are these two
tables the same, and if not, fix the replica" must not cost two full
table scans plus a full-table join at 100 TB.

``diff_tables`` is the two-phase check:

* Phase 1 — per-bucket fingerprints: ONE distributed aggregation per
  side computes ``xor(xxhash64(key…, payload…))`` + row count per
  bucket over the CLEAN state (LWW winners, tombstones/purges applied —
  convergence is about what readers see).  XOR is order-independent and
  overflow-free, and clean rows are key-unique so pair-cancellation
  cannot mask a diff.  Equal fingerprints ⇒ bucket provably identical
  (up to hash collision); the common case costs two scans and NO join.
* Phase 2 — only DIVERGENT buckets are re-read and full-outer-joined on
  the key, classifying each divergent key as ``missing_left`` /
  ``missing_right`` / ``differing``.  Cost is O(divergent buckets), not
  O(table).

``repair_replica`` then converges the replica onto the upstream with two
``merge_into`` calls scoped to the diff keys — upsert rows the upstream
has (update differing, insert missing), delete rows the upstream lacks —
so the fix inherits merge_into's whole discipline: minted-LSN tombstones
(no resurrection), fence carried, base-snapshot OCC, CHECK constraints.

Both tables must share key, bucket columns, and bucket count (the
replica contract); anything else is refused rather than silently
re-hashed.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.table import (
    _commit_dir,
    _file_token,
)
from credix_data_pipeline_spark.operators.apply import (
    read_clean,
    read_current,
)
from credix_data_pipeline_spark.operators.merge import merge_into


def _check_compatible(left: LakeTable, right: LakeTable):
    ls, rs = left.current(), right.current()
    if ls.key != rs.key:
        raise ValueError(f"key mismatch: {ls.key} vs {rs.key}")
    if ls.bucket_by != rs.bucket_by or ls.num_buckets != rs.num_buckets:
        raise ValueError(
            "bucket layout mismatch: "
            f"{ls.bucket_by}/{ls.num_buckets} vs {rs.bucket_by}/{rs.num_buckets}"
        )
    lp = sorted(f.name for f in ls.schema.fields if not f.name.startswith("_"))
    rp = sorted(f.name for f in rs.schema.fields if not f.name.startswith("_"))
    if lp != rp:
        raise ValueError(f"payload column mismatch: {lp} vs {rp}")
    return ls, lp


def _row_hash(prefix: str, cols: list[str]):
    """Position-anchored row hash.  Spark's ``xxhash64`` SKIPS null inputs
    (the running hash is unchanged at that position), so ``(NULL, 'v')``
    and ``('v', NULL)`` over two same-typed columns collide — a value
    migrated between columns would read as identical.  Interleaving each
    column with its (never-null) nullness flag re-anchors every position.
    """
    parts: list = []
    for c in cols:
        col = F.col(f"{prefix}{c}") if prefix else F.col(c)
        parts.append(col)
        parts.append(col.isNull())
    return F.xxhash64(*parts)


def _metadata_identical_buckets(ls, rs) -> set[int]:
    """Phase 0 — buckets provably identical from MANIFESTS ALONE, zero
    scan: both sides reference the exact same data files (root-independent
    tokens — a zero-copy clone records the source's paths, so a fresh
    clone/restore passes entirely), with no outstanding equality deletes
    touching the bucket, identical position-delete files, matching merge
    semantics, and equal write-time dir records (same files must PROJECT
    identically — a drop+re-add on one side changes the logical read of
    the same bytes).  At 100 TB this turns the common "did my restore
    diverge?" diff from two full scans into a metadata walk."""
    if ls.merge_mode != rs.merge_mode or ls.mor_deletes != rs.mor_deletes:
        return set()
    eq_l = {int(b) for e in ls.eq_deletes for b in e["buckets"]}
    eq_r = {int(b) for e in rs.eq_deletes for b in e["buckets"]}
    out: set[int] = set()
    for b in set(ls.files) | set(rs.files):
        if int(b) in eq_l or int(b) in eq_r:
            continue
        lf = sorted(_file_token(f) for f in ls.files.get(b, []))
        rf = sorted(_file_token(f) for f in rs.files.get(b, []))
        if lf != rf:
            continue
        ld = sorted(_file_token(f) for f in ls.delete_files.get(b, []))
        rd = sorted(_file_token(f) for f in rs.delete_files.get(b, []))
        if ld != rd:
            continue
        dirs = {_commit_dir(f) for f in ls.files.get(b, [])}
        if any(ls.dir_schemas.get(d) != rs.dir_schemas.get(d) for d in dirs):
            continue
        out.add(int(b))
    return out


def _fingerprints(
    t: LakeTable, cols: list[str], buckets: list[int] | None = None
) -> dict[int, tuple[int, int]]:
    df = read_current(t, buckets=buckets)
    if "_deleted" in df.columns:
        df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    h = _row_hash("", cols)
    rows = (
        # bit_xor: bit-granular, order-independent, overflow-free digest
        df.withColumn("_h", h)
        .groupBy(t.bucket_expr().alias("_b"))
        .agg(F.expr("bit_xor(_h)").alias("x"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {int(r["_b"]): (r["x"], r["n"]) for r in rows}


def diff_tables(
    left: LakeTable, right: LakeTable
) -> dict[str, Any]:
    """Two-phase divergence report.  ``identical=True`` when every bucket
    fingerprint matches; otherwise ``keys`` is a DataFrame of divergent
    keys tagged ``missing_left`` / ``missing_right`` / ``differing``."""
    snap, payload = _check_compatible(left, right)
    key = list(snap.key)
    cols = key + [c for c in payload if c not in key]

    ls, rs = left.current(), right.current()
    trusted = _metadata_identical_buckets(ls, rs)
    candidates = sorted(
        int(b) for b in set(ls.files) | set(rs.files)
        if int(b) not in trusted
    )
    if not candidates:
        return {
            "identical": True,
            "buckets_compared": len(trusted),
            "metadata_identical_buckets": len(trusted),
            "divergent_buckets": [],
        }
    fl = _fingerprints(left, cols, candidates)
    fr = _fingerprints(right, cols, candidates)
    divergent = sorted(
        b for b in set(fl) | set(fr) if fl.get(b) != fr.get(b)
    )
    if not divergent:
        return {
            "identical": True,
            "buckets_compared": len(set(fl) | set(fr)) + len(trusted),
            "metadata_identical_buckets": len(trusted),
            "divergent_buckets": [],
        }

    # bucket-PRUNED reads (the same file-level pruning _fingerprints
    # uses): a row filter on bucket_expr would plan every file of every
    # bucket and hash-discard the rest — two full scans on a table where
    # one bucket diverged, the exact O(table) cost this module promises
    # to avoid
    l = read_clean(left, buckets=divergent).alias("l")
    r = read_clean(right, buckets=divergent).alias("r")
    cond = None
    for k in key:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    lh = _row_hash("l.", cols)
    rh = _row_hash("r.", cols)
    l = l.withColumn("_lp", F.lit(True))
    r = r.withColumn("_rp", F.lit(True))
    keys = (
        l.join(r, cond, "full_outer")
        .select(
            *[F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in key],
            F.when(~F.coalesce("_lp", F.lit(False)), "missing_left")
            .when(~F.coalesce("_rp", F.lit(False)), "missing_right")
            .otherwise("differing")
            .alias("kind"),
            (lh != rh).alias("_differs"),
        )
        .filter(
            (F.col("kind") != "differing") | F.coalesce("_differs", F.lit(False))
        )
        .drop("_differs")
    )
    return {
        "identical": False,
        "buckets_compared": len(set(fl) | set(fr)) + len(trusted),
        "metadata_identical_buckets": len(trusted),
        "divergent_buckets": divergent,
        "keys": keys,
    }


def repair_replica(
    replica: LakeTable, upstream: LakeTable
) -> dict[str, Any]:
    """Converge ``replica`` onto ``upstream``: upsert every divergent key
    the upstream has, delete every key it lacks.  Idempotent — a second
    call reports ``identical``."""
    d = diff_tables(upstream, replica)  # left = truth
    if d["identical"]:
        return {"identical": True, "repaired": 0}
    snap = upstream.current()
    key = list(snap.key)
    keys = d["keys"].cache()
    try:
        # One job over the (small, cached) key set drives both branches —
        # no per-branch limit(1).count() probe jobs.
        kinds = {
            r["kind"]: r["n"]
            for r in keys.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        n_up = sum(n for k, n in kinds.items() if k != "missing_left")
        n_kill = kinds.get("missing_left", 0)
        up_keys = keys.filter(F.col("kind") != "missing_left").select(*key)
        src = read_clean(upstream).join(up_keys, key, "left_semi")
        res_up = {"inserted": 0, "updated": 0}
        if n_up:
            payload = [
                f.name
                for f in snap.schema.fields
                if not f.name.startswith("_") and f.name not in key
            ]
            res_up = merge_into(
                replica,
                src,
                when_matched_update={c: f"s.{c}" for c in payload},
                when_not_matched_insert=True,
            )
        kill = keys.filter(F.col("kind") == "missing_left").select(*key)
        res_del = {"deleted": 0}
        if n_kill:
            res_del = merge_into(
                replica,
                kill,
                when_matched_delete="true",
                when_not_matched_insert=False,
            )
        return {
            "identical": False,
            "divergent_buckets": d["divergent_buckets"],
            "upserted": res_up.get("inserted", 0) + res_up.get("updated", 0),
            "deleted": res_del.get("deleted", 0),
        }
    finally:
        keys.unpersist()
