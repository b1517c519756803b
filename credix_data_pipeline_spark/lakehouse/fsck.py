"""Table integrity check (``main.py fsck``) — the disaster-recovery /
pre-migration audit an operator runs before trusting a table.

Checks are METADATA-FIRST (manifest walk + ``os.stat``, zero data pages)
so they cost O(files) stat calls at any table size:

* every data / position-delete / equality-delete file referenced by any
  RETAINED snapshot exists and is non-empty;
* every retained manifest loads (segment references resolve — a GC'd
  segment would fail here, not at 3 a.m. in a reader);
* fence well-formedness: the newest fence-declaring commit's ``fences``
  map (if any) maps string source names to integer batch ids — fan-in
  commits carry the scalar ``batch_id`` AND the map together by design;
* orphan report: files under ``data/`` referenced by NO retained manifest
  (crash residue awaiting ``expire_snapshots`` collection — a warning,
  not an error);
* ``deep=True`` adds one distributed job: every live row's recomputed
  bucket hash must equal the bucket directory it lives in (catches a
  table whose files were moved/renamed by hand).

Iceberg analogue: there is no first-class fsck; this fills the gap the
way ``remove_orphan_files --dry-run`` + manifest validation scripts do.
"""

from __future__ import annotations

import os

from credix_data_pipeline_spark.lakehouse.table import (
    DATA_DIR,
    LakeTable,
)


def _abs(table: LakeTable, p: str) -> str:
    return p if os.path.isabs(p) else os.path.join(table.path, p)


def fsck(table: LakeTable, deep: bool = False) -> dict:
    errors: list[str] = []
    warnings: list[str] = []
    versions = table._versions()

    # 1) every retained manifest loads (segment refs resolve)
    snaps = []
    for v in versions:
        try:
            snaps.append(table._read_manifest(v))
        except Exception as e:  # noqa: BLE001 - report, don't crash
            errors.append(f"manifest v{v} unreadable: {e}")
    if not snaps:
        return {"ok": False, "errors": errors or ["no manifests"],
                "warnings": warnings, "checked_files": 0}

    # 2) referenced files exist and are non-empty
    referenced: set[str] = set()
    checked = 0
    for s in snaps:
        for kind, paths in (
            ("data", s.all_files()),
            ("position-delete", s.all_delete_files()),
            ("equality-delete", s.all_eq_delete_files()),
        ):
            for p in paths:
                referenced.add(p)
                ap = _abs(table, p)
                checked += 1
                if not os.path.isfile(ap):
                    errors.append(
                        f"{kind} file missing (v{s.version}): {p}"
                    )
                elif os.path.getsize(ap) == 0:
                    errors.append(
                        f"{kind} file empty (v{s.version}): {p}"
                    )

    # 3) fence well-formedness on the newest fence-declaring commit.
    # NB: fan-in merge commits legitimately carry BOTH the scalar batch_id
    # and the fences map in one summary (operators/apply.py writes them
    # together so retention protection rides the same key) — that is the
    # normal fan-in shape, not corruption.  What fsck checks is the map's
    # SHAPE: string source names to integer batch ids.
    for s in reversed(snaps):
        summ = s.summary
        if "batch_id" in summ or "fences" in summ:
            fences = summ.get("fences")
            if fences is not None and (
                not isinstance(fences, dict)
                or any(
                    not isinstance(k, str)
                    or (v is not None and not isinstance(v, int))
                    for k, v in fences.items()
                )
            ):
                errors.append(
                    f"malformed fences map at v{s.version}: {fences!r}"
                )
            break

    # 4) orphan report (local data/ only; clones reference foreign roots)
    data_root = os.path.join(table.path, DATA_DIR)
    local_ref = {
        os.path.normpath(_abs(table, p))
        for p in referenced
        if not os.path.isabs(p) or p.startswith(table.path)
    }
    orphans = 0
    for dirpath, _dirs, files in os.walk(data_root):
        for f in files:
            ap = os.path.normpath(os.path.join(dirpath, f))
            if ap.endswith(".parquet") and ap not in local_ref:
                orphans += 1
    if orphans:
        warnings.append(
            f"{orphans} unreferenced data file(s) under data/ — crash "
            "residue; expire_snapshots(orphan_grace_sec=...) collects them"
        )

    # 5) deep: recomputed bucket hash == the bucket each row is stored
    # under.  Built from per-bucket reads (the engine's own pruning path —
    # the read plan may be a multi-source join when purges are
    # outstanding, where file-introspection expressions like
    # input_file_name() are unsupported), lazily UNIONED and aggregated in
    # ONE distributed job.
    if deep:
        from functools import reduce

        from pyspark.sql import functions as F

        cur = table.current()
        parts = [
            table.read(buckets=[int(b)]).select(
                F.lit(int(b)).alias("_stored_bucket"),
                table.bucket_expr(cur).alias("_hash_bucket"),
            )
            for b in sorted(cur.files, key=int)
            if cur.files[b]
        ]
        if parts:
            bad_rows = (
                reduce(lambda a, b: a.unionByName(b), parts)
                .filter(F.col("_stored_bucket") != F.col("_hash_bucket"))
                .groupBy("_stored_bucket")
                .count()
                .collect()
            )
            for r in bad_rows:
                errors.append(
                    f"{r['count']} live row(s) stored under bucket "
                    f"{r['_stored_bucket']} hash to a different bucket "
                    "(files moved by hand?)"
                )

    return {
        "ok": not errors,
        "errors": errors,
        "warnings": warnings,
        "checked_files": checked,
        "retained_snapshots": len(snaps),
    }
