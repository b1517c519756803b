"""LakeTable: a minimal Iceberg-style table format on a filesystem.

Layout::

    <table>/
      _meta/v00000000001.json     # snapshot manifests, monotone versions
      _meta/seg-<sha1>.json       # per-bucket manifest segments (content-
                                  # addressed, shared across snapshots)
      data/<commit-uuid>/_bucket=<k>/part-*.parquet

Commit protocol: write the manifest to a temp file, then ``os.link`` it to its
final versioned name.  ``link(2)`` fails with EEXIST if the version already
exists, giving atomic optimistic concurrency without any lock service — the
same contract as an Iceberg catalog's atomic swap.  Readers list ``_meta/``
and take the highest version; data files are immutable, so a reader pinned to
snapshot V is unaffected by later commits (snapshot isolation).

Scale posture: manifests store per-bucket file lists, so key-targeted MERGE
prunes to dirty buckets only (the Iceberg partition-pruning analogue); reads
pass explicit file lists to the vectorized parquet reader with the table
schema, so late-added columns read as NULL from old files (Iceberg-style
evolution).  The per-file state (file lists, ``_lsn`` stats, sequence
numbers, position-delete files) is persisted as CONTENT-ADDRESSED per-bucket
manifest SEGMENTS (the Iceberg manifest-file/manifest-list split): a commit
touching 7 of 1024 buckets writes 7 small segment files plus a thin snapshot
skeleton — every untouched bucket's segment hashes identically and is reused
byte-for-byte — so commit metadata I/O is O(dirty buckets), not O(table
files), and retention GCs segments no retained snapshot references.
``compact()`` (rewrite_data_files analogue) bounds per-segment file counts.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

META_DIR = "_meta"
DATA_DIR = "data"
BRANCHES_DIR = "_branches"  # named writable branches nest under the root
BUCKET_COL = "_bucket"


class CommitConflict(RuntimeError):
    """Another writer committed the same version first (optimistic CC loss)."""


@dataclass(frozen=True)
class Snapshot:
    version: int
    snapshot_id: int
    parent_id: int | None
    schema: T.StructType
    key: list[str]
    bucket_by: list[str]
    num_buckets: int
    # bucket id (as str) -> list of data-file paths relative to table root
    files: dict[str, list[str]]
    summary: dict[str, Any]
    committed_at_ms: int
    # "cow": MERGE rewrites dirty buckets (read = latest only).  "mor":
    # MERGE appends delta rows — the Iceberg copy-on-write vs merge-on-read
    # axis.  Within "mor", `mor_prefer` picks position-delete merges
    # (Iceberg v2: anti-join reads, no shuffle) vs blind appends (fastest
    # ingest, LWW collapse at read until compaction).
    merge_mode: str = "cow"
    # Iceberg field ids: current column name -> stable id.  Ids survive
    # renames and are never reused after a drop, so files written before a
    # rename/drop still project to the right columns (Iceberg v2 name
    # mapping).  Legacy manifests get positional ids on load (safe: a
    # legacy table by definition never renamed).
    column_ids: dict[str, int] = field(default_factory=dict)
    next_column_id: int = 0
    # commit-dir (the uuid dir under data/) -> {"schema": <StructType
    # json>, "ids": {name: id}} AT WRITE TIME.  A dir absent here is read
    # by-name with the snapshot schema (pre-feature files).  Pruned to live
    # dirs at every commit, so the manifest never grows with dead history.
    dir_schemas: dict[str, dict] = field(default_factory=dict)
    # per-file `_lsn` bounds (Iceberg manifest column-stats analogue):
    # path -> [lsn_min, lsn_max].  Lets incremental readers skip whole
    # files by manifest metadata alone — no footer open, no scan task.
    # Files absent here (legacy commits, tables without _lsn) are never
    # skipped.  Pruned to live files at every commit.
    file_stats: dict[str, list[int]] = field(default_factory=dict)
    # per-file EVENT-TIME bounds (epoch ms over the non-null ``ts``
    # values): the manifest column-stats analogue for wall-clock slices.
    # ``read(ts_between=...)`` skips files provably outside the window —
    # zero footer opens, zero scan tasks — when the one-live-version
    # invariant holds (CoW / MoR position-delete mode).  Files absent
    # here are never skipped.
    ts_stats: dict[str, list[int]] = field(default_factory=dict)
    # Generalized per-file column bounds (Delta data-skipping / Iceberg
    # column-stats analogue) for the columns named by the
    # ``stats.columns`` table property: col name -> {file -> [min, max]}
    # in the column's native type (numeric / string).  ``read(between=
    # {col: (lo, hi)})`` skips files provably disjoint from the window
    # under the same one-live-version invariant as ts_stats.  Col-major
    # so column DDL is a single outer-key operation.
    col_stats: dict[str, dict[str, list]] = field(default_factory=dict)
    # Merge-on-read POSITION DELETES (Iceberg v2 position-delete files):
    # bucket id -> delete-file paths; each delete file holds (file, pos)
    # rows marking superseded ordinals in OLDER data files of the same
    # bucket.  Reads anti-join instead of LWW-collapsing the whole table.
    delete_files: dict[str, list[str]] = field(default_factory=dict)
    # True while the position-delete INVARIANT holds: at most one live
    # (non-position-deleted) version per key, so reads take the cheap
    # scan + anti-join path with no LWW shuffle.  Holds from creation;
    # preserved by position-delete merges, compact and rebucket; CLEARED
    # by any blind append (mor-append merges, warehouse loads) until the
    # next compaction collapses versions and restores it.
    mor_deletes: bool = False
    # The table's MERGE strategy preference, fixed at create time:
    # "posdel" (merge_mode="mor") arbitrates at write and maintains the
    # invariant; "append" (merge_mode="mor-append" / legacy manifests)
    # blind-appends winners and defers LWW to read/compaction.
    mor_prefer: str = "append"
    # EQUALITY DELETES (Iceberg v2 equality-delete files): each entry is a
    # key-value purge committed WITHOUT reading any data file —
    # {"paths": [rel parquet paths holding the key values], "cols":
    # [column names at write time], "col_ids": [their field ids], "seq":
    # commit version, "buckets": [bucket ids the keys hash to]}.  A row is
    # dead iff its key matches an entry AND its file's sequence number is
    # OLDER than the entry's seq (the Iceberg sequence-number rule) — so
    # re-inserting a purged key later is visible, and bucket rewrites
    # consume entries as an OPTIMIZATION only, never for correctness.
    eq_deletes: list[dict] = field(default_factory=list)
    # data-file path -> sequence number (the version of the commit that
    # added the file).  Files absent here predate the eq-delete feature and
    # read as seq 0 (older than every possible delete).
    file_seq: dict[str, int] = field(default_factory=dict)
    # data-file path -> True iff parquet footer stats PROVE the file holds
    # no ``_col_lsn`` per-column version maps (column absent or all-NULL).
    # The partial-update fast-path switch: a merge whose batch carries no
    # patches AND whose dirty buckets' files are all proven map-free takes
    # the classic row-struct plan — provably identical there — instead of
    # the K-per-column fold.  False/absent = unknown → fold (conservative).
    # Computed from footers once per file at commit, like ts_stats.
    map_stats: dict[str, bool] = field(default_factory=dict)
    # Table properties (Iceberg table-properties analogue): free-form
    # string config carried forward by every commit.  Policy keys consumed
    # by ``operators/maintenance.maintain``:
    #   maintenance.small-files-per-bucket  compact trigger (default "4")
    #   maintenance.min-avg-file-mb         size-aware trigger (footer scan;
    #                                       unset = manifest-only policy)
    #   retention.auto                      "true" => expire on maintain
    #   retention.keep-last                 expire keep_last (default "5")
    # Policy keys consumed by ``operators/relay.publish_changes``:
    #   relay.rebase-every                  escalate every Nth chunk to a
    #                                       full-state rebase
    #   relay.auto-vacuum                   "true" => vacuum superseded
    #                                       chunks right after a rebase
    # Properties are TABLE-level, not snapshot-level: ``rollback_to`` keeps
    # the current properties (the Iceberg rule — config does not time-travel).
    properties: dict[str, str] = field(default_factory=dict)
    # Column DEFAULT values (Iceberg v3 initial/write defaults): column
    # name -> constant SQL expression string.  Declared at ``add_columns``;
    # files whose write schema lacks the column's field id read the default
    # instead of NULL (initial-default, metadata-only — no rewrite), and
    # writers whose batch schema omits the column write it (write-default),
    # so replay results do not depend on WHEN the DDL landed relative to a
    # batch.  Top-level columns only; schema-bound (rename re-keys, drop
    # removes), unlike time-travel-exempt properties.
    column_defaults: dict[str, str] = field(default_factory=dict)
    # True when this snapshot's ``column_ids`` were POSITIONALLY backfilled
    # at load (pre-field-id manifest).  Backfilled ids are a valid base for
    # future DDL but NOT comparable across two such snapshots (an add shifts
    # positions) — snapshot-to-snapshot id alignment must not trust them.
    # Load-time only, never persisted.
    ids_backfilled: bool = False

    def all_files(self) -> list[str]:
        return [f for fl in self.files.values() for f in fl]

    def all_delete_files(self) -> list[str]:
        return [f for fl in self.delete_files.values() for f in fl]

    def all_eq_delete_files(self) -> list[str]:
        return [p for e in self.eq_deletes for p in e["paths"]]

    def max_seq(self) -> int:
        """Highest sequence number live in this snapshot (>= version).
        Normally == version; after a branch ``fast_forward`` the adopted
        state carries the branch's higher seqs, so every later mint must
        start ABOVE them — derived, never persisted, so legacy manifests
        need no migration."""
        return max(
            [
                self.version,
                *self.file_seq.values(),
                *(int(e["seq"]) for e in self.eq_deletes),
            ]
        )

    def live_dirs(self) -> set[str]:
        return {_commit_dir(f) for fl in self.files.values() for f in fl}


def ts_predicate(ts_between: tuple[int | None, int | None]):
    """The row-level event-time-window predicate (non-null ``ts`` inside
    the inclusive epoch-ms bounds; either side may be None) — the exact
    filter ``read(ts_between=...)`` applies on top of stats skipping."""
    lo, hi = ts_between
    pred = F.col("ts").isNotNull()
    if lo is not None:
        pred = pred & (F.col("ts") >= F.timestamp_millis(F.lit(lo)))
    if hi is not None:
        pred = pred & (F.col("ts") <= F.timestamp_millis(F.lit(hi)))
    return pred


def _file_token(p: str) -> str:
    """Root-independent identity of a data-file path: ``data/<commit>/
    _bucket=K/<file>`` — exactly the ``_file`` column ``_pos_cols``
    computes from scan metadata.  Table-relative paths already have this
    form; absolute paths recorded by zero-copy clones are stripped to
    everything after the LAST ``/data/`` marker (commit dirs are uuid hex,
    so the marker cannot repeat below the data root)."""
    i = p.rfind("/" + DATA_DIR + "/")
    return p[i + 1:] if i >= 0 else p


def _commit_dir(p: str) -> str:
    """The writing commit dir of a data-file path (third-from-last
    component: ``.../<commit>/_bucket=K/<file>``) — the ``dir_schemas``
    key; root-independent, so clone-recorded absolute paths resolve to the
    SOURCE's commit dirs and inherit their write schemas."""
    return p.split("/")[-3]


def _id_names(schema: T.StructType) -> list[str]:
    """All id-bearing names of a schema: top-level columns plus DEPTH-1
    struct fields as dotted paths (``tool_meta.source``).  One nesting
    level is the engine's nested-DDL scope — the transcript tool-metadata
    shape; deeper nesting reads/writes fine but evolves only at the
    column level."""
    out: list[str] = []
    for f in schema.fields:
        out.append(f.name)
        if isinstance(f.dataType, T.StructType):
            out.extend(f"{f.name}.{sf.name}" for sf in f.dataType.fields)
    return out


def _dotted_types(schema: T.StructType) -> dict[str, T.DataType]:
    """name -> type for every id-bearing name (incl. dotted paths)."""
    out: dict[str, T.DataType] = {}
    for f in schema.fields:
        out[f.name] = f.dataType
        if isinstance(f.dataType, T.StructType):
            for sf in f.dataType.fields:
                out[f"{f.name}.{sf.name}"] = sf.dataType
    return out


def _replace_nested(
    schema: T.StructType, parent: str, new_fields: list[T.StructField]
) -> T.StructType:
    """The schema with column ``parent``'s struct fields replaced."""
    return T.StructType(
        [
            T.StructField(f.name, T.StructType(new_fields), f.nullable)
            if f.name == parent
            else f
            for f in schema.fields
        ]
    )


def _manifest_name(version: int) -> str:
    return f"v{version:011d}.json"


def _staged_name(version: int) -> str:
    # staged (write-audit-publish) manifests are invisible to `_versions`;
    # publishing links the SAME bytes to the versioned name
    return f"staged-{_manifest_name(version)}"


# Iceberg-style type promotions allowed by ``widen_column`` (reads of old
# files cast on the fly; compaction rewrites them physically widened).
_WIDENINGS: dict[str, set[str]] = {
    "integer": {"long"},
    "float": {"double"},
}


def _struct_superset_ok(f: T.StructField, dir_type) -> bool:
    """True when a dir's struct layout is a name+type-equal SUBSET of the
    snapshot field's — only fields ADDED since the write are missing, so a
    by-name read is exact (the parquet reader scans missing nested fields
    as NULL).  Drop+re-add under the same nested name is caught separately
    by the dotted-id check in ``_dir_compatible``."""
    if not isinstance(dir_type, dict) or dir_type.get("type") != "struct":
        return False
    snap_fields = {
        sf.name: sf.dataType.jsonValue() for sf in f.dataType.fields
    }
    return all(
        df["name"] in snap_fields and snap_fields[df["name"]] == df["type"]
        for df in dir_type.get("fields", [])
    )


def _dir_compatible(snap: Snapshot, dinfo: dict | None) -> bool:
    """True if a commit dir's files can be read BY NAME with the snapshot
    schema (the single-scan fast path).  A dir with no registration is
    legacy/by-name by construction.  Incompatible dirs (a rename, drop+
    re-add name collision, or type widening in between) take the per-dir
    projection path instead."""
    if dinfo is None:
        return True
    dids: dict[str, int] = dinfo["ids"]
    dtypes = {
        f["name"]: f["type"] for f in dinfo["schema"]["fields"]
    }
    rev = {i: n for n, i in dids.items()}
    for f in snap.schema.fields:
        i = snap.column_ids.get(f.name)
        n = rev.get(i)
        if n is not None:
            # field id exists in the dir: name and type must match for a
            # by-name read to land the data in the right column un-cast.
            # Exception: a struct whose dir layout is a name+type-equal
            # SUBSET of the snapshot's (fields ADDED since the write) —
            # the parquet reader resolves nested fields by name and fills
            # missing ones with NULL, so by-name stays a single scan, just
            # like a top-level add-column (nested rename/widen/drop still
            # lands the dir on the projection path)
            if n != f.name:
                return False
            if dtypes.get(n) != f.dataType.jsonValue() and not (
                isinstance(f.dataType, T.StructType)
                and _struct_superset_ok(f, dtypes.get(n))
            ):
                return False
        elif f.name in dids:
            # same NAME bound to a different id in the dir (drop + re-add,
            # or rename swap): by-name would resurrect dead data
            return False
        if isinstance(f.dataType, T.StructType):
            # drop + re-add of a NESTED name: the dotted name exists in the
            # dir under a retired id — by-name would resurrect dead data
            # even though the full struct type round-tripped to equality
            for sf in f.dataType.fields:
                dn = f"{f.name}.{sf.name}"
                if dn in dids and dids[dn] != snap.column_ids.get(dn):
                    return False
    return True


# Deterministic in Catalyst's sense but re-bound at every query start —
# a default carrying one makes pre-add rows read a different value per
# scan (non-repeatable snapshot reads; relay replicas diverge on
# never-updated keys).  Class names of the analyzed expression nodes.
_QUERY_TIME_EXPRS = frozenset({
    "CurrentTimestamp", "CurrentDate", "Now", "LocalTimestamp",
    "CurrentTimeZone", "CurrentUser",
})


def _validate_default_constant(pdf: DataFrame, c: str, d: str) -> None:
    """Reject DEFAULT expressions that resolve on the zero-column probe
    but are not repeatable constants (Iceberg v3 restricts defaults to
    literals for exactly this reason):

    * aggregates (``max(1)``) — resolve here as an Aggregate plan but
      throw AnalysisException inside every later read/merge projection,
      bricking the table;
    * non-deterministic expressions (``rand()``, ``uuid()``) — every scan
      of a pre-add row would read a different value;
    * query-start-time expressions (``current_timestamp()``) —
      deterministic within one query, different across queries.
    """
    plan = pdf._jdf.queryExecution().analyzed()
    if "Project" not in plan.getClass().getSimpleName():
        raise ValueError(
            f"default for {c!r} must be a constant expression, not an "
            f"aggregate: {d!r} (it would fail inside every later read "
            "projection)"
        )
    root = plan.expressions().apply(0)
    if not root.deterministic():
        raise ValueError(
            f"default for {c!r} is non-deterministic: {d!r} — pre-add "
            "rows would read a different value on every scan"
        )

    def _walk(e) -> str | None:
        name = e.getClass().getSimpleName()
        if name in _QUERY_TIME_EXPRS:
            return name
        ch = e.children()
        for i in range(ch.size()):
            hit = _walk(ch.apply(i))
            if hit:
                return hit
        return None

    hit = _walk(root)
    if hit:
        raise ValueError(
            f"default for {c!r} depends on query start time ({hit}): "
            f"{d!r} — reads would not be repeatable across scans; "
            "declare the literal value instead"
        )


def default_expr(snap: Snapshot, name: str):
    """The Column filling ``name`` where its data is absent: the declared
    DEFAULT (a constant SQL expression, cast to the column's type) or a
    typed NULL.  The single alignment rule every reader and writer shares —
    pre-add files, pre-add event batches, merge inserts."""
    fld = snap.schema[name]
    d = snap.column_defaults.get(name)
    if d is None:
        return F.lit(None).cast(fld.dataType)
    return F.expr(d).cast(fld.dataType)


def _project_dir(df: DataFrame, snap: Snapshot, dinfo: dict) -> DataFrame:
    """Project a write-schema read to the snapshot schema by FIELD ID:
    renamed columns re-alias, widened columns cast, columns the dir never
    had (or whose id was dropped) read as typed NULL.  Struct columns
    rebuild FIELD-BY-FIELD by dotted id, so nested renames/widens/drops
    project exactly like top-level ones.  Engine position columns
    (``_file``/``_pos``, present on ``with_pos`` reads) pass through
    untouched."""
    rev = {i: n for n, i in dinfo["ids"].items()}
    dir_struct_fields = {
        f["name"]: {sf["name"] for sf in f["type"].get("fields", [])}
        for f in dinfo["schema"]["fields"]
        if isinstance(f["type"], dict) and f["type"].get("type") == "struct"
    }
    dir_has_dotted = any("." in n for n in dinfo["ids"])
    cols = []
    for f in snap.schema.fields:
        n = rev.get(snap.column_ids.get(f.name))
        if n is None:
            # column (by field id) absent from this dir: declared DEFAULT,
            # else typed NULL — the Iceberg v3 initial-default rule
            cols.append(default_expr(snap, f.name).alias(f.name))
            continue
        if not isinstance(f.dataType, T.StructType):
            cols.append(F.col(n).cast(f.dataType).alias(f.name))
            continue
        # struct column: rebuild each nested field by its dotted id
        sub = []
        for sf in f.dataType.fields:
            dn = rev.get(snap.column_ids.get(f"{f.name}.{sf.name}"))
            if dn is not None and "." in dn:
                _, old_field = dn.split(".", 1)
                sub.append(
                    F.col(n).getField(old_field)
                    .cast(sf.dataType).alias(sf.name)
                )
            elif not dir_has_dotted and sf.name in dir_struct_fields.get(
                n, set()
            ):
                # dir pinned before nested ids existed: by definition no
                # nested DDL had happened when it was written, so by-name
                # within the struct is correct (the flat legacy convention)
                sub.append(
                    F.col(n).getField(sf.name)
                    .cast(sf.dataType).alias(sf.name)
                )
            else:
                sub.append(F.lit(None).cast(sf.dataType).alias(sf.name))
        cols.append(
            # struct(...) of a NULL row would yield a struct of NULLs;
            # the guard preserves NULL structs as NULL
            F.when(F.col(n).isNotNull(), F.struct(*sub))
            .otherwise(F.lit(None).cast(f.dataType))
            .alias(f.name)
        )
    for extra in ("_file", "_pos", "_del"):
        if extra in df.columns:
            cols.append(F.col(extra))
    return df.select(*cols)


class LakeTable:
    """Handle to one snapshot-committed table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.meta_path = os.path.join(self.path, META_DIR)
        # Parsed manifest segments by file name.  Segments are content-
        # addressed and immutable, so the cache can never serve stale data;
        # it turns history()/snapshot() walks into one read per DISTINCT
        # segment instead of one per (snapshot × bucket).
        self._seg_cache: dict[str, dict] = {}

    # ------------------------------------------------- manifest segments
    def _write_segment(self, seg: dict) -> str:
        """Persist one bucket's manifest segment, content-addressed.

        The canonical JSON bytes are hashed to the file name, so a bucket
        untouched by a commit hashes to the SAME name its parent snapshot
        references — the write is skipped and the new snapshot shares the
        segment byte-for-byte (Iceberg's manifest-reuse rule).  Two
        concurrent writers producing the same segment race benignly: the
        content is identical, so the link-EEXIST loser just drops its temp
        file."""
        blob = json.dumps(seg, sort_keys=True).encode()
        name = f"seg-{hashlib.sha1(blob).hexdigest()[:24]}.json"
        final = os.path.join(self.meta_path, name)
        if not os.path.exists(final):
            tmp = os.path.join(
                self.meta_path, f".tmp-{uuid.uuid4().hex}.json"
            )
            with open(tmp, "wb") as f:
                f.write(blob)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, final)
            except FileExistsError:
                pass  # same content already on disk
            finally:
                os.unlink(tmp)
        return name

    def _read_segment(self, name: str) -> dict:
        seg = self._seg_cache.get(name)
        if seg is None:
            with open(os.path.join(self.meta_path, name)) as f:
                seg = json.load(f)
            self._seg_cache[name] = seg
        return seg

    # ------------------------------------------------------------------ DDL
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key: list[str],
        num_buckets: int = 16,
        bucket_by: list[str] | None = None,
        merge_mode: str = "cow",
        properties: dict[str, str] | None = None,
    ) -> "LakeTable":
        """``merge_mode`` picks the MERGE strategy per table (the Iceberg
        copy-on-write / merge-on-read axis, plus the delete-granularity
        choice within merge-on-read):

        * ``cow`` — MERGE rewrites dirty buckets; reads are flat scans.
        * ``mor`` — MERGE appends the winners PLUS position-delete files
          for the ordinals they supersede (Iceberg v2): no bucket rewrite
          at write, no key shuffle at read (scan + broadcast anti-join).
          Pays a dirty-bucket read per batch to discover positions.
        * ``mor-append`` — MERGE blindly appends winners, O(batch) with NO
          read of existing data (the Flink-CDC equality-delete shape);
          reads LWW-collapse all delta versions until ``compact()``.
          Fastest ingest, most expensive read — pick for write-dominated
          tables with infrequent reads.
        """
        if merge_mode not in ("cow", "mor", "mor-append"):
            raise ValueError(
                f"merge_mode must be cow|mor|mor-append, got {merge_mode!r}"
            )
        t = cls(spark, path)
        os.makedirs(t.meta_path, exist_ok=True)
        os.makedirs(os.path.join(t.path, DATA_DIR), exist_ok=True)
        if t.exists():
            raise FileExistsError(f"table already exists at {path}")
        t._commit(
            parent=None,
            schema=schema,
            key=key,
            bucket_by=bucket_by or key[:1],
            num_buckets=num_buckets,
            files={},
            summary={"operation": "create"},
            # both MoR flavors persist as merge_mode=mor; the strategy
            # preference and the (trivially true on an empty table)
            # position-delete invariant are tracked separately
            merge_mode="mor" if merge_mode == "mor-append" else merge_mode,
            mor_deletes=merge_mode in ("mor", "mor-append"),
            mor_prefer="posdel" if merge_mode == "mor" else "append",
            properties=properties or {},
        )
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        t = cls(spark, path)
        if not t.exists():
            raise FileNotFoundError(f"no lakehouse table at {path}")
        return t

    @classmethod
    def create_if_not_exists(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key: list[str],
        num_buckets: int = 16,
        bucket_by: list[str] | None = None,
        merge_mode: str = "cow",
    ) -> "LakeTable":
        t = cls(spark, path)
        if t.exists():
            return t
        try:
            return cls.create(
                spark, path, schema, key, num_buckets, bucket_by, merge_mode
            )
        except CommitConflict:
            # two writers raced the create (concurrent fan-in jobs): the
            # loser's "not exists" check was stale — the table now exists,
            # which is exactly this constructor's contract
            return cls(spark, path)

    def exists(self) -> bool:
        return os.path.isdir(self.meta_path) and bool(self._versions())

    # ------------------------------------------------------------- snapshots
    def _versions(self) -> list[int]:
        if not os.path.isdir(self.meta_path):
            return []
        out = []
        for name in os.listdir(self.meta_path):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def _read_manifest(self, version: int) -> Snapshot:
        return self._read_manifest_file(
            os.path.join(self.meta_path, _manifest_name(version))
        )

    def _read_manifest_file(self, path: str) -> Snapshot:
        with open(path) as f:
            m = json.load(f)
        if "segments" in m:
            # segmented manifest: reassemble the per-file state from the
            # content-addressed per-bucket segments (cached — immutable).
            # Legacy manifests carry the same fields inline and skip this.
            files: dict[str, list[str]] = {}
            file_stats: dict[str, list[int]] = {}
            ts_stats: dict[str, list[int]] = {}
            col_stats: dict[str, dict[str, list]] = {}
            file_seq: dict[str, int] = {}
            map_stats: dict[str, bool] = {}
            delete_files: dict[str, list[str]] = {}
            for b, name in m["segments"].items():
                seg = self._read_segment(name)
                if seg["files"]:
                    files[b] = seg["files"]
                file_stats.update(seg.get("file_stats", {}))
                ts_stats.update(seg.get("ts_stats", {}))
                map_stats.update(seg.get("map_stats", {}))
                for c, per_file in seg.get("col_stats", {}).items():
                    col_stats.setdefault(c, {}).update(per_file)
                file_seq.update(
                    {p: int(s) for p, s in seg.get("file_seq", {}).items()}
                )
                if seg.get("delete_files"):
                    delete_files[b] = seg["delete_files"]
            m["files"] = files
            m["file_stats"] = file_stats
            m["ts_stats"] = ts_stats
            m["col_stats"] = col_stats
            m["file_seq"] = file_seq
            m["map_stats"] = map_stats
            m["delete_files"] = delete_files
        schema = T.StructType.fromJson(m["schema"])
        # legacy manifests (pre field-id feature): positional ids — safe,
        # a legacy table has never renamed/dropped, so ids are only a base
        # for future DDL, not needed to interpret existing files
        ids = m.get("column_ids") or {
            f.name: i + 1 for i, f in enumerate(schema.fields)
        }
        backfilled = not m.get("column_ids")
        return Snapshot(
            version=m["version"],
            snapshot_id=m["snapshot_id"],
            parent_id=m.get("parent_id"),
            schema=schema,
            key=m["key"],
            bucket_by=m.get("bucket_by", m["key"][:1]),
            num_buckets=m["num_buckets"],
            files=m["files"],
            summary=m.get("summary", {}),
            committed_at_ms=m["committed_at_ms"],
            merge_mode=m.get("merge_mode", "cow"),
            column_ids=ids,
            next_column_id=m.get("next_column_id")
            or (max(ids.values(), default=0) + 1),
            dir_schemas=m.get("dir_schemas", {}),
            file_stats=m.get("file_stats", {}),
            ts_stats=m.get("ts_stats", {}),
            col_stats=m.get("col_stats", {}),
            delete_files=m.get("delete_files", {}),
            mor_deletes=m.get("mor_deletes", False),
            mor_prefer=m.get("mor_prefer")
            or ("posdel" if m.get("mor_deletes") else "append"),
            eq_deletes=m.get("eq_deletes", []),
            file_seq=m.get("file_seq", {}),
            map_stats=m.get("map_stats", {}),
            properties=m.get("properties", {}),
            column_defaults=m.get("column_defaults", {}),
            ids_backfilled=backfilled,
        )

    def current(self) -> Snapshot:
        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        return self._read_manifest(versions[-1])

    def history(self) -> list[Snapshot]:
        return [self._read_manifest(v) for v in self._versions()]

    def snapshot(self, snapshot_id: int) -> Snapshot:
        for s in self.history():
            if s.snapshot_id == snapshot_id:
                return s
        raise KeyError(f"snapshot {snapshot_id} not found")

    def snapshot_as_of(self, ts_ms: int) -> Snapshot:
        """The snapshot that was CURRENT at wall-clock time ``ts_ms``
        (Iceberg ``FOR SYSTEM_TIME AS OF`` / Delta ``timestampAsOf``): the
        latest retained commit with ``committed_at_ms <= ts_ms``.  Every
        commit — including ``rollback_to``, which is itself a new commit —
        stamps a fresh ``committed_at_ms``, so "latest" is the max version
        among qualifying commits (ties at the same millisecond resolve to
        the later version, which was equally current at that instant).

        Raises ``KeyError`` when ``ts_ms`` predates the oldest RETAINED
        snapshot — after ``expire_snapshots`` the answer would be a state
        whose files may be gone, so guessing is unsafe.
        """
        cands = [s for s in self.history() if s.committed_at_ms <= ts_ms]
        if not cands:
            raise KeyError(
                f"no snapshot at or before ts_ms={ts_ms}: the oldest "
                "retained commit is newer (expired by retention, or the "
                "timestamp predates the table)"
            )
        return max(cands, key=lambda s: s.version)

    # ------------------------------------------------- write-audit-publish
    def _staged_versions(self) -> list[int]:
        if not os.path.isdir(self.meta_path):
            return []
        out = []
        for name in os.listdir(self.meta_path):
            if name.startswith("staged-v") and name.endswith(".json"):
                try:
                    out.append(int(name[len("staged-v"):-5]))
                except ValueError:
                    continue
        return sorted(out)

    def staged_snapshot(self) -> Snapshot | None:
        """The pending staged (write-audit-publish) snapshot, if any."""
        versions = self._staged_versions()
        if not versions:
            return None
        return self._read_manifest_file(
            os.path.join(self.meta_path, _staged_name(versions[-1]))
        )

    def publish_staged(self, version: int) -> Snapshot:
        """Atomically promote a staged snapshot to the table's current
        snapshot (the Iceberg WAP publish / fast-forward step).

        The staged manifest's bytes are hard-linked to the versioned name —
        the exact file the audit read is the file readers see, and the same
        EEXIST race rule as ``_commit`` applies: if another writer committed
        ``version`` meanwhile, publish fails with ``CommitConflict`` and the
        staged snapshot stays pending (data files untouched).
        """
        src = os.path.join(self.meta_path, _staged_name(version))
        if not os.path.exists(src):
            raise FileNotFoundError(f"no staged snapshot v{version}")
        dst = os.path.join(self.meta_path, _manifest_name(version))
        try:
            os.link(src, dst)
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} already committed at {self.path}; "
                "staged snapshot left pending"
            ) from e
        os.unlink(src)
        return self._read_manifest(version)

    def discard_staged(self, version: int) -> None:
        """Drop a staged snapshot that failed its audit.  Its data files
        become unreferenced and are collected by ``expire_snapshots``'s
        orphan pass after the grace period; the published table never saw
        them."""
        src = os.path.join(self.meta_path, _staged_name(version))
        if os.path.exists(src):
            os.unlink(src)

    # ------------------------------------------------------------------ tags
    def tag(self, name: str, snapshot_id: int | None = None) -> None:
        """Create an immutable named ref to a snapshot (Iceberg tag).
        Tagged snapshots are exempt from retention: ``expire_snapshots``
        keeps their manifest and data files until the tag is dropped —
        the audit/reproducibility pin (e.g. tag the snapshot a model was
        trained from)."""
        if not name or not all(c.isalnum() or c in "._-" for c in name):
            raise ValueError(f"invalid tag name {name!r}")
        sid = snapshot_id if snapshot_id is not None else self.current().snapshot_id
        self.snapshot(sid)  # must exist
        tmp = os.path.join(self.meta_path, f".tmp-{uuid.uuid4().hex}.json")
        final = os.path.join(self.meta_path, f"tag-{name}.json")
        with open(tmp, "w") as f:
            json.dump(
                {"name": name, "snapshot_id": sid,
                 "created_at_ms": int(time.time() * 1000)},
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic; EEXIST => tag already exists
        except FileExistsError as e:
            raise CommitConflict(f"tag {name!r} already exists") from e
        finally:
            os.unlink(tmp)

    def untag(self, name: str) -> None:
        p = os.path.join(self.meta_path, f"tag-{name}.json")
        if not os.path.exists(p):
            raise KeyError(f"no tag {name!r}")
        os.unlink(p)

    def tags(self) -> dict[str, int]:
        out: dict[str, int] = {}
        if not os.path.isdir(self.meta_path):
            return out
        for fn in sorted(os.listdir(self.meta_path)):
            if fn.startswith("tag-") and fn.endswith(".json"):
                with open(os.path.join(self.meta_path, fn)) as f:
                    m = json.load(f)
                out[m["name"]] = m["snapshot_id"]
        return out

    # -------------------------------------------------------------- rollback
    def _fence_as_of(self, version: int) -> dict[str, Any]:
        """Fence / high-water summary keys visible at ``version`` — what
        ``carry_fence`` would have returned right after that commit."""
        want = ("batch_id", "fences", "lsn_min", "lsn_max", "source_lsn_hw",
                "source_snapshot_id")
        out: dict[str, Any] = {}
        for v in reversed([x for x in self._versions() if x <= version]):
            snap = self._read_manifest(v)
            for k in want:
                if k in snap.summary and k not in out:
                    out[k] = snap.summary[k]
            if "batch_id" in out and "source_lsn_hw" in out:
                break
        return out

    def rollback_to(self, snapshot_id: int) -> Snapshot:
        """Roll the table back to a past snapshot (Iceberg
        ``rollback_to_snapshot``): a NEW commit whose file set, schema and
        partition spec are the target's — history is preserved (the bad
        commits stay inspectable/time-travelable until retention) and data
        files are shared, so rollback is O(1) metadata.

        The exactly-once fence rolls back WITH the data: the commit summary
        carries the fence **as of the target snapshot** (explicitly
        ``batch_id: None`` when the target predates the first merge), so
        ``last_applied_batch_id`` answers as of the target and a re-run
        replay re-applies exactly the batches after it — reconverging to the
        original state by LWW determinism.
        """
        target = self.snapshot(snapshot_id)
        cur = self.current()
        fence = self._fence_as_of(target.version)
        fence.setdefault("batch_id", None)  # explicit fence reset marker
        fence.setdefault("fences", None)  # fan-in per-source fences too
        fence.setdefault("source_lsn_hw", None)
        return self._commit(
            parent=cur,
            schema=target.schema,
            key=target.key,
            bucket_by=target.bucket_by,
            num_buckets=target.num_buckets,
            files=target.files,
            summary={
                **fence,
                "operation": "rollback",
                "rolled_back_to": snapshot_id,
            },
            merge_mode=target.merge_mode,
            # schema/spec roll back with the data; ids are the target's but
            # the id counter stays monotone so no retired id is ever reused
            column_ids=dict(target.column_ids),
            next_column_id=max(cur.next_column_id, target.next_column_id),
            dir_schemas=dict(target.dir_schemas),
            column_defaults=dict(target.column_defaults),
            file_stats=dict(target.file_stats),
            ts_stats=dict(target.ts_stats),
            col_stats={c: dict(per) for c, per in target.col_stats.items()},
            delete_files=dict(target.delete_files),
            # the position-delete INVARIANT is a property of the target's
            # FILE SET, not of the current snapshot: rolling back from a
            # compacted (mor_deletes=True) state to a blind-append-era
            # target must also roll the flag back, or reads take the
            # anti-join path over multi-version files and return
            # duplicate keys
            mor_deletes=target.mor_deletes,
            eq_deletes=list(target.eq_deletes),
            # the target's file sequence numbers must roll back WITH its
            # files: backfilling re-appearing files at the NEW version
            # would lift them past the target era's equality deletes
            file_seq=dict(target.file_seq),
        )

    def clone_to(
        self,
        dest_path: str,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        pin: bool = True,
    ) -> "LakeTable":
        """Zero-copy table clone (Delta ``SHALLOW CLONE`` / Iceberg
        snapshot-ref table): a new independent table whose first snapshot
        references the source's data files by ABSOLUTE path — no data is
        read, copied, or rewritten, so cloning a 100 TB table is one
        metadata commit.  Clone from a past state with ``snapshot_id`` or
        ``as_of_ms`` (``snapshot_as_of``).

        The clone is a full LakeTable: merges replace dirty buckets with
        its OWN local files (copy-on-write divergence — untouched buckets
        keep pointing at the source), ``compact()`` materializes everything
        locally (the "deep-copy on demand" point), and its retention only
        ever deletes under its own root — a clone can never delete source
        data.  Schema, field ids, merge mode, properties, position-delete
        files, equality-delete entries (with their source sequence numbers;
        the clone's version space starts above them), per-file stats, and
        the exactly-once fence all carry over — so a cloned ingest table
        RESUMES the same feed from the same batch: the blue/green cutover
        and the dev-against-prod-data workflow.

        ``pin=True`` tags the source snapshot (``clone-…``) so source
        retention cannot age out files the clone still references — the
        documented way Delta shallow clones break (source VACUUM) is
        designed out; drop the tag (``untag``) when the clone is deleted
        or fully materialized.
        """
        if snapshot_id is not None and as_of_ms is not None:
            raise ValueError("pass snapshot_id OR as_of_ms, not both")
        if as_of_ms is not None:
            snap = self.snapshot_as_of(as_of_ms)
        elif snapshot_id is not None:
            snap = self.snapshot(snapshot_id)
        else:
            snap = self.current()

        dest = LakeTable(self.spark, dest_path)
        if dest.exists():
            raise FileExistsError(f"table already exists at {dest_path}")
        os.makedirs(dest.meta_path, exist_ok=True)
        os.makedirs(os.path.join(dest.path, DATA_DIR), exist_ok=True)

        def _abs(p: str) -> str:
            return (
                p
                if os.path.isabs(p)
                else os.path.abspath(os.path.join(self.path, p))
            )

        files = {b: [_abs(f) for f in fl] for b, fl in snap.files.items()}
        # legacy files with no recorded sequence must stay seq 0 (older
        # than every purge) — _commit would otherwise mint them the NEW
        # version, lifting them past entries they are covered by
        file_seq = {
            _abs(f): int(snap.file_seq.get(f, 0))
            for fl in snap.files.values()
            for f in fl
        }
        # unique per-clone pin (catalog-tag nonce pattern): two clones cut
        # from the same snapshot must not collide on the tag name, and
        # must not SHARE one pin — deleting clone #1 (untag) would strip
        # clone #2's retention protection.  The clone records its own tag
        # name in the commit summary so delete/materialize workflows untag
        # exactly their pin.
        pin_tag = (
            f"clone-{snap.snapshot_id}-{uuid.uuid4().hex[:8]}" if pin else None
        )
        if pin_tag:
            self.tag(pin_tag, snap.snapshot_id)
        dest._commit(
            parent=None,
            version_base=snap.version + 1,
            schema=snap.schema,
            key=list(snap.key),
            bucket_by=list(snap.bucket_by),
            num_buckets=snap.num_buckets,
            files=files,
            # clone provenance uses its OWN keys: ``source_snapshot_id``
            # belongs to the fence (a cloned GOLD table's incremental
            # high-water against its upstream) and must carry untouched
            summary={
                **self._fence_as_of(snap.version),
                "operation": "clone",
                "clone_source": os.path.abspath(self.path),
                "clone_source_snapshot_id": snap.snapshot_id,
                "clone_pin_tag": pin_tag,
            },
            merge_mode=snap.merge_mode,
            column_ids=dict(snap.column_ids),
            next_column_id=snap.next_column_id,
            dir_schemas=dict(snap.dir_schemas),
            column_defaults=dict(snap.column_defaults),
            file_stats={_abs(p): list(s) for p, s in snap.file_stats.items()},
            ts_stats={_abs(p): list(s) for p, s in snap.ts_stats.items()},
            col_stats={
                c: {_abs(p): list(s) for p, s in per.items()}
                for c, per in snap.col_stats.items()
            },
            delete_files={
                b: [_abs(f) for f in fl]
                for b, fl in snap.delete_files.items()
            },
            mor_deletes=snap.mor_deletes,
            mor_prefer=snap.mor_prefer,
            eq_deletes=[
                {**e, "paths": [_abs(p) for p in e["paths"]]}
                for e in snap.eq_deletes
            ],
            file_seq=file_seq,
            properties=dict(snap.properties),
        )
        return dest

    @classmethod
    def import_dataset(
        cls,
        spark: SparkSession,
        src_dir: str,
        dest_path: str,
        key: list[str],
        num_buckets: int | None = None,
        validate: bool = True,
    ) -> "LakeTable":
        """Zero-copy adoption of an existing parquet dataset as a LakeTable
        (Delta ``CONVERT TO DELTA`` / Iceberg ``add_files`` analogue): ONE
        metadata commit referencing the source files by absolute path — no
        data is read, copied, or rewritten, so converting 100 TB costs
        O(files) footer stat reads (the same price Iceberg add_files pays,
        and it buys manifest ts-stats from day one) plus one manifest write.

        Placement: the table is born with ``num_buckets=1`` — every key
        hashes to bucket 0, so the adopted files are correctly placed BY
        DEFINITION with zero data movement.  Run ``rebucket(N)`` afterwards
        to spread the table (that is the one full rewrite, deferred until
        the user asks), or leave it at 1 bucket for read-mostly tables.

        LWW seam: adopted files predate the ``_lsn`` column and read as
        LSN 0 — older than every feed event — so replaying a change feed
        on top gives feed events precedence, exactly the bootstrap
        contract, but without rewriting the snapshot.  (Need a non-zero
        seed LSN from a source column?  Use ``runner.bootstrap`` — that is
        the rewrite path.)

        ``validate=True`` runs ONE read-only distributed pass: null key
        values and un-arbitrated duplicate keys are refused (a snapshot is
        curated input; duplicates have no LWW tie-break at a shared LSN 0).
        """
        import glob as _glob

        if num_buckets not in (None, 1):
            raise ValueError(
                "zero-copy import requires num_buckets=1 (every key hashes "
                "to bucket 0 — correct placement with no data movement); "
                "rebucket(N) afterwards to spread the table"
            )
        src_abs = os.path.abspath(src_dir)

        def _hidden(p: str) -> bool:
            # Hadoop's hidden-path rule applies to every path COMPONENT
            # (`_temporary/...`, `.staging/...`), not just the basename —
            # the validation/schema pass (spark.read.parquet) skips such
            # files, so adopting them would commit data the validator
            # never saw (e.g. duplicate rows from crashed-job residue).
            rel = os.path.relpath(p, src_abs)
            return any(
                part.startswith(("_", ".")) for part in rel.split(os.sep)
            )

        files = sorted(
            p
            for p in _glob.glob(
                os.path.join(src_abs, "**", "*.parquet"), recursive=True
            )
            if not _hidden(p)
        )
        if not files:
            raise FileNotFoundError(f"no parquet files under {src_dir}")
        src_schema = spark.read.parquet(src_abs).schema
        reserved = {"_lsn", "_deleted", "_bucket", "_seq", "_col_lsn",
                    "_file", "_pos"}
        clash = [f.name for f in src_schema.fields if f.name in reserved]
        if clash:
            raise ValueError(
                f"source carries reserved engine column(s) {clash}; rename "
                "them before importing"
            )
        missing = [k for k in key if k not in {f.name for f in src_schema}]
        if missing:
            raise ValueError(f"key column(s) {missing} not in source schema")
        if validate:
            df = spark.read.parquet(src_abs)
            null_pred = None
            for k in key:
                c = F.col(k).isNull()
                null_pred = c if null_pred is None else (null_pred | c)
            stats = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(null_pred, 1).otherwise(0)).alias("nulls"),
                F.count_distinct(*[F.col(k) for k in key]).alias("dk"),
            ).collect()[0]
            if stats["nulls"]:
                raise ValueError(
                    f"{stats['nulls']} row(s) with NULL key — a snapshot "
                    "is curated input; repair or filter before importing"
                )
            if stats["dk"] != stats["n"] - (stats["nulls"] or 0):
                raise ValueError(
                    "duplicate keys in source and no LWW arbiter (all "
                    "imported rows share LSN 0) — dedup first, or use "
                    "runner.bootstrap with lsn_col"
                )
        schema = T.StructType(
            [
                *src_schema.fields,
                T.StructField("_lsn", T.LongType(), True),
                T.StructField("_deleted", T.BooleanType(), True),
            ]
        )
        t = cls.create(spark, dest_path, schema, key=key, num_buckets=1)
        snap = t.current()
        t._commit(
            parent=snap,
            schema=snap.schema,
            key=snap.key,
            bucket_by=snap.bucket_by,
            num_buckets=snap.num_buckets,
            files={"0": files},
            summary={
                "operation": "import",
                "import_source": src_abs,
                "files_imported": len(files),
            },
            # adopted files predate every purge (the file_seq=0 legacy rule)
            file_seq={p: 0 for p in files},
        )
        return t

    # -------------------------------------------------------------- branches
    def _branch_path(self, name: str) -> str:
        if not name or not all(c.isalnum() or c in "._-" for c in name):
            raise ValueError(f"invalid branch name {name!r}")
        return os.path.join(self.path, BRANCHES_DIR, name)

    def create_branch(
        self,
        name: str,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
    ) -> "LakeTable":
        """Named writable branch (Iceberg branch ref / Git-style dev
        branch): a zero-copy clone nested under ``<root>/_branches/<name>``
        that records its fork point so ``fast_forward`` can publish it back
        atomically.  The WAP-at-scale workflow: replay/merge/DDL into the
        branch, audit it, ``fast_forward(name)`` to make main adopt the
        branch head as ONE commit — main readers never see intermediate
        states.  All clone guarantees apply (shared files, CoW divergence,
        fork snapshot auto-pinned against source retention)."""
        if snapshot_id is not None and as_of_ms is not None:
            raise ValueError("pass snapshot_id OR as_of_ms, not both")
        if as_of_ms is not None:
            snap = self.snapshot_as_of(as_of_ms)
        elif snapshot_id is not None:
            snap = self.snapshot(snapshot_id)
        else:
            snap = self.current()
        # Per-branch fork pin (NOT the shared clone-<sid> tag): two branches
        # forked from one snapshot each own their pin, so dropping one never
        # strips the other's retention protection.
        bp = self._branch_path(name)
        if LakeTable(self.spark, bp).exists():
            raise FileExistsError(f"branch {name!r} already exists")
        pin_name = f"branch-pin-{name}"
        if pin_name in self.tags():
            # crash residue: the branch itself doesn't exist (checked
            # above), so the stale pin is ours to re-point
            self.untag(pin_name)
        self.tag(pin_name, snap.snapshot_id)
        br = self.clone_to(bp, snapshot_id=snap.snapshot_id, pin=False)
        br.alter_properties(
            {
                "branch.name": name,
                "branch.of": os.path.abspath(self.path),
                "branch.base-version": str(snap.version),
                "branch.pin": pin_name,
            }
        )
        return br

    def branch(self, name: str) -> "LakeTable":
        return LakeTable.load(self.spark, self._branch_path(name))

    def list_branches(self) -> list[str]:
        root = os.path.join(self.path, BRANCHES_DIR)
        if not os.path.isdir(root):
            return []
        return sorted(
            d
            for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d, META_DIR))
        )

    @staticmethod
    def _effective_head(br: "LakeTable") -> Snapshot:
        """Newest branch snapshot that changed DATA state (skips pure
        ``set-properties`` commits — branch bookkeeping must not read as
        unpublished work)."""
        for s in reversed(br.history()):
            if s.summary.get("operation") != "set-properties":
                return s
        return br.current()

    @staticmethod
    def _is_published(br: "LakeTable") -> bool:
        """True when branch ``br`` holds no unpublished DATA commits: its
        effective head is still the fork clone, or matches the snapshot id
        the last ``fast_forward`` recorded.  The ONE definition used by
        ``fast_forward``, ``drop_branch`` and the monitor's branch view —
        and the reason ``fast_forward`` records the EFFECTIVE head's id
        (a trailing ``alter_properties`` commit must not read as
        unpublished work forever after)."""
        eff = LakeTable._effective_head(br)
        return eff.summary.get("operation") == "clone" or str(
            eff.snapshot_id
        ) == br.current().properties.get("branch.published-snapshot-id")

    def fast_forward(self, name: str) -> Snapshot:
        """Publish branch ``name``'s head onto this table as ONE atomic
        commit (Iceberg ``fast_forward`` / Nessie merge): adopts the
        branch's file set, schema, deletes, properties and exactly-once
        fence wholesale.  Requires this table to still sit at the branch's
        fork point (the fast-forward ancestor rule) — a moved main raises
        ``CommitConflict``; recreate the branch from the new head to
        rebase.  The commit itself rides the normal version CAS, so a
        concurrent writer racing the publish loses cleanly.

        Carried sequence numbers may exceed main's version counter; the
        ``max_seq`` floor keeps every later mint above them, so adopted
        equality-delete entries can never cover files main adds later.
        """
        br = self.branch(name)
        head = br.current()
        props = head.properties
        if props.get("branch.name") != name:
            raise ValueError(f"{self._branch_path(name)} is not a managed branch")
        cur = self.current()
        eff = self._effective_head(br)
        if self._is_published(br):
            return cur  # nothing unpublished — no-op
        base_version = int(props["branch.base-version"])
        if (
            cur.summary.get("operation") == "fast-forward"
            and cur.summary.get("branch") == name
            and cur.summary.get("branch_snapshot_id") == head.snapshot_id
        ):
            # crash-recovery: the adoption commit already landed but the
            # bookkeeping after it (main tag re-point + branch published
            # properties) didn't — finish those idempotently instead of
            # failing the retry on the ancestor rule (main moved by the
            # adoption commit itself)
            try:
                self.untag(f"branch-{name}")
            except KeyError:
                pass
            self.tag(f"branch-{name}", cur.snapshot_id)
            br.alter_properties(
                {
                    "branch.base-version": str(cur.version),
                    "branch.published-snapshot-id": str(eff.snapshot_id),
                }
            )
            return cur
        if cur.version != base_version:
            raise CommitConflict(
                f"main moved (v{cur.version}) since branch {name!r} forked "
                f"(v{base_version}); recreate the branch from the current "
                "head to rebase"
            )

        def _abs(p: str) -> str:
            return (
                p
                if os.path.isabs(p)
                else os.path.abspath(os.path.join(br.path, p))
            )

        # Pin the published head on the BRANCH *before* main's adoption
        # commit references its files: a crash between the two leaves only
        # a harmless extra pin (dropped with the branch), whereas the old
        # commit-then-pin order left main referencing branch files that
        # branch retention was free to delete.
        try:
            br.tag(f"ff-{head.snapshot_id}", head.snapshot_id)
        except CommitConflict:
            pass  # re-published after a crash — pin already present

        new = self._commit(
            parent=cur,
            schema=head.schema,
            key=list(head.key),
            bucket_by=list(head.bucket_by),
            num_buckets=head.num_buckets,
            files={b: [_abs(f) for f in fl] for b, fl in head.files.items()},
            summary={
                **br._fence_as_of(head.version),
                "operation": "fast-forward",
                "branch": name,
                "branch_snapshot_id": head.snapshot_id,
            },
            merge_mode=head.merge_mode,
            column_ids=dict(head.column_ids),
            next_column_id=head.next_column_id,
            dir_schemas=dict(head.dir_schemas),
            column_defaults=dict(head.column_defaults),
            file_stats={_abs(p): list(s) for p, s in head.file_stats.items()},
            ts_stats={_abs(p): list(s) for p, s in head.ts_stats.items()},
            col_stats={
                c: {_abs(p): list(s) for p, s in per.items()}
                for c, per in head.col_stats.items()
            },
            delete_files={
                b: [_abs(f) for f in fl]
                for b, fl in head.delete_files.items()
            },
            mor_deletes=head.mor_deletes,
            mor_prefer=head.mor_prefer,
            eq_deletes=[
                {**e, "paths": [_abs(p) for p in e["paths"]]}
                for e in head.eq_deletes
            ],
            file_seq={
                _abs(f): int(head.file_seq.get(f, 0))
                for fl in head.files.values()
                for f in fl
            },
            properties={
                k: v
                for k, v in head.properties.items()
                if not k.startswith("branch.")
            },
        )
        # The ff pin on the BRANCH landed before the adoption commit (see
        # above); re-point the adoption pin on MAIN (main retention must
        # not age the adoption out while the branch lives).  Both pins
        # drop with the branch.
        try:
            self.untag(f"branch-{name}")
        except KeyError:
            pass
        self.tag(f"branch-{name}", new.snapshot_id)
        br.alter_properties(
            {
                "branch.base-version": str(new.version),
                # the EFFECTIVE head's id: _is_published compares against
                # it, and a trailing set-properties commit (head != eff)
                # must not leave the branch reading as unpublished forever
                "branch.published-snapshot-id": str(eff.snapshot_id),
            }
        )
        return new

    def drop_branch(self, name: str, force: bool = False) -> dict[str, int]:
        """Delete branch ``name``.  Refuses when the branch holds
        unpublished data commits (``fast_forward`` first, or ``force=True``
        to discard them).  Branch files still referenced by ANY retained
        main manifest (adopted by a fast-forward, or shared via the fork
        pin) survive in place — they are now main's, and main's retention
        sweeps them once unreferenced (dropped-branch roots join the orphan
        walk).  Both branch pins are removed."""
        br = self.branch(name)
        props = br.current().properties
        if not (self._is_published(br) or force):
            raise RuntimeError(
                f"branch {name!r} has unpublished commits; fast_forward it "
                "or pass force=True to discard"
            )
        refs: set[str] = set()
        snaps = self.history()
        staged = self.staged_snapshot()
        if staged is not None:
            snaps.append(staged)
        for s in snaps:
            for f in (
                *s.all_files(),
                *s.all_delete_files(),
                *s.all_eq_delete_files(),
            ):
                refs.add(
                    f
                    if os.path.isabs(f)
                    else os.path.abspath(os.path.join(self.path, f))
                )
        bp = self._branch_path(name)
        shutil.rmtree(os.path.join(bp, META_DIR), ignore_errors=True)
        kept = deleted = 0
        for dirpath, _dirnames, filenames in os.walk(bp, topdown=False):
            for fn in filenames:
                abs_f = os.path.abspath(os.path.join(dirpath, fn))
                if abs_f in refs:
                    kept += 1
                    continue
                os.unlink(abs_f)
                deleted += 1
            if not os.listdir(dirpath):
                os.rmdir(dirpath)
        for tag_name in (f"branch-{name}", props.get("branch.pin")):
            if not tag_name:
                continue
            try:
                self.untag(tag_name)
            except KeyError:
                pass
        return {"files_kept": kept, "files_deleted": deleted}

    def alter_properties(
        self,
        set_props: dict[str, str] | None = None,
        unset: list[str] | None = None,
    ) -> Snapshot:
        """Set/unset table properties as a metadata-only commit (Iceberg
        ``ALTER TABLE ... SET TBLPROPERTIES``).  Properties steer the
        maintenance policy (see the ``Snapshot.properties`` key list) and
        are carried forward by every commit; rollback keeps the CURRENT
        properties (config does not time-travel)."""
        snap = self.current()
        props = dict(snap.properties)
        for k, v in (set_props or {}).items():
            if k == "compaction.sort-order":
                # fail at DECLARATION (same rule as the TTL keys): a
                # sort order naming unknown columns would otherwise fail
                # every scheduled maintain()/compact() run instead
                unknown = [
                    c
                    for c in self._sort_order_cols(str(v))
                    if c not in {f.name for f in snap.schema.fields}
                ]
                if unknown:
                    raise ValueError(
                        f"compaction.sort-order references unknown "
                        f"column(s) {unknown}"
                    )
            if k == "stats.columns":
                # data-skipping columns: validate at DECLARATION (the
                # sort-order rule).  ``ts`` is refused — it has its own
                # dedicated ts_stats machinery (TTL, ts_between).
                fields = {f.name: f for f in snap.schema.fields}
                for c in [x.strip() for x in str(v).split(",") if x.strip()]:
                    if c == "ts":
                        raise ValueError(
                            "stats.columns: 'ts' already has dedicated "
                            "event-time stats (ts_between/TTL) — omit it"
                        )
                    if c.startswith("_") or c not in fields:
                        raise ValueError(
                            f"stats.columns references unknown or engine "
                            f"column {c!r}"
                        )
                    if not isinstance(fields[c].dataType, self._STATS_TYPES):
                        raise ValueError(
                            f"stats.columns: column {c!r} has unsupported "
                            f"type {fields[c].dataType.simpleString()} "
                            "(numeric or string only)"
                        )
            if k == "governance.row-filter":
                # row filters hide rows from the governed SQL surface;
                # validate resolution NOW (empty-relation analysis, no job)
                self._validate_governance_expr(snap, str(v), cast_to=T.BooleanType())
            if str(k).startswith("governance.mask."):
                col = str(k)[len("governance.mask."):]
                if col.startswith("_"):
                    raise ValueError(f"cannot mask engine column {col!r}")
                if "." in col:
                    # nested mask (tool_meta.call_id): parent/field resolve
                    # exactly like nested DDL paths
                    parent, fname = self._nested_parent(snap, col)
                    ptype = snap.schema[parent].dataType
                    dtype = next(
                        sf.dataType for sf in ptype.fields if sf.name == fname
                    )
                    ref = f"`{parent}`.`{fname}`"
                else:
                    fld = next(
                        (f for f in snap.schema.fields if f.name == col),
                        None,
                    )
                    if fld is None:
                        raise ValueError(f"cannot set {k}: no column {col!r}")
                    dtype, ref = fld.dataType, f"`{col}`"
                # the mask references its column via the {col} placeholder
                # and must cast back to the column's declared type
                self._validate_governance_expr(
                    snap, str(v).replace("{col}", ref), cast_to=dtype
                )
            if k in ("retention.ttl-ms", "retention.ttl-days"):
                # fail at DECLARATION, not in the middle of a scheduled
                # maintain() run: row TTL is planned/applied over the
                # event-time column, so a table without one can never
                # honor the policy (the CHECK-constraint eager-parse rule)
                tsf = next(
                    (f for f in snap.schema.fields if f.name == "ts"), None
                )
                if tsf is None or not isinstance(
                    tsf.dataType, T.TimestampType
                ):
                    raise ValueError(
                        f"cannot set {k}: row TTL needs a timestamp 'ts' "
                        "column, which this table's schema lacks"
                    )
            props[str(k)] = str(v)
        for k in unset or []:
            props.pop(k, None)
        if props == snap.properties:
            return snap
        return self._commit(
            parent=snap,
            schema=snap.schema,
            key=snap.key,
            bucket_by=snap.bucket_by,
            num_buckets=snap.num_buckets,
            files=snap.files,
            summary={
                **self.carry_fence(),
                "operation": "set-properties",
            },
            properties=props,
        )

    def _commit(
        self,
        parent: Snapshot | None,
        schema: T.StructType,
        key: list[str],
        bucket_by: list[str],
        num_buckets: int,
        files: dict[str, list[str]],
        summary: dict[str, Any],
        merge_mode: str | None = None,
        staged: bool = False,
        column_ids: dict[str, int] | None = None,
        next_column_id: int | None = None,
        dir_schemas: dict[str, dict] | None = None,
        file_stats: dict[str, list[int]] | None = None,
        ts_stats: dict[str, list[int]] | None = None,
        col_stats: dict[str, dict[str, list]] | None = None,
        delete_files: dict[str, list[str]] | None = None,
        mor_deletes: bool | None = None,
        mor_prefer: str | None = None,
        eq_deletes: list[dict] | None = None,
        file_seq: dict[str, int] | None = None,
        properties: dict[str, str] | None = None,
        column_defaults: dict[str, str] | None = None,
        version_base: int | None = None,
    ) -> Snapshot:
        # ``version_base`` starts a parentless table's version space above 1:
        # a zero-copy clone carries the SOURCE's file sequence numbers and
        # equality-delete entries verbatim, so the clone's own future commits
        # must mint sequence numbers ABOVE every carried entry's — i.e. above
        # the source version the clone was cut from.
        version = (parent.version + 1) if parent else (version_base or 1)
        snapshot_id = int(time.time() * 1000) * 1000 + (version % 1000)
        # Field-id bookkeeping: drop ids for columns no longer in the
        # schema, mint fresh ids for new columns (never reusing a retired
        # id — the Iceberg rule that makes drop + re-add-same-name safe).
        base_ids = (
            column_ids
            if column_ids is not None
            else (dict(parent.column_ids) if parent else {})
        )
        nci = (
            next_column_id
            if next_column_id is not None
            else (parent.next_column_id if parent else 1)
        )
        names = _id_names(schema)  # top-level + depth-1 struct fields
        ids = {n: i for n, i in base_ids.items() if n in set(names)}
        for n in names:
            if n not in ids:
                ids[n] = nci
                nci += 1
        # column DEFAULTs are schema-bound: prune entries whose column left
        # the schema (a later re-add mints a fresh id with no default)
        fnames_now = {f.name for f in schema.fields}
        defaults = {
            c: v
            for c, v in (
                column_defaults
                if column_defaults is not None
                else (parent.column_defaults if parent else {})
            ).items()
            if c in fnames_now
        }
        # Per-dir write schemas: register dirs new in this commit with the
        # schema being committed (= what _write_files just laid down),
        # prune dirs no longer referenced by any file of this snapshot.
        dsch = dict(
            dir_schemas
            if dir_schemas is not None
            else (parent.dir_schemas if parent else {})
        )
        live = {_commit_dir(f) for fl in files.values() for f in fl}
        dsch = {d: v for d, v in dsch.items() if d in live}
        for d in sorted(live - set(dsch)):
            dsch[d] = {"schema": schema.jsonValue(), "ids": ids}
        # Per-file _lsn bounds (Iceberg manifest column stats): carried
        # forward for surviving files, computed from parquet FOOTERS for
        # files new in this commit — a driver-side loop bounded by the
        # commit's own file count (each file was just written locally).
        live_files = {f for fl in files.values() for f in fl}
        stats = {
            p: s
            for p, s in (
                file_stats
                if file_stats is not None
                else (parent.file_stats if parent else {})
            ).items()
            if p in live_files
        }
        if any(f.name == "_lsn" for f in schema.fields):
            for rel in sorted(live_files - set(stats)):
                s = self._lsn_footer_stats(rel)
                if s is not None:
                    stats[rel] = s
        # Event-time bounds (same footer-read rule, epoch-ms ints): carried
        # for survivors, read once for files new in this commit.  Stats
        # are only valid for the FIELD ID currently bound to the logical
        # ``ts`` column: a drop+re-add or a rename onto/away from ``ts``
        # re-binds the name, after which old files' PHYSICAL ts column is
        # a retired field that reads as NULL (or a different column
        # entirely) — trusting its bounds would let ``delete_older_than``
        # metadata-drop rows whose logical ts is NULL and let
        # ``read(ts_between=…)`` skip in-window rows.  So: a ts-binding
        # change clears every carried stat, and the footer backfill only
        # runs for files whose write-time registry binds physical ``ts``
        # to the SAME id (dirs without a registry record predate all DDL
        # on this table — any DDL registers every live dir — so their
        # physical ts IS the current binding).
        ts_id = ids.get("ts")
        # explicit ts_stats come from one coherent snapshot together with
        # the ids (rollback/fast-forward/clone) — only stats INHERITED
        # from the parent can be stale against a new binding
        ts_rebound = (
            ts_stats is None
            and parent is not None
            and parent.column_ids.get("ts") != ts_id
        )
        tstats = (
            {}
            if ts_rebound
            else {
                p: s
                for p, s in (
                    ts_stats
                    if ts_stats is not None
                    else (parent.ts_stats if parent else {})
                ).items()
                if p in live_files
            }
        )
        if any(
            f.name == "ts" and isinstance(f.dataType, T.TimestampType)
            for f in schema.fields
        ):
            for rel in sorted(live_files - set(tstats)):
                rec = dsch.get(_commit_dir(rel))
                if (
                    rec is not None
                    and rec.get("ids", {}).get("ts") != ts_id
                ):
                    continue  # physical ts is a retired/other field
                s = self._footer_stats(rel, "ts")
                if s is not None:
                    tstats[rel] = s
        # Generalized column bounds (``stats.columns`` property): the
        # ts_stats carry/backfill discipline applied per column — a column
        # whose field id changed since the parent (drop + re-add; renames
        # re-key explicitly in rename_column) drops its carried entries,
        # and the footer backfill only runs for files whose write-time
        # registry binds the column to the SAME id.  First commit after
        # declaring the property backfills existing files O(files) once;
        # steady state is O(new files) footer opens.
        eff_props = (
            properties
            if properties is not None
            else (dict(parent.properties) if parent else {})
        )
        cstats_src = (
            col_stats
            if col_stats is not None
            else (parent.col_stats if parent else {})
        )
        cstats: dict[str, dict[str, list]] = {}
        for c, per_file in cstats_src.items():
            if (
                col_stats is None
                and parent is not None
                and parent.column_ids.get(c) != ids.get(c)
            ):
                continue  # rebound since the parent: stale bounds
            kept = {p: s for p, s in per_file.items() if p in live_files}
            if kept:
                cstats[c] = kept
        fnames = {f.name for f in schema.fields}
        for c in [
            x.strip()
            for x in eff_props.get("stats.columns", "").split(",")
            if x.strip()
        ]:
            if c not in fnames:
                continue  # stale property residue: collect nothing
            have = cstats.setdefault(c, {})
            for rel in sorted(live_files - set(have)):
                rec = dsch.get(_commit_dir(rel))
                if (
                    rec is not None
                    and rec.get("ids", {}).get(c) != ids.get(c)
                ):
                    continue  # physical col is a retired/other field
                s = self._footer_minmax(rel, c)
                if s is not None:
                    have[rel] = s
            if not have:
                cstats.pop(c, None)
        # File sequence numbers (the Iceberg data-sequence-number rule that
        # scopes equality deletes): carried for surviving files; files NEW
        # in this commit get this commit's version; live files with no
        # recorded seq that already existed at the parent are backfilled
        # with the PARENT's version — never the new one, or the purge
        # committing right now would skip the very files it must cover.
        seq_base = dict(
            file_seq
            if file_seq is not None
            else (parent.file_seq if parent else {})
        )
        parent_files = set(parent.all_files()) if parent else set()
        fseq = {p: s for p, s in seq_base.items() if p in live_files}
        # New files mint max(version, parent.max_seq()+1): normally just the
        # version, but after a branch fast-forward the adopted state carries
        # seqs above the version — new files must sort AFTER every carried
        # equality-delete entry or the entry would wrongly cover them.
        mint = max(version, (parent.max_seq() + 1) if parent else 0)
        for p in live_files - set(fseq):
            fseq[p] = (
                (parent.version if parent else 0)
                if p in parent_files
                else mint
            )
        # Per-file map-presence proof (the partial-update fast-path switch):
        # carried for survivors, proven from footers for files new in this
        # commit — same discipline as ts_stats.  Only meaningful while the
        # schema carries _col_lsn; a file whose footer lacks the column (or
        # shows it all-NULL) is PROVEN map-free.
        mstats = {
            p: v
            for p, v in (parent.map_stats if parent else {}).items()
            if p in live_files
        }
        if any(f.name == "_col_lsn" for f in schema.fields):
            for rel in sorted(live_files - set(mstats)):
                mstats[rel] = self._footer_map_free(rel, "_col_lsn")
        dfiles = (
            delete_files
            if delete_files is not None
            else (parent.delete_files if parent else {})
        )
        # Per-bucket manifest segments (the Iceberg manifest-file split):
        # all O(files) state — file lists, _lsn stats, sequence numbers,
        # position-delete files — leaves the snapshot skeleton and lands in
        # content-addressed per-bucket files.  Unchanged buckets hash to
        # the parent's segment and cost ZERO writes, so commit metadata I/O
        # is O(dirty buckets) at any table size.
        segments: dict[str, str] = {}
        for b in sorted(set(files) | set(dfiles)):
            bfiles = files.get(b, [])
            bcol = {
                c: {p: per[p] for p in bfiles if p in per}
                for c, per in cstats.items()
            }
            segments[b] = self._write_segment({
                "files": bfiles,
                "file_stats": {p: stats[p] for p in bfiles if p in stats},
                "ts_stats": {p: tstats[p] for p in bfiles if p in tstats},
                "col_stats": {c: per for c, per in bcol.items() if per},
                "file_seq": {p: fseq[p] for p in bfiles if p in fseq},
                "map_stats": {p: mstats[p] for p in bfiles if p in mstats},
                "delete_files": dfiles.get(b, []),
            })
        manifest = {
            "version": version,
            "snapshot_id": snapshot_id,
            "parent_id": parent.snapshot_id if parent else None,
            "schema": schema.jsonValue(),
            "key": key,
            "bucket_by": bucket_by,
            "num_buckets": num_buckets,
            "segments": segments,
            "summary": summary,
            "committed_at_ms": int(time.time() * 1000),
            "merge_mode": merge_mode
            or (parent.merge_mode if parent else "cow"),
            "column_ids": ids,
            "next_column_id": nci,
            "dir_schemas": dsch,
            "mor_deletes": (
                mor_deletes
                if mor_deletes is not None
                else (parent.mor_deletes if parent else False)
            ),
            "mor_prefer": (
                mor_prefer
                if mor_prefer is not None
                else (parent.mor_prefer if parent else "append")
            ),
            "eq_deletes": (
                eq_deletes
                if eq_deletes is not None
                else (list(parent.eq_deletes) if parent else [])
            ),
            "properties": eff_props,
            "column_defaults": defaults,
        }
        tmp = os.path.join(self.meta_path, f".tmp-{uuid.uuid4().hex}.json")
        name = _staged_name(version) if staged else _manifest_name(version)
        final = os.path.join(self.meta_path, name)
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        if staged:
            # A leftover staged-vN (crash between stage and publish) must
            # not wedge the re-staging retry: staged manifests are
            # invisible to readers and the exactly-once fence makes the
            # batch's re-application idempotent, so for single-writer WAP
            # os.replace is safe — the OCC race is still decided at
            # PUBLISH time by publish_staged's os.link (ADVICE r3 medium).
            os.replace(tmp, final)
            return self._read_manifest_file(final)
        try:
            os.link(tmp, final)  # atomic; EEXIST => lost the race
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} already committed at {self.path}"
            ) from e
        finally:
            os.unlink(tmp)
        return self._read_manifest(version)

    def _lsn_footer_stats(self, rel_path: str) -> list[int] | None:
        """[lsn_min, lsn_max] from the parquet footer, or None (missing
        column / all-null / unreadable — the file is then never skipped)."""
        return self._footer_stats(rel_path, "_lsn")

    def _footer_profile(self, rel_path: str, col: str):
        """One parquet-footer open serving every footer-proof consumer:
        ``(groups, col_present)`` where ``groups`` is the per-row-group
        ``statistics`` list (None entries for stat-less groups), or None
        when the footer is unreadable.  The scaffolding lives HERE alone —
        the _footer_stats/_null_free/_all_null front-ends interpret the
        same profile under their own proof rules."""
        try:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(os.path.join(self.path, rel_path)).metadata
            idx = None
            for i in range(md.num_columns):
                if md.schema.column(i).name == col:
                    idx = i
                    break
            if idx is None:
                return [], False
            return [
                md.row_group(rg).column(idx).statistics
                for rg in range(md.num_row_groups)
            ], True
        except Exception:
            return None

    def _footer_stats(self, rel_path: str, col: str) -> list[int] | None:
        """[min, max] of ``col`` from the parquet footer as ints (epoch ms
        for timestamp columns), or None (missing column / all-null /
        unreadable — the file is then never skipped)."""
        try:
            import datetime as _dt

            prof = self._footer_profile(rel_path, col)
            if prof is None or not prof[1]:
                return None

            def _ms(v):
                if isinstance(v, _dt.datetime):
                    if v.tzinfo is None:
                        # parquet timestamps are UTC-adjusted; pyarrow may
                        # surface them naive — naive means UTC here, and
                        # .timestamp() on naive would assume LOCAL time
                        v = v.replace(tzinfo=_dt.timezone.utc)
                    return int(v.timestamp() * 1000)
                return int(v)

            lo = hi = None
            for st in prof[0]:
                if st is None or not st.has_min_max:
                    # all-null row groups carry no min/max; if the whole
                    # group is null the file still has no usable bound
                    if st is not None and st.num_values == 0:
                        continue
                    return None  # partial stats: never skip this file
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is None:
                return None
            return [_ms(lo), _ms(hi)]
        except Exception:
            return None

    def _footer_num_rows(self, rel_path: str) -> int | None:
        """Row count from the parquet footer, or None (unreadable)."""
        try:
            import pyarrow.parquet as pq

            p = (
                rel_path
                if os.path.isabs(rel_path)
                else os.path.join(self.path, rel_path)
            )
            return int(pq.ParquetFile(p).metadata.num_rows)
        except Exception:
            return None

    def _footer_minmax(self, rel_path: str, col: str) -> list | None:
        """[min, max] of ``col`` from the parquet footer in the column's
        NATIVE type (int / float / str — the ``stats.columns`` family), or
        None under the same proof rules as ``_footer_stats``: missing
        column, any stat-less non-empty row group, or an unreadable footer
        means the file is never skipped."""
        try:
            prof = self._footer_profile(rel_path, col)
            if prof is None or not prof[1]:
                return None
            lo = hi = None
            for st in prof[0]:
                if st is None or not st.has_min_max:
                    if st is not None and st.num_values == 0:
                        continue  # all-null group: no bound, no rows
                    return None  # partial stats: never skip this file
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is None:
                return None
            if isinstance(lo, bytes):  # pre-arrow-utf8 writers
                lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
            return [lo, hi]
        except Exception:
            return None

    #: column types the ``stats.columns`` skipping family supports —
    #: totally ordered, JSON-round-trippable footer stats.  ``ts`` has its
    #: own dedicated machinery (ts_stats + TTL); timestamps here would
    #: shadow it.
    _STATS_TYPES = (
        T.IntegerType,
        T.LongType,
        T.ShortType,
        T.ByteType,
        T.FloatType,
        T.DoubleType,
        T.StringType,
    )

    @staticmethod
    def _stats_cols(snap: Snapshot) -> list[str]:
        return [
            c.strip()
            for c in snap.properties.get("stats.columns", "").split(",")
            if c.strip()
        ]

    # ----------------------------------------------------------------- read
    def bucket_expr(self, snap: Snapshot | None = None):
        """Deterministic bucket id for a row: pmod(xxhash64(key...), N)."""
        snap = snap or self.current()
        return F.pmod(F.xxhash64(*snap.bucket_by), F.lit(snap.num_buckets)).cast("int")

    def read(
        self,
        snapshot_id: int | None = None,
        buckets: list[int] | None = None,
        lsn_above: int | None = None,
        as_of_ms: int | None = None,
        ts_between: tuple[int | None, int | None] | None = None,
        between: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Read the table (optionally a past snapshot / a bucket subset).

        ``as_of_ms`` time-travels by wall clock instead of snapshot id
        (``snapshot_as_of``); mutually exclusive with ``snapshot_id``.

        Files are immutable, the manifest pins the set — this is snapshot
        isolation and time travel.  ``buckets`` is the partition-pruning path
        used by MERGE (only dirty buckets are read).

        ``lsn_above=N`` additionally skips files whose manifest ``_lsn``
        bounds prove ``lsn_max <= N`` (Iceberg column-stats file pruning):
        an incremental reader's "rows past the high-water" scan plans zero
        tasks for cold files without opening a single footer.  Callers must
        STILL apply the row-level ``_lsn > N`` filter — stats prune whole
        files; surviving files can hold straddling rows.  Files without
        recorded bounds are never skipped.

        ``ts_between=(lo_ms, hi_ms)`` returns the EVENT-TIME slice (rows
        with non-null ``ts`` inside the inclusive window; either bound may
        be None).  The row-level predicate is applied here, and files whose
        manifest ``ts`` bounds prove them disjoint from the window are
        skipped by metadata alone — the "last 7 days" analytical scan plans
        only the warm files.  Stats-skipping engages only when the
        one-live-version invariant holds (CoW, or MoR position-delete
        mode): under blind-append MoR the LWW collapse must see EVERY
        version of a key, so there the slice is filter-only.
        """
        if snapshot_id is not None and as_of_ms is not None:
            raise ValueError("pass snapshot_id OR as_of_ms, not both")
        if as_of_ms is not None:
            snap = self.snapshot_as_of(as_of_ms)
        elif snapshot_id is not None:
            snap = self.snapshot(snapshot_id)
        else:
            snap = self.current()
        return self.read_snap(
            snap,
            buckets=buckets,
            lsn_above=lsn_above,
            ts_between=ts_between,
            between=between,
        )

    def _pos_cols(self, df: DataFrame) -> DataFrame:
        """Attach the file-position identity of each row (``_file`` = path
        relative to the table root, ``_pos`` = row ordinal in that file)
        from Spark's parquet ``_metadata`` columns — the coordinates
        position-delete files reference.  Zero extra I/O: both are scan
        metadata, not data pages."""
        # rel path = everything after the LAST "/data/" marker (the table's
        # data root; commit dirs are uuid hex so the marker cannot repeat
        # below it).  substring_index is a plain scan — ~4x cheaper per row
        # than a regexp over the URI, measurable at full-table reads.
        rel = F.concat(
            F.lit(DATA_DIR + "/"),
            F.substring_index(
                F.col("_metadata.file_path"), "/" + DATA_DIR + "/", -1
            ),
        )
        return df.withColumn("_file", rel).withColumn(
            "_pos", F.col("_metadata.row_index")
        )

    def read_snap(
        self,
        snap: Snapshot,
        buckets: list[int] | None = None,
        lsn_above: int | None = None,
        with_pos: bool = False,
        ts_between: tuple[int | None, int | None] | None = None,
        between: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Read an explicit Snapshot object — also works for a staged
        (not-yet-published) snapshot, which is how the WAP audit inspects
        the post-image before anyone else can see it.

        ``with_pos=True`` appends ``_file``/``_pos`` row-position columns
        (the position-delete coordinate system).

        Equality deletes are applied here, so every read — including the
        MERGE's dirty-bucket scan and every maintenance rewrite — is net of
        purged keys by default.  That default is what makes rewrites safe:
        a rewrite that copied purged rows into NEW files would resurrect
        them (new files carry a sequence number newer than the purge)."""
        eq_entries = self._live_eq_entries(snap, buckets)
        need_pos = with_pos or bool(eq_entries)
        file_map = snap.files
        if buckets is not None:
            wanted = {str(b) for b in buckets}
            file_map = {b: fl for b, fl in file_map.items() if b in wanted}
        # Event-time file skipping is sound only when each key has ONE
        # live version in the data files (CoW always; MoR once position
        # deletes arbitrate): a blind-append MoR read must LWW-collapse
        # over every version, so pruning there could resurrect a stale
        # in-window version whose winner sits in a pruned file.
        ts_skip_ok = snap.merge_mode == "cow" or snap.mor_deletes
        ts_lo, ts_hi = ts_between if ts_between is not None else (None, None)
        if between:
            # validate against the schema ONCE (a typo'd column or a bound
            # whose type cannot compare with the stored stats must fail
            # loud, not silently skip nothing/everything)
            fmap = {f.name: f for f in snap.schema.fields}
            for c, (blo, bhi) in between.items():
                if c not in fmap:
                    raise KeyError(f"between: no column {c!r}")
                want_str = isinstance(fmap[c].dataType, T.StringType)
                for b in (blo, bhi):
                    if b is None:
                        continue
                    if want_str != isinstance(b, str):
                        raise ValueError(
                            f"between: bound {b!r} does not match column "
                            f"{c!r} type {fmap[c].dataType.simpleString()}"
                        )
        # group files by writing commit dir: each dir was written under ONE
        # schema, so field-id projection decisions are per-dir
        by_dir: dict[str, list[str]] = {}
        for fl in file_map.values():
            for f in fl:
                if lsn_above is not None:
                    s = snap.file_stats.get(f)
                    if s is not None and s[1] <= lsn_above:
                        continue  # provably no rows past the high-water
                if ts_between is not None and ts_skip_ok:
                    s = snap.ts_stats.get(f)
                    if s is not None and (
                        (ts_hi is not None and s[0] > ts_hi)
                        or (ts_lo is not None and s[1] < ts_lo)
                    ):
                        continue  # provably outside the event-time window
                if between and ts_skip_ok:
                    # generalized column bounds: same one-live-version
                    # gate — pruning a blind-append MoR read could
                    # resurrect a stale in-window version
                    skip = False
                    for c, (blo, bhi) in between.items():
                        s = snap.col_stats.get(c, {}).get(f)
                        if s is not None and (
                            (bhi is not None and s[0] > bhi)
                            or (blo is not None and s[1] < blo)
                        ):
                            skip = True
                            break
                    if skip:
                        continue  # provably outside every requested window
                by_dir.setdefault(_commit_dir(f), []).append(
                    os.path.join(self.path, f)
                )
        if not by_dir:
            empty_schema = snap.schema
            if with_pos:
                empty_schema = T.StructType(
                    [
                        *snap.schema.fields,
                        T.StructField("_file", T.StringType(), True),
                        T.StructField("_pos", T.LongType(), True),
                    ]
                )
            return self.spark.createDataFrame([], empty_schema)
        fast: dict[frozenset, list[str]] = {}
        slow: dict[str, tuple[dict, list[str]]] = {}
        dflt_ids = {
            snap.column_ids[c]
            for c in snap.column_defaults
            if c in snap.column_ids
        }
        for d, paths in by_dir.items():
            dinfo = snap.dir_schemas.get(d)
            if _dir_compatible(snap, dinfo):
                # defaulted columns ABSENT from this dir (by field id) must
                # not ride the parquet NULL-fill: group fast dirs by their
                # missing-defaults set — still one vectorized scan per
                # group, and the empty set (no defaults declared, or a dir
                # that has them all) stays the single common-case scan
                missing: frozenset = frozenset()
                if dflt_ids and dinfo is not None:
                    have = set(dinfo["ids"].values())
                    missing = frozenset(
                        c for c in snap.column_defaults
                        if snap.column_ids.get(c) not in have
                    )
                elif dflt_ids:
                    # unregistered dir: it predates every DDL on this
                    # table (add_columns registers live dirs with their
                    # PRE-add schema when a default is declared), so every
                    # defaulted column is missing from it by construction
                    missing = frozenset(snap.column_defaults)
                fast.setdefault(missing, []).extend(paths)
            else:
                k = json.dumps(dinfo, sort_keys=True)
                slow.setdefault(k, (dinfo, []))[1].extend(paths)
        parts: list[DataFrame] = []
        for missing, paths in fast.items():
            # the common case — ONE vectorized scan over every by-name-
            # compatible file; explicit schema => files missing late-added
            # columns yield NULL (add-column evolution stays metadata-only)
            p = self.spark.read.schema(snap.schema).parquet(*sorted(paths))
            if need_pos:
                p = self._pos_cols(p)
            for c in sorted(missing):
                p = p.withColumn(c, default_expr(snap, c))
            parts.append(p)
        for dinfo, paths in slow.values():
            # files written before a rename/drop/widen: read with their
            # WRITE schema, then project to the snapshot schema by field id
            wschema = T.StructType.fromJson(dinfo["schema"])
            p = self.spark.read.schema(wschema).parquet(*sorted(paths))
            if need_pos:
                p = self._pos_cols(p)
            parts.append(_project_dir(p, snap, dinfo))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # Files predating the `_lsn` column (zero-copy imports of foreign
        # parquet) read as LSN 0 — older than every event, mirroring the
        # file_seq=0 legacy convention — so LWW arbitration stays total.
        if any(f.name == "_lsn" for f in snap.schema.fields):
            out = out.withColumn(
                "_lsn", F.coalesce(F.col("_lsn"), F.lit(0).cast("long"))
            )
        if eq_entries:
            read_files = [f for fl in file_map.values() for f in fl]
            out = self._apply_eq_deletes(out, snap, eq_entries, read_files)
            if not with_pos:
                out = out.drop("_file", "_pos")
        if ts_between is not None:
            # the row-level predicate: stats pruned whole files, surviving
            # files can hold straddling rows; Catalyst pushes this to the
            # parquet scan so row groups prune too
            out = out.filter(ts_predicate(ts_between))
        if between:
            for c, (blo, bhi) in between.items():
                cond = F.col(c).isNotNull()
                if blo is not None:
                    cond = cond & (F.col(c) >= F.lit(blo))
                if bhi is not None:
                    cond = cond & (F.col(c) <= F.lit(bhi))
                out = out.filter(cond)
        return out

    def _live_eq_entries(
        self, snap: Snapshot, buckets: list[int] | None = None
    ) -> list[dict]:
        """The snapshot's equality-delete entries that could affect the
        requested buckets (entry bucket lists prune, exactly like file
        lists do)."""
        if not snap.eq_deletes:
            return []
        if buckets is None:
            return list(snap.eq_deletes)
        want = {int(b) for b in buckets}
        return [e for e in snap.eq_deletes if want & set(e["buckets"])]

    def _apply_eq_deletes(
        self,
        df: DataFrame,
        snap: Snapshot,
        entries: list[dict],
        read_files: list[str] | None = None,
    ) -> DataFrame:
        """Remove rows matched by equality-delete entries, honouring the
        sequence-number rule: a delete covers only rows from files OLDER
        than its committing version (``file_seq``), so keys re-inserted
        after the purge survive.  ``df`` must carry ``_file``.

        Plan shape: one broadcast left-anti join per distinct key-column
        signature (normally one) — the delete key sets are tiny by
        construction, the data side never shuffles.  ``read_files`` scopes
        the broadcast file→seq map to the files this read actually planned
        (the bucket-pruned set), not the whole table."""
        rev = {i: n for n, i in snap.column_ids.items()}
        files = read_files if read_files is not None else snap.all_files()
        # join key is the root-independent _file form: clone manifests
        # record absolute source paths, but the scan's _file column is
        # always 'data/<commit>/...' regardless of which root served it
        seq_df = self.spark.createDataFrame(
            [(_file_token(p), int(snap.file_seq.get(p, 0))) for p in files],
            T.StructType(
                [
                    T.StructField("_sq_file", T.StringType(), False),
                    T.StructField("_fseq", T.LongType(), False),
                ]
            ),
        )
        df = (
            df.join(
                F.broadcast(seq_df),
                df["_file"] == seq_df["_sq_file"],
                "left",
            )
            .drop("_sq_file")
            .withColumn("_fseq", F.coalesce(F.col("_fseq"), F.lit(0)))
        )
        groups: dict[tuple, list[dict]] = {}
        for e in entries:
            groups.setdefault(tuple(e["col_ids"]), []).append(e)
        for ids, es in groups.items():
            cur_names = [rev.get(i) for i in ids]
            dels = None
            for e in es:
                d = self.eq_entry_keys(e, snap=snap)
                d = d.select(
                    *[F.col(n).alias(f"_eqd_{n}") for n in cur_names]
                ).withColumn("_eq_seq", F.lit(int(e["seq"])))
                dels = d if dels is None else dels.unionByName(d)
            cond = F.col("_fseq") < F.col("_eq_seq")
            for n in cur_names:
                cond = cond & F.col(n).eqNullSafe(F.col(f"_eqd_{n}"))
            df = df.join(F.broadcast(dels), cond, "left_anti")
        return df.drop("_fseq")

    def eq_entry_keys(
        self, entry: dict, snap: Snapshot | None = None
    ) -> DataFrame:
        """One equality-delete entry's key values, aligned BY FIELD ID to
        the snapshot's current column names and types (key files carry the
        names at purge time, so a later rename/widen still enforces)."""
        snap = snap or self.current()
        rev = {i: n for n, i in snap.column_ids.items()}
        names = []
        for i in entry["col_ids"]:
            n = rev.get(i)
            if n is None:
                raise RuntimeError(
                    f"equality-delete entry references column id {i} "
                    f"which was dropped from {self.path}; the purge can "
                    "no longer be enforced — compact() before dropping "
                    "purge key columns"
                )
            names.append(n)
        d = self.spark.read.parquet(
            *[os.path.join(self.path, p) for p in entry["paths"]]
        )
        return d.select(
            *[
                F.col(old).cast(snap.schema[new].dataType).alias(new)
                for old, new in zip(entry["cols"], names)
            ]
        )

    def _delete_rows(
        self, snap: Snapshot, buckets: list[int] | None = None
    ) -> DataFrame | None:
        """(file, pos) rows of the snapshot's position-delete files for the
        requested buckets, or None when there are none."""
        file_map = snap.delete_files
        if buckets is not None:
            wanted = {str(b) for b in buckets}
            file_map = {b: fl for b, fl in file_map.items() if b in wanted}
        paths = sorted(
            os.path.join(self.path, f) for fl in file_map.values() for f in fl
        )
        if not paths:
            return None
        schema = T.StructType(
            [
                T.StructField("file", T.StringType(), False),
                T.StructField("pos", T.LongType(), False),
            ]
        )
        return self.spark.read.schema(schema).parquet(*paths)

    def current_versions(
        self,
        snap: Snapshot | None = None,
        buckets: list[int] | None = None,
        with_pos: bool = False,
        ts_between: tuple[int | None, int | None] | None = None,
        between: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """One CURRENT row version per key (tombstones included) under the
        table's merge mode:

        * CoW: the plain snapshot read (one version per key by contract).
        * MoR + position deletes (``mor_deletes``): scan minus delete-file
          anti-join — NO key shuffle; the delete set is small (one row per
          superseded version) so the join broadcasts.  This is the
          Iceberg-v2 read path that makes update-heavy MoR reads cheap.
        * Legacy MoR (no delete files): the historical LWW hash-collapse.
        """
        snap = snap or self.current()
        if snap.merge_mode != "mor":
            return self.read_snap(
                snap, buckets=buckets, with_pos=with_pos,
                ts_between=ts_between, between=between,
            )
        if snap.mor_deletes:
            # one live version per key: the event-time slice can prune and
            # filter BEFORE the position-delete anti-join (delete rows
            # reference superseded coordinates — pruning data files never
            # hides a winner)
            dels = self._delete_rows(snap, buckets)
            if dels is None and not with_pos:
                # no outstanding deletes (e.g. right after compaction):
                # a plain flat scan, same as CoW
                df = self.read_snap(
                    snap, buckets=buckets, ts_between=ts_between,
                    between=between,
                )
                return df.drop("_seq") if "_seq" in df.columns else df
            df = self.read_snap(
                snap, buckets=buckets, with_pos=True, ts_between=ts_between,
                between=between,
            )
            if dels is not None:
                df = df.join(
                    dels,
                    on=(df["_file"] == dels["file"])
                    & (df["_pos"] == dels["pos"]),
                    how="left_anti",
                )
            if "_seq" in df.columns:
                # residue of a mor-append phase whose compaction restored
                # the invariant: internal column, never user-visible
                df = df.drop("_seq")
            return df if with_pos else df.drop("_file", "_pos")
        # blind-append MoR: the LWW collapse must see EVERY version of a
        # key, so the event-time slice applies strictly AFTER the collapse
        df = self.read_snap(snap, buckets=buckets, with_pos=with_pos)
        df = self._lww_collapse(df, snap=snap)
        if "_seq" in df.columns:
            df = df.drop("_seq")
        if ts_between is not None:
            df = df.filter(ts_predicate(ts_between))
        if between:
            for c, (blo, bhi) in between.items():
                cond = F.col(c).isNotNull()
                if blo is not None:
                    cond = cond & (F.col(c) >= F.lit(blo))
                if bhi is not None:
                    cond = cond & (F.col(c) <= F.lit(bhi))
                df = df.filter(cond)
        return df

    def read_keys(
        self, bucket_values: list, snap: Snapshot | None = None
    ) -> DataFrame:
        """Key-targeted read: prune the scan to the buckets the given
        ``bucket_by`` values hash to, then filter to exactly those values.

        The point-/multi-key query path (the reference's BigQuery key
        lookups): at 10^10 rows a conv_id lookup touches 1 of N bucket file
        sets instead of the table.  ``bucket_values`` are values of the
        table's ``bucket_by`` column (single-column bucketing; the common
        case and this engine's default ``conv_id``).  ``snap`` time-travels
        the lookup (pair with ``snapshot_as_of`` for "what did this
        conversation look like at 9am").
        """
        snap = snap or self.current()
        if len(snap.bucket_by) != 1:
            raise ValueError("read_keys supports single-column bucketing")
        col = snap.bucket_by[0]
        # bucket ids for the requested values: one tiny spark job over a
        # literal DF (xxhash64 is a JVM function; never reimplement it
        # driver-side — drift would silently unprune the wrong bucket)
        vals_df = self.spark.createDataFrame(
            [(v,) for v in bucket_values], T.StructType([snap.schema[col]])
        )
        buckets = [
            r["_b"]
            for r in vals_df.select(
                F.pmod(F.xxhash64(F.col(col)), F.lit(snap.num_buckets))
                .cast("int")
                .alias("_b")
            )
            .distinct()
            .collect()
        ]
        return self.current_versions(snap=snap, buckets=buckets).filter(
            F.col(col).isin(list(bucket_values))
        )

    # ---------------------------------------------------------------- write
    def _write_files(
        self,
        df: DataFrame,
        snap: Snapshot,
        sort_keys: list[str] | None = None,
        max_records_per_file: int | None = None,
        sort_exprs: list | None = None,
    ) -> dict[str, list[str]]:
        """Write df (already carrying BUCKET_COL) under a fresh commit dir.

        Returns bucket -> relative file paths.  partitionBy(_bucket) keeps the
        bucket column out of the data files; each bucket's rows are colocated
        so per-bucket replacement stays surgical.

        ``sort_keys``: lay rows down sorted by (bucket, keys...) within each
        task.  Sorting on the materialized BUCKET_COL attribute (not the
        bucket expression) matters: the dynamic-partition writer requires
        ordering by the partition column and would otherwise insert its own
        bucket-only sort, destroying the secondary key order.
        """
        commit_dir = uuid.uuid4().hex
        out_abs = os.path.join(self.path, DATA_DIR, commit_dir)
        cols = [f.name for f in snap.schema.fields]
        out = df.select(BUCKET_COL, *cols)
        if sort_exprs:
            # expression sort (z-order): MATERIALIZE each expression once
            # as a temp column, sort, then project it away.  Sorting by the
            # raw expression instead inlines the word arithmetic (string
            # hash, min-max scale) into every one of the ~16 bit-extraction
            # terms — measured 20x compaction slowdown at 2M rows from the
            # repeated hashing.  The projection after the sort is a narrow
            # map, so intra-partition order reaches the writer intact (the
            # sort leads with the partition column, satisfying the dynamic-
            # partition writer's required ordering — no re-sort).
            sx = [e.alias(f"_sx{i}") for i, e in enumerate(sort_exprs)]
            out = (
                out.select("*", *sx)
                .sortWithinPartitions(
                    BUCKET_COL, *[f"_sx{i}" for i in range(len(sx))]
                )
                .select(BUCKET_COL, *cols)
            )
        elif sort_keys:
            out = out.sortWithinPartitions(BUCKET_COL, *sort_keys)
        writer = out.write.partitionBy(BUCKET_COL).mode("append")
        if max_records_per_file:
            # write.target-file-size analogue: with a sort order, the split
            # files carry DISJOINT stat ranges — the file-pruning substrate
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        # Parquet bloom filter on the bucket column (Iceberg write.
        # parquet.bloom-filter-enabled analogue), MAINTENANCE writes only
        # (``sort_keys`` marks the compact/rebucket path): point lookups
        # (``read_keys``) skip row groups whose bloom rejects the key.
        # Never on the ingest hot path — a measured A/B at level 8 put the
        # bitset construction at ~3x replay wall on a high-cardinality
        # insert-heavy feed (17.0 s vs 5.9 s per 2M events), so ingest
        # files rely on dictionary/min-max skipping until compaction
        # rewrites them with both the sort order and the bloom.
        if (sort_keys or sort_exprs) and snap.bucket_by:
            writer = writer.option(
                f"parquet.bloom.filter.enabled#{snap.bucket_by[0]}", "true"
            ).option("parquet.bloom.filter.adaptive.enabled", "true")
        writer.parquet(out_abs)
        files: dict[str, list[str]] = {}
        if not os.path.isdir(out_abs):
            return files
        for entry in sorted(os.listdir(out_abs)):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(out_abs, entry)
            rel = [
                os.path.join(DATA_DIR, commit_dir, entry, fn)
                for fn in sorted(os.listdir(bdir))
                if fn.endswith(".parquet")
            ]
            if rel:
                files[b] = rel
        return files

    def _write_delete_files(self, delete_df: DataFrame) -> dict[str, list[str]]:
        """Write position-delete rows (``_bucket``, ``file``, ``pos``) under
        a fresh commit dir, one file set per bucket (same layout rule as
        data files, so bucket pruning applies to delete reads too).
        Returns bucket -> relative delete-file paths (empty for an empty
        delete set — no files, no manifest entries)."""
        commit_dir = uuid.uuid4().hex
        out_abs = os.path.join(self.path, DATA_DIR, commit_dir)
        (
            # REBALANCE by bucket: a batch's delete set is tiny relative to
            # its data, so AQE coalesces the write to a couple of tasks —
            # without this, every shuffle partition emits a file per bucket
            # and the accumulated tiny delete files dominate read planning
            delete_df.select(BUCKET_COL, "file", "pos")
            .hint("rebalance", BUCKET_COL)
            .write.partitionBy(BUCKET_COL)
            .mode("append")
            .parquet(out_abs)
        )
        files: dict[str, list[str]] = {}
        if not os.path.isdir(out_abs):
            return files
        for entry in sorted(os.listdir(out_abs)):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(out_abs, entry)
            rel = [
                os.path.join(DATA_DIR, commit_dir, entry, fn)
                for fn in sorted(os.listdir(bdir))
                if fn.endswith(".parquet")
            ]
            if rel:
                files[b] = rel
        return files

    def _additive_since(self, base: Snapshot, head: Snapshot) -> str | None:
        """Why the commits between ``base`` and ``head`` are NOT pure
        additions (None = every interloper only ADDED files).  The
        admission rule for metadata-level commit rebase: an additive
        commit (append / MoR merge-delta) computed against ``base`` is
        still valid verbatim on ``head`` iff nothing it read was removed
        or re-shaped — no file deletions (compaction/CoW replace), no
        new equality deletes (its pre-image read would have missed a
        purge), no schema / field-id / partition-spec / property change.
        The Iceberg "concurrent appends never conflict" validation."""
        if head.version <= base.version:
            return f"head v{head.version} is not ahead of base v{base.version}"
        if head.schema.jsonValue() != base.schema.jsonValue():
            return "schema changed"
        if head.column_ids != base.column_ids:
            return "column ids changed"
        if (
            head.key != base.key
            or head.bucket_by != base.bucket_by
            or head.num_buckets != base.num_buckets
            or head.merge_mode != base.merge_mode
        ):
            return "key/partition spec changed"
        if head.properties != base.properties:
            return "table properties changed"
        if head.eq_deletes != base.eq_deletes:
            return "equality deletes changed"
        if not set(base.all_files()) <= set(head.all_files()):
            return "data files removed (rewrite committed)"
        if not set(base.all_delete_files()) <= set(head.all_delete_files()):
            return "position-delete files removed (rewrite committed)"
        return None

    def _commit_additive(
        self,
        base: Snapshot,
        new_files: dict[str, list[str]],
        new_delete_files: dict[str, list[str]] | None,
        summary: dict[str, Any],
        *,
        op: str,
        staged: bool,
        mor_deletes: bool | None,
        rebase=None,
    ) -> Snapshot:
        """Commit a pure ADDITION (files/delete-files already on disk) with
        optional metadata-level rebase: when another writer's commit lands
        between ``base`` and this commit's version CAS, and every interloper
        was itself additive (``_additive_since``), the addition is re-linked
        onto the new head WITHOUT re-running the data job — O(manifest)
        instead of O(merge).  ``rebase`` is None (off: conflict raises, the
        caller's full retry loop owns recovery), or a callable
        ``head_snapshot -> dict`` whose result overrides summary keys that
        must be recomputed against the new head (the fan-in ``fences`` map —
        a rebased commit keeping its stale map would erase the interloping
        source's fence and break exactly-once on redelivery)."""
        head = base
        while True:
            merged = {b: list(fl) for b, fl in head.files.items()}
            for b, fl in new_files.items():
                merged.setdefault(b, []).extend(fl)
            merged_dels = {b: list(fl) for b, fl in head.delete_files.items()}
            for b, fl in (new_delete_files or {}).items():
                merged_dels.setdefault(b, []).extend(fl)
            s = {"operation": op, **summary}
            if head is not base:
                if callable(rebase):
                    s.update(rebase(head))
                s["occ_rebase"] = {
                    "base_version": base.version,
                    "rebased_over": head.version - base.version,
                }
            try:
                return self._commit(
                    parent=head,
                    schema=head.schema,
                    key=head.key,
                    bucket_by=head.bucket_by,
                    num_buckets=head.num_buckets,
                    files=merged,
                    summary=s,
                    delete_files=merged_dels,
                    mor_deletes=mor_deletes,
                    staged=staged,
                )
            except CommitConflict:
                if rebase is None or staged:
                    raise
                newhead = self.current()
                why = self._additive_since(base, newhead)
                if why:
                    raise CommitConflict(
                        f"cannot metadata-rebase {op} onto "
                        f"v{newhead.version}: {why}"
                    ) from None
                head = newhead

    def append_mor_delta(
        self,
        df: DataFrame,
        delete_df: DataFrame | None,
        summary: dict[str, Any] | None = None,
        staged: bool = False,
        base: Snapshot | None = None,
        rebase=None,
    ) -> Snapshot:
        """Merge-on-read MERGE commit (Iceberg v2 shape): append the batch's
        winning row versions as data files PLUS position-delete files
        marking the ordinals they supersede in older files — one atomic
        commit, no bucket rewrite.  ``delete_df`` columns: ``_bucket``,
        ``file`` (table-relative path), ``pos`` (row ordinal).  ``base``
        pins the snapshot the deletes were computed against (see
        ``replace_buckets``) — stale positions must conflict, not commit.

        ``rebase`` (see ``_commit_additive``) lets the commit re-link onto
        a moved head when every interloper was itself additive.  For
        position-delete merges this is only sound when concurrent writers
        own DISJOINT key sets (the fan-in sharded-OLTP contract): a rebase
        never re-arbitrates LWW against rows an interloper wrote, so an
        overlapping key would end up with two live versions under an
        invariant that promises one.  Callers gate it on the
        ``occ.additive-rebase`` table property for exactly that reason."""
        snap = base or self.current()
        bucketed = df.withColumn(BUCKET_COL, self.bucket_expr(snap))
        new_files = self._write_files(bucketed, snap)
        ndels = (
            self._write_delete_files(delete_df)
            if delete_df is not None
            else None
        )
        return self._commit_additive(
            snap,
            new_files,
            ndels,
            summary or {},
            op="merge-delta",
            staged=staged,
            mor_deletes=None,
            rebase=rebase,
        )

    def append(
        self,
        df: DataFrame,
        summary: dict[str, Any] | None = None,
        staged: bool = False,
        base: Snapshot | None = None,
        rebase=None,
    ) -> Snapshot:
        """Append rows (no key reconciliation — the reference's WRITE_APPEND,
        credix_pipeline/resources/gcp_resource.py:32-67).

        On a merge-on-read table a blind append may introduce a second live
        version of a key, so it CLEARS the position-delete invariant —
        reads fall back to the (correct, slower) LWW collapse until the
        next ``compact()`` restores it.

        ``rebase`` (see ``_commit_additive``): blind appends perform no key
        reconciliation, so two concurrent appends ALWAYS commute — the
        rebase is unconditionally sound here and only the summary fence
        hook needs the new head."""
        snap = base or self.current()
        bucketed = df.withColumn(BUCKET_COL, self.bucket_expr(snap))
        new_files = self._write_files(bucketed, snap)
        return self._commit_additive(
            snap,
            new_files,
            None,
            summary or {},
            op="append",
            staged=staged,
            mor_deletes=False if snap.merge_mode == "mor" else None,
            rebase=rebase,
        )

    def delete_keys(
        self,
        keys,
        cols: list[str] | None = None,
        summary: dict[str, Any] | None = None,
        staged: bool = False,
    ) -> Snapshot:
        """Purge every CURRENT row matching the given key values — an
        Iceberg v2 EQUALITY-DELETE commit: the key values are written as one
        tiny delete file and linked in the manifest; **no data file is read
        or rewritten** (O(keys), never O(table) — the GDPR/right-to-be-
        forgotten path at 100 TB).  Reads anti-join the key set against rows
        from files older than this commit (broadcast — the key set is small
        by construction), so rows of the same key written AFTER the purge
        are visible.  ``compact()`` materializes the purge physically;
        ``expire_snapshots`` then ages out the pre-purge files.

        ``keys``: a DataFrame whose columns are the purge key, or a list of
        values / tuples for ``cols`` (default: the table's bucket columns —
        purge-by-conversation for the default layout).  When the purge key
        covers the bucket columns the entry records the affected buckets,
        so reads of other buckets never even plan the anti-join.
        """
        snap = self.current()
        names = {f.name for f in snap.schema.fields}
        if isinstance(keys, DataFrame):
            cols = list(cols) if cols else list(keys.columns)
        else:
            cols = list(cols) if cols else list(snap.bucket_by)
        if not cols:
            raise ValueError("delete_keys needs at least one key column")
        unknown = [c for c in cols if c not in names]
        if unknown:
            raise ValueError(f"purge columns not in schema: {unknown}")
        if isinstance(keys, DataFrame):
            kdf = keys.select(*cols)
        else:
            rows = [
                tuple(v) if isinstance(v, (tuple, list)) else (v,)
                for v in keys
            ]
            kdf = self.spark.createDataFrame(
                rows, T.StructType([snap.schema[c] for c in cols])
            )
        kdf = kdf.select(
            *[F.col(c).cast(snap.schema[c].dataType) for c in cols]
        ).distinct()
        commit_dir = uuid.uuid4().hex
        out_abs = os.path.join(self.path, DATA_DIR, commit_dir)
        kdf.coalesce(1).write.parquet(out_abs)
        rel_paths = [
            os.path.join(DATA_DIR, commit_dir, fn)
            for fn in sorted(os.listdir(out_abs))
            if fn.endswith(".parquet")
        ]
        n = self.spark.read.parquet(out_abs).count()
        if n == 0:
            shutil.rmtree(out_abs, ignore_errors=True)
            return snap
        if set(snap.bucket_by) <= set(cols):
            buckets = sorted(
                r["_b"]
                for r in self.spark.read.parquet(out_abs)
                .select(self.bucket_expr(snap).alias("_b"))
                .distinct()
                .collect()
            )
        else:
            buckets = list(range(snap.num_buckets))
        # a bucket with NO files can never hold a covered row (any future
        # file carries a newer sequence number), so scope the entry to
        # buckets that exist — a purge matching nothing commits nothing
        buckets = [b for b in buckets if snap.files.get(str(b))]
        if not buckets:
            shutil.rmtree(out_abs, ignore_errors=True)
            return snap
        entry = {
            "paths": rel_paths,
            "cols": cols,
            "col_ids": [snap.column_ids[c] for c in cols],
            # above every live seq (normally version+1): rows in files at
            # least this new were written after the purge and survive
            # (sequence-number rule); max_seq keeps this sound after a
            # branch fast-forward carried higher seqs than the version
            "seq": snap.max_seq() + 1,
            "buckets": buckets,
        }
        return self._commit(
            parent=snap,
            schema=snap.schema,
            key=snap.key,
            bucket_by=snap.bucket_by,
            num_buckets=snap.num_buckets,
            files=snap.files,
            summary={
                **self.carry_fence(),
                "operation": "delete-keys",
                "purged_keys": n,
                **(summary or {}),
            },
            eq_deletes=[*snap.eq_deletes, entry],
            staged=staged,
        )

    def _null_free(self, rel_path: str, col: str) -> bool:
        """True iff parquet footer stats PROVE ``col`` has no nulls in the
        file.  Unknown (missing stats, unreadable) is False — callers must
        then take the safe path."""
        try:
            prof = self._footer_profile(rel_path, col)
            if prof is None or not prof[1]:
                return False
            return all(
                st is not None
                and st.null_count is not None
                and st.null_count == 0
                for st in prof[0]
            )
        except Exception:
            return False

    def _footer_map_free(self, rel_path: str, col: str) -> bool:
        """True iff footer stats PROVE the MAP column ``col`` holds no
        entries in any row of the file (column absent, or every leaf chunk
        — parquet flattens maps to ``col.key_value.key``/``.value`` leaves
        — shows zero non-null values).  A NULL map contributes a null slot
        but no values, so null-only files prove free.  Unknown is False —
        callers take the fold path."""
        try:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(os.path.join(self.path, rel_path)).metadata
            idxs = [
                i for i in range(md.num_columns)
                if md.schema.column(i).path == col
                or md.schema.column(i).path.startswith(col + ".")
            ]
            if not idxs:
                return True  # column not stored: reads project NULL
            for rg in range(md.num_row_groups):
                for i in idxs:
                    st = md.row_group(rg).column(i).statistics
                    if (
                        st is None
                        or st.num_values is None
                        or st.num_values > 0
                    ):
                        return False
            return True
        except Exception:
            return False

    def _all_null(self, rel_path: str, col: str) -> bool:
        """True iff footer stats PROVE ``col`` is entirely NULL (or absent)
        in the file — then no row of it can ever satisfy a ``col``-based
        predicate.  Unknown is False."""
        try:
            prof = self._footer_profile(rel_path, col)
            if prof is None:
                return False
            if not prof[1]:
                return True  # column not stored: reads project NULL
            return all(
                st is not None
                and st.num_values is not None
                and st.num_values == 0
                for st in prof[0]
            )
        except Exception:
            return False

    def delete_older_than(
        self,
        cutoff_ms: int,
        summary: dict[str, Any] | None = None,
        staged: bool = False,
    ) -> Snapshot:
        """Row TTL / retention delete: remove every current row whose
        event time ``ts`` is strictly before ``cutoff_ms`` (rows with NULL
        ``ts`` are kept — expiry can't be proven).  The Iceberg
        ``DELETE FROM t WHERE ts < X`` partition-expiry pattern, planned
        from manifest ``ts_stats`` so the cost is O(affected), never
        O(table):

        * files whose ts bounds prove ``max < cutoff`` (and whose footer
          proves no NULL ts — bounds cover only non-null values) are
          DROPPED from the manifest: metadata-only, no data read;
        * buckets holding straddling files (``min < cutoff <= max``) or
          files without recorded bounds are rewritten copy-on-write with
          the keep-filter applied — boundary work only;
        * wholly-live files are untouched.

        The metadata drop and the FILE-granular rewrite require the
        one-live-version invariant (CoW or MoR position-delete mode):
        under blind-append MoR a dropped file could hold the LATEST
        version of a key whose OLDER version survives in a straddling
        file, resurrecting it — those buckets take a whole-bucket rewrite
        through the LWW collapse instead (always correct).  With the
        invariant, only the straddling/stats-less FILES rewrite and every
        other file in the bucket is carried over untouched — on a
        key-bucketed layout where every bucket spans all days, a mid-day
        cutoff rewrites one day's files, not every bucket (the difference
        between O(boundary) and O(table) at 100 TB).

        One atomic commit covers both paths; a reader never sees a
        partially-applied TTL.  Time travel to pre-TTL snapshots keeps
        working until retention ages the dropped files out, and the
        commit diff propagates through changelog / relay / incremental
        gold as ordinary deletes."""
        import dataclasses

        snap = self.current()
        tsf = next((f for f in snap.schema.fields if f.name == "ts"), None)
        if tsf is None or not isinstance(tsf.dataType, T.TimestampType):
            raise ValueError(
                "delete_older_than needs a timestamp 'ts' column"
            )
        one_live = snap.merge_mode == "cow" or snap.mor_deletes
        dirty_full: set[str] = set()  # blind-append MoR: whole-bucket LWW
        drop: dict[str, set[str]] = {}
        rewrite: dict[str, list[str]] = {}
        for b, fl in snap.files.items():
            expired, rw = [], []
            for f in fl:
                s = snap.ts_stats.get(f)
                if s is None:
                    # stats-less: an all-NULL-ts file can never expire a
                    # row — leave it alone (rewriting it would churn every
                    # TTL run); anything else must look at the rows
                    if not self._all_null(f, "ts"):
                        rw.append(f)
                elif s[1] < cutoff_ms:
                    expired.append(f)
                elif s[0] < cutoff_ms:
                    rw.append(f)  # straddles the cutoff
            if not expired and not rw:
                continue
            if not one_live:
                dirty_full.add(b)
                continue
            for f in expired:
                if self._null_free(f, "ts"):
                    drop.setdefault(b, set()).add(f)
                else:
                    rw.append(f)  # holds NULL-ts rows that must survive
            if rw:
                rewrite[b] = rw
        if not dirty_full and not drop and not rewrite:
            return snap

        new_files: dict[str, list[str]] = {}
        keep_pred = F.col("ts").isNull() | (
            F.col("ts") >= F.timestamp_millis(F.lit(cutoff_ms))
        )
        if dirty_full:
            ids = sorted(int(b) for b in dirty_full)
            src = self._lww_collapse(
                self.read_snap(snap, buckets=ids), snap=snap
            )
            keep = src.filter(keep_pred).repartition(
                max(1, len(ids)), self.bucket_expr(snap)
            )
            new_files = self._write_files(
                keep.withColumn(BUCKET_COL, self.bucket_expr(snap)), snap
            )
        elif rewrite:
            # file-subset read through the normal reader (dir-schema
            # projection + equality deletes apply as on any read); under
            # one-live-version the subset partitions the rows exactly
            sub = dataclasses.replace(
                snap, files={b: list(fl) for b, fl in rewrite.items()}
            )
            if snap.merge_mode == "mor" and snap.mor_deletes:
                df = self.read_snap(sub, with_pos=True)
                dels = self._delete_rows(snap, [int(b) for b in rewrite])
                if dels is not None:
                    df = df.join(
                        dels,
                        on=(df["_file"] == dels["file"])
                        & (df["_pos"] == dels["pos"]),
                        how="left_anti",
                    )
                df = df.drop("_file", "_pos")
            else:
                df = self.read_snap(sub)
            keep = df.filter(keep_pred).repartition(
                max(1, len(rewrite)), self.bucket_expr(snap)
            )
            new_files = self._write_files(
                keep.withColumn(BUCKET_COL, self.bucket_expr(snap)), snap
            )

        merged: dict[str, list[str]] = {}
        for b, fl in snap.files.items():
            if b in dirty_full:
                continue
            gone = drop.get(b, set()) | set(rewrite.get(b, []))
            merged[b] = [f for f in fl if f not in gone]
        for b, fl in new_files.items():
            merged.setdefault(b, []).extend(fl)
        # whole-bucket rewrites consume the bucket's position deletes;
        # file-subset rewrites KEEP them (remaining old files may still be
        # covered; entries pointing at dropped/rewritten paths anti-join
        # nothing)
        kept_dels = {
            b: list(fl)
            for b, fl in snap.delete_files.items()
            if b not in dirty_full
        }
        # equality-delete entries: whole-bucket rewrites consume (the read
        # was net of purges, new files carry a newer sequence number);
        # file-subset rewrites keep them for the carried-over files
        kept_eq = []
        for e in snap.eq_deletes:
            rem = [
                b
                for b in e["buckets"]
                if str(b) not in dirty_full and merged.get(str(b))
            ]
            if rem:
                kept_eq.append({**e, "buckets": rem})
        n_dropped = sum(len(v) for v in drop.values())
        rewritten_buckets = dirty_full or set(rewrite)
        return self._commit(
            parent=snap,
            schema=snap.schema,
            key=snap.key,
            bucket_by=snap.bucket_by,
            num_buckets=snap.num_buckets,
            files=merged,
            summary={
                **self.carry_fence(),
                "operation": "ttl-delete",
                "cutoff_ms": int(cutoff_ms),
                "files_dropped": n_dropped,
                "files_rewritten": sum(len(v) for v in rewrite.values()),
                "buckets_rewritten": len(rewritten_buckets),
                **(summary or {}),
            },
            delete_files=kept_dels,
            eq_deletes=kept_eq,
            staged=staged,
        )

    def replace_buckets(
        self,
        dirty_buckets: list[int],
        new_df: DataFrame,
        summary: dict[str, Any] | None = None,
        schema: T.StructType | None = None,
        sort_keys: list[str] | None = None,
        staged: bool = False,
        restore_mor_invariant: bool = False,
        base: Snapshot | None = None,
        max_records_per_file: int | None = None,
        sort_exprs: list | None = None,
    ) -> Snapshot:
        """Copy-on-write commit: swap the file sets of ``dirty_buckets`` for
        the files of ``new_df`` (which must contain exactly those buckets'
        rows, post-merge).  Untouched buckets keep their files — this is the
        partition-scoped overwrite that makes MERGE O(dirty) not O(table).

        ``schema`` lets the same commit carry an evolution (add-column): the
        new files are written with the new schema, old files in untouched
        buckets read as NULL for the added columns.

        ``base`` pins the snapshot this rewrite was COMPUTED against (the
        Iceberg validation rule): if any other writer committed after
        ``base``, the version link fails with ``CommitConflict`` instead of
        silently replacing state the rewrite never saw — without the pin, a
        commit landing in the compute window would be LOST, not conflicted.
        """
        snap = base or self.current()
        out_schema = schema or snap.schema
        write_snap = Snapshot(
            version=snap.version,
            snapshot_id=snap.snapshot_id,
            parent_id=snap.parent_id,
            schema=out_schema,
            key=snap.key,
            bucket_by=snap.bucket_by,
            num_buckets=snap.num_buckets,
            files=snap.files,
            summary=snap.summary,
            committed_at_ms=snap.committed_at_ms,
        )
        bucketed = new_df.withColumn(BUCKET_COL, self.bucket_expr(snap))
        new_files = self._write_files(
            bucketed,
            write_snap,
            sort_keys=sort_keys,
            max_records_per_file=max_records_per_file,
            sort_exprs=sort_exprs,
        )
        dirty = {str(b) for b in dirty_buckets}
        merged = {b: list(fl) for b, fl in snap.files.items() if b not in dirty}
        for b, fl in new_files.items():
            merged.setdefault(b, []).extend(fl)
        # a rewritten bucket's position-delete files are consumed by the
        # rewrite (the new files are already net-of-deletes)
        kept_dels = {
            b: list(fl)
            for b, fl in snap.delete_files.items()
            if b not in dirty
        }
        # equality-delete entries are consumed per bucket the same way: the
        # rewrite read was net of purges (read_snap applies them) and the
        # new files carry a NEWER sequence number, so dropping the covered
        # buckets from each entry is a pure read-path optimization — the
        # sequence rule keeps correctness either way
        kept_eq = []
        for e in snap.eq_deletes:
            # drop rewritten buckets AND buckets left with no files at all
            # (vacuous: any future file carries a newer sequence number)
            rem = [
                b
                for b in e["buckets"]
                if str(b) not in dirty and merged.get(str(b))
            ]
            if rem:
                kept_eq.append({**e, "buckets": rem})
        return self._commit(
            parent=snap,
            schema=out_schema,
            key=snap.key,
            bucket_by=snap.bucket_by,
            num_buckets=snap.num_buckets,
            files=merged,
            summary={"operation": "merge", **(summary or {})},
            delete_files=kept_dels,
            eq_deletes=kept_eq,
            # compaction-style rewrites collapse to one version per key in
            # the rewritten buckets; with ALL buckets rewritten (or none
            # previously violating), the caller attests the invariant
            mor_deletes=True if restore_mor_invariant else None,
            staged=staged,
        )

    def add_columns(
        self,
        fields: list[T.StructField],
        defaults: dict[str, str] | None = None,
    ) -> Snapshot:
        """Metadata-only schema evolution (Iceberg ALTER TABLE ADD COLUMNS).

        The reference only *tolerates* a missing schema
        (installments_assets.py:151-156); in-flight add-column is new engine
        capability required by the north rule.

        ``defaults`` maps added column names to CONSTANT SQL expressions
        (Iceberg v3 ``ADD COLUMN ... DEFAULT``): rows in files written
        before the add read the default instead of NULL — still zero
        rewrite — and writers whose batch schema omits the column write it,
        so replay results do not depend on when the DDL landed relative to
        a batch.  Validated at declaration: must parse, resolve with no
        column references, and cast to the column's type.
        """
        snap = self.current()
        existing = {f.name for f in snap.schema.fields}
        new_fields = [f for f in fields if f.name not in existing]
        new_defaults = None
        if defaults:
            unknown = [c for c in defaults
                       if c not in {f.name for f in new_fields}]
            if unknown:
                raise ValueError(
                    f"defaults for column(s) {unknown} not being added — "
                    "defaults are declared WITH the add (the Iceberg v3 "
                    "initial-default rule); existing columns already have "
                    "physical data"
                )
            ftypes = {f.name: f.dataType for f in new_fields}
            probe = self.spark.createDataFrame([], T.StructType([]))
            for c, d in defaults.items():
                try:
                    # constant-ness by construction: zero-column relation
                    pdf = probe.select(F.expr(d).cast(ftypes[c]))
                    pdf.schema
                except Exception as e:
                    raise ValueError(
                        f"default for {c!r} is not a constant expression "
                        f"castable to {ftypes[c].simpleString()}: {d!r}: {e}"
                    ) from e
                _validate_default_constant(pdf, c, d)
            new_defaults = {**snap.column_defaults, **defaults}
        if not new_fields:
            return snap
        # Keep engine bookkeeping columns (`_`-prefixed) as the last columns.
        base = [f for f in snap.schema.fields if not f.name.startswith("_")]
        tail = [f for f in snap.schema.fields if f.name.startswith("_")]
        new_schema = T.StructType(base + new_fields + tail)
        dsch = None
        if defaults:
            # register still-unregistered live dirs with their PRE-add
            # schema: _commit's backfill would otherwise record them under
            # the POST-add schema, claiming they physically hold the new
            # column — and the default would never fill for them
            dsch = dict(snap.dir_schemas)
            rec = {"schema": snap.schema.jsonValue(),
                   "ids": dict(snap.column_ids)}
            for d in sorted(snap.live_dirs() - set(dsch)):
                dsch[d] = rec
        return self._commit(
            parent=snap,
            schema=new_schema,
            key=snap.key,
            bucket_by=snap.bucket_by,
            num_buckets=snap.num_buckets,
            files=snap.files,
            summary={
                "operation": "add-columns",
                "columns": [f.name for f in new_fields],
            },
            column_defaults=new_defaults,
            dir_schemas=dsch,
        )

    def add_struct_fields(
        self, parent: str, fields: list[T.StructField]
    ) -> Snapshot:
        """Metadata-only nested ADD (Iceberg ALTER TABLE ADD COLUMN
        parent.field): append fields to a struct column.  New fields mint
        fresh dotted ids; files written before the add keep the by-name
        FAST path (the parquet reader scans missing nested fields as
        NULL), exactly like a top-level add-column."""
        snap = self.current()
        if parent not in {f.name for f in snap.schema.fields}:
            raise KeyError(f"no column {parent!r}")
        ptype = snap.schema[parent].dataType
        if not isinstance(ptype, T.StructType):
            raise ValueError(f"{parent!r} is not a struct column")
        existing = {sf.name for sf in ptype.fields}
        new_fields = [
            T.StructField(f.name, f.dataType, True)
            for f in fields
            if f.name not in existing
        ]
        if not new_fields:
            return snap
        for f in new_fields:
            if not f.name or f.name.startswith("_") or "." in f.name:
                raise ValueError(f"invalid field name {f.name!r}")
        ids, nci, dirs = self._nested_ddl_base(snap)
        return self._commit(
            parent=snap,
            schema=_replace_nested(
                snap.schema, parent, [*ptype.fields, *new_fields]
            ),
            key=snap.key,
            bucket_by=snap.bucket_by,
            num_buckets=snap.num_buckets,
            files=snap.files,
            summary={
                "operation": "add-columns",
                "columns": [f"{parent}.{f.name}" for f in new_fields],
            },
            column_ids=ids,  # new dotted names mint fresh ids in _commit
            next_column_id=nci,
            dir_schemas=dirs,
        )

    def _dirs_registered(self, snap: Snapshot) -> dict[str, dict]:
        """``dir_schemas`` with every live dir present — legacy dirs (written
        before the field-id feature) pin to the PRE-DDL schema, under which
        they are by-name correct.  Rename/drop/widen must snapshot this
        before changing the schema, otherwise _commit would register legacy
        dirs under the post-DDL schema they were never written with."""
        out = dict(snap.dir_schemas)
        for d in sorted(snap.live_dirs() - set(out)):
            out[d] = {
                "schema": snap.schema.jsonValue(),
                "ids": dict(snap.column_ids),
            }
        return out

    def _nested_ddl_base(
        self, snap: Snapshot
    ) -> tuple[dict[str, int], int, dict[str, dict]]:
        """(ids, next_id, dirs) base state for a NESTED DDL commit: dotted
        ids for the current schema minted if the manifest predates them
        (legacy), and pre-dotted dir registrations patched with those ids.
        The patch is sound because no mechanism could change struct
        INTERNALS before nested DDL existed — every pre-dotted dir's
        struct layout equals the pre-DDL current layout (still verified
        per field against the dir's own schema below)."""
        ids = dict(snap.column_ids)
        nci = snap.next_column_id
        for n in _id_names(snap.schema):
            if n not in ids:
                ids[n] = nci
                nci += 1
        dirs: dict[str, dict] = {}
        for d, info in self._dirs_registered(snap).items():
            dinfo_ids = dict(info["ids"])
            if not any("." in k for k in dinfo_ids):
                dir_fields = {
                    f["name"]: {
                        sf["name"] for sf in f["type"].get("fields", [])
                    }
                    for f in info["schema"]["fields"]
                    if isinstance(f["type"], dict)
                    and f["type"].get("type") == "struct"
                }
                for k, i in ids.items():
                    if "." not in k or k in dinfo_ids:
                        continue
                    par, fld = k.split(".", 1)
                    if (
                        dinfo_ids.get(par) == ids.get(par)
                        and fld in dir_fields.get(par, set())
                    ):
                        dinfo_ids[k] = i
            dirs[d] = {**info, "ids": dinfo_ids}
        return ids, nci, dirs

    def _nested_parent(self, snap: Snapshot, dotted: str) -> tuple[str, str]:
        """Validated (parent, field) of a dotted nested path."""
        parent, field = dotted.split(".", 1)
        if "." in field:
            raise ValueError(
                f"{dotted!r}: nested DDL supports one level of nesting"
            )
        pnames = {f.name for f in snap.schema.fields}
        if parent not in pnames:
            raise KeyError(f"no column {parent!r}")
        ptype = snap.schema[parent].dataType
        if not isinstance(ptype, T.StructType):
            raise ValueError(f"{parent!r} is not a struct column")
        if field not in {sf.name for sf in ptype.fields}:
            raise KeyError(f"no field {field!r} in struct {parent!r}")
        return parent, field

    @staticmethod
    def _sort_order_cols(order: str) -> list[str]:
        """Column names a ``compaction.sort-order`` value references —
        both the plain ``a,b`` list and the ``zorder(a,b)`` form."""
        from credix_data_pipeline_spark.lakehouse.zorder import parse_zorder

        z = parse_zorder(order)
        return z if z is not None else [
            c.strip() for c in order.split(",") if c.strip()
        ]

    def _validate_governance_expr(
        self,
        snap: Snapshot,
        expr_s: str,
        cast_to: T.DataType | None = None,
        without: str | None = None,
    ) -> None:
        """Analysis-only validation of a governance expression against the
        table schema (no Spark job — an empty local relation resolves the
        plan).  The CHECK-constraint / sort-order eager rule: a broken
        expression fails at DECLARATION naming itself, not inside every
        later consumer query."""
        fields = [
            f for f in snap.schema.fields
            if without is None or f.name != without
        ]
        df = self.spark.createDataFrame([], T.StructType(fields))
        try:
            c = F.expr(expr_s)
            if cast_to is not None:
                c = c.cast(cast_to)
            df.select(c)
        except Exception as e:
            raise ValueError(
                f"invalid governance expression {expr_s!r}: {e}"
            ) from e

    def _expr_references(self, snap: Snapshot, expr_s: str, col: str) -> bool:
        """True when the expression stops resolving once ``col`` is removed
        from the schema — i.e. it references the column (robust against
        quoting/comments, unlike token scans: the ANALYZER decides)."""
        try:
            self._validate_governance_expr(snap, expr_s, without=col)
            return False
        except ValueError:
            return True

    def _masks_referencing(
        self, snap: Snapshot, col: str, exclude: tuple[str, ...] = ()
    ) -> list[str]:
        """Mask property keys whose EXPRESSION explicitly references
        top-level column ``col`` by name.  The ``{col}`` placeholder is
        substituted with a neutral ``null`` first, so only references to
        OTHER columns (or self-references spelled out instead of via the
        placeholder) remain detectable — those are arbitrary SQL that a
        rename cannot rewrite and a drop would leave dangling, bricking
        every later governed read with an AnalysisException.  ``exclude``
        skips masks keyed on the given columns (a drop deletes them
        anyway).  Nested (dotted) references inside other structs are not
        detected — the analyzer check removes whole top-level columns."""
        pfx = "governance.mask."
        hits = []
        for k, v in snap.properties.items():
            if not k.startswith(pfx) or not v:
                continue
            mcol = k[len(pfx):]
            if mcol in exclude or any(
                mcol.startswith(e + ".") for e in exclude
            ):
                continue
            if self._expr_references(
                snap, str(v).replace("{col}", "null"), col
            ):
                hits.append(k)
        return hits

    def rename_column(self, old: str, new: str) -> Snapshot:
        """Metadata-only column rename (Iceberg ALTER TABLE RENAME COLUMN).

        The column keeps its field id, so files written under the old name
        keep projecting to it — no rewrite.  Key/bucket columns may be
        renamed: bucketing hashes VALUES, so layout and pruning are
        unaffected.

        ``old`` may be a DOTTED nested path (``tool_meta.source``) to
        rename a field INSIDE a struct column — same id rule, same
        metadata-only cost; ``new`` is the bare new field name (a dotted
        ``new`` with the same parent is also accepted, the relay DDL
        channel's form)."""
        snap = self.current()
        if "." in old:
            parent, field = self._nested_parent(snap, old)
            if "." in new:
                np, new = new.split(".", 1)
                if np != parent:
                    raise ValueError(
                        f"cannot rename {old!r} across structs (to {np!r})"
                    )
            ptype = snap.schema[parent].dataType
            if new in {sf.name for sf in ptype.fields}:
                raise ValueError(
                    f"field {new!r} already exists in {parent!r}"
                )
            if not new or new.startswith("_") or "." in new:
                raise ValueError(f"invalid field name {new!r}")
            ids, nci, dirs = self._nested_ddl_base(snap)
            new_struct = [
                T.StructField(new, sf.dataType, sf.nullable)
                if sf.name == field
                else sf
                for sf in ptype.fields
            ]
            ids[f"{parent}.{new}"] = ids.pop(f"{parent}.{field}")
            # governance follows nested renames too: conservative guard —
            # a row filter touching the PARENT struct at all refuses the
            # rename (field-level reference detection would need schema
            # surgery; over-refusing is the safe direction), and a nested
            # mask key is re-keyed like the flat case
            gf = snap.properties.get("governance.row-filter")
            if gf and self._expr_references(snap, gf, parent):
                raise ValueError(
                    f"column {parent!r} is referenced by "
                    f"governance.row-filter={gf!r}; unset or re-set the "
                    "property first"
                )
            nprops = None
            nmkey = f"governance.mask.{parent}.{field}"
            if nmkey in snap.properties:
                nprops = dict(snap.properties)
                nprops[f"governance.mask.{parent}.{new}"] = nprops.pop(nmkey)
            return self._commit(
                parent=snap,
                schema=_replace_nested(snap.schema, parent, new_struct),
                key=snap.key,
                bucket_by=snap.bucket_by,
                num_buckets=snap.num_buckets,
                files=snap.files,
                properties=nprops,
                summary={
                    "operation": "rename-column",
                    "from": old,
                    "to": f"{parent}.{new}",
                },
                column_ids=ids,
                next_column_id=nci,
                dir_schemas=dirs,
            )
        names = {f.name for f in snap.schema.fields}
        if old not in names:
            raise KeyError(f"no column {old!r}")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        if not new or new.startswith("_") or "." in new:
            raise ValueError(
                f"invalid name {new!r} (empty, dotted, or engine-reserved "
                "'_' prefix)"
            )
        dirs = self._dirs_registered(snap)
        new_fields = [
            T.StructField(new, f.dataType, f.nullable) if f.name == old else f
            for f in snap.schema.fields
        ]
        ids = dict(snap.column_ids)
        ids[new] = ids.pop(old)
        # a struct column's dotted children re-key under the new parent
        # name, KEEPING their ids — else _commit would retire + re-mint
        # them and old files would project the children as NULL
        for k in list(ids):
            if k.startswith(old + "."):
                ids[new + k[len(old):]] = ids.pop(k)
        # properties referencing the column follow the rename (a rename
        # keeps the column's meaning) — otherwise the next scheduled
        # maintain()/compact() raises on an unknown sort column forever
        props = None
        order = snap.properties.get("compaction.sort-order")
        if order and old in self._sort_order_cols(order):
            cols = [
                new if c == old else c for c in self._sort_order_cols(order)
            ]
            props = dict(snap.properties)
            props["compaction.sort-order"] = (
                f"zorder({','.join(cols)})"
                if order.strip().lower().startswith("zorder(")
                else ",".join(cols)
            )
        # governance follows the rename: the mask key is re-keyed (mask
        # expressions reference their column only via the {col}
        # placeholder, so the expression needs no rewrite); a row filter
        # naming the column is arbitrary SQL that CANNOT be rewritten
        # safely — refuse, the drop_column/sort-order rule
        gf = snap.properties.get("governance.row-filter")
        if gf and self._expr_references(snap, gf, old):
            raise ValueError(
                f"column {old!r} is referenced by governance.row-filter="
                f"{gf!r}; unset or re-set the property first"
            )
        # same rule for mask EXPRESSIONS naming the column (a mask on
        # another column, or a self-reference spelled out instead of via
        # {col}): arbitrary SQL cannot be rewritten safely, and a stale
        # reference would brick every later governed read
        mhits = self._masks_referencing(snap, old)
        if mhits:
            raise ValueError(
                f"column {old!r} is referenced by mask expression(s) "
                f"{mhits}; unset or re-set those properties first"
            )
        # stats.columns follows the rename (a rename keeps the column's
        # meaning), and the stats themselves re-key so the carried bounds
        # survive — inheritance is by name, and the field id is unchanged
        scols = self._stats_cols(snap)
        if old in scols:
            props = dict(props if props is not None else snap.properties)
            props["stats.columns"] = ",".join(
                new if c == old else c for c in scols
            )
        mkey = f"governance.mask.{old}"
        re_keyed = [mkey] if mkey in snap.properties else []
        # nested masks under a renamed struct parent re-key with it
        re_keyed += [
            k for k in snap.properties
            if k.startswith(f"governance.mask.{old}.")
        ]
        if re_keyed:
            props = dict(props if props is not None else snap.properties)
            for k in re_keyed:
                suffix = k[len(f"governance.mask.{old}"):]
                props[f"governance.mask.{new}{suffix}"] = props.pop(k)
        return self._commit(
            parent=snap,
            schema=T.StructType(new_fields),
            key=[new if c == old else c for c in snap.key],
            bucket_by=[new if c == old else c for c in snap.bucket_by],
            num_buckets=snap.num_buckets,
            files=snap.files,
            summary={"operation": "rename-column", "from": old, "to": new},
            column_ids=ids,
            dir_schemas=dirs,
            properties=props,
            col_stats={
                (new if c == old else c): per
                for c, per in snap.col_stats.items()
            },
            # a DEFAULT follows its column through a rename (same field id)
            column_defaults={
                (new if c == old else c): v
                for c, v in snap.column_defaults.items()
            },
        )

    def drop_column(self, name: str) -> Snapshot:
        """Metadata-only column drop (Iceberg ALTER TABLE DROP COLUMN).

        The field id is retired and never reused: a later ADD COLUMN with
        the same name gets a fresh id, so old files' stale physical data
        can never resurrect under the new column (reads of mixed dirs take
        the field-id projection path and see typed NULL).

        A DOTTED path (``tool_meta.source``) drops a field INSIDE a struct
        column — same retired-id rule at the nested level."""
        snap = self.current()
        if "." in name:
            parent, field = self._nested_parent(snap, name)
            ptype = snap.schema[parent].dataType
            if len(ptype.fields) == 1:
                raise ValueError(
                    f"{name!r} is the last field of {parent!r}; drop the "
                    "column instead"
                )
            gf = snap.properties.get("governance.row-filter")
            if gf and self._expr_references(snap, gf, parent):
                raise ValueError(
                    f"column {parent!r} is referenced by "
                    f"governance.row-filter={gf!r}; unset or re-set the "
                    "property first"
                )
            nprops = None
            nmkey = f"governance.mask.{parent}.{field}"
            if nmkey in snap.properties:
                nprops = {
                    k: v for k, v in snap.properties.items() if k != nmkey
                }
            ids, nci, dirs = self._nested_ddl_base(snap)
            new_struct = [sf for sf in ptype.fields if sf.name != field]
            return self._commit(
                parent=snap,
                schema=_replace_nested(snap.schema, parent, new_struct),
                key=snap.key,
                bucket_by=snap.bucket_by,
                num_buckets=snap.num_buckets,
                files=snap.files,
                summary={"operation": "drop-column", "column": name},
                column_ids=ids,  # _commit prunes the retired dotted id
                next_column_id=nci,
                dir_schemas=dirs,
                properties=nprops,
            )
        if name not in {f.name for f in snap.schema.fields}:
            raise KeyError(f"no column {name!r}")
        if name in snap.key or name in snap.bucket_by:
            raise ValueError(f"cannot drop key/bucket column {name!r}")
        if name.startswith("_"):
            raise ValueError(f"cannot drop engine column {name!r}")
        order = snap.properties.get("compaction.sort-order")
        if order and name in self._sort_order_cols(order):
            raise ValueError(
                f"column {name!r} is referenced by compaction.sort-order="
                f"{order!r}; unset or change the property first (else "
                "every later maintain()/compact() fails on it)"
            )
        gf = snap.properties.get("governance.row-filter")
        if gf and self._expr_references(snap, gf, name):
            raise ValueError(
                f"column {name!r} is referenced by governance.row-filter="
                f"{gf!r}; unset or re-set the property first"
            )
        # a mask on ANOTHER column whose expression names this one would
        # dangle after the drop and fail inside every governed read —
        # refuse, like the row filter (masks ON the dropped column are
        # excluded: they go with it, below)
        mhits = self._masks_referencing(snap, name, exclude=(name,))
        if mhits:
            raise ValueError(
                f"column {name!r} is referenced by mask expression(s) "
                f"{mhits}; unset or re-set those properties first"
            )
        # a mask on the dropped column goes with it (the sort-order rule
        # refuses instead, because a stale sort column breaks maintain();
        # a mask of a gone column binds nothing and would block the DDL
        # for no reader-visible reason)
        props = None
        doomed = {
            k for k in snap.properties
            if k == f"governance.mask.{name}"
            or k.startswith(f"governance.mask.{name}.")
        }
        if doomed:
            props = {
                k: v for k, v in snap.properties.items() if k not in doomed
            }
        # a dropped stats column leaves the skipping roster with it (its
        # carried bounds clear via the field-id inheritance rule); unlike
        # sort-order the drop is not refused — stats are advisory
        scols = self._stats_cols(snap)
        if name in scols:
            props = dict(props if props is not None else snap.properties)
            remaining = [c for c in scols if c != name]
            if remaining:
                props["stats.columns"] = ",".join(remaining)
            else:
                props.pop("stats.columns", None)
        dirs = self._dirs_registered(snap)
        return self._commit(
            parent=snap,
            schema=T.StructType(
                [f for f in snap.schema.fields if f.name != name]
            ),
            key=snap.key,
            bucket_by=snap.bucket_by,
            num_buckets=snap.num_buckets,
            files=snap.files,
            summary={"operation": "drop-column", "column": name},
            dir_schemas=dirs,
            properties=props,
        )

    def widen_column(self, name: str, new_type: T.DataType) -> Snapshot:
        """Metadata-only type promotion (Iceberg ALTER TABLE ALTER COLUMN
        TYPE): int→long, float→double.  Old files cast on the fly via the
        field-id projection path; ``compact()`` rewrites them physically
        widened, restoring the single-scan fast path.

        A DOTTED path widens a field INSIDE a struct column."""
        snap = self.current()
        if "." in name:
            parent, field = self._nested_parent(snap, name)
            ptype = snap.schema[parent].dataType
            cur_t = ptype[field].dataType
            if cur_t == new_type:
                return snap
            allowed = _WIDENINGS.get(cur_t.typeName(), set())
            if new_type.typeName() not in allowed:
                raise ValueError(
                    f"cannot widen {name!r} from {cur_t.simpleString()} to "
                    f"{new_type.simpleString()}; allowed: int->long, "
                    "float->double"
                )
            ids, nci, dirs = self._nested_ddl_base(snap)
            new_struct = [
                T.StructField(field, new_type, sf.nullable)
                if sf.name == field
                else sf
                for sf in ptype.fields
            ]
            return self._commit(
                parent=snap,
                schema=_replace_nested(snap.schema, parent, new_struct),
                key=snap.key,
                bucket_by=snap.bucket_by,
                num_buckets=snap.num_buckets,
                files=snap.files,
                summary={
                    "operation": "widen-column",
                    "column": name,
                    "to": new_type.simpleString(),
                },
                column_ids=ids,
                next_column_id=nci,
                dir_schemas=dirs,
            )
        if name not in {f.name for f in snap.schema.fields}:
            raise KeyError(f"no column {name!r}")
        if name in snap.bucket_by:
            # xxhash64(int x) != xxhash64(long x): widening a bucketing
            # column would silently desync stored bucket ids from
            # bucket_expr — MERGE would route a key's new rows to a
            # different bucket than its stored rows (duplicate keys) and
            # read_keys would prune to the wrong files.  Rename is safe
            # (values unchanged); widening the hash input is not.
            raise ValueError(
                f"cannot widen bucketing column {name!r}: the bucket hash "
                "is type-sensitive; create a new table or rebucket to a "
                "different bucket_by first"
            )
        cur_t = snap.schema[name].dataType
        if cur_t == new_type:
            return snap
        allowed = _WIDENINGS.get(cur_t.typeName(), set())
        if new_type.typeName() not in allowed:
            raise ValueError(
                f"cannot widen {name!r} from {cur_t.simpleString()} to "
                f"{new_type.simpleString()}; allowed: int->long, "
                "float->double"
            )
        dirs = self._dirs_registered(snap)
        new_fields = [
            T.StructField(name, new_type, f.nullable)
            if f.name == name
            else f
            for f in snap.schema.fields
        ]
        return self._commit(
            parent=snap,
            schema=T.StructType(new_fields),
            key=snap.key,
            bucket_by=snap.bucket_by,
            num_buckets=snap.num_buckets,
            files=snap.files,
            summary={
                "operation": "widen-column",
                "column": name,
                "to": new_type.simpleString(),
            },
            dir_schemas=dirs,
        )

    def _lww_collapse(
        self, df: DataFrame, snap: Snapshot | None = None
    ) -> DataFrame:
        """Collapse multi-version merge-on-read rows to the LWW winner per
        key (same hash-agg shape as the apply core's LWW).

        Tie-break mirrors the CoW write path: on an ``_lsn`` tie (an
        at-least-once feed reusing an LSN across batches with differing
        payloads) the row from the LATER batch wins — MoR delta rows persist
        the batch ordinal as ``_seq`` for exactly this comparator, so CoW and
        MoR replays of the same feed stay byte-equal (ADVICE r2)."""
        snap = snap or self.current()
        cols = [f.name for f in snap.schema.fields]
        row = F.struct(*[F.col(c) for c in cols])
        order = (
            F.struct(F.col("_lsn"), F.coalesce(F.col("_seq"), F.lit(-1)))
            if "_seq" in cols
            else F.col("_lsn")
        )
        return (
            df.groupBy(*[F.col(k) for k in snap.key])
            .agg(F.max_by(row, order).alias("_w"))
            .select("_w.*")
        )

    def carry_fence(self) -> dict[str, Any]:
        """Fence / high-water summary keys from the newest commits that set
        them.  Maintenance commits (compact, expire-tombstones) merge this
        into their own summary so retention can never bury the exactly-once
        fence or an incremental model's high-water (ADVICE r2).

        Exactly ``_fence_as_of`` at the current version — ONE walk owns
        the fence key list, so a new fence key can never reach one path
        and miss the other."""
        return self._fence_as_of(self.current().version)

    def compact(
        self,
        target_buckets: list[int] | None = None,
        sort: bool = True,
    ) -> Snapshot:
        """Rewrite each bucket's many small files into one file set
        (Iceberg ``rewrite_data_files`` analogue; small-file defense for the
        60 s-rotation change feed, datastream_streams.tf:75-76).  On a
        merge-on-read table compaction ALSO collapses delta versions to the
        LWW winner per key — the MoR maintenance contract.

        ``sort=True`` (the Iceberg table *sort order*, applied at rewrite
        like ``rewrite_data_files(sort_order)``): rows are laid down sorted
        by the table key within each written file, so parquet row-group
        min/max stats carry disjoint key ranges and a key-targeted read
        (``read_keys``, the dirty-bucket MERGE scan) skips row groups
        instead of scanning the bucket.  Ingest never sorts (hot path cost);
        maintenance rewrites do.

        Two table properties refine the rewrite (Iceberg ``sort-order`` +
        ``write.target-file-size`` analogues):

        * ``compaction.sort-order`` — comma-separated columns replacing the
          default key sort (e.g. ``ts`` or ``ts,conv_id``): an event-time
          sort clusters each file's rows by ``ts``, and with file splitting
          the per-file ts bounds become disjoint slices, so
          ``read(ts_between=…)`` (the "last 7 days" slice) prunes FILES, not
          just row groups.  Trade-off is explicit: ordering not led by the
          key gives up key-sorted row-group skipping for ``read_keys`` —
          lead with the key (``conv_id,ts``) to keep both at coarser grain,
          or use ``zorder(conv_id,ts)`` (Delta OPTIMIZE ZORDER BY analogue,
          ``lakehouse/zorder.py``): a Morton-curve layout where EVERY
          z-dimension prunes at once instead of only the leading column.
        * ``compaction.target-file-rows`` — max rows per written file
          (``maxRecordsPerFile``): bounds file size at 100 TB and is what
          turns a sort order into multiple stat-disjoint files per bucket.
        """
        snap = self.current()
        buckets = (
            [int(b) for b in snap.files]
            if target_buckets is None
            else target_buckets
        )
        # buckets covered by an outstanding equality delete always rewrite:
        # compaction is what MATERIALIZES a purge (physically removes the
        # rows and consumes the entry so reads stop paying the anti-join)
        eq_buckets = {
            int(b) for e in snap.eq_deletes for b in e["buckets"]
        }
        # adopted references (clone_to / import_dataset) live OUTSIDE this
        # table's root; compaction is the documented deep-copy-on-demand,
        # so such buckets always rewrite — otherwise a clone of an
        # already-compacted source is a permanent compact() no-op and the
        # docstring's "untag when fully materialized" workflow would let
        # source retention delete files the clone still references.
        # (Branch files under ``_branches/`` are INSIDE the root: ff
        # adoption keeps its ownership-transfer semantics.)
        root_prefix = os.path.abspath(self.path) + os.sep

        def _external(f: str) -> bool:
            return os.path.isabs(f) and not os.path.abspath(f).startswith(
                root_prefix
            )

        ext_buckets = {
            int(b)
            for b, fl in snap.files.items()
            if any(_external(f) for f in fl)
        }
        if snap.merge_mode == "mor" and not snap.mor_deletes:
            # invariant broken (blind appends): rewrite every non-empty
            # bucket — any single file may hide multiple key versions
            multi = [b for b in buckets if snap.files.get(str(b))]
        elif snap.merge_mode == "mor":
            # any bucket with delta buildup, outstanding position deletes,
            # or equality-delete coverage
            multi = [
                b
                for b in buckets
                if snap.files.get(str(b))
                and (
                    len(snap.files[str(b)]) > 1
                    or snap.delete_files.get(str(b))
                    or b in eq_buckets
                    or b in ext_buckets
                )
            ]
        else:
            # rewrite a bucket if it has small-file buildup OR any file from
            # a dir across an evolution boundary (rename/drop/widen): the
            # rewrite lands under the current schema, restoring the
            # single-scan by-name fast path (Iceberg rewrite_data_files
            # migrating old-schema files)
            target_rows = snap.properties.get("compaction.target-file-rows")

            def _needs_rewrite(b: int) -> bool:
                fl = snap.files.get(str(b), [])
                if not fl:
                    return False
                if len(fl) > 1 or b in eq_buckets or b in ext_buckets:
                    return True
                if target_rows is not None:
                    # a single OVERSIZED file also rewrites (Iceberg
                    # rewrite_data_files splits too-large files, not only
                    # merges small ones) — otherwise a one-file bucket can
                    # never split and a declared sort order / file-rows
                    # target never reaches it.  One footer open per
                    # single-file bucket, only while the property is set.
                    n = self._footer_num_rows(fl[0])
                    if n is not None and n > int(target_rows):
                        return True
                return any(
                    not _dir_compatible(
                        snap, snap.dir_schemas.get(_commit_dir(f))
                    )
                    for f in fl
                )

            multi = [b for b in buckets if _needs_rewrite(b)]
        if not multi:
            return snap
        if snap.merge_mode == "mor" and snap.mor_deletes:
            # apply position deletes; the rewrite consumes them
            # (replace_buckets drops the rewritten buckets' delete files)
            df = self.current_versions(snap=snap, buckets=multi)
        elif snap.merge_mode == "mor":
            df = self._lww_collapse(self.read(buckets=multi))
        else:
            df = self.read(buckets=multi)
        # partition BY BUCKET ID, not coalesce: coalesce leaves each task
        # holding rows of many buckets, so the dynamic-partition writer
        # emits up to tasks x buckets small files — the exact buildup
        # compaction exists to remove.  Hash-partitioned on the bucket id,
        # each bucket's rows land in one task → one file set per bucket.
        df = df.repartition(max(1, len(multi)), self.bucket_expr(snap))
        sort_keys = None
        sort_exprs = None
        if sort:
            order = snap.properties.get("compaction.sort-order")
            if order:
                from credix_data_pipeline_spark.lakehouse.zorder import (
                    parse_zorder,
                    zorder_expr,
                )

                zcols = parse_zorder(order)
                if zcols is not None:
                    # Morton-curve clustering: every z-dimension prunes at
                    # once (key point lookups AND event-time slices), where
                    # a lexicographic sort serves only its leading column
                    sort_exprs = [zorder_expr(df, zcols, snap.schema)]
                else:
                    sort_keys = [
                        c.strip() for c in order.split(",") if c.strip()
                    ]
                    names = {f.name for f in snap.schema.fields}
                    missing = [c for c in sort_keys if c not in names]
                    if missing:
                        raise ValueError(
                            f"compaction.sort-order references unknown "
                            f"column(s) {missing}"
                        )
            else:
                sort_keys = snap.key
        target_rows = snap.properties.get("compaction.target-file-rows")
        return self.replace_buckets(
            multi,
            df,
            summary={**self.carry_fence(), "operation": "compact"},
            sort_keys=sort_keys,
            sort_exprs=sort_exprs,
            max_records_per_file=int(target_rows) if target_rows else None,
            # a FULL MoR compaction collapses every bucket to one version
            # per key — the position-delete invariant holds again, so reads
            # drop back to the cheap scan + anti-join path
            restore_mor_invariant=(
                snap.merge_mode == "mor" and target_buckets is None
            ),
        )

    def rebucket(
        self,
        num_buckets: int,
        bucket_by: list[str] | None = None,
    ) -> Snapshot:
        """Partition-spec evolution: rewrite the table into a new bucket
        layout (count and/or bucket columns) in one atomic commit — the
        Iceberg ``ALTER TABLE … partition spec`` + ``rewrite_data_files``
        pair for a table that outgrew its layout (the reference re-creates
        its BigQuery tables to re-partition, terraform state apply; this
        engine keeps history and the fence instead).

        Iceberg applies a new spec lazily (old files keep the old layout);
        this engine's bucket pruning (dirty-bucket MERGE, ``read_keys``,
        gold refresh scoping) requires ONE consistent layout, so the rewrite
        is eager: every live row is re-hashed into the new layout and all
        file sets swap atomically.  O(table) by design — a scheduled
        maintenance operation like compaction, never part of ingest.  On a
        merge-on-read table delta versions collapse to their LWW winner
        first (same contract as ``compact``).  The exactly-once fence and
        gold high-water ride the commit summary (``carry_fence``), so
        replay resumability and incremental gold are unaffected.
        """
        snap = self.current()
        new_by = list(bucket_by) if bucket_by else snap.bucket_by
        if num_buckets < 1:
            raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
        unknown = [c for c in new_by if c not in {f.name for f in snap.schema.fields}]
        if unknown:
            raise ValueError(f"bucket_by columns not in schema: {unknown}")
        if num_buckets == snap.num_buckets and new_by == snap.bucket_by:
            return snap
        if snap.merge_mode == "mor" and snap.mor_deletes:
            df = self.current_versions(snap=snap)  # net of position deletes
        elif snap.merge_mode == "mor":
            df = self._lww_collapse(self.read())  # one base version per key
        else:
            df = self.read()
        bexpr = F.pmod(F.xxhash64(*new_by), F.lit(num_buckets)).cast("int")
        # rebalance on the new bucket id: write tasks are byte-sized by AQE
        # and each bucket's rows co-locate, so the new layout starts with
        # one compact file set per bucket
        bucketed = df.withColumn(BUCKET_COL, bexpr).hint("rebalance", BUCKET_COL)
        # table sort order at rewrite (see compact): the new layout starts
        # read-optimized with disjoint key ranges per row group
        new_files = self._write_files(bucketed, snap, sort_keys=snap.key)
        return self._commit(
            parent=snap,
            schema=snap.schema,
            key=snap.key,
            bucket_by=new_by,
            num_buckets=num_buckets,
            files=new_files,
            summary={**self.carry_fence(), "operation": "rebucket"},
            delete_files={},  # the rewrite consumed all position deletes
            eq_deletes=[],  # ...and every equality delete (full rewrite)
            # full-table rewrite → one version per key → invariant restored
            mor_deletes=True if snap.merge_mode == "mor" else None,
        )

    def expire_snapshots(
        self,
        keep_last: int = 5,
        older_than_ms: int | None = None,
        orphan_grace_sec: float = 3600.0,
    ) -> dict[str, int]:
        """Retention maintenance — the Iceberg ``expire_snapshots`` +
        ``remove_orphan_files`` analogue of the reference's GCS lifecycle
        deletes (30/90/365-day rules, datastream_resources.tf:9-16,
        storage.tf:9-16,29-36).

        Keeps the newest ``keep_last`` manifests (always including current);
        with ``older_than_ms`` set, a manifest must ALSO be older than that
        wall-clock to expire (both conditions, like Iceberg).  Data files
        referenced only by expired snapshots are deleted immediately (their
        commit provably completed); files never referenced by ANY manifest
        are deleted only past ``orphan_grace_sec`` — they may belong to a
        commit still in flight (same age guard as Iceberg's
        remove_orphan_files).  Files shared with retained snapshots are
        untouched, so time travel within the retention window keeps working.
        """
        versions = self._versions()
        if not versions:
            return {"snapshots_expired": 0, "files_deleted": 0}
        cutoff = set(versions[-max(1, keep_last) :])
        # Never expire the newest manifest carrying the exactly-once fence
        # (batch_id) or an incremental high-water (source_lsn_hw): if
        # >= keep_last maintenance commits follow the last merge, dropping it
        # would silently reset ``last_applied_batch_id`` (ADVICE r2).
        # Maintenance commits carry the fence forward (``carry_fence``), so
        # in the steady state this protects a manifest already in ``cutoff``.
        for key in ("batch_id", "source_lsn_hw"):
            for v in reversed(versions):
                if key in self._read_manifest(v).summary:
                    cutoff.add(v)
                    break
        # tagged snapshots are pinned until the tag is dropped (Iceberg refs)
        tagged = set(self.tags().values())
        if tagged:
            for v in versions:
                if self._read_manifest(v).snapshot_id in tagged:
                    cutoff.add(v)
        expire: list[int] = []
        for v in versions:
            if v in cutoff:
                continue
            if older_than_ms is not None:
                if self._read_manifest(v).committed_at_ms >= older_than_ms:
                    continue
            expire.append(v)

        expired_files = set()
        for v in expire:
            s = self._read_manifest(v)
            expired_files.update(s.all_files())
            expired_files.update(s.all_delete_files())
            expired_files.update(s.all_eq_delete_files())
        keep_snaps = [self._read_manifest(v) for v in versions if v not in expire]
        live = {
            f
            for s in keep_snaps
            for f in (
                *s.all_files(),
                *s.all_delete_files(),
                *s.all_eq_delete_files(),
            )
        }
        # A stale staged manifest (version already taken by a published
        # commit — e.g. a crash between stage and publish/discard, then a
        # later writer won the version) can never publish (EEXIST); drop it
        # so it stops pinning files.  A still-publishable staged snapshot's
        # files are referenced, not orphans.
        cur_version = versions[-1]
        for sv in self._staged_versions():
            if sv <= cur_version:
                os.unlink(os.path.join(self.meta_path, _staged_name(sv)))
        staged = self.staged_snapshot()
        if staged is not None:
            live |= set(staged.all_files())
            live |= set(staged.all_delete_files())
            live |= set(staged.all_eq_delete_files())

        # Delete expired manifests FIRST: a crash mid-way leaves extra data
        # files (harmless, re-collected next run), never a manifest pointing
        # at deleted data.
        for v in expire:
            os.unlink(os.path.join(self.meta_path, _manifest_name(v)))

        # Segment GC: a manifest segment lives exactly as long as some
        # remaining manifest (published or staged) references it.  Segments
        # never referenced by ANY manifest get the same in-flight grace as
        # orphan data files — a concurrent commit writes its segments
        # BEFORE linking its snapshot.
        now = time.time()
        referenced: set[str] = set()
        seg_names: list[str] = []
        for name in os.listdir(self.meta_path):
            if name.startswith("seg-") and name.endswith(".json"):
                seg_names.append(name)
            elif name.endswith(".json") and (
                name.startswith("v") or name.startswith("staged-v")
            ):
                try:
                    with open(os.path.join(self.meta_path, name)) as f:
                        referenced.update(
                            json.load(f).get("segments", {}).values()
                        )
                except (OSError, ValueError):
                    continue
        segments_deleted = 0
        for name in seg_names:
            if name in referenced:
                continue
            p = os.path.join(self.meta_path, name)
            try:
                if now - os.path.getmtime(p) < orphan_grace_sec:
                    continue
                os.unlink(p)
            except OSError:
                continue
            self._seg_cache.pop(name, None)
            segments_deleted += 1

        files_deleted = 0
        data_root = os.path.join(self.path, DATA_DIR)
        # Dropped branches (no _meta left) are ownerless residue: any files
        # a fast-forward adopted are referenced by ABS path in main's
        # manifests and survive; everything else is sweepable.  LIVE
        # branches own their subtree and are never walked.
        walk_roots = [data_root]
        br_root = os.path.join(self.path, BRANCHES_DIR)
        if os.path.isdir(br_root):
            for d in sorted(os.listdir(br_root)):
                bp = os.path.join(br_root, d)
                if os.path.isdir(bp) and not os.path.isdir(
                    os.path.join(bp, META_DIR)
                ):
                    walk_roots.append(bp)
        live_abs = {f for f in live if os.path.isabs(f)}
        expired_abs = {f for f in expired_files if os.path.isabs(f)}
        for root in walk_roots:
            for dirpath, _dirnames, filenames in os.walk(root, topdown=False):
                for fn in filenames:
                    abs_f = os.path.join(dirpath, fn)
                    rel = os.path.relpath(abs_f, self.path)
                    if rel in live or os.path.abspath(abs_f) in live_abs:
                        continue
                    known_expired = (
                        rel in expired_files
                        or os.path.abspath(abs_f) in expired_abs
                    )
                    if not known_expired:
                        try:
                            if now - os.path.getmtime(abs_f) < orphan_grace_sec:
                                continue  # possibly an in-flight commit
                        except OSError:
                            continue
                    os.unlink(abs_f)
                    files_deleted += 1
                if dirpath not in (data_root, br_root) and not os.listdir(
                    dirpath
                ):
                    os.rmdir(dirpath)
        return {
            "snapshots_expired": len(expire),
            "files_deleted": files_deleted,
            "segments_deleted": segments_deleted,
        }
