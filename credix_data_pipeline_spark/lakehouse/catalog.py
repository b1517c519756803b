"""Atomic multi-table catalog: consistent cross-table snapshots.

A CDC pipeline is a chain of tables (bronze transcripts → silver clean →
gold summaries).  Each ``LakeTable`` commit is atomic, but a consumer
reading silver AND gold mid-refresh can see a gold state computed from a
NEWER silver than the silver it reads beside it — the classic multi-table
consistency gap.  Iceberg solves it one layer up (catalog-level commits /
Nessie); this module is that layer for the engine.

Reference parity: the reference rebuilds its marts in one ``dbt run``
invocation but the warehouse offers no cross-table atomicity — a dashboard
refreshing mid-run reads mixed generations of the gold models
(credix_pipeline dbt gold models, dbt/business_case/models/gold/*.sql).
The catalog gives consumers the stronger guarantee those models assume.

Design — file-system OCC, the exact protocol LakeTable commits use:

* ``<root>/vN.json`` — immutable catalog versions.  Commit = temp write +
  ``os.link`` to the next ordinal; EEXIST ⇒ ``CommitConflict`` (the loser
  re-reads and re-merges).  A catalog version maps table NAME →
  ``{path, snapshot_id}``; ``publish()`` merges the current mapping with
  its updates and commits ONE new version, so readers resolving that
  version see every table at exactly the snapshots the publisher grouped
  together.
* Retention safety: each newly-pinned snapshot is TAGGED on its own table
  (``catalog-<cid>-v<N>-<name>-<nonce>``) so table-side ``expire_snapshots`` cannot age
  out a state the catalog still serves; ``expire(keep_last=K)`` drops old
  catalog versions and their tags together, after which the table's own
  retention collects the files normally.  (Zero-copy clones use the same
  tag-the-source rule — ``lakehouse/table.py clone_to``.)
* Wall-clock time travel: ``as_of(ts_ms)`` resolves the catalog version
  live at an instant — a consistent PIPELINE-WIDE historical view, the
  multi-table analogue of ``LakeTable.snapshot_as_of``.

Scale posture: a catalog version is one tiny JSON file naming N tables —
publish cost is O(N) stat calls + one link, independent of data size; no
Spark job runs.  At 100 TB the catalog is the cheapest commit in the
pipeline.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from credix_data_pipeline_spark.lakehouse.table import (
    CommitConflict,
    LakeTable,
)


@dataclass(frozen=True)
class CatalogVersion:
    version: int
    ts_ms: int
    # name -> {"path": str, "snapshot_id": int}
    tables: dict = field(default_factory=dict)
    summary: dict = field(default_factory=dict)


def _now_ms() -> int:
    return int(time.time() * 1000)


class Catalog:
    """Versioned name → (table path, snapshot id) mapping with atomic,
    optimistically-concurrent publishes."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)

    @property
    def cid(self) -> str:
        """Short stable catalog id — namespaces this catalog's tags so two
        catalogs pinning the same table never sweep each other's pins."""
        with open(os.path.join(self.root, "_cid")) as f:
            return f.read().strip()

    def _tag_name(self, version: int, name: str) -> str:
        # per-attempt nonce: two publishers racing at the same ordinal (or
        # a crashed attempt's residue) can never collide on a tag name, so
        # a winner's pin is always protected by ITS OWN tag and a loser
        # cleans only its own
        return f"catalog-{self.cid}-v{version}-{name}-{uuid.uuid4().hex[:8]}"

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, root: str) -> "Catalog":
        cat = cls(root)
        os.makedirs(cat.root, exist_ok=True)
        if cat._versions():
            raise FileExistsError(f"catalog already exists at {root}")
        # O_EXCL: a concurrent creator must never overwrite the winner's id
        # (tags already written under the old id would escape the sweep)
        try:
            fd = os.open(
                os.path.join(cat.root, "_cid"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            with os.fdopen(fd, "w") as f:
                f.write(uuid.uuid4().hex[:8])
        except FileExistsError:
            pass  # a concurrent creator won the id; share it
        try:
            cat._commit(
                CatalogVersion(1, _now_ms(), {}, {"operation": "create"})
            )
        except CommitConflict as e:
            # the concurrent creator also won v1 — the catalog exists
            raise FileExistsError(f"catalog already exists at {root}") from e
        return cat

    @classmethod
    def load(cls, root: str) -> "Catalog":
        cat = cls(root)
        if not cat._versions():
            raise FileNotFoundError(f"no catalog at {root}")
        return cat

    @classmethod
    def create_if_not_exists(cls, root: str) -> "Catalog":
        try:
            return cls.create(root)
        except FileExistsError:
            return cls.load(root)

    # ------------------------------------------------------------- internals
    def _versions(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for fn in os.listdir(self.root):
            if fn.startswith("v") and fn.endswith(".json"):
                try:
                    out.append(int(fn[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def _read(self, version: int) -> CatalogVersion:
        p = os.path.join(self.root, f"v{version}.json")
        try:
            with open(p) as f:
                m = json.load(f)
        except FileNotFoundError:
            raise KeyError(
                f"catalog version {version} not found (expired?)"
            ) from None
        return CatalogVersion(
            m["version"], m["ts_ms"], m.get("tables", {}), m.get("summary", {})
        )

    def _commit(self, cv: CatalogVersion) -> None:
        tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex}.json")
        final = os.path.join(self.root, f"v{cv.version}.json")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "version": cv.version,
                    "ts_ms": cv.ts_ms,
                    "tables": cv.tables,
                    "summary": cv.summary,
                },
                f,
                indent=1,
            )
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
        except FileExistsError as e:
            raise CommitConflict(
                f"catalog version {cv.version} was committed concurrently; "
                "re-read and retry"
            ) from e
        finally:
            os.unlink(tmp)

    # ----------------------------------------------------------------- reads
    def current(self) -> CatalogVersion:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no catalog at {self.root}")
        return self._read(vs[-1])

    def history(self) -> list[CatalogVersion]:
        return [self._read(v) for v in reversed(self._versions())]

    def as_of(self, ts_ms: int) -> CatalogVersion:
        """The catalog version live at a wall-clock instant.  Refuses
        probes before the oldest retained version (mirror of
        ``LakeTable.snapshot_as_of`` — expired versions may have lost
        their tag protection, so guessing would serve broken pins)."""
        best = None
        for v in self._versions():
            cv = self._read(v)
            if cv.ts_ms <= ts_ms and (best is None or cv.version > best.version):
                best = cv
        if best is None:
            raise KeyError(
                f"no retained catalog version at or before ts_ms={ts_ms} "
                "(probe predates retention?)"
            )
        return best

    # --------------------------------------------------------------- publish
    def publish(
        self,
        updates: dict,
        summary: dict | None = None,
        drop: list[str] | None = None,
        retries: int = 0,
    ) -> CatalogVersion:
        """Atomically publish a new catalog version.

        ``updates`` maps table name → ``LakeTable`` (pin its CURRENT
        snapshot) or ``(LakeTable, snapshot_id)`` (pin a specific one).
        Unmentioned names carry over from the current version; ``drop``
        removes names.  All updates land in ONE version or none.

        Each newly-pinned snapshot is tagged ``catalog-<cid>-v<N>-<name>-<nonce>`` on its
        table so table retention can't expire it while the catalog serves
        it; a lost OCC race removes the loser's tags before retrying
        (``retries`` > 0) or re-raising ``CommitConflict``.
        """
        if not updates and not drop:
            raise ValueError("publish needs updates and/or drop")
        bad_names = [
            n for n in updates
            if not n or not all(c.isalnum() or c in "._-" for c in n)
        ]
        if bad_names:
            raise ValueError(
                f"invalid catalog table name(s) {bad_names}: use "
                "alphanumerics, dot, underscore, dash"
            )
        for attempt in range(retries + 1):
            cur = self.current()
            tables = dict(cur.tables)
            for name in drop or []:
                if name not in tables:
                    raise KeyError(f"catalog has no table {name!r}")
                del tables[name]
            next_v = cur.version + 1
            # tags we CREATED this attempt — any failure (lost OCC race,
            # invalid name, vanished snapshot) must clean exactly these;
            # nonce names mean they are OURS alone, never a winner's pin
            created: list[tuple[LakeTable, str]] = []
            try:
                for name, spec in updates.items():
                    if isinstance(spec, tuple):
                        t, sid = spec
                    else:
                        t, sid = spec, spec.current().snapshot_id
                    sid = int(sid)
                    t.snapshot(sid)  # must exist NOW (publish-time check)
                    # register the path BEFORE tagging: expire() must be
                    # able to find this table's tags even when every
                    # catalog version naming it has been dropped (or the
                    # publish crashes right after tagging) — without the
                    # registry such a tag pins the table's snapshot
                    # forever (unbounded retention leak)
                    self._register_path(t.path)
                    tag = self._tag_name(next_v, name)
                    t.tag(tag, snapshot_id=sid)
                    created.append((t, tag))
                    tables[name] = {
                        "path": t.path, "snapshot_id": sid, "tag": tag,
                    }
                cv = CatalogVersion(
                    next_v,
                    _now_ms(),
                    tables,
                    {"operation": "publish", **(summary or {})},
                )
                self._commit(cv)
                return cv
            except BaseException as e:
                for t, tag in created:
                    try:
                        t.untag(tag)
                    except KeyError:
                        pass
                if isinstance(e, CommitConflict) and attempt < retries:
                    continue
                raise
        raise AssertionError("unreachable")

    def rollback(
        self, spark: SparkSession, version: int, retries: int = 0
    ) -> CatalogVersion:
        """Roll the catalog back to a retained ``version`` — as a NEW
        version pinning exactly the target's tables (roll-forward history,
        mirroring ``LakeTable.rollback_to``: nothing is deleted, ``history``
        shows the excursion, and a later ``expire`` ages the bad versions
        out normally).

        The new version re-tags every pin under its own version number, so
        it keeps protecting the snapshots even after ``expire`` drops the
        original version (and its tags).  Tables added since the target
        are dropped from the catalog view (their data is untouched).
        Raises ``KeyError`` if the target version has been expired or a
        pinned snapshot no longer exists on its table (possible only if
        the catalog's tag was removed by hand)."""
        cur = self.current()
        if version > cur.version:
            raise ValueError(
                f"cannot roll back to v{version}: current is v{cur.version}"
            )
        target = self._read(version)
        updates = {
            name: (LakeTable.load(spark, ent["path"]), int(ent["snapshot_id"]))
            for name, ent in target.tables.items()
        }
        drop = [n for n in cur.tables if n not in target.tables]
        return self.publish(
            updates,
            summary={"operation": "rollback", "to_version": version},
            drop=drop or None,
            retries=retries,
        )

    # --------------------------------------------------------------- resolve
    def resolve(
        self,
        spark: SparkSession,
        name: str,
        version: int | None = None,
        as_of_ms: int | None = None,
    ) -> tuple[LakeTable, int]:
        """The (table, snapshot_id) a catalog version pins for ``name``."""
        if version is not None and as_of_ms is not None:
            raise ValueError("pass version or as_of_ms, not both")
        if as_of_ms is not None:
            cv = self.as_of(as_of_ms)
        elif version is not None:
            cv = self._read(version)
        else:
            cv = self.current()
        ent = cv.tables.get(name)
        if ent is None:
            raise KeyError(
                f"catalog v{cv.version} has no table {name!r} "
                f"(has {sorted(cv.tables)})"
            )
        return LakeTable.load(spark, ent["path"]), int(ent["snapshot_id"])

    def read(
        self,
        spark: SparkSession,
        name: str,
        version: int | None = None,
        as_of_ms: int | None = None,
    ) -> DataFrame:
        """Clean rows of ``name`` at the cataloged snapshot (LWW winners,
        tombstones/purges applied)."""
        from credix_data_pipeline_spark.operators.apply import read_clean

        t, sid = self.resolve(spark, name, version=version, as_of_ms=as_of_ms)
        return read_clean(t, snapshot_id=sid)

    def register_views(
        self,
        spark: SparkSession,
        version: int | None = None,
        as_of_ms: int | None = None,
    ) -> list[str]:
        """Register every cataloged table as SQL views pinned at its
        cataloged snapshot (``<name>`` clean + ``<name>_raw``) — the
        consumer's one-call consistent read surface."""
        from credix_data_pipeline_spark.operators.apply import (
            register_sql_views,
        )

        if version is not None and as_of_ms is not None:
            raise ValueError("pass version or as_of_ms, not both")
        if as_of_ms is not None:
            cv = self.as_of(as_of_ms)
        elif version is not None:
            cv = self._read(version)
        else:
            cv = self.current()
        names = []
        for name, ent in sorted(cv.tables.items()):
            t = LakeTable.load(spark, ent["path"])
            register_sql_views(t, name, snapshot_id=int(ent["snapshot_id"]))
            names.append(name)
        return names

    # -------------------------------------------------------------- retention
    def _register_path(self, path: str) -> None:
        """Record ``path`` in the catalog's append-only pinned-path
        registry (``_pins/``; one marker file per path, content-stable so
        concurrent publishers racing on the same path write identical
        bytes).  ``expire()`` unions the registry into its tag sweep: a
        table whose last NAMING catalog version is dropped — or whose
        publish crashed right after tagging — would otherwise never be
        visited again and its pin tag would protect a snapshot forever."""
        d = os.path.join(self.root, "_pins")
        os.makedirs(d, exist_ok=True)
        p = os.path.abspath(path)
        fp = os.path.join(
            d, hashlib.sha1(p.encode()).hexdigest()[:16] + ".json"
        )
        if os.path.exists(fp):
            return
        tmp = fp + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"path": p}, f)
        os.replace(tmp, fp)

    def _registered_paths(self) -> dict[str, str]:
        """marker-file path -> registered table path."""
        d = os.path.join(self.root, "_pins")
        if not os.path.isdir(d):
            return {}
        out: dict[str, str] = {}
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json") and ".tmp-" not in fn:
                with open(os.path.join(d, fn)) as f:
                    out[os.path.join(d, fn)] = json.load(f)["path"]
        return out

    def expire(self, keep_last: int = 5, grace_ms: int = 900_000) -> dict:
        """Drop catalog versions older than the newest ``keep_last`` and
        sweep this catalog's tags whose pinned STATE no longer appears in
        any retained version (the tables' own ``expire_snapshots`` then
        ages the underlying files normally).  Sweeping by state, not by
        tag name, means a pin CARRIED across versions keeps its
        protection, and crash residue from failed publishes is collected
        too.  ``grace_ms`` spares tags younger than the window — an
        IN-FLIGHT publish tags before it commits, so a concurrent expire
        must not sweep a pin whose version is milliseconds from landing.
        O(versions + tags) stat cost, no Spark job."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self._versions()
        doomed = vs[:-keep_last] if len(vs) > keep_last else []
        paths: set[str] = set()
        still_pinned: set[tuple[str, int]] = set()
        for v in vs[-keep_last:]:
            for ent in self._read(v).tables.values():
                paths.add(ent["path"])
                still_pinned.add((ent["path"], int(ent["snapshot_id"])))
        for v in doomed:
            paths.update(e["path"] for e in self._read(v).tables.values())
        # the registry covers tables whose last NAMING version is being
        # (or was previously) dropped, and crash residue from publishes
        # that tagged but never committed — neither appears in any
        # retained/doomed version, so without it their tags leak forever
        registry = self._registered_paths()
        paths.update(registry.values())
        for v in doomed:
            os.unlink(os.path.join(self.root, f"v{v}.json"))
        from credix_data_pipeline_spark.lakehouse.table import META_DIR

        now = _now_ms()
        prefix = f"tag-catalog-{self.cid}-"
        dropped_tags = 0
        tags_left: set[str] = set()
        for path in sorted(paths):
            meta_dir = os.path.join(path, META_DIR)
            if not os.path.isdir(meta_dir):
                continue
            for fn in os.listdir(meta_dir):
                if not (fn.startswith(prefix) and fn.endswith(".json")):
                    continue
                with open(os.path.join(meta_dir, fn)) as f:
                    m = json.load(f)
                if (path, int(m["snapshot_id"])) in still_pinned:
                    tags_left.add(path)
                    continue
                if now - int(m.get("created_at_ms", 0)) < grace_ms:
                    tags_left.add(path)
                    continue  # possibly an in-flight publish's pin
                os.unlink(os.path.join(meta_dir, fn))
                dropped_tags += 1
        # prune registry markers whose path holds no remaining catalog
        # tags and appears in no retained version — nothing left to
        # sweep.  Same grace window as tags: a concurrent publish
        # registers BEFORE tagging, so a younger marker may belong to a
        # tag that lands a moment later.
        live_paths = {p for p, _ in still_pinned} | tags_left
        for marker, path in registry.items():
            if path in live_paths:
                continue
            try:
                if now - os.path.getmtime(marker) * 1000 < grace_ms:
                    continue
                os.unlink(marker)
            except FileNotFoundError:
                pass
        return {"expired_versions": doomed, "dropped_tags": dropped_tags}
