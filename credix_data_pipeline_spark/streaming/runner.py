"""Streaming front door: tail the change feed, apply micro-batches.

Two execution modes over the same apply core (operators/apply.py):

``replay()`` — the engine's incremental executor, the primary mode.  A
driver loop lists feed chunks in arrival order, batch-reads the next K with
per-batch schema discovery (mergeSchema), applies them, then advances a
checkpoint file.  This is ``Trigger.AvailableNow`` re-expressed with two
capabilities stock Structured Streaming lacks: true *in-flight* schema
evolution (SS pins the source schema at query start) and deterministic
chunk-aligned batches for replay verification.  It mirrors the reference's
pull path exactly: list → process → advance watermark only after success
(credix_pipeline/assets/cnpj_assets.py watermark flow, README.md:65-72).

``stream()`` — genuine ``spark.readStream`` + ``foreachBatch(apply_batch)``
with a Spark checkpointLocation, for standard Structured Streaming
integration (continuous service mode / ``processingTime`` triggers).  Schema
comes from the feed registry at query start; the fence inside apply_batch
makes ``foreachBatch``'s at-least-once delivery exactly-once.

Crash contract (both modes): data commit carries the batch_id atomically; the
checkpoint advances after.  Crash between the two ⇒ the batch is re-delivered
and fenced out.  Crash before the commit ⇒ the batch re-applies from scratch.
Either way the final table state is identical (tested in tests/test_resume).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from credix_data_pipeline_spark.lakehouse.table import LakeTable
from credix_data_pipeline_spark.operators.apply import ApplyResult, apply_batch
from credix_data_pipeline_spark.sources import feed as feed_mod
from credix_data_pipeline_spark.streaming.lineage import LineageLog

FAILED_DIR = "_failed"
ARCHIVE_DIR = "_archive"


@dataclass
class ReplayStats:
    batches: int = 0
    rows_in: int = 0
    rows_applied: int = 0
    rows_deduped: int = 0
    wall_ms: int = 0
    profile_ms: int = 0
    merge_ms: int = 0

    def add(self, r: ApplyResult) -> None:
        if r.skipped:
            return
        self.batches += 1
        self.rows_in += r.rows_in
        self.rows_applied += r.rows_applied
        self.rows_deduped += r.rows_deduped
        self.wall_ms += r.wall_ms
        self.profile_ms += r.profile_ms
        self.merge_ms += r.merge_ms


class Checkpoint:
    """Tiny atomic progress file: {next_chunk, next_batch_id}."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def load(self) -> dict:
        if not os.path.exists(self.path):
            return {"next_chunk": 0, "next_batch_id": 0}
        with open(self.path) as f:
            return json.load(f)

    def save(self, next_chunk: int, next_batch_id: int) -> None:
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"next_chunk": next_chunk, "next_batch_id": next_batch_id}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self.path)


def quarantine_writer(table_path: str) -> Callable[[DataFrame], None]:
    """ST6 dead-letter: malformed events land under <table>/_failed/ (the
    reference moves failed loads to a `failed/` prefix,
    credix_pipeline/resources/gcp_resource.py:110-118)."""
    failed = os.path.join(os.path.abspath(table_path), FAILED_DIR)

    def _write(df: DataFrame) -> None:
        df.write.mode("append").parquet(failed)

    return _write


def archive_chunks(feed_path: str, chunk_paths: list[str]) -> None:
    """S10 archive-on-success: move processed chunk dirs under
    ``<feed>/_archive/`` (the reference moves successfully-loaded landing
    files to an `archive/` prefix, credix_pipeline/resources/
    gcp_resource.py:88-109, gcs_operations.py:26-33).  The underscore
    prefix hides archived chunks from Spark's file listing, so the
    streaming reader never re-ingests them."""
    for rel in chunk_paths:
        src = os.path.join(feed_path, rel)
        if not os.path.isdir(src):
            continue  # already archived (crash between checkpoint+archive)
        dst = os.path.join(feed_path, ARCHIVE_DIR, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(src, dst)


def replay(
    spark: SparkSession,
    feed_path: str,
    table_path: str,
    *,
    chunks_per_batch: int = 4,
    num_buckets: int = 16,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    checkpoint_path: str | None = None,
    max_batches: int | None = None,
    write_salt: int = 4,
    collect_stats: bool = True,
    fail_at_batch: int | None = None,
    archive: bool = False,
    auto_compact_threshold: int | None = None,
    merge_mode: str = "cow",
    wap: bool = False,
    publish_to: str | None = None,
    occ_retries: int = 0,
    source: str | None = None,
) -> ReplayStats:
    """Replay the feed to exhaustion (availableNow semantics), resumable.

    ``occ_retries=N`` re-runs a merge that loses an optimistic-concurrency
    race against another writer on the same table (compaction loop, a
    second ingest job): the retry re-reads the fence and current snapshot
    and re-merges — the Iceberg commit-retry loop (see apply_batch).

    ``source=<name>`` joins this replay to a FAN-IN table as one named
    shard: the fence becomes per-source and the default checkpoint moves
    to ``_checkpoint_fanin_<name>.json`` (the same files replay_fanin and
    the monitor use).  N INDEPENDENT replay jobs — separate spark-submits,
    one per upstream connector — can then ingest one table concurrently:
    their commits race under base-snapshot OCC, so pair ``source=`` with
    ``occ_retries`` (losers re-read and re-merge; one writer always wins
    each round, so progress is guaranteed).  replay_fanin() is the
    single-process round-robin convenience over the same machinery —
    strictly less commit contention, same final state.

    ``publish_to=<dir>`` relays this table's net changes as a downstream
    change feed after every checkpoint advance (operators/relay.py) —
    multi-hop pipelines tail the published feed with their own ``replay``.
    Publish runs AFTER the checkpoint: a crash between them re-applies the
    fenced batch as a no-op and the next publish picks the span up (the
    relay state pins snapshot ids, so nothing is skipped or doubled).

    ``wap=True`` commits every batch through the write-audit-publish gate
    (apply_batch wap): contracts run on the staged dirty-bucket post-image
    and a violation halts the replay with the published table unchanged and
    the checkpoint still pointing at the offending chunk — the dbt-build
    promotion gate at micro-batch granularity.

    ``fail_at_batch`` injects a crash *after* the data commit but *before*
    the checkpoint advance — the worst-case window — for exactly-once tests.

    ``archive=True`` moves each batch's chunk dirs to ``<feed>/_archive/``
    AFTER the checkpoint advance (commit → checkpoint → archive): a crash
    in the commit/checkpoint window re-reads the un-archived chunk and is
    fenced; a crash in the checkpoint/archive window leaves a chunk behind
    that no later run reads (pos is already past it) — at-most-once residue,
    never data loss.  Mirrors the reference's landing → archive/ move.

    ``auto_compact_threshold=N`` compacts, after each checkpoint advance,
    any bucket holding more than N data files — the small-file defense a
    60 s-rotation feed needs (datastream_streams.tf:75-76) run as part of
    ingestion instead of a separate maintenance job.  Compaction commits
    are snapshots like any other: crash-safe, fenced replays unaffected.
    """
    manifest = feed_mod.read_manifest(feed_path)
    if source is not None and manifest.get("ddl"):
        # same rule as replay_fanin: N upstream DDL streams converging on
        # one fan-in table have no well-defined merge order — one shard's
        # rename would mis-align every other shard's still-old-named rows
        raise RuntimeError(
            f"fan-in source {source!r}: relay feed at {feed_path} carries "
            "a DDL channel; replicate DDL-bearing feeds one-to-one with "
            "a sourceless replay()/stream_ddl()"
        )
    chunks: list[str] = manifest["chunks"]
    feed_format: str = manifest.get("format", "parquet")
    feed_schema = T.StructType.fromJson(manifest["schema"])
    target_schema = _target_schema_base(feed_schema, manifest)

    table = LakeTable.create_if_not_exists(
        spark,
        table_path,
        target_schema,
        key=["conv_id", "turn_idx"],
        num_buckets=num_buckets,
        bucket_by=["conv_id"],
        merge_mode=merge_mode,
    )
    lineage = LineageLog(table_path)
    dead = quarantine_writer(table_path)
    default_ckpt = (
        f"_checkpoint_fanin_{source}.json" if source else "_checkpoint.json"
    )
    ckpt = Checkpoint(checkpoint_path or os.path.join(table_path, default_ckpt))
    state = ckpt.load()
    pos, batch_id = state["next_chunk"], state["next_batch_id"]

    # Vacuumed relay feeds keep chunk ORDINALS (dropped entries are None).
    # A fresh replica bootstraps at the rebase chunk (full state as
    # inserts); a replica whose checkpoint points INTO the vacuumed prefix
    # lost history it never consumed — fail loudly, never skip a span.
    if pos < len(chunks) and chunks[pos] is None:
        rb = manifest.get("rebase_chunk")
        if pos == 0 and rb is not None and chunks[rb] is not None:
            pos = rb
        else:
            raise RuntimeError(
                f"relay feed at {feed_path} was vacuumed past this "
                f"replica's checkpoint (chunk {pos}); its un-consumed "
                "history is gone — re-bootstrap the replica from the "
                "rebase chunk (fresh table + checkpoint)"
            )

    stats = ReplayStats()
    done = 0
    # DDL replication channel (relay feeds): a chunk with recorded DDL must
    # START its micro-batch — its data is aligned to the post-DDL layout,
    # so the ALTERs apply to the replica before that chunk merges, while
    # earlier chunks in flight still merge under the pre-DDL layout.
    ddl_map: dict[str, list] = manifest.get("ddl") or {}
    while pos < len(chunks):
        if max_batches is not None and done >= max_batches:
            break
        batch_chunks = chunks[pos : pos + chunks_per_batch]
        if ddl_map:
            for j, c in enumerate(batch_chunks):
                if j > 0 and c in ddl_map:
                    batch_chunks = batch_chunks[:j]
                    break
            # chunks[0] never applies DDL: a fresh replica is created from
            # its post-DDL schema (pre-fix manifests may still carry it)
            if batch_chunks[0] in ddl_map and batch_chunks[0] != chunks[0]:
                from credix_data_pipeline_spark.operators.relay import (
                    apply_ddl,
                )

                # idempotent: a crash-redelivered batch re-applies as no-op
                apply_ddl(table, ddl_map[batch_chunks[0]])
        batch_df = feed_mod.read_chunks(
            spark,
            feed_path,
            batch_chunks,
            file_format=feed_format,
            schemas=manifest.get("schemas"),
        )
        res = apply_batch(
            table,
            batch_df,
            batch_id,
            transform=transform,
            lineage=lineage,
            dead_letter=dead,
            write_salt=write_salt,
            collect_stats=collect_stats,
            wap=wap,
            occ_retries=occ_retries,
            source=source,
        )
        stats.add(res)
        if fail_at_batch is not None and batch_id == fail_at_batch:
            raise RuntimeError(f"injected crash after commit of batch {batch_id}")
        pos += len(batch_chunks)
        batch_id += 1
        ckpt.save(pos, batch_id)
        if archive:
            archive_chunks(feed_path, batch_chunks)
        if auto_compact_threshold:
            snap = table.current()
            fat = [
                int(b)
                for b, fl in snap.files.items()
                if len(fl) > auto_compact_threshold
            ]
            if fat:
                table.compact(target_buckets=fat)
        if publish_to:
            from credix_data_pipeline_spark.operators.relay import (
                publish_changes,
            )

            publish_changes(table, publish_to)
        done += 1
    return stats


def bootstrap(
    spark: SparkSession,
    src_path: str,
    table_path: str,
    *,
    key: list[str] | None = None,
    num_buckets: int = 16,
    bucket_by: list[str] | None = None,
    lsn_col: str | None = None,
    src_format: str = "parquet",
    merge_mode: str = "cow",
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> dict:
    """Initial-snapshot load (SURVEY §2.8 ST4 — Datastream
    ``backfill_all``): seed a FRESH table from an existing dataset, then
    let ``replay``/``stream`` apply the change feed incrementally on top.

    LWW semantics of the seam: bootstrap rows carry ``_lsn`` from
    ``lsn_col`` (the snapshot's consistent LSN — the Debezium "snapshot at
    position X, stream from X" contract) or 0 without one, so any feed
    event for the same key supersedes the seeded row.  Duplicate keys in
    the source collapse to the highest-LSN row when ``lsn_col`` is given
    and are refused otherwise (a keyed snapshot must be unique — silently
    keeping an arbitrary duplicate would seed wrong state).  Null keys are
    refused outright: a snapshot is curated input, not a stream to
    quarantine.  Refuses a non-empty existing table (bootstrap is not an
    upsert; replay is).
    """
    from pyspark.sql import functions as F

    key = list(key or ["conv_id", "turn_idx"])
    t_probe = LakeTable(spark, table_path)
    if t_probe.exists():
        raise RuntimeError(
            f"table at {table_path} already exists — bootstrap seeds "
            "fresh tables only; use replay for incremental loads"
        )
    df = spark.read.format(src_format).load(src_path)
    if transform is not None:
        df = transform(df)
    missing = [k for k in key if k not in df.columns]
    if missing:
        raise RuntimeError(f"bootstrap source lacks key column(s) {missing}")
    reserved = [c for c in ("_lsn", "_deleted") if c in df.columns]
    if reserved:
        raise RuntimeError(
            f"bootstrap source carries engine column(s) {reserved} "
            "(exported from another lake table?) — drop or rename them; "
            "to seed LSNs from such a column, rename it and pass lsn_col"
        )
    n_null = df.filter(
        " OR ".join(f"{k} IS NULL" for k in key)
    ).count()
    if n_null:
        raise RuntimeError(
            f"bootstrap refused: {n_null} source rows have null key "
            "column(s) — a snapshot must be complete"
        )
    lsn = (
        F.col(lsn_col).cast("long") if lsn_col else F.lit(0).cast("long")
    )
    payload = [c for c in df.columns]
    out = df.select(
        *payload,
        lsn.alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    dup = (
        out.groupBy(*key).count().filter(F.col("count") > 1).count()
    )
    if dup:
        if not lsn_col:
            raise RuntimeError(
                f"bootstrap refused: {dup} duplicate key(s) in the source "
                "and no lsn_col to arbitrate — a keyed snapshot must be "
                "unique"
            )
        row = F.struct(*[F.col(c) for c in out.columns])
        out = (
            out.groupBy(*key)
            .agg(F.max_by(row, F.col("_lsn")).alias("_w"))
            .select("_w.*")
        )
    from pyspark.sql import types as T_

    schema = T_.StructType(
        [*df.schema.fields,
         T_.StructField("_lsn", T_.LongType(), True),
         T_.StructField("_deleted", T_.BooleanType(), True)]
    )
    table = LakeTable.create(
        spark, table_path, schema, key=key, num_buckets=num_buckets,
        bucket_by=bucket_by or [key[0]], merge_mode=merge_mode,
    )
    n = out.count()
    table.append(out, summary={"operation": "bootstrap"})
    if merge_mode == "cow":
        # a CoW bootstrap is unique-per-key by construction (checked /
        # collapsed above) — compact restores the sorted one-file layout
        table.compact()
    return {"rows": n, "table": table_path}


def requeue_failed(
    spark: SparkSession,
    table_path: str,
    feed_path: str,
    fixes: dict[str, str] | None = None,
    source: str | None = None,
) -> dict:
    """Dead-letter requeue: repair quarantined events and re-enter them
    into the change feed as a fresh tail chunk (the Kafka-Connect
    DLQ-redrive / Debezium re-submit pattern).

    Rows in ``<table>/_failed/`` were rejected by ``rejection_condition``
    (null key / null lsn / unknown op, or a ``contracts.check.*`` table
    CHECK constraint).  ``fixes`` maps column -> SQL
    expression applied before re-validation (e.g.
    ``{"turn_idx": "coalesce(turn_idx, 0)", "op": "'U'"}``) — the repair a
    human writes after diagnosing the upstream bug.  Every repaired row
    must pass validation or the whole requeue refuses (no partial redrive:
    half-fixed batches just round-trip through quarantine again).

    On success the failed set moves to ``<table>/_failed_requeued/<chunk>/``
    (audit trail) and the next ``replay``/``stream`` pass ingests the new
    chunk through the normal exactly-once path.  Crash between the feed
    append and the archive move re-requeues the same rows as one more
    chunk — verbatim duplicates, collapsed by LWW (same lsn, same payload),
    so the operation is idempotent in effect.
    """
    from pyspark.sql import functions as F

    from credix_data_pipeline_spark.operators.apply import (
        align_for_checks,
        rejection_condition,
    )

    tbl_root = os.path.abspath(table_path)
    failed = os.path.join(tbl_root, FAILED_DIR)
    parks = sorted(
        p for p in os.listdir(tbl_root)
        if p.startswith("failed-park-")
    ) if os.path.isdir(tbl_root) else []
    if os.path.isdir(failed):
        # an intact quarantine supersedes any park residue: a crash AFTER
        # the park write but BEFORE the archive rename left a stale copy
        # whose rows are still in _failed — keeping it around would later
        # resurrect already-requeued rows once _failed drains
        import shutil as _shutil

        for p in parks:
            _shutil.rmtree(os.path.join(tbl_root, p))
    elif parks:
        # crash recovery: a per-shard requeue that died between the
        # archive move and the park rename stranded the other shards'
        # rows — restore them as the quarantine.  The supersede rule
        # above guarantees at most one park can exist here.
        os.rename(os.path.join(tbl_root, parks[-1]), failed)
    if not os.path.isdir(failed) or not any(
        f.endswith(".parquet") for f in os.listdir(failed)
    ):
        return {"requeued": 0, "chunk": None, "still_bad": 0}
    df = spark.read.option("mergeSchema", "true").parquet(failed)
    remaining = None
    if source is not None:
        # fan-in: redrive only this shard's rows into ITS feed; the other
        # shards' quarantined rows stay parked for their own requeues
        if "_source" not in df.columns:
            raise RuntimeError(
                "requeue --source on a quarantine with no _source tags "
                "(written by a sourceless replay) — requeue without "
                "--source instead"
            )
        remaining = df.filter(
            (F.col("_source") != source) | F.col("_source").isNull()
        )
        df = df.filter(F.col("_source") == source)
    elif "_source" in df.columns:
        raise RuntimeError(
            "requeue without --source on a fan-in quarantine (rows carry "
            "_source tags): redriving every shard's rows into one feed "
            "would break per-shard key ownership — requeue each shard "
            "into its own feed with --source"
        )
    if "_source" in df.columns:
        df = df.drop("_source")
    for col, expr in (fixes or {}).items():
        df = df.withColumn(col, F.expr(expr))
    table = LakeTable.load(spark, table_path)
    snap = table.current()
    # re-validate against the FULL rejection predicate (structural +
    # contracts.check.* table properties) — a repair that satisfies the
    # shape but still violates a CHECK would round-trip to quarantine
    requeue_cols = set(df.columns)  # PRE-alignment physical schema
    df = align_for_checks(df, snap)
    bad = rejection_condition(
        snap, snap.key,
        has_patch_cols="patch_cols" in requeue_cols,
        batch_cols=requeue_cols,
    )
    still_bad = df.filter(bad).count()
    if still_bad:
        raise RuntimeError(
            f"requeue refused: {still_bad} rows still fail validation "
            "after fixes — repair them or they will round-trip straight "
            "back to quarantine"
        )
    n = df.count()
    if n == 0:
        return {"requeued": 0, "chunk": None, "still_bad": 0}
    rel = feed_mod.append_chunk(spark, feed_path, df)
    # park the OTHER shards' rows durably BEFORE the quarantine moves —
    # a lazily-planned write after the rename would re-read moved files.
    # NB: no leading underscore (Spark's file listing hides such paths).
    park = None
    if remaining is not None and remaining.count():
        park = os.path.join(
            os.path.abspath(table_path), f"failed-park-{uuid.uuid4().hex}"
        )
        remaining.write.parquet(park)
    archive = os.path.join(
        os.path.abspath(table_path),
        "_failed_requeued",
        # per-shard requeues of the same poisoned span archive separately
        f"{rel.replace('/', '_')}-{uuid.uuid4().hex[:8]}",
    )
    os.makedirs(os.path.dirname(archive), exist_ok=True)
    os.rename(failed, archive)
    if park is not None:
        os.rename(park, failed)
    return {"requeued": n, "chunk": rel, "still_bad": 0}


def replay_fanin(
    spark: SparkSession,
    feeds: dict[str, str],
    table_path: str,
    *,
    chunks_per_batch: int = 4,
    num_buckets: int = 16,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    write_salt: int = 4,
    collect_stats: bool = True,
    max_batches: int | None = None,
    merge_mode: str = "cow",
    archive: bool = False,
    fail_at: tuple[str, int] | None = None,
    occ_retries: int = 0,
) -> dict[str, ReplayStats]:
    """Fan-in replay: N sharded upstream feeds → ONE lake table.

    The sharded-OLTP ingest shape (Vitess / tenant-sharded MySQL behind N
    Datastream/Debezium connectors): each source owns a disjoint key range
    and publishes its own change feed with its own LSN space and chunk
    sequence.  Each source gets its own checkpoint file
    (``_checkpoint_fanin_<name>.json``) and its own monotone batch-id
    sequence; the exactly-once fence is per-source (the commit summary's
    ``fences`` map — see ``operators/apply.last_applied_batch_id``), so a
    crash-redelivered batch from one shard is fenced out without blocking
    the others, and a rollback restores every shard's fence together.

    Scheduling is a deterministic round-robin over sorted source names —
    one micro-batch per source per round until every feed is exhausted
    (availableNow semantics).  Because shards own disjoint keys, the final
    state is independent of interleaving (each key's history lives wholly
    in one feed); the tests pin A,B vs B,A equality.

    ``fail_at=(source, batch_id)`` injects a crash after that source's
    commit but before its checkpoint advance — the worst-case window — for
    exactly-once tests.

    v1 scope: plain (non-DDL) feeds; a relay feed carrying a DDL channel is
    refused — two upstream DDL streams converging on one table have no
    well-defined merge order.
    """
    if not feeds:
        raise ValueError("replay_fanin needs at least one feed")
    names = sorted(feeds)
    manifests = {n: feed_mod.read_manifest(feeds[n]) for n in names}
    for n, man in manifests.items():
        if man.get("ddl"):
            raise RuntimeError(
                f"fan-in source {n!r} carries a relay DDL channel; "
                "replicate DDL-bearing feeds one-to-one with replay()"
            )
        if any(c is None for c in man["chunks"]):
            raise RuntimeError(
                f"fan-in source {n!r} was vacuumed; re-bootstrap replicas "
                "of vacuumed relay feeds with replay()"
            )

    first = manifests[names[0]]
    target_schema = _target_schema_base(
        T.StructType.fromJson(first["schema"]), first
    )
    table = LakeTable.create_if_not_exists(
        spark,
        table_path,
        target_schema,
        key=["conv_id", "turn_idx"],
        num_buckets=num_buckets,
        bucket_by=["conv_id"],
        merge_mode=merge_mode,
    )
    lineage = LineageLog(table_path)
    dead = quarantine_writer(table_path)

    state: dict[str, dict] = {}
    for n in names:
        ckpt = Checkpoint(
            os.path.join(table_path, f"_checkpoint_fanin_{n}.json")
        )
        st = ckpt.load()
        state[n] = {
            "ckpt": ckpt,
            "pos": st["next_chunk"],
            "batch_id": st["next_batch_id"],
            "stats": ReplayStats(),
        }

    done = 0
    while True:
        progressed = False
        for n in names:
            if max_batches is not None and done >= max_batches:
                break
            man, st = manifests[n], state[n]
            chunks = man["chunks"]
            if st["pos"] >= len(chunks):
                continue
            batch_chunks = chunks[st["pos"] : st["pos"] + chunks_per_batch]
            batch_df = feed_mod.read_chunks(
                spark,
                feeds[n],
                batch_chunks,
                file_format=man.get("format", "parquet"),
                schemas=man.get("schemas"),
            )
            res = apply_batch(
                table,
                batch_df,
                st["batch_id"],
                transform=transform,
                lineage=lineage,
                dead_letter=dead,
                write_salt=write_salt,
                collect_stats=collect_stats,
                source=n,
                occ_retries=occ_retries,
            )
            st["stats"].add(res)
            if fail_at is not None and fail_at == (n, st["batch_id"]):
                raise RuntimeError(
                    f"injected crash after commit of {n} batch "
                    f"{st['batch_id']}"
                )
            st["pos"] += len(batch_chunks)
            st["batch_id"] += 1
            st["ckpt"].save(st["pos"], st["batch_id"])
            if archive:
                archive_chunks(feeds[n], batch_chunks)
            progressed = True
            done += 1
        if not progressed:
            break
        if max_batches is not None and done >= max_batches:
            break
    return {n: state[n]["stats"] for n in names}


def _target_schema_base(feed_schema: T.StructType, manifest: dict) -> T.StructType:
    """Initial target schema: payload of the *pre-evolution* feed schema.

    Columns appearing at the evolution switch-point must NOT pre-exist — the
    engine adds them in-flight when they first arrive (that is the test).
    """
    from credix_data_pipeline_spark.schema import (
        CHANGE_SCHEMA,
        target_schema_for,
    )

    if manifest.get("evolution_chunk") is not None:
        return target_schema_for(CHANGE_SCHEMA)
    return target_schema_for(feed_schema)


def _guard_continuous_batch(
    feed_path: str, pinned_cols: set[str], batch_df: DataFrame
) -> DataFrame:
    """Per-batch safety gate for a CONTINUOUS (processingTime) stream over
    a chunked feed.  The open ``feed_path/*`` glob a long-lived query needs
    in order to discover future chunks also matches (a) chunks published
    after the query pinned its schema and (b) chunk dirs never committed
    to the feed manifest (data-before-link residue of a crashed or
    OCC-losing publish).  Re-reads the manifest (one tiny JSON) and
    raises — failing the query loudly — when the feed gained a DDL
    channel, evolved its schema past the pinned columns, or the batch
    contains files from uncommitted chunk dirs.  The failed batch is not
    committed to the SS checkpoint, so a restart re-reads it safely.
    Returns the batch with the ``_graft_src_file`` helper column dropped.
    """
    man = feed_mod.read_manifest(feed_path)
    if man.get("ddl"):
        raise RuntimeError(
            f"relay feed at {feed_path} gained a DDL channel while this "
            "stream was running; restart via stream_ddl() (SS pins the "
            "source schema at query start)"
        )
    new_cols = [
        f["name"]
        for f in man["schema"]["fields"]
        if f["name"] not in pinned_cols
    ]
    if new_cols:
        raise RuntimeError(
            f"feed at {feed_path} evolved mid-stream (added column(s) "
            f"{new_cols}); restart stream() to re-pin the schema — the "
            "un-committed batch re-reads under the new layout on restart"
        )
    committed = {c.split("/", 1)[0] for c in man["chunks"] if c}
    root = os.path.abspath(feed_path)
    batch_subs = {
        r[0]
        for r in batch_df.select(
            F.element_at(
                F.split(
                    F.regexp_replace("_graft_src_file", "^file:(//)?", ""),
                    "/",
                ),
                len(root.split(os.sep)) + 1,
            )
        )
        .distinct()
        .collect()
    }
    stray = sorted(s for s in batch_subs if s and s not in committed)
    if stray:
        raise RuntimeError(
            f"stream over {feed_path} read chunk dir(s) {stray} that are "
            "not committed to the feed manifest — crashed/conflicting "
            "publish residue (or a publish racing this batch; retry). "
            "Sweep the residue or use availableNow/stream_ddl, which read "
            "only committed chunks"
        )
    return batch_df.drop("_graft_src_file")


def stream(
    spark: SparkSession,
    feed_path: str,
    table_path: str,
    *,
    num_buckets: int = 16,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    processing_time: str = "10 seconds",
    write_salt: int = 4,
    collect_stats: bool = True,
    merge_mode: str = "cow",
    wap: bool = False,
    publish_to: str | None = None,
    occ_retries: int = 0,
    source: str | None = None,
):
    """Structured Streaming mode: readStream file source → foreachBatch MERGE.

    ``source=<name>`` joins a fan-in table as one named shard, exactly as
    in ``replay`` — per-source fence, and the default SS checkpoint moves
    to ``_ss_checkpoint_<name>`` so each shard's stream tracks its own
    offsets.  Pair with ``occ_retries`` when shards stream concurrently.

    The classic exactly-once pattern: SS checkpoint gives offset tracking and
    monotone batch ids; the fence inside apply_batch de-duplicates the
    at-least-once `foreachBatch` redelivery window (SURVEY §2.8 ST3).

    Source discovery: ``availableNow`` reads exactly the chunks committed
    to the feed manifest at call time (brace glob — uncommitted
    publish residue and schema-unpinned late chunks are excluded; the
    next call picks those up under a re-pinned schema).  Continuous mode
    (``available_now=False``) keeps the open glob so future chunks are
    discovered, and guards EVERY micro-batch (``_guard_continuous_batch``)
    against mid-stream DDL, schema adds, and uncommitted chunk dirs —
    the query fails loudly instead of silently mis-reading, and the
    un-committed batch re-reads under the corrected setup on restart.

    ``wap=True``: each foreachBatch commit goes through the write-audit-
    publish gate; a contract violation raises inside the sink, failing the
    streaming query with the published table unchanged and the SS
    checkpoint still pointing at the offending offsets — on restart the
    batch is re-delivered (fixed upstream, it publishes; still broken, it
    fails again rather than corrupting the table).
    """
    manifest = feed_mod.read_manifest(feed_path)
    if manifest.get("ddl"):
        # SS pins the source schema at query start, so ONE long-lived query
        # cannot apply a mid-stream rename/widen/drop at the right chunk
        # boundary — the replica would silently mis-align.  Refuse loudly;
        # stream_ddl() drains DDL-bearing feeds with per-segment queries
        # (restart-on-schema-change) and replay() handles them natively.
        raise RuntimeError(
            f"relay feed at {feed_path} carries a DDL channel; Structured "
            "Streaming pins the source schema at query start — use "
            "stream_ddl() (segmented availableNow) or replay()"
        )
    feed_format: str = manifest.get("format", "parquet")
    if feed_format == "avro" and not feed_mod.avro_available(spark):
        raise RuntimeError(
            "Structured Streaming over an avro feed needs the external "
            "spark-avro module (the SS file source cannot use the "
            "vendored avro_lite decoder) — install spark-avro or use "
            "replay(), which reads avro feeds everywhere"
        )
    feed_schema = T.StructType.fromJson(manifest["schema"])
    target_schema = _target_schema_base(feed_schema, manifest)

    table = LakeTable.create_if_not_exists(
        spark,
        table_path,
        target_schema,
        key=["conv_id", "turn_idx"],
        num_buckets=num_buckets,
        bucket_by=["conv_id"],
        merge_mode=merge_mode,
    )
    lineage = LineageLog(table_path)
    dead = quarantine_writer(table_path)

    # ST7: Spark-measured per-batch throughput lands next to the engine's
    # own lineage rows (idempotent: addListener tolerates duplicates only
    # if we track it, so keep one per table path on this session)
    from credix_data_pipeline_spark.streaming.listener import (
        LineageProgressListener,
    )

    attached = getattr(spark, "_graft_listeners", {})
    if table_path not in attached:
        listener = LineageProgressListener(table_path)
        spark.streams.addListener(listener)
        attached[table_path] = listener
        spark._graft_listeners = attached

    live_chunks = [c for c in manifest["chunks"] if c]
    if available_now:
        # Read exactly the chunks COMMITTED to the feed manifest (brace
        # glob, as in stream_ddl) — never `feed_path/*`, which also
        # matches chunk dirs whose manifest link never landed (a crashed
        # or OCC-losing publish leaves data-before-link residue) and
        # chunks published between the manifest read and query start,
        # whose registry schema this query did not pin.  Un-matched new
        # chunks are consumed by the NEXT call, which re-pins the evolved
        # schema; the SS checkpoint's seen-files log makes the growing
        # glob incremental.
        if any(c is None for c in manifest["chunks"]):
            # vacuumed feed: this replica's progress lives inside the SS
            # checkpoint, so we cannot prove its un-consumed span wasn't
            # vacuumed away.  A FRESH replica bootstraps at the rebase
            # chunk (the live chunks start there); an existing one must
            # use stream_ddl()/replay(), which track chunk progress
            # explicitly — or re-bootstrap.
            ckpt_probe = os.path.join(
                table_path,
                f"_ss_checkpoint_{source}" if source else "_ss_checkpoint",
            )
            if (checkpoint_dir and os.path.isdir(checkpoint_dir)) or (
                not checkpoint_dir and os.path.isdir(ckpt_probe)
            ):
                raise RuntimeError(
                    f"relay feed at {feed_path} was vacuumed; stream() "
                    "cannot prove this replica consumed the dropped span "
                    "(its progress is inside the SS checkpoint) — drive "
                    "vacuumed feeds with stream_ddl()/replay(), or "
                    "re-bootstrap the replica"
                )
            if manifest.get("rebase_chunk") is None or not live_chunks:
                raise RuntimeError(
                    f"relay feed at {feed_path} was vacuumed and records "
                    "no live rebase chunk — nothing to bootstrap from"
                )
        if not live_chunks:
            raise RuntimeError(f"relay feed at {feed_path} has no chunks")
        src_path = os.path.join(
            feed_path,
            live_chunks[0]
            if len(live_chunks) == 1
            else "{" + ",".join(live_chunks) + "}",
        )
    else:
        # continuous mode must discover future chunks, so the open glob
        # stays — guarded per batch in the sink below
        src_path = feed_path + "/*"

    reader = (
        spark.readStream.schema(feed_schema)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if feed_format == "parquet":
        src = reader.parquet(src_path)
    else:
        src = reader.format(feed_format).load(src_path)
    if not available_now:
        src = src.withColumn("_graft_src_file", F.input_file_name())

    pinned_cols = set(feed_schema.fieldNames())

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not available_now:
            # a long-lived query picks up chunks published AFTER the
            # schema was pinned: stop loudly before mis-aligning them
            # (the failed batch is un-committed in the SS checkpoint, so
            # a restarted stream re-reads it under the evolved schema —
            # no data is lost, unlike a silent narrow-schema read)
            batch_df = _guard_continuous_batch(
                feed_path, pinned_cols, batch_df
            )
        apply_batch(
            table,
            batch_df,
            batch_id,
            transform=transform,
            lineage=lineage,
            dead_letter=dead,
            write_salt=write_salt,
            collect_stats=collect_stats,
            wap=wap,
            occ_retries=occ_retries,
            source=source,
        )
        if publish_to:
            # relay inside foreachBatch, AFTER the fenced commit: an SS
            # redelivery re-applies as a no-op and the relay state (pinned
            # snapshot ids) publishes each span exactly once
            from credix_data_pipeline_spark.operators.relay import (
                publish_changes,
            )

            publish_changes(table, publish_to)

    default_ss = f"_ss_checkpoint_{source}" if source else "_ss_checkpoint"
    writer = src.writeStream.foreachBatch(_sink).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(table_path, default_ss),
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def _ddl_segments(
    chunks: list[str | None], ddl_map: dict[str, list]
) -> list[tuple[int, int, list | None]]:
    """Split a relay feed's chunk list at DDL boundaries.

    Returns ``[(start_ordinal, end_ordinal_exclusive, ddl_events)]`` in feed
    order.  A chunk that recorded DDL STARTS its segment (its row data is
    aligned to the post-DDL layout, so the ALTERs must land first) — the
    same rule ``replay`` enforces at micro-batch granularity.  Chunk 0
    never applies DDL (a fresh replica is born with the post-DDL schema;
    pre-fix manifests may still carry it).
    """
    if not chunks:
        return []
    starts = [0]
    for i, c in enumerate(chunks):
        if i > 0 and c is not None and c in ddl_map:
            starts.append(i)
    segs: list[tuple[int, int, list | None]] = []
    for j, s in enumerate(starts):
        e = starts[j + 1] if j + 1 < len(starts) else len(chunks)
        c0 = chunks[s]
        ddl = ddl_map.get(c0) if (s > 0 and c0 is not None) else None
        segs.append((s, e, ddl))
    return segs


def _merged_reader_schema(
    manifest: dict, rels: list[str]
) -> T.StructType:
    """One pinned SS reader schema for a segment: the by-name superset of
    the segment chunks' registry schemas.  Within a segment only column
    ADDS occur (rename/widen/drop mint DDL and therefore a boundary), so a
    superset is exact — parquet fills a pre-add file's missing columns with
    NULL, the same alignment ``read_chunks``'s unionByName produces.  A
    same-name type conflict inside one segment means the manifest is
    corrupt; refuse rather than coerce."""
    schemas = manifest.get("schemas") or {}
    fields: dict[str, T.StructField] = {}
    order: list[str] = []
    for rel in rels:
        sub = rel.split("/", 1)[0]
        sj = schemas.get(sub, manifest["schema"])
        for f in T.StructType.fromJson(sj).fields:
            prev = fields.get(f.name)
            if prev is None:
                fields[f.name] = f
                order.append(f.name)
            elif prev.dataType != f.dataType:
                raise RuntimeError(
                    f"relay feed chunk {rel!r}: column {f.name!r} changes "
                    f"type mid-segment ({prev.dataType.simpleString()} -> "
                    f"{f.dataType.simpleString()}) with no DDL boundary — "
                    "manifest is inconsistent"
                )
    return T.StructType([fields[n] for n in order])


def stream_ddl(
    spark: SparkSession,
    feed_path: str,
    table_path: str,
    *,
    num_buckets: int = 16,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int | None = None,
    write_salt: int = 4,
    collect_stats: bool = True,
    merge_mode: str = "cow",
    wap: bool = False,
    publish_to: str | None = None,
    occ_retries: int = 0,
    source: str | None = None,
) -> dict:
    """Structured Streaming over a DDL-bearing relay feed: drain-to-now via
    per-segment ``availableNow`` queries, restarting at every DDL boundary.

    SS pins the source schema at query start, so one long-lived query
    cannot apply a mid-stream rename/widen/drop at the right chunk — that
    is why ``stream()`` refuses DDL channels.  This is the standard
    restart-on-schema-change pattern (Delta streaming's
    ``schemaTrackingLocation`` contract: the stream STOPS at a non-additive
    schema change and resumes under the new schema): the feed's chunk list
    is split at DDL-bearing chunks, each segment runs as its own
    ``availableNow`` file-source query pinned to that segment's superset
    registry schema, and the segment's DDL events apply to the replica
    between queries — exactly where ``replay`` applies them.

    Exactly-once across restarts and redeliveries:

    - each segment keeps its own SS checkpoint (``_ss_checkpoint[_<src>]``
      for the ordinal-0 segment — the SAME dir ``stream()`` uses, so a
      replica that started on a plain feed upgrades seamlessly when DDL
      first appears — and ``…_seg<start_ordinal>`` after);
    - segment batch ids are offset by ``start_ordinal << 32`` so the
      table's fence stays monotone across segments (SS batch ids restart
      at 0 per checkpoint);
    - progress is recorded in ``_ss_ddl_segments[_<src>].json`` as
      ``drained_through`` — the exclusive END ordinal of the consumed
      chunk prefix, advanced after every segment's ``availableNow``
      query completes (the query provably consumed every chunk its
      brace glob covered).  Chunk END ordinals are stable under
      ``vacuum_relay`` (dropped entries stay as ``None`` placeholders)
      whereas segment BOUNDARIES are not — vacuum strips dropped chunks'
      DDL entries, merging segments — so keying progress by boundary
      ordinals (the original design) silently skipped merged segments
      and wedged rebase-bootstrapped replicas.  A segment that GREW
      since the last run (or was merged by vacuum) is clipped to its
      un-consumed suffix, which runs under a checkpoint keyed by that
      effective start.  A crash anywhere re-runs at most one segment,
      whose fence + idempotent ``apply_ddl`` make re-application a
      no-op.  Legacy ``drained_starts`` markers migrate on load when
      their boundaries still exist, and fail loudly (re-bootstrap) when
      the feed was vacuumed under one.

    Vacuumed feeds: a fresh replica bootstraps at the ``rebase_chunk``
    (full state as inserts); a replica whose undrained segments were
    vacuumed away fails loudly — its un-consumed history is gone (the same
    never-skip-a-span rule as ``replay``).

    Returns ``{"segments_run": n, "ddl_applied": k, "batches": m}``.
    """
    from credix_data_pipeline_spark.operators.relay import apply_ddl
    from credix_data_pipeline_spark.schema import target_schema_for

    manifest = feed_mod.read_manifest(feed_path)
    ddl_map: dict[str, list] = manifest.get("ddl") or {}
    if source is not None and ddl_map:
        # same rule as replay_fanin: no per-shard DDL on a fan-in table
        raise RuntimeError(
            f"fan-in source {source!r}: relay feed at {feed_path} carries "
            "a DDL channel; replicate DDL-bearing feeds one-to-one with "
            "a sourceless replay()/stream_ddl()"
        )
    chunks: list[str | None] = manifest["chunks"]
    feed_format: str = manifest.get("format", "parquet")
    if feed_format == "avro" and not feed_mod.avro_available(spark):
        raise RuntimeError(
            "Structured Streaming over an avro feed needs the external "
            "spark-avro module (the SS file source cannot use the "
            "vendored avro_lite decoder) — install spark-avro or use "
            "replay(), which reads avro feeds everywhere"
        )

    suffix = f"_{source}" if source else ""
    segs = _ddl_segments(chunks, ddl_map)
    marker_path = os.path.join(table_path, f"_ss_ddl_segments{suffix}.json")
    marker_exists = os.path.exists(marker_path)
    drained_through = 0  # chunks [0, drained_through) are fully consumed
    if marker_exists:
        with open(marker_path) as f:
            m = json.load(f)
        if "drained_through" in m:
            drained_through = int(m["drained_through"])
        else:
            # legacy marker: the set of drained segment-START ordinals.
            # Segments drain strictly in order, so a valid legacy marker
            # names a contiguous boundary prefix of the CURRENT
            # segmentation; anything else means the feed was vacuumed or
            # rebased under a legacy marker (boundaries shifted) and the
            # replica's true progress is unknowable — refuse.
            rest = set(m["drained_starts"])
            for s, e, _ in segs:
                if s == drained_through and s in rest:
                    rest.discard(s)
                    drained_through = e
            if rest:
                raise RuntimeError(
                    f"legacy stream_ddl marker at {marker_path} references "
                    "segment boundaries no longer in the feed manifest "
                    "(the feed was vacuumed/rebased under the old marker "
                    "format) — re-bootstrap the replica (fresh table + "
                    "checkpoint)"
                )

    def _clip(
        seg_list: list[tuple[int, int, list | None]], floor: int
    ) -> list[tuple[int, int, list | None]]:
        # Skip fully-consumed segments; clip one that straddles ``floor``.
        # A straddle only arises when vacuum merged boundaries below the
        # floor — the ordinal-0 segment, which never carries DDL — or at
        # the rebase-bootstrap floor, where the rebase chunk is a
        # full-state re-anchor already laid out post-DDL; in both cases
        # the clipped segment applies no DDL.
        out: list[tuple[int, int, list | None]] = []
        for s, e, ddl in seg_list:
            if e <= floor:
                continue
            s_eff = max(s, floor)
            out.append((s_eff, e, ddl if s_eff == s else None))
        return out

    pending = _clip(segs, drained_through)

    # fresh replica over a vacuumed feed: bootstrap at the rebase chunk
    fresh = (
        not marker_exists
        and drained_through == 0
        and not any(
            d.startswith(f"_ss_checkpoint{suffix}")
            for d in (
                os.listdir(table_path) if os.path.isdir(table_path) else []
            )
        )
    )
    if fresh and chunks and chunks[0] is None:
        rb = manifest.get("rebase_chunk")
        if rb is None or chunks[rb] is None:
            raise RuntimeError(
                f"relay feed at {feed_path} was vacuumed and records no "
                "live rebase chunk — nothing to bootstrap a replica from"
            )
        # the rebase chunk is a full-state re-anchor: start there, no DDL
        # (a fresh replica is born with the post-DDL registry schema even
        # when the rebase chunk itself sits on a DDL boundary)
        pending = [
            (s, e, None if s == rb else ddl)
            for s, e, ddl in _clip(pending, rb)
        ]
    for s, e, _ in pending:
        if any(chunks[i] is None for i in range(s, e)):
            raise RuntimeError(
                f"relay feed at {feed_path} was vacuumed past this "
                f"replica's progress (un-consumed chunk in [{s}, {e})); "
                "its history is gone — re-bootstrap the replica "
                "from the rebase chunk (fresh table + checkpoint)"
            )

    if not pending:
        return {"segments_run": 0, "ddl_applied": 0, "batches": 0}

    # create the replica from the FIRST consumed chunk's registry schema
    # (later columns evolve in flight, exactly as in replay)
    first_rel = chunks[pending[0][0]]
    create_schema = target_schema_for(
        _merged_reader_schema(manifest, [first_rel])
    )
    table = LakeTable.create_if_not_exists(
        spark,
        table_path,
        create_schema,
        key=["conv_id", "turn_idx"],
        num_buckets=num_buckets,
        bucket_by=["conv_id"],
        merge_mode=merge_mode,
    )
    lineage = LineageLog(table_path)
    dead = quarantine_writer(table_path)

    from credix_data_pipeline_spark.streaming.listener import (
        LineageProgressListener,
    )

    attached = getattr(spark, "_graft_listeners", {})
    if table_path not in attached:
        listener = LineageProgressListener(table_path)
        spark.streams.addListener(listener)
        attached[table_path] = listener
        spark._graft_listeners = attached

    total_batches = 0
    ddl_applied = 0
    for start, end, ddl in pending:
        if ddl:
            # idempotent: a crash between apply and drain re-applies as no-op
            ddl_applied += apply_ddl(table, ddl)
        rels = [chunks[i] for i in range(start, end)]
        reader_schema = _merged_reader_schema(manifest, rels)
        glob = os.path.join(
            feed_path,
            rels[0] if len(rels) == 1 else "{" + ",".join(rels) + "}",
        )
        reader = (
            spark.readStream.schema(reader_schema)
            .option("recursiveFileLookup", "true")
        )
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        if feed_format == "parquet":
            src = reader.parquet(glob)
        else:
            src = reader.format(feed_format).load(glob)

        offset = start << 32  # SS ids restart per checkpoint; keep the fence monotone
        seg_batches = [0]

        def _sink(batch_df: DataFrame, batch_id: int, _off=offset) -> None:
            apply_batch(
                table,
                batch_df,
                _off + batch_id,
                transform=transform,
                lineage=lineage,
                dead_letter=dead,
                write_salt=write_salt,
                collect_stats=collect_stats,
                wap=wap,
                occ_retries=occ_retries,
                source=source,
            )
            seg_batches[0] += 1
            if publish_to:
                from credix_data_pipeline_spark.operators.relay import (
                    publish_changes,
                )

                publish_changes(table, publish_to)

        ckpt = (
            os.path.join(table_path, f"_ss_checkpoint{suffix}")
            if start == 0
            else os.path.join(table_path, f"_ss_checkpoint{suffix}_seg{start}")
        )
        q = (
            src.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        total_batches += seg_batches[0]
        # an availableNow query provably consumed every chunk its brace
        # glob covered, so the FINAL segment advances the marker too —
        # a later vacuum can then never wedge a fully-caught-up replica
        # whose progress would otherwise live only inside the SS
        # checkpoint.  END ordinals are stable under vacuum (dropped
        # entries stay as None placeholders).
        tmp = marker_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"drained_through": end}, f)
        os.replace(tmp, marker_path)

    return {
        "segments_run": len(pending),
        "ddl_applied": ddl_applied,
        "batches": total_batches,
    }
