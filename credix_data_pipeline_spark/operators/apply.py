"""Batch apply core: LWW dedup → fenced idempotent CoW MERGE → lineage.

Capability map (SURVEY §2):
* W2  last-writer-wins per key      — ONE ``max_by(payload, (lsn, _src,
      commit_ts))`` hash aggregation: within-batch duplicates, the stored
      row, and tombstones all compete in the same comparator (map-side
      partial aggregation, no sort/window in the hot path); the windowed
      ``row_number`` form survives in :func:`dedup_events` for standalone use
* J3  MERGE upsert on composite key — copy-on-write bucket rewrite (the
      Iceberg ``MERGE INTO … WHEN MATCHED [AND op='D'] DELETE/UPDATE …``
      equivalent; reference: dbt ``incremental_strategy='merge'``,
      dbt/business_case/models/silver/installments_clean.sql:1-8)
* ST3 exactly-once fencing          — batch_id recorded inside the atomic
      snapshot commit; re-delivered batches are skipped (the reference
      advances its watermark only after downstream success, README.md:65-72)
* ST6 dead-letter                   — malformed events quarantined, never
      poison the commit (reference: failed loads → `failed/` prefix,
      credix_pipeline/resources/gcp_resource.py:110-118)
* ST7 run metrics                   — lineage sidecar row per batch
      (reference: Dagster metadata, credix_pipeline/utils/cdc_helpers.py:29-38)
* P8  no-change short-circuit       — empty batch commits nothing
      (reference: `no_changes` marker, gcs_operations.py:14-17)

Pure function of ``(table, batch_df, batch_id)`` so it is unit-testable
without streaming (SURVEY §7.2 step 3) and drop-in usable as a
``foreachBatch`` body.

Scale design: a micro-batch touches only the hash-buckets its keys map to —
the read, the merge shuffle, and the rewrite are all O(dirty buckets), not
O(table).  The merge union shuffles by the *composite* key (conv_id,
turn_idx), so a hot conversation spreads across partitions; the final write
is REBALANCEd on (bucket, salted key) — AQE sizes write tasks by bytes and
splits skewed ones, with the salt spreading a hot bucket over ``write_salt``
hash groups as the AQE-independent floor (north-rule skew defense).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, Window, functions as F, types as T

from credix_data_pipeline_spark.lakehouse.table import (
    BUCKET_COL,
    LakeTable,
    default_expr,
)
from credix_data_pipeline_spark.schema import ENGINE_COLS, ENVELOPE_COLS
from credix_data_pipeline_spark.streaming.lineage import LineageLog

_SRC_EXISTING = 0
_SRC_EVENT = 1

# I/U/D plus "P" — a PARTIAL update carrying only its patch_cols subset
VALID_OPS = ("I", "U", "D", "P")


@dataclass
class ApplyResult:
    batch_id: int
    source: str | None = None  # fan-in shard name (None for single-feed)
    skipped: bool = False
    snapshot_id: int | None = None
    lsn_min: int | None = None
    lsn_max: int | None = None
    rows_in: int = 0
    rows_deduped: int = 0
    rows_applied: int = 0
    rows_quarantined: int = 0
    dirty_buckets: list[int] = field(default_factory=list)
    partition_stats: dict[str, int] = field(default_factory=dict)
    wall_ms: int = 0
    # phase telemetry (ST7): profile job / merge+write+commit job / the
    # serial driver remainder (fence read, planning, evolution check)
    profile_ms: int = 0
    merge_ms: int = 0
    # write-audit-publish: the contract report run against the staged
    # snapshot before publish (None when wap was off)
    audit: dict | None = None
    # number of interloping commits this merge's commit was metadata-
    # rebased over (occ.additive-rebase) — 0 when no conflict or when
    # recovery went through the full re-merge retry instead
    occ_rebased: int = 0
    # True when this merge ran the column-level fold (patches in the
    # batch, or stored per-column version maps in a dirty bucket); False
    # = the classic row-struct plan, incl. map-free patch-history tables
    fold_path: bool = False
    # fold pruning telemetry: how many payload columns took their own
    # per-column max_by (the rest shared one non-patch row winner); None
    # when the classic plan ran
    fold_cols_active: int | None = None


class ContractViolation(RuntimeError):
    """A WAP audit failed: the staged snapshot was discarded and the
    published table is unchanged."""

    def __init__(self, batch_id: int, report: dict):
        self.batch_id = batch_id
        self.report = report
        bad = {k: v for k, v in report["violations"].items() if v}
        super().__init__(f"batch {batch_id} failed contract audit: {bad}")


def _fence_state(table: LakeTable) -> tuple[int | None, dict | None]:
    """(scalar batch_id, per-source fences map) from the newest commit that
    declares a fence.  The scan stops at the first commit carrying either
    key, even with a null value: a rollback commit writes explicit ``None``
    markers so pre-rollback fences can never shine through (see
    ``LakeTable.rollback_to``).  Fan-in merge commits write BOTH keys in
    one summary, so whichever mode the table is in, one commit answers."""
    for snap in reversed(table.history()):
        s = snap.summary
        if "batch_id" in s or "fences" in s:
            b = s.get("batch_id")
            return (None if b is None else int(b), s.get("fences"))
    return (None, None)


def last_applied_batch_id(
    table: LakeTable, source: str | None = None
) -> int | None:
    """Newest merge-commit's batch_id (the fence).  Authoritative because it
    was written in the same atomic commit as the data.

    With ``source`` set (fan-in ingest: N sharded upstream feeds into one
    table), the fence is per-source: each merge commit carries the full
    ``fences`` map ``{source: batch_id}``, merged from the previous map, so
    the newest fence-declaring commit answers for every source and the map
    rolls back / is retained exactly like the scalar fence."""
    scalar, fences = _fence_state(table)
    if source is None:
        return scalar
    if not fences:
        return None
    v = fences.get(source)
    return None if v is None else int(v)


def dedup_events(events: DataFrame, key: list[str]) -> DataFrame:
    """W2: one winner per key per batch — highest lsn (ties: identical
    payloads from at-least-once redelivery; commit_ts desc is a stable
    formality)."""
    w = Window.partitionBy(*key).orderBy(
        F.col("lsn").desc(), F.col("commit_ts").desc()
    )
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def malformed_condition(key: list[str]):
    """ST6 predicate: events that cannot be applied (null key / null lsn /
    unknown op)."""
    bad_cond = F.col("lsn").isNull() | ~F.col("op").isin(*VALID_OPS)
    for k in key:
        bad_cond = bad_cond | F.col(k).isNull()
    return bad_cond


def table_checks(snap) -> list[tuple[str, str]]:
    """CHECK constraints carried by the table itself: every
    ``contracts.check.<name> = <SQL boolean expr>`` table property
    (Delta ``ALTER TABLE ADD CONSTRAINT CHECK`` analogue).  Declared once
    with ``alter_properties``/``maintain --set-property``, they then bind
    EVERY writer — replay, stream, fan-in, requeue — instead of relying on
    each job wiring the same validation flag."""
    pfx = "contracts.check."
    return sorted(
        (k[len(pfx):], v)
        for k, v in snap.properties.items()
        if k.startswith(pfx) and v
    )


_CHECK_REFS_CACHE: dict[tuple, frozenset] = {}


def _check_refs(snap, expr_s: str) -> set[str]:
    """Payload columns a CHECK expression references, by the analyzer:
    remove one column at a time from an empty relation and see whether the
    expression still resolves (robust against quoting/comments, the
    ``_expr_references`` rule).  Cached per (expression, schema shape) —
    the probes run driver-side per batch otherwise."""
    key = (expr_s, tuple(sorted(f.name for f in snap.schema.fields)))
    hit = _CHECK_REFS_CACHE.get(key)
    if hit is not None:
        return set(hit)
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    fields = [f for f in snap.schema.fields if not f.name.startswith("_")]
    refs = set()
    for f in fields:
        probe = sess.createDataFrame(
            [], T.StructType([x for x in fields if x.name != f.name])
        )
        try:
            probe.select(F.expr(expr_s)).schema
        except Exception:
            refs.add(f.name)
    _CHECK_REFS_CACHE[key] = frozenset(refs)
    return refs


def rejection_condition(
    snap,
    key: list[str],
    has_patch_cols: bool = False,
    batch_cols: set[str] | None = None,
):
    """The full dead-letter predicate: structurally malformed events
    (``malformed_condition``) OR any table CHECK constraint failing.

    Check semantics: evaluated on the incoming EVENT payload; a NULL
    result counts as a violation (wrap with ``coalesce`` in the expression
    to accept nulls).  Delete events are exempt (no payload to validate,
    only a key to remove).  Partial-update events are validated by the
    checks whose referenced columns they CARRY (a patch setting value=-5
    is quarantined by a check on value exactly like a full update) and
    exempt from checks referencing columns they leave unchanged — those
    read NULL on the event row but mean "unchanged"; the WAP audit is the
    surface that validates the folded post-image.  A structurally valid
    op="P" with a NULL/empty patch_cols sets nothing yet would still win
    row-level arbitration — it dead-letters as malformed.  So do op="P"
    rows in a batch that carries NO ``patch_cols`` column at all (the
    set-vs-unchanged distinction is unrecoverable — one stray row from a
    misconfigured feed quarantines instead of poisoning the whole batch)
    and, when ``batch_cols`` (the batch's PRE-alignment physical columns)
    is given, patches whose ``patch_cols`` name a column the batch does
    not physically carry — folding the aligned NULL would silently turn
    "unchanged" into a deliberate set at the patch's LSN."""
    bad = malformed_condition(key)
    if not has_patch_cols:
        # no envelope column anywhere in the batch: every op="P" row is
        # structurally malformed (mirrors the NULL/empty-array rule below)
        bad = bad | (F.col("op") == "P")
    if has_patch_cols:
        pc = F.coalesce(F.col("patch_cols").cast("array<string>"),
                        F.array().cast("array<string>"))
        bad = bad | ((F.col("op") == "P") & (F.size(pc) == 0))
        if batch_cols is not None:
            present = F.array(*[F.lit(c) for c in sorted(batch_cols)])
            bad = bad | (
                (F.col("op") == "P")
                & F.exists(
                    pc,
                    # a NULL entry names no column — malformed too
                    lambda x: F.coalesce(
                        ~F.array_contains(present, x), F.lit(True)
                    ),
                )
            )
    checks = table_checks(snap)
    if checks:
        # F.expr defers parsing to analysis; validate each expression NOW
        # so a broken constraint names itself instead of surfacing as a
        # bare ParseException deep inside the profile job
        from pyspark.sql import SparkSession

        sess = SparkSession.getActiveSession()
        parser = (
            sess._jsparkSession.sessionState().sqlParser()
            if sess is not None
            else None
        )
    for name, expr_s in checks:
        try:
            if parser is not None:
                parser.parseExpression(expr_s)
            c = F.expr(expr_s)
        except Exception as e:  # parse errors fail loud, at the writer
            raise ValueError(
                f"contracts.check.{name} is not a valid SQL expression: "
                f"{expr_s!r}: {e}"
            ) from e
        passes = F.coalesce(c, F.lit(False))
        if has_patch_cols:
            # a patch is bound by this check iff it CARRIES every column
            # the check references (it then evaluates over real values);
            # checks over unchanged columns read NULL here and would
            # mis-quarantine — the WAP audit owns the folded post-image
            carried = F.lit(True)
            for r in sorted(_check_refs(snap, expr_s)):
                carried = carried & F.coalesce(
                    F.array_contains(F.col("patch_cols"), r), F.lit(False)
                )
            p_ok = ~carried | passes
        else:
            p_ok = F.lit(True)
        ok = (
            F.when(F.col("op") == "D", F.lit(True))
            .when(F.col("op") == "P", p_ok)
            .otherwise(passes)
        )
        bad = bad | ~ok
    return bad


def align_for_checks(df: DataFrame, snap) -> DataFrame:
    """A batch sourced from pre-evolution chunks may lack a recently-added
    table column a CHECK constraint references; Delta evaluates CHECKs on
    the written post-image where such a column exists as NULL — mirror
    that by adding missing table payload columns as typed NULLs, so the
    constraint filters rows instead of halting the replay with an
    unresolved-column error.  No-op without declared checks."""
    if not table_checks(snap):
        return df
    have = set(df.columns)
    for f in snap.schema.fields:
        if f.name in have or f.name.startswith("_"):
            continue
        # a CHECK sees what the merge would write: the declared DEFAULT
        # for a column this batch's chunks predate, else NULL.  Deletes and
        # patches stay NULL — a tombstone has no payload and a patch leaves
        # the column unchanged; filling them here would also leak into the
        # merge (this aligned frame IS the merge input), silently breaking
        # the D/P guard ev_side applies when the column is absent.
        df = df.withColumn(
            f.name,
            F.when(
                F.col("op").isin("D", "P"),
                F.lit(None).cast(f.dataType),
            ).otherwise(default_expr(snap, f.name)),
        )
    return df


def split_malformed(events: DataFrame, key: list[str]):
    """ST6: dead-letter side vs applicable side."""
    bad = malformed_condition(key)
    return events.filter(~bad), events.filter(bad)


def _evolve_if_needed(table: LakeTable, events: DataFrame) -> None:
    """In-flight schema evolution: payload columns present in the batch but
    absent from the target become nullable target columns (metadata-only
    commit; old files read as NULL).  A struct column whose batch shape
    carries NEW nested fields evolves the same way — the fields append to
    the target struct with fresh dotted ids (``add_struct_fields``), and
    old files keep the by-name fast path.  SURVEY §4 'Schema evolution'
    row; nested adds are engine-forward (the reference only tolerates
    missing columns, installments_assets.py:151-156)."""
    snap = table.current()
    existing = {f.name: f.dataType for f in snap.schema.fields}
    new = [
        f
        for f in events.schema.fields
        if f.name not in ENVELOPE_COLS and f.name not in existing
    ]
    if new:
        table.add_columns([T.StructField(f.name, f.dataType, True) for f in new])
    for f in events.schema.fields:
        cur = existing.get(f.name)
        if (
            isinstance(f.dataType, T.StructType)
            and isinstance(cur, T.StructType)
            and f.dataType != cur
        ):
            have = {sf.name for sf in cur.fields}
            extra = [sf for sf in f.dataType.fields if sf.name not in have]
            if extra:
                table.add_struct_fields(f.name, extra)


def _align_payload_expr(c: str, batch_type, target: T.StructField):
    """The batch column ``c`` aligned to the target field's type.  Struct
    columns rebuild FIELD-BY-NAME (a producer still on an older struct
    shape sends fewer fields → typed NULL; field order never matters),
    with a NULL guard so NULL structs stay NULL.  Non-struct columns pass
    through untouched (top-level int/long etc. coerce in the union, the
    long-standing flat behavior)."""
    if (
        isinstance(target.dataType, T.StructType)
        and isinstance(batch_type, T.StructType)
        and batch_type != target.dataType
    ):
        have = {sf.name for sf in batch_type.fields}
        sub = [
            (
                F.col(c).getField(sf.name).cast(sf.dataType)
                if sf.name in have
                else F.lit(None).cast(sf.dataType)
            ).alias(sf.name)
            for sf in target.dataType.fields
        ]
        return (
            F.when(F.col(c).isNotNull(), F.struct(*sub))
            .otherwise(F.lit(None).cast(target.dataType))
            .alias(c)
        )
    return F.col(c)


def _audit_and_publish(table, staged, dirty: list[int], res: ApplyResult):
    """WAP audit: run the data contracts on the staged snapshot's dirty-
    bucket post-image; publish on pass, discard + raise on violation."""
    from credix_data_pipeline_spark.operators.contracts import validate_df

    df = table.current_versions(snap=staged, buckets=dirty)
    if "_seq" in df.columns:
        df = df.drop("_seq")
    if "_deleted" in df.columns:
        df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    report = validate_df(df, staged.key)
    res.audit = report
    if not report["passed"]:
        table.discard_staged(staged.version)
        raise ContractViolation(res.batch_id, report)
    return table.publish_staged(staged.version)


def apply_batch(
    table: LakeTable,
    batch_df: DataFrame,
    batch_id: int,
    *,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    lineage: LineageLog | None = None,
    dead_letter: Callable[[DataFrame], None] | None = None,
    write_salt: int = 4,
    collect_stats: bool = True,
    wap: bool = False,
    source: str | None = None,
    occ_retries: int = 0,
) -> ApplyResult:
    """Apply one micro-batch of change events to the target table.

    ``occ_retries=N`` makes the merge self-healing under concurrent
    writers: a ``CommitConflict`` (another commit landed between this
    merge's snapshot read and its publish — the base-snapshot OCC rule)
    re-runs the WHOLE apply, which re-reads the fence and the new current
    snapshot and re-merges against it — the Iceberg commit-retry loop.
    The fence re-check makes retries safe even when the interloper was a
    redelivery of this very batch.  Default 0: single-writer replays fail
    fast, because an unexpected conflict there means a misconfigured
    second writer, not a race to paper over.

    ``source=<name>`` enables fan-in ingest: N sharded upstream feeds (each
    with its own monotone batch-id sequence) merging into ONE table.  The
    exactly-once fence becomes per-source — the commit summary carries the
    full merged ``fences`` map — so a crash-redelivered batch from one
    source is skipped without blocking the others' progress.  Sources are
    expected to own disjoint key ranges (the sharded-OLTP layout); for
    overlapping keys the cross-source winner is still deterministic (max
    raw LSN) but LSN spaces from different databases are not semantically
    comparable — that is the operator's contract to uphold.  Mixing
    sourceless and fan-in merges on one table is refused: the two fence
    disciplines cannot see each other's progress.

    ``wap=True`` turns the merge commit into a write-audit-publish gate
    (the Iceberg WAP pattern, dbt-build's test-before-promote): the batch
    commits as a STAGED snapshot invisible to readers, the data contracts
    run against the staged dirty-bucket post-image (O(changed data) — per-
    key rules are bucket-local because the table is hash-bucketed by key),
    and only a clean audit publishes.  A violation discards the staged
    snapshot — the published table never saw the batch — and raises
    ``ContractViolation`` so the runner halts with the feed position still
    pointing at the bad chunk.
    """
    if occ_retries:
        from credix_data_pipeline_spark.lakehouse.table import CommitConflict

        last_err: Exception | None = None
        for _attempt in range(occ_retries + 1):
            try:
                return apply_batch(
                    table, batch_df, batch_id,
                    transform=transform, lineage=lineage,
                    # quarantine writes happen BEFORE the commit, so a
                    # conflicted attempt already parked the bad rows —
                    # retries must not append duplicate copies
                    dead_letter=dead_letter if _attempt == 0 else None,
                    write_salt=write_salt,
                    collect_stats=collect_stats, wap=wap, source=source,
                )
            except CommitConflict as e:
                last_err = e  # re-read state + fence and re-merge
        raise last_err

    t0 = time.monotonic()
    spark = batch_df.sparkSession
    res = ApplyResult(batch_id=batch_id, source=source)

    # --- ST3 fence: streaming batch ids are monotone; a re-delivered batch
    # after crash-before-checkpoint is already in the table -> skip.
    scalar_fence, fences_map = _fence_state(table)
    if source is None:
        if fences_map:
            raise RuntimeError(
                "table carries per-source fan-in fences; pass source=<name> "
                "(a sourceless merge cannot see fan-in progress)"
            )
        last = scalar_fence
    else:
        if fences_map is None and scalar_fence is not None:
            raise RuntimeError(
                "table carries a single-feed fence; fan-in ingest "
                "(source=) requires a table whose merges all declare a "
                "source"
            )
        v = (fences_map or {}).get(source)
        last = None if v is None else int(v)
    if last is not None and batch_id <= last:
        res.skipped = True
        res.wall_ms = int((time.monotonic() - t0) * 1000)
        if lineage:
            lineage.record(res, note="fenced-duplicate")
        return res

    # --- in-flight evolution BEFORE the profile pass and its empty-batch
    # short-circuit: a batch whose SCHEMA carries new columns must evolve
    # the target even when it holds zero applicable rows — a relayed
    # upstream column add can arrive as a schema-only (empty or no-op)
    # chunk, and the replica must still converge to the upstream layout
    # (test_property_relay DDL-mix counterexample).  Idempotent: a
    # redelivered batch's columns already exist and commit nothing.
    _evolve_if_needed(table, batch_df)
    snap0 = table.current()
    key = snap0.key
    merge_mode = snap0.merge_mode
    bexpr = table.bucket_expr()
    # structural malformedness + the table's own CHECK constraints
    # (contracts.check.* properties) — violations dead-letter exactly like
    # null-key events, whichever writer carried the batch; the batch first
    # aligns to the table schema so a check referencing a column this
    # batch's chunks predate sees NULL, not an unresolved column
    orig_cols = set(batch_df.columns)  # PRE-alignment physical schema
    batch_df = align_for_checks(batch_df, snap0)
    bad = rejection_condition(
        snap0, key,
        has_patch_cols="patch_cols" in orig_cols,
        batch_cols=orig_cols,
    )

    # --- single profiling pass over the raw batch: dirty buckets (the
    # copy-on-write pruning set), malformed count, batch size, and the raw
    # event-LSN range for lineage.  Malformed rows profile under bucket -1 so
    # a null key can never poison the bucket hash.  This replaces what used
    # to be three separate jobs (isEmpty / malformed.count / dirty-distinct).
    t_prof = time.monotonic()
    prof_aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min("lsn").alias("lo"),
        F.max("lsn").alias("hi"),
        # partial-update detection rides the same single pass
        F.sum(
            F.when(F.col("op") == "P", F.lit(1)).otherwise(F.lit(0))
        ).alias("np"),
    ]
    if "patch_cols" in orig_cols:
        # the distinct patched-column set rides the same pass too: the
        # fold prunes its per-column max_by list to these plus whatever
        # the dirty files' map-key bounds admit (bounded by the schema's
        # column count, so the agg state stays tiny)
        prof_aggs.append(
            F.array_distinct(F.flatten(F.collect_set(
                F.when(
                    F.col("op") == "P",
                    F.coalesce(
                        F.col("patch_cols").cast("array<string>"),
                        F.array().cast("array<string>"),
                    ),
                )
            ))).alias("pc")
        )
    prof = (
        batch_df.groupBy(
            F.when(bad, F.lit(-1)).otherwise(bexpr).alias("_b")
        )
        .agg(*prof_aggs)
        .collect()
    )
    res.profile_ms = int((time.monotonic() - t_prof) * 1000)

    # --- P8 empty-batch short-circuit.
    if not prof:
        res.wall_ms = int((time.monotonic() - t0) * 1000)
        if lineage:
            lineage.record(res, note="no_changes")
        return res

    good = [r for r in prof if r["_b"] >= 0]
    res.rows_quarantined = sum(r["n"] for r in prof if r["_b"] < 0)
    res.rows_in = sum(r["n"] for r in good)
    res.lsn_min = min((r["lo"] for r in good), default=None)
    res.lsn_max = max((r["hi"] for r in good), default=None)
    dirty = [r["_b"] for r in good]
    res.dirty_buckets = sorted(dirty)

    events = batch_df.filter(~bad)
    if res.rows_quarantined and dead_letter is not None:
        q = batch_df.filter(bad)
        if source is not None:
            # fan-in: tag quarantined rows with their shard so a requeue
            # can redrive each shard's rows into ITS OWN feed (key
            # ownership stays with the shard that produced the row)
            q = q.withColumn("_source", F.lit(source))
        dead_letter(q)
    if not dirty:
        res.wall_ms = int((time.monotonic() - t0) * 1000)
        if lineage:
            lineage.record(res, note="all_quarantined")
        return res

    # (in-flight evolution already ran, before the empty short-circuit)
    # Position-delete MoR (Iceberg v2, merge_mode="mor"): arbitration
    # happens at WRITE time against the live prior versions, so no `_seq`
    # tie-break column is needed.  Requires BOTH the table preference AND
    # the invariant to hold — a blind append (warehouse load) clears the
    # invariant and merges fall back to append+`_seq` until compact()
    # restores it.  mor-append tables always take the blind path.
    pos_del = (
        merge_mode == "mor"
        and snap0.mor_deletes
        and snap0.mor_prefer == "posdel"
    )
    if merge_mode == "mor" and not pos_del and "_seq" not in {
        f.name for f in table.current().schema.fields
    }:
        # MoR delta rows persist the batch ordinal: the `_lsn`-tie LWW
        # comparator at read/compaction (mirrors the CoW `_src` tie-break —
        # a later batch's row beats an earlier one on equal LSN).
        table.add_columns([T.StructField("_seq", T.LongType(), True)])

    # --- partial-update (patch) events: op="P" rows set ONLY the columns
    # listed in the envelope's `patch_cols` array (the rest mean
    # "unchanged").  Column-level LWW needs the stored pre-image at merge
    # time, so patches require a write-time-arbitrating mode: CoW, or
    # position-delete MoR with the invariant intact — a blind-append MoR
    # phase has nothing to fold against and defers LWW to read, where a
    # partial row cannot be completed.
    has_patches = any(r["np"] for r in good)
    snap_pre = table.current()
    has_patch_history = "_col_lsn" in {
        f.name for f in snap_pre.schema.fields
    }
    # Same map_stats admission as patch_mode below: a patch-HISTORY table
    # whose dirty buckets are all footer-proven map-free and whose batch
    # carries no patches has nothing the blind path could mis-arbitrate —
    # the classic row-level plan is provably identical there, so a single
    # warehouse blind append must not brick every later merge until
    # compact().  (Non-dirty buckets get no new competitors from this
    # batch, so their stored maps are unaffected.)
    stored_maps_live = has_patch_history and any(
        not snap_pre.map_stats.get(f, False)
        for b in dirty
        for f in snap_pre.files.get(str(b), [])
    )
    if (has_patches or stored_maps_live) and merge_mode == "mor" \
            and not pos_del:
        # The blind-append path defers LWW to read/compaction, which
        # arbitrates ROW-level — it can neither fold an incoming partial
        # row nor honor the per-column versions already stored, so a late
        # full event would lose whole columns the sequential fold says it
        # wins.  Loud refusal beats silent divergence (VERDICT-style:
        # compact() restores the invariant and the fold path).
        raise RuntimeError(
            "partial-update (patch) semantics need write-time arbitration "
            "against the stored row: merge_mode='mor-append' (or a posdel "
            "table whose invariant a blind append cleared) cannot fold "
            "them — use cow or mor, or compact() first"
        )
    if has_patches:
        if "patch_cols" not in batch_df.columns:
            # unreachable: rejection_condition quarantines every op='P'
            # row of a patch_cols-less batch, so `good` cannot carry
            # patches here — kept as an invariant guard
            raise RuntimeError(
                "batch carries op='P' partial-update events but no "
                "patch_cols envelope column — the set-vs-unchanged "
                "distinction is unrecoverable; fix the feed"
            )
        if not has_patch_history:
            # sparse per-column version map: what keeps column-level LWW
            # exact across batch boundaries (see schema.ENGINE_COLS)
            table.add_columns([T.StructField(
                "_col_lsn", T.MapType(T.StringType(), T.LongType()), True
            )])
    snap = table.current()
    # Fold admission: the column-level plan is only NEEDED when this batch
    # carries patches, or a stored row this merge could fold against holds
    # a per-column version map.  Manifest map_stats prove map-freeness per
    # FILE from parquet footers (column absent / all-NULL), so a
    # patch-history table whose patched rows have since been overwritten
    # and rewritten drops back to the classic row-struct plan — measured
    # at ~32% merge throughput (BENCH/patch.json) — with zero runtime
    # probes.  Unknown files (pre-feature manifests) fold conservatively.
    patch_mode = (
        "_col_lsn" in {f.name for f in snap.schema.fields}
    ) and (
        has_patches
        or any(
            not snap.map_stats.get(f, False)
            for b in dirty
            for f in snap.files.get(str(b), [])
        )
    )
    res.fold_path = patch_mode
    out_cols = [f.name for f in snap.schema.fields]
    payload_cols = [c for c in out_cols if c not in ENGINE_COLS]

    if transform is not None:
        events = transform(events)

    # Merge-on-read:
    # * position-delete mode (`pos_del`): read the LIVE prior versions of
    #   the dirty buckets WITH row positions, arbitrate at write like CoW,
    #   then append only the event-won rows plus position-delete files for
    #   the ordinals they supersede — no bucket rewrite (low write
    #   amplification) AND no read-time key shuffle (the Iceberg v2 MERGE).
    # * legacy mode: blind O(batch) append of the batch winners; LWW
    #   against stored rows deferred to read/compaction.
    if merge_mode == "mor" and not pos_del:
        ex_side = None
    else:
        if pos_del:
            existing = table.current_versions(buckets=dirty, with_pos=True)
        else:
            existing = table.read(buckets=dirty)

        # Align both sides to (payload..., lsn, op, _src) and take the
        # max-lsn winner per key: cross-batch LWW against the stored
        # `_lsn`, tombstones included so late lower-LSN updates cannot
        # resurrect deleted turns.
        pos_extra = (
            [F.col("_file"), F.col("_pos")] if pos_del else []
        )
        ex_side = existing.select(
            *[F.col(c) for c in payload_cols],
            F.col("_lsn").alias("lsn"),
            F.when(F.coalesce(F.col("_deleted"), F.lit(False)), F.lit("D"))
            .otherwise(F.lit("E"))
            .alias("op"),
            F.lit(_SRC_EXISTING).alias("_src"),
            # stored rows carry no commit_ts; 0 is fine — the third
            # comparator field is only reached on (lsn, _src) ties, i.e.
            # event-vs-event
            F.lit(0).alias("_cts"),
            *(
                [
                    F.col("_col_lsn").alias("_clsn"),
                    F.lit(None).cast("array<string>").alias("_pcols"),
                ]
                if patch_mode
                else []
            ),
            *pos_extra,
        )
    ev_cols = set(events.columns)
    # commit_ts tie-break (event-vs-event only): a real WAL/binlog LSN is
    # unique, but an at-least-once feed that reuses LSNs must still pick a
    # deterministic winner — later commit_ts wins.
    # cast: feeds may carry TIMESTAMP or TIMESTAMP_NTZ; the session is
    # pinned to UTC so the NTZ->TZ reinterpretation is deterministic
    ev_cts = (
        F.coalesce(
            F.unix_micros(F.col("commit_ts").cast("timestamp")), F.lit(0)
        )
        if "commit_ts" in ev_cols
        else F.lit(0)
    )
    ev_types = {f.name: f.dataType for f in events.schema.fields}
    ev_side = events.select(
        *[
            (
                _align_payload_expr(c, ev_types[c], d)
                if c in ev_cols
                # batch schema predates the column: the declared DEFAULT
                # (write-default), else typed NULL — so the merge result
                # does not depend on whether the DDL landed before or
                # after this batch.  Deletes stay NULL (tombstones carry
                # no payload); patches too (the column is "unchanged",
                # and their fold ignores unset columns regardless).
                else F.when(
                    F.col("op").isin("D", "P"),
                    F.lit(None).cast(d.dataType),
                ).otherwise(default_expr(snap, c)).alias(c)
            )
            for c, d in zip(payload_cols, [snap.schema[c] for c in payload_cols])
        ],
        F.col("lsn"),
        F.col("op"),
        F.lit(_SRC_EVENT).alias("_src"),
        ev_cts.alias("_cts"),
        *(
            [
                F.lit(None).cast("map<string,bigint>").alias("_clsn"),
                (
                    F.col("patch_cols").cast("array<string>")
                    if "patch_cols" in ev_cols
                    else F.lit(None).cast("array<string>")
                ).alias("_pcols"),
            ]
            if patch_mode
            else []
        ),
        *(
            [
                F.lit(None).cast("string").alias("_file"),
                F.lit(None).cast("long").alias("_pos"),
            ]
            if pos_del
            else []
        ),
    )
    combined = ev_side if ex_side is None else ex_side.unionByName(ev_side)
    # W2 + cross-batch LWW in ONE hash aggregation: max_by over (lsn, _src,
    # _cts) picks the newest version per key — within-batch duplicates, the
    # stored row, and tombstones all compete in the same comparator.  A hash
    # agg partial-aggregates map-side (duplicates collapse before the
    # shuffle) and needs no sort — strictly cheaper than the equivalent
    # row_number window at any scale.
    order_key = F.struct(F.col("lsn"), F.col("_src"), F.col("_cts"))
    sp_agg = (
        [
            # the STORED row's file position rides the same aggregation (at
            # most one stored version per key — the position-delete
            # invariant), so superseded ordinals are known without a second
            # pass over `prior`
            F.max(
                F.when(
                    F.col("_src") == _SRC_EXISTING,
                    F.struct(F.col("_file").alias("f"), F.col("_pos").alias("p")),
                )
            ).alias("_sp")
        ]
        if pos_del
        else []
    )
    if not patch_mode:
        row_struct = F.struct(
            *[F.col(c) for c in payload_cols],
            F.col("lsn"), F.col("op"), F.col("_src"),
        )
        winners = (
            combined.groupBy(*[F.col(k) for k in key])
            .agg(F.max_by(row_struct, order_key).alias("_w"), *sp_agg)
            .select("_w.*", *(["_sp"] if pos_del else []))
        )

        is_del = F.col("op") == "D"
        result = winners.select(
            *[
                F.when(is_del, F.lit(None).cast(snap.schema[c].dataType))
                .otherwise(F.col(c))
                .alias(c)
                if c not in key
                else F.col(c)
                for c in payload_cols
            ],
            F.col("lsn").alias("_lsn"),
            is_del.alias("_deleted"),
            F.col("_src"),
            *(["_sp"] if pos_del else []),
        )
    else:
        # --- column-level LWW fold (partial-update tables), candidate-
        # decomposed (r4 verdict ask #3).  Per key, only THREE kinds of
        # row can supply a column's winning value:
        #   * the (at most one — posdel/CoW invariant) STORED row, whose
        #     per-column LSNs are its sparse `_col_lsn` entries defaulting
        #     to the row `_lsn`;
        #   * the best NON-PATCH event (full events and deletes set every
        #     column at their own LSN — one shared winner for ALL columns);
        #   * per column, the best PATCH that names it — needed only for
        #     columns the batch actually patches (the profile pass's "pc"
        #     set).
        # So the hash aggregation carries 3 + |batch-patched| states
        # instead of K per-column max_bys, and each column's winner is a
        # POST-aggregation `greatest()` over (at most 3) candidate structs
        # ordered by (col_lsn, _src, _cts) — pure projection, no extra
        # shuffle state.  Equals the sequential global-LSN fold under ANY
        # batching or reordering; the classic path above is byte-identical
        # for patch-free tables and skips all of this.
        fold_cols = [c for c in payload_cols if c not in key]
        batch_patched: set[str] = set()
        if "patch_cols" in orig_cols:
            for r in good:
                batch_patched.update(r["pc"] or [])
        patched = [c for c in fold_cols if c in batch_patched]
        res.fold_cols_active = len(patched)

        aggs = [
            F.max_by(
                F.struct(F.col("lsn"), F.col("op"), F.col("_src")), order_key
            ).alias("_w"),
            *sp_agg,
            # the stored row, whole: values + row lsn + its sparse map (at
            # most one per key, so a conditional max_by is exact; max_by
            # because the VALUE struct carries a map, which max() cannot
            # order — the ordering here is just the scalar lsn)
            F.max_by(
                F.when(
                    F.col("_src") == _SRC_EXISTING,
                    F.struct(
                        *[F.col(c) for c in fold_cols],
                        F.col("lsn").alias("_l"),
                        F.col("_clsn").alias("_m"),
                    ),
                ),
                F.when(F.col("_src") == _SRC_EXISTING, F.col("lsn")),
            ).alias("_ex"),
            # best non-patch EVENT (sets every column at its row LSN)
            F.max_by(
                F.struct(
                    *[F.col(c) for c in fold_cols],
                    F.col("lsn").alias("_l"),
                    F.col("_cts").cast("long").alias("_t"),
                ),
                F.when(
                    (F.col("op") != "P") & (F.col("_src") == _SRC_EVENT),
                    order_key,
                ),
            ).alias("_nv"),
        ]
        for c in patched:
            aggs.append(
                F.max_by(
                    F.struct(
                        F.col(c).alias("v"),
                        F.col("lsn").alias("_l"),
                        F.col("_cts").cast("long").alias("_t"),
                    ),
                    F.when(
                        (F.col("op") == "P")
                        & F.coalesce(
                            F.array_contains(F.col("_pcols"), c),
                            F.lit(False),
                        ),
                        order_key,
                    ),
                ).alias(f"_p_{c}")
            )
        grouped = combined.groupBy(*[F.col(k) for k in key]).agg(*aggs)

        # each candidate contributes a comparable ORDERING struct
        # (l=col_lsn, s=src, t=commit_ts) — values stay outside the
        # comparison (a map-typed payload column is not orderable), picked
        # by matching the winning ordering back to its candidate
        patched_set = set(patched)
        ev_ord = F.when(
            F.col("_nv").isNotNull(),
            F.struct(
                F.col("_nv._l").alias("l"),
                F.lit(_SRC_EVENT).alias("s"),
                F.col("_nv._t").alias("t"),
            ),
        )

        def _st_ord(c):
            return F.when(
                F.col("_ex").isNotNull(),
                F.struct(
                    F.coalesce(
                        F.element_at(F.col("_ex._m"), F.lit(c)),
                        F.col("_ex._l"),
                    ).alias("l"),
                    F.lit(_SRC_EXISTING).alias("s"),
                    F.lit(0).cast("long").alias("t"),
                ),
            )

        def _p_ord(c):
            return F.when(
                F.col(f"_p_{c}").isNotNull(),
                F.struct(
                    F.col(f"_p_{c}._l").alias("l"),
                    F.lit(_SRC_EVENT).alias("s"),
                    F.col(f"_p_{c}._t").alias("t"),
                ),
            )

        def _resolve(c):
            """(value, last_set_lsn, from_event) for column ``c`` via a
            3-way candidate compare — `greatest` skips NULL candidates."""
            so, eo = _st_ord(c), ev_ord
            po = _p_ord(c) if c in patched_set else None
            ords = ([po] if po is not None else []) + [eo, so]
            m = F.greatest(*ords)
            chain = []
            if po is not None:
                chain.append((po, F.col(f"_p_{c}.v")))
            chain.append((eo, F.col(f"_nv.{c}")))
            chain.append((so, F.col(f"_ex.{c}")))
            val = None
            for o, v in chain:
                cond = o.isNotNull() & (o == m)
                val = F.when(cond, v) if val is None else val.when(cond, v)
            ev_won = eo.isNotNull() & (eo == m)
            if po is not None:
                ev_won = ev_won | (po.isNotNull() & (po == m))
            return val, m["l"], ev_won

        wins = {c: _resolve(c) for c in fold_cols}
        is_del = F.col("_w.op") == "D"
        # a key changed iff any column (or the row-level winner — covers
        # pure deletes) came from an event; unchanged keys stay stored
        changed = F.col("_w._src") == F.lit(_SRC_EVENT)
        for c in fold_cols:
            changed = changed | F.coalesce(wins[c][2], F.lit(False))

        # sparse map out: entries only where a column's last-set LSN lags
        # the row LSN (0 = never set); a delete sets everything at its own
        # LSN so tombstones always store NULL
        entries = F.array(*[
            F.struct(
                F.lit(c).alias("key"),
                F.coalesce(wins[c][1], F.lit(0)).alias("value"),
            )
            for c in fold_cols
        ])
        stale = F.filter(entries, lambda x: x["value"] != F.col("_w.lsn"))
        col_lsn_out = F.when(
            ~is_del & (F.size(stale) > 0), F.map_from_entries(stale)
        )

        def _fold_val(c):
            return wins[c][0]

        result = grouped.select(
            *[
                F.col(c)
                if c in key
                else F.when(
                    is_del, F.lit(None).cast(snap.schema[c].dataType)
                )
                .otherwise(_fold_val(c))
                .alias(c)
                for c in payload_cols
            ],
            F.col("_w.lsn").alias("_lsn"),
            is_del.alias("_deleted"),
            col_lsn_out.alias("_col_lsn"),
            F.when(changed, F.lit(_SRC_EVENT))
            .otherwise(F.lit(_SRC_EXISTING))
            .alias("_src"),
            *(["_sp"] if pos_del else []),
        )
    if pos_del:
        # stored-won keys need no write at all: their stored row stays live.
        # Event-won keys append their new version and position-delete the
        # stored one (if any).  Persist: the delete rows and the data rows
        # are two writes over the same merge result.
        result = result.filter(F.col("_src") == _SRC_EVENT).persist()

    if collect_stats:
        if not pos_del:  # pos_del already persisted above
            result = result.persist()
        stats = result.groupBy("_src").count().collect()
        by_src = {r["_src"]: r["count"] for r in stats}
        res.rows_applied = by_src.get(_SRC_EVENT, 0)
        res.rows_deduped = res.rows_in - res.rows_applied
        pstats = (
            result.groupBy(F.col(BUCKET_COL) if BUCKET_COL in result.columns else bexpr)
            .count()
            .collect()
        )

    # --- skew-defused write: REBALANCE on (bucket, salt) lets AQE size the
    # write tasks by bytes — a tiny batch coalesces to a couple of tasks
    # (fixed cost ∝ data, not ∝ buckets), a hot bucket splits across tasks
    # (optimizeSkewsInRebalancePartitions).  The salt keeps a hot
    # conversation spread over `write_salt` hash groups even where AQE's
    # skew split is unavailable.  Strictly better than a fixed-width
    # repartition at both ends of the scale.
    out = result.drop("_src", *(["_sp"] if pos_del else []))
    if "_col_lsn" in out_cols and not patch_mode:
        # classic plan on a (map-free) patch-history table: the schema
        # still carries the map column — write it as typed NULL, which is
        # also what keeps the file PROVABLY map-free for the next merge's
        # fast-path admission (footer num_values == 0)
        out = out.withColumn(
            "_col_lsn", F.lit(None).cast("map<string,bigint>")
        )
    if merge_mode == "mor" and not pos_del:
        out = out.withColumn("_seq", F.lit(batch_id).cast("long"))
    elif pos_del and "_seq" in out_cols:
        # `_seq` residue of a blind-append phase: position-delete rows
        # don't need a tie-break, but the table schema still carries the
        # column — write typed NULL
        out = out.withColumn("_seq", F.lit(None).cast("long"))
    salt = F.pmod(F.xxhash64(*key), F.lit(max(1, write_salt)))
    out = (
        out.withColumn("_wb", bexpr)
        .withColumn("_ws", salt)
        .hint("rebalance", "_wb", "_ws")
        .drop("_wb", "_ws")
    )

    batch_summary = {
        "batch_id": batch_id,
        "lsn_min": res.lsn_min,
        "lsn_max": res.lsn_max,
        "rows_applied": res.rows_applied,
    }
    if source is not None:
        # Full merged map every commit: the newest fence-declaring commit
        # answers for ALL sources (rollback/retention then work unchanged).
        # RE-READ the map here, AFTER the OCC base snapshot (`snap`) was
        # taken — a concurrent source's fence advance landing between the
        # early fence check and this commit must not be erased.  Ordering
        # argument: any commit that lands after `snap` makes THIS commit
        # lose the version race (base pinning), so a map read after the
        # base read can never be older than what the winning commit chain
        # sees — the early `fences_map` (read before the profile job, a
        # seconds-wide window) could be.
        _, fences_now = _fence_state(table)
        batch_summary["fences"] = {**(fences_now or {}), source: batch_id}

    # --- metadata-level commit rebase (opt-in via the
    # ``occ.additive-rebase`` table property): when a concurrent writer's
    # commit is itself pure-additive, this merge's commit re-links onto the
    # new head at O(manifest) cost instead of re-running the whole merge
    # job — the Iceberg "concurrent appends never conflict" rule, and the
    # difference between N fan-in shards serializing on re-merges vs on a
    # file link.  Sound for blind-append MoR unconditionally (no key
    # reconciliation to invalidate); for position-delete MoR the property
    # additionally ASSERTS the fan-in disjoint-key contract (a rebase never
    # re-arbitrates LWW against interloper rows, so overlapping keys would
    # break the one-live-version invariant).  Never for CoW: a bucket
    # replace is not additive.  WAP audits against a pinned staged
    # snapshot, so staged commits keep the full-retry path.
    rebase_cb = None
    if (
        not wap
        and merge_mode == "mor"
        and snap.properties.get("occ.additive-rebase", "").lower() == "true"
    ):
        def rebase_cb(head, _src=source, _bid=batch_id):
            if _src is None:
                return {}
            from credix_data_pipeline_spark.lakehouse.table import (
                CommitConflict,
            )

            f = table._fence_as_of(head.version).get("fences") or {}
            prev = f.get(_src)
            if prev is not None and _bid <= int(prev):
                # the interloper already fenced THIS source at or past this
                # batch — a concurrent duplicate delivery (zombie runner).
                # A metadata rebase would append the same rows a second
                # time; refuse, so the full-retry path re-reads the fence
                # and skips the batch (exactly-once survives concurrency)
                raise CommitConflict(
                    f"fence for source {_src!r} advanced to {prev} during "
                    f"the merge of batch {_bid} (concurrent duplicate "
                    "delivery) — metadata rebase refused"
                )
            return {"fences": {**f, _src: _bid}}

    t_merge = time.monotonic()
    if pos_del:
        # Iceberg v2 MERGE shape: append the event-won versions + position-
        # delete files for the stored ordinals they supersede — one atomic
        # commit, no bucket rewrite, and reads stay shuffle-free
        delete_df = result.filter(F.col("_sp").isNotNull()).select(
            bexpr.alias(BUCKET_COL),
            F.col("_sp.f").alias("file"),
            F.col("_sp.p").alias("pos"),
        )
        # base=snap pins the snapshot this merge READ: a concurrent commit
        # landing mid-merge loses the version race (CommitConflict) instead
        # of being silently replaced — the retry re-reads and converges
        new_snap = table.append_mor_delta(
            out, delete_df, summary=batch_summary, staged=wap, base=snap,
            rebase=rebase_cb,
        )
    elif merge_mode == "mor":
        # delta append: existing files stay; the fence rides this commit's
        # summary exactly like a CoW merge commit
        new_snap = table.append(
            out, summary=batch_summary, staged=wap, base=snap,
            rebase=rebase_cb,
        )
    else:
        new_snap = table.replace_buckets(
            dirty, out, summary=batch_summary, staged=wap, base=snap
        )
    if wap:
        try:
            new_snap = _audit_and_publish(table, new_snap, dirty, res)
        except ContractViolation:
            # the failed audit is an operational event: surface it in the
            # lineage sidecar before halting (the staged snapshot is gone)
            res.wall_ms = int((time.monotonic() - t0) * 1000)
            if lineage:
                lineage.record(res, note="wap-audit-failed")
            raise
    res.merge_ms = int((time.monotonic() - t_merge) * 1000)
    res.snapshot_id = new_snap.snapshot_id
    _reb = new_snap.summary.get("occ_rebase")
    if _reb:
        res.occ_rebased = int(_reb["rebased_over"])

    if collect_stats:
        res.partition_stats = {
            str(r[0]): r["count"] for r in pstats  # noqa: F821 (guarded)
        }
    if collect_stats or pos_del:
        result.unpersist()

    res.wall_ms = int((time.monotonic() - t0) * 1000)
    if lineage:
        lineage.record(res)
    return res


def read_current(
    table: LakeTable,
    snapshot_id: int | None = None,
    buckets: list[int] | None = None,
    ts_between: tuple[int | None, int | None] | None = None,
    between: dict[str, tuple] | None = None,
) -> DataFrame:
    """Current row versions (tombstones still present).

    CoW tables store exactly one version per key, so this is the plain
    read.  Merge-on-read tables store the base row plus appended deltas;
    here the LWW collapse (max ``_lsn`` per key — the same hash-agg shape
    as the write-side merge) happens at read, which is the MoR contract.
    Same-LSN verbatim duplicates collapse to an identical row either way;
    within-batch conflicts were already resolved by commit_ts before the
    delta was written.
    """
    snap = (
        table.snapshot(snapshot_id) if snapshot_id else table.current()
    )
    return table.current_versions(
        snap=snap, buckets=buckets, ts_between=ts_between, between=between
    )


def read_clean(
    table: LakeTable,
    snapshot_id: int | None = None,
    ts_between: tuple[int | None, int | None] | None = None,
    between: dict[str, tuple] | None = None,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Public view of the target: tombstones and bookkeeping filtered out.

    ``ts_between=(lo_ms, hi_ms)`` slices by event time with manifest-stats
    file pruning where the merge mode allows it (see ``LakeTable.read``).
    ``buckets`` restricts the read to those buckets' FILES (pruned at
    planning, not filtered post-scan).

    Tables without a ``_deleted`` column (created outside the CDC replay
    path — plain warehouse loads) have no tombstones to filter."""
    df = read_current(
        table, snapshot_id=snapshot_id, ts_between=ts_between,
        between=between, buckets=buckets,
    )
    if "_deleted" not in df.columns:
        return df
    return df.filter(~F.coalesce(F.col("_deleted"), F.lit(False))).drop("_deleted")


def governance_rules(snap) -> tuple[dict[str, str], str | None]:
    """Column masks + row filter carried by the table itself (the BigQuery
    column-level-security / Delta-Unity masking-policy analogue):

    * ``governance.mask.<col> = <SQL expr>`` — the governed surface shows
      the expression's value in place of the column; ``{col}`` inside the
      expression refers to the (true) column value, and the result is cast
      back to the column's declared type.
    * ``governance.row-filter = <SQL boolean expr>`` — rows where the
      filter is not TRUE are hidden from the governed surface.  The filter
      evaluates over TRUE (unmasked) values, the BigQuery row-access-policy
      order.

    Both validate at DECLARATION (``alter_properties``).  Governance binds
    the SQL read surface (``register_sql_views`` / ``main.py sql`` /
    catalog views); engine paths — replay, merge, relay, repair — stay
    privileged, the pipeline-service-account exemption."""
    pfx = "governance.mask."
    masks = {
        k[len(pfx):]: v
        for k, v in snap.properties.items()
        if k.startswith(pfx) and v
    }
    return masks, snap.properties.get("governance.row-filter") or None


def guard_governed_slice(
    snap,
    ts_between: tuple[int | None, int | None] | None = None,
    between: dict[str, tuple] | None = None,
) -> None:
    """Refuse range-slicing on a MASKED column from a governed surface.

    ``between``/``ts_between`` predicates evaluate over the TRUE column
    values before the mask projects — so row counts per window act as an
    oracle: a governed consumer could binary-search every masked value
    one slice at a time.  Privileged surfaces skip this check."""
    masks, _ = governance_rules(snap)
    sliced = set(between or {})
    if ts_between is not None:
        sliced.add("ts")
    leak = sorted(
        c for c in sliced
        if c in masks or any(m.startswith(c + ".") for m in masks)
    )
    if leak:
        raise PermissionError(
            f"cannot slice on masked column(s) {leak} from a governed "
            "surface: the range predicate evaluates over true values and "
            "would let a consumer binary-search the masked value; use a "
            "privileged read or unset the mask"
        )


def apply_governance(df: DataFrame, snap, masks_only: bool = False) -> DataFrame:
    """Apply the table's governance rules to a read: row filter first
    (over true values), then masks, each cast back to the column's type.

    ``masks_only`` skips the row filter — the change-stream surface
    (``changes``) masks payload but keeps every change event visible:
    hiding a filtered row's DELETE would leave a consumer's replica
    holding the row forever, the worse leak."""
    masks, row_filter = governance_rules(snap)
    if row_filter and not masks_only:
        df = df.filter(F.coalesce(F.expr(row_filter), F.lit(False)))
    # every mask evaluates over the PRE-MASK row (one projection, not a
    # withColumn chain): a mask referencing another masked column sees
    # the TRUE value, same as the row filter — no alphabetical-order
    # dependence between masks
    replacements: dict = {}
    for col in sorted(masks):
        if "." in col:
            # nested mask: rewrite the field INSIDE the struct (a NULL
            # parent struct stays NULL — withField is null-propagating)
            parent, fname = col.split(".", 1)
            if parent not in df.columns:
                continue
            ptype = snap.schema[parent].dataType
            dtype = next(
                sf.dataType for sf in ptype.fields if sf.name == fname
            )
            masked = F.expr(
                masks[col].replace("{col}", f"`{parent}`.`{fname}`")
            ).cast(dtype)
            base = replacements.get(parent, F.col(parent))
            replacements[parent] = base.withField(fname, masked)
        elif col in df.columns:
            fld = next(f for f in snap.schema.fields if f.name == col)
            replacements[col] = F.expr(
                masks[col].replace("{col}", f"`{col}`")
            ).cast(fld.dataType)
    if replacements:
        df = df.withColumns(replacements)
    return df


def register_sql_views(
    table: LakeTable,
    name: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    ts_between: tuple[int | None, int | None] | None = None,
    privileged: bool = False,
    between: dict[str, tuple] | None = None,
) -> DataFrame:
    """Register the table as Spark SQL temp views — the dbt-model read
    surface (the reference's consumers query silver/gold models as SQL
    relations, e.g. ``models/gold/daily_analytics.sql``):

    * ``<name>``      — clean live rows: LWW winners with tombstones and
      purges applied (what a SQL analyst means by "the table").
    * ``<name>_raw``  — the versioned rows including ``_lsn`` /
      ``_deleted`` bookkeeping, for audits and debugging.

    Time travel: ``snapshot_id`` or ``as_of_ms`` (FOR SYSTEM_TIME AS OF)
    pin a past state.  ``ts_between=(lo_ms, hi_ms)`` scopes both views to
    an event-time slice with manifest-stats file pruning — the analyst's
    "last 7 days" query plans only the warm files.  Registration resolves
    the manifest ONCE, so every query against the view reads one
    consistent snapshot even while writers keep committing — re-register
    to advance.  Returns the clean DataFrame."""
    if as_of_ms is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or as_of_ms, not both")
        snapshot_id = table.snapshot_as_of(as_of_ms).snapshot_id
    clean = read_clean(
        table, snapshot_id=snapshot_id, ts_between=ts_between, between=between
    )
    raw = read_current(
        table, snapshot_id=snapshot_id, ts_between=ts_between, between=between
    )
    if not privileged:
        # governance policy is LIVE (current properties), even for a
        # time-travel read — otherwise `--as-of` would bypass a mask that
        # was added after the pinned snapshot
        snap = table.current()
        guard_governed_slice(snap, ts_between=ts_between, between=between)
        clean = apply_governance(clean, snap)
        # the raw view keeps TOMBSTONES visible through the row filter
        # (the cmd_changes rule): a tombstone's payload is nulled, so any
        # filter evaluates NULL on it and coalesce(...,False) would hide
        # every delete — stranding a consumer's replica forever, the
        # worse leak.  Filter first (over true values), exempt deletes,
        # then mask.
        masks, row_filter = governance_rules(snap)
        if row_filter:
            keep = F.coalesce(F.expr(row_filter), F.lit(False))
            if "_deleted" in raw.columns:
                keep = keep | F.coalesce(F.col("_deleted"), F.lit(False))
            raw = raw.filter(keep)
        raw = apply_governance(raw, snap, masks_only=True)
    clean.createOrReplaceTempView(name)
    raw.createOrReplaceTempView(f"{name}_raw")
    return clean


def expire_tombstones(table: LakeTable, horizon_lsn: int) -> None:
    """Drop tombstones whose delete LSN is older than the reorder horizon
    (safe once no in-flight event can carry a lower LSN), then compact.

    On a merge-on-read table the delta versions must collapse FIRST:
    dropping a tombstone while a lower-LSN pre-delete version still sits in
    an older delta file would resurrect the deleted row at read time.
    ``compact()`` is exactly that collapse.
    """
    snap = table.current()
    if snap.merge_mode == "mor":
        table.compact()
        snap = table.current()
    buckets = [int(b) for b in snap.files]
    if not buckets:
        return
    df = table.read().filter(
        ~(
            F.coalesce(F.col("_deleted"), F.lit(False))
            & (F.col("_lsn") < F.lit(horizon_lsn))
        )
    )
    table.replace_buckets(
        buckets,
        df,
        summary={**table.carry_fence(), "operation": "expire-tombstones"},
    )


def partition_stats_json(stats: dict[str, int]) -> str:
    return json.dumps(stats, sort_keys=True)
