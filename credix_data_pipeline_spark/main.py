"""CLI entry point — the engine's ``spark-submit`` surface (SURVEY §2.10).

The reference exposes per-table Dagster jobs (`cnpj_data_pipeline`,
`installments_data_pipeline`, `full_data_pipeline`, `monitoring_job` —
credix_pipeline/credix_pipeline/jobs/data_pipeline_jobs.py:4-28).  The engine
exposes the same surface as subcommands runnable via::

    spark-submit --py-files engine.zip /path/to/main.py <cmd> ...
    # (spark-submit takes a script path; this module doubles as that script)
    # or locally:
    python -m credix_data_pipeline_spark.main <cmd> ...

Subcommands:

* ``generate``  — write a deterministic synthetic change feed
* ``replay``    — replay a feed to exhaustion into a lakehouse table
                  (availableNow semantics, resumable from checkpoint)
* ``stream``    — genuine Structured Streaming mode (foreachBatch MERGE)
* ``metrics``   — print the lineage/throughput sidecar (monitoring_job analogue)
* ``monitor``   — freshness / volume-anomaly / error signals as JSON
                  (``edr monitor`` analogue, SURVEY §3.4)
* ``report``    — write the static HTML+JSON monitoring report to a publish
                  directory (``edr send-report`` → public bucket, S11)
* ``gold``      — run the per-conversation gold summary over the table
* ``gold-refresh`` — incrementally maintain a gold summary LakeTable
                  (A10 high-water + per-bucket CoW MERGE, the dbt
                  incremental-model analogue)
* ``validate``  — run the data contracts (unique key, not-null, accepted
                  values) and exit non-zero on violations (dbt-test analogue)
* ``sql``       — ad-hoc Spark SQL over the table's registered views:
                  ``<view>`` = clean live rows, ``<view>_raw`` = versioned
                  rows with bookkeeping; ``--as-of`` pins a past state
                  (the dbt-model read surface for SQL consumers)
* ``changes``   — changelog scan between two snapshots (Iceberg changelog /
                  Delta CDF analogue) for downstream incremental consumers
* ``publish``   — CDC relay: publish the table's net changes as a
                  replayable change feed (the engine's CDC-source role)
* ``alter``     — column DDL: metadata-only rename / drop / widen /
                  add (optional DEFAULT: Iceberg v3 initial+write default)
                  (Iceberg v2 field-id evolution)
* ``compact``   — rewrite small files (Iceberg rewrite_data_files analogue)
* ``history``   — snapshot lineage / per-file footer stats (Iceberg
                  ``history`` + ``files`` metadata tables; ``--files`` runs
                  a distributed footer-only metadata scan)
* ``clone``     — zero-copy shallow clone: one metadata commit referencing
                  the source's files (Delta SHALLOW CLONE analogue); clone
                  a past state with ``--snapshot`` / ``--as-of``
* ``import``    — zero-copy adoption of an existing parquet dataset (Delta
                  CONVERT / Iceberg add_files analogue): one metadata
                  commit referencing the files in place, LWW seam at
                  LSN 0; ``rebucket`` afterwards to spread
* ``branch``    — named writable branches (Iceberg branch refs): ``create``
                  forks zero-copy under ``_branches/<name>``, ``ff``
                  publishes the branch head back as ONE atomic commit
                  (fast-forward; refuses if main moved), ``drop`` removes
                  the branch (adopted files transfer ownership), ``list``
* ``rollback``  — roll back to a past snapshot; the exactly-once fence rolls
                  back with the data (Iceberg rollback_to_snapshot)
* ``expire``    — retention: expire old snapshots + collect orphan files
                  (Iceberg expire_snapshots / the reference's GCS lifecycle
                  deletes)
* ``replay-fanin`` — fan-in: N sharded feeds (name=path,…) into one table
                  with per-source exactly-once fences; single jobs can
                  also join a fan-in table via ``replay/stream --source``
* ``bootstrap`` — initial-snapshot load (Datastream backfill_all): seed a
                  fresh table from an existing dataset, LWW seam at the
                  snapshot LSN (``--lsn-col``)
* ``requeue``   — dead-letter redrive: repair quarantined events
                  (``--set col=sql_expr``) and re-enter them as a feed
                  tail chunk; ``--source`` scopes to one fan-in shard
* ``fsck``      — metadata-first integrity audit (files exist, manifests
                  load, fences coherent, orphans reported); ``--deep``
                  re-checks bucket placement row-by-row
* ``diff``      — anti-entropy divergence check between two same-layout
                  tables (Dynamo-style): per-bucket xor-of-hash
                  fingerprints first (no join when identical), key-level
                  classification of divergent buckets only
* ``repair``    — converge a replica onto its upstream via merge_into
                  scoped to the divergent keys
* ``export``    — unload one consistent snapshot as plain parquet
                  (reverse of ``import``); governed by default,
                  ``--privileged`` for the operator view
* ``ttl``       — retention delete (``DELETE WHERE ts < cutoff``): files
                  wholly below the cutoff drop by manifest ts-stats alone
                  (metadata-only), boundary buckets rewrite copy-on-write;
                  NULL-ts rows (tombstones) are kept
* ``catalog-publish`` — atomically pin N tables' snapshots as ONE catalog
                  version (consistent multi-table snapshot; Nessie /
                  catalog-level-commit analogue); pins are tag-protected
                  from table retention
* ``catalog-show``   — print a catalog version (``--history``, ``--as-of``)
* ``catalog-sql``    — SQL over every cataloged table pinned at one
                  consistent catalog version
* ``catalog-expire`` — drop old catalog versions and release their pins
* ``catalog-rollback`` — re-pin the catalog at a prior retained version
                  (published as a NEW version — roll-forward history,
                  mirroring table ``rollback``)

``replay --wap`` stages each batch and publishes only after the contracts
pass on the staged post-image (Iceberg write-audit-publish).

``lookup --as-of <iso|epoch-ms>`` time-travels the bucket-pruned key lookup
by wall clock (Iceberg ``FOR SYSTEM_TIME AS OF``).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from credix_data_pipeline_spark.session import get_spark

    return get_spark(
        app_name=f"credix-{args.cmd}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )


def cmd_generate(args) -> int:
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed

    spark = _spark(args)
    spec = FeedSpec(
        n_events=args.events,
        n_conversations=args.conversations,
        turns_per_conversation=args.turns,
        delete_pct=args.delete_pct,
        duplicate_pct=args.duplicate_pct,
        hot_pct=args.hot_pct,
        events_per_chunk=args.events_per_chunk,
        n_shards=args.shards,
        shard=args.shard,
        patch_pct=args.patch_pct,
    )
    manifest = write_feed(spark, args.feed, spec)
    print(json.dumps({"feed": args.feed, "chunks": len(manifest["chunks"])}))
    return 0


def cmd_replay_fanin(args) -> int:
    from credix_data_pipeline_spark.functions.normalize import (
        with_normalized_text,
    )
    from credix_data_pipeline_spark.streaming import runner

    spark = _spark(args)
    feeds: dict[str, str] = {}
    for pair in args.feeds.split(","):
        name, _, path = pair.partition("=")
        if not name or not path:
            raise SystemExit(f"--feeds entry {pair!r} is not name=path")
        feeds[name] = path
    stats = runner.replay_fanin(
        spark,
        feeds,
        args.table,
        chunks_per_batch=args.chunks_per_batch,
        num_buckets=args.buckets,
        transform=with_normalized_text if not args.no_normalize else None,
        collect_stats=not args.fast,
        merge_mode=args.merge_mode,
        occ_retries=args.occ_retries,
    )
    print(json.dumps({
        n: {"batches": s.batches, "rows_in": s.rows_in,
            "rows_applied": s.rows_applied, "wall_ms": s.wall_ms}
        for n, s in stats.items()
    }))
    return 0


def cmd_replay(args) -> int:
    from credix_data_pipeline_spark.functions.normalize import with_normalized_text
    from credix_data_pipeline_spark.operators.apply import ContractViolation
    from credix_data_pipeline_spark.streaming import runner

    spark = _spark(args)
    try:
        stats = runner.replay(
            spark,
            args.feed,
            args.table,
            chunks_per_batch=args.chunks_per_batch,
            num_buckets=args.buckets,
            transform=with_normalized_text if not args.no_normalize else None,
            collect_stats=not args.fast,
            auto_compact_threshold=args.auto_compact,
            merge_mode=args.merge_mode,
            wap=args.wap,
            publish_to=args.publish_to,
            occ_retries=args.occ_retries,
            source=args.source,
            max_batches=args.max_batches,
        )
    except ContractViolation as e:
        # staged snapshot discarded; published table unchanged; checkpoint
        # still points at the offending chunk for a fixed re-run
        print(json.dumps({"error": "contract_violation", "batch_id": e.batch_id,
                          "report": e.report}))
        return 1
    out = {
        "batches": stats.batches,
        "rows_in": stats.rows_in,
        "rows_applied": stats.rows_applied,
        "wall_ms": stats.wall_ms,
    }
    rc = 0
    if args.validate:
        # dbt build analogue: ingest + contracts in one invocation, non-zero
        # exit when a contract fails so schedulers gate downstream jobs
        from credix_data_pipeline_spark.lakehouse import LakeTable
        from credix_data_pipeline_spark.operators.contracts import validate

        report = validate(LakeTable.load(spark, args.table))
        out["contracts"] = report
        rc = 0 if report["passed"] else 1
    print(json.dumps(out))
    return rc


def cmd_bootstrap(args) -> int:
    from credix_data_pipeline_spark.streaming import runner

    spark = _spark(args)
    try:
        out = runner.bootstrap(
            spark,
            args.src,
            args.table,
            key=args.key.split(",") if args.key else None,
            num_buckets=args.buckets,
            lsn_col=args.lsn_col,
            src_format=args.format,
            merge_mode=args.merge_mode,
        )
    except RuntimeError as e:
        print(json.dumps({"error": "bootstrap_refused", "detail": str(e)}))
        return 1
    print(json.dumps(out))
    return 0


def cmd_requeue(args) -> int:
    from credix_data_pipeline_spark.streaming import runner

    spark = _spark(args)
    fixes: dict[str, str] = {}
    for pair in args.set or []:
        col, _, expr = pair.partition("=")
        if not col or not expr:
            raise SystemExit(f"--set entry {pair!r} is not col=sql_expr")
        fixes[col] = expr
    try:
        out = runner.requeue_failed(spark, args.table, args.feed, fixes,
                                    source=args.source)
    except RuntimeError as e:
        print(json.dumps({"error": "requeue_refused", "detail": str(e)}))
        return 1
    print(json.dumps(out))
    return 0


def cmd_stream(args) -> int:
    from credix_data_pipeline_spark.functions.normalize import with_normalized_text
    from credix_data_pipeline_spark.streaming import runner

    spark = _spark(args)
    common = dict(
        num_buckets=args.buckets,
        transform=with_normalized_text if not args.no_normalize else None,
        collect_stats=not args.fast,
        merge_mode=args.merge_mode,
        wap=args.wap,
        publish_to=args.publish_to,
        occ_retries=args.occ_retries,
        source=args.source,
    )
    if args.ddl:
        if args.continuous:
            print("--ddl implies availableNow (drain-to-now); "
                  "--continuous is not supported", file=sys.stderr)
            return 1
        res = runner.stream_ddl(spark, args.feed, args.table, **common)
        print(json.dumps(res))
        return 0
    q = runner.stream(
        spark,
        args.feed,
        args.table,
        available_now=not args.continuous,
        processing_time=args.trigger,
        **common,
    )
    q.awaitTermination()
    return 0


def cmd_metrics(args) -> int:
    from credix_data_pipeline_spark.streaming.lineage import LineageLog

    spark = _spark(args)
    df = LineageLog(args.table).read(spark)
    df.orderBy("batch_id").show(n=args.limit, truncate=False)
    return 0


def cmd_monitor(args) -> int:
    from credix_data_pipeline_spark.streaming.monitoring import monitor

    spark = _spark(args)
    print(json.dumps(
        monitor(spark, args.table, catalog_root=args.catalog),
        indent=2, sort_keys=True,
    ))
    return 0


def cmd_report(args) -> int:
    from credix_data_pipeline_spark.streaming.monitoring import publish_report

    spark = _spark(args)
    report = publish_report(spark, args.table, args.out)
    print(
        json.dumps(
            {
                "out": args.out,
                "freshness": report["freshness"]["status"],
                "anomaly_count": report["volume"]["anomaly_count"],
            }
        )
    )
    return 0


def cmd_gold(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.apply import read_clean
    from credix_data_pipeline_spark.plans.gold import conversation_summary

    spark = _spark(args)
    table = LakeTable.load(spark, args.table)
    conversation_summary(read_clean(table)).orderBy("conv_id").show(
        n=args.limit, truncate=False
    )
    return 0


def cmd_compact(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable

    spark = _spark(args)
    snap = LakeTable.load(spark, args.table).compact()
    print(json.dumps({"snapshot_id": snap.snapshot_id, "version": snap.version}))
    return 0


def cmd_maintain(args) -> int:
    """Policy-driven maintenance: targeted compaction + configured
    retention from the table's own properties (Iceberg-style)."""
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.maintenance import maintain

    spark = _spark(args)
    t = LakeTable.load(spark, args.table)
    if args.set_property:
        t.alter_properties(
            set_props=dict(kv.split("=", 1) for kv in args.set_property)
        )
    print(json.dumps(maintain(t, dry_run=args.dry_run)))
    return 0


def cmd_purge(args) -> int:
    """Equality-delete purge (GDPR path): commit a key-value delete WITHOUT
    reading or rewriting any data file; `compact` later materializes it."""
    from credix_data_pipeline_spark.lakehouse import LakeTable

    spark = _spark(args)
    t = LakeTable.load(spark, args.table)
    if args.keys_parquet:
        keys = spark.read.parquet(args.keys_parquet)
        snap = t.delete_keys(keys, cols=args.cols)
    else:
        if not args.values:
            raise SystemExit("one of --values/--keys-parquet is required")
        snap = t.delete_keys(
            [v for v in args.values.split(",") if v], cols=args.cols
        )
    print(
        json.dumps(
            {
                "snapshot_id": snap.snapshot_id,
                "version": snap.version,
                "purged_keys": snap.summary.get("purged_keys", 0),
                "operation": snap.summary.get("operation"),
            }
        )
    )
    return 0


def cmd_merge(args) -> int:
    """General conditional MERGE INTO: Delta-style update/delete/insert
    clauses for ad-hoc corrections and backfills (operators/merge.py);
    O(dirty buckets), fence-preserving, CHECK-constraint bound."""
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.merge import merge_into

    spark = _spark(args)
    t = LakeTable.load(spark, args.table)
    src = spark.read.parquet(args.src)
    upd = {}
    for kv in args.set or []:
        col, _, expr = kv.partition("=")
        if not expr:
            raise SystemExit(f"--set needs COL=SQL_EXPR, got {kv!r}")
        upd[col.strip()] = expr
    res = merge_into(
        t,
        src,
        when_matched_update=upd or None,
        when_matched_delete=args.delete_when,
        when_not_matched_insert=not args.no_insert,
    )
    print(json.dumps(res))
    return 0


def cmd_ttl(args) -> int:
    """Row TTL / retention delete: drop rows with event time before the
    cutoff — whole files by manifest stats alone, boundary buckets by a
    scoped copy-on-write rewrite."""
    from credix_data_pipeline_spark.lakehouse import LakeTable

    spark = _spark(args)
    t = LakeTable.load(spark, args.table)
    before = t.current().snapshot_id
    snap = t.delete_older_than(_parse_ts_ms(args.older_than))
    if snap.snapshot_id == before:
        print(json.dumps({"snapshot_id": snap.snapshot_id,
                          "version": snap.version, "noop": True}))
        return 0
    print(json.dumps({
        "snapshot_id": snap.snapshot_id,
        "version": snap.version,
        "noop": False,
        "cutoff_ms": snap.summary.get("cutoff_ms"),
        "files_dropped": snap.summary.get("files_dropped", 0),
        "buckets_rewritten": snap.summary.get("buckets_rewritten", 0),
        "operation": snap.summary.get("operation"),
    }))
    return 0


def cmd_publish(args) -> int:
    """Publish the table's net changes as a replayable change feed (the
    engine's CDC-source role — downstream tables replay this feed)."""
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.relay import publish_changes

    spark = _spark(args)
    out = publish_changes(
        LakeTable.load(spark, args.table), args.out,
        rebase=getattr(args, "rebase", False),
    )
    print(json.dumps(out))
    return 0


def cmd_vacuum_relay(args) -> int:
    """Drop relay chunks older than the rebase chunk (bounded feed storage)."""
    from credix_data_pipeline_spark.operators.relay import vacuum_relay

    print(json.dumps(vacuum_relay(args.out)))
    return 0


def cmd_alter(args) -> int:
    """Column DDL: metadata-only rename/drop/widen (Iceberg ALTER TABLE)."""
    from pyspark.sql import types as T

    from credix_data_pipeline_spark.lakehouse import LakeTable

    spark = _spark(args)
    t = LakeTable.load(spark, args.table)
    if args.rename:
        old, new = args.rename.split(":", 1)
        snap = t.rename_column(old, new)
    elif args.drop:
        snap = t.drop_column(args.drop)
    elif args.widen:
        col, type_name = args.widen.split(":", 1)
        snap = t.widen_column(col, T._parse_datatype_string(type_name))
    elif args.add:
        # NAME:TYPE split at the FIRST colon only — types may carry colons
        # (struct<a:int>); the default is its own flag for the same reason
        name, _, type_name = args.add.partition(":")
        if not type_name:
            raise SystemExit("--add expects NAME:TYPE (with --default SQL)")
        snap = t.add_columns(
            [T.StructField(name, T._parse_datatype_string(type_name), True)],
            defaults={name: args.default} if args.default else None,
        )
    else:
        raise SystemExit("one of --rename/--drop/--widen/--add is required")
    print(
        json.dumps(
            {
                "snapshot_id": snap.snapshot_id,
                "version": snap.version,
                "columns": [f.name for f in snap.schema.fields],
            }
        )
    )
    return 0


def cmd_rebucket(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable

    spark = _spark(args)
    snap = LakeTable.load(spark, args.table).rebucket(
        args.num_buckets, bucket_by=args.bucket_by
    )
    print(
        json.dumps(
            {
                "snapshot_id": snap.snapshot_id,
                "version": snap.version,
                "num_buckets": snap.num_buckets,
                "bucket_by": snap.bucket_by,
            }
        )
    )
    return 0


def _parse_ts_ms(s: str) -> int:
    """Epoch milliseconds from either a raw integer or an ISO-8601 string
    (naive timestamps are taken as UTC, matching ``committed_at_ms``)."""
    try:
        return int(s)
    except ValueError:
        pass
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def parse_between(specs, schema) -> dict | None:
    """``COL:LO:HI`` slice specs → the ``between=`` dict, coercing each
    bound by the COLUMN's declared type: numeric columns get numeric
    bounds, string columns keep the raw text — so a string column holding
    zero-padded codes (``code:0100:0200``) slices as written instead of
    collapsing to int 100 and failing type validation.  Empty bound =
    open side.  Raises ValueError with a user-facing message (one shared
    parser: cmd_sql and cmd_export must never drift)."""
    out = None
    fields = {f.name: f.dataType for f in schema.fields}
    for spec in specs or []:
        parts = spec.split(":")
        if len(parts) != 3:
            raise ValueError(
                "--between expects COL:LO:HI (empty side = open bound)"
            )
        col = parts[0]
        if col not in fields:
            raise ValueError(f"--between: no column {col!r} in the table")
        numeric = fields[col].typeName() not in ("string",)

        def _bound(x):
            if x == "":
                return None
            if not numeric:
                return x
            try:
                f = float(x)
                return int(f) if f.is_integer() and "." not in x else f
            except ValueError:
                raise ValueError(
                    f"--between: bound {x!r} is not numeric but column "
                    f"{col!r} is {fields[col].simpleString()}"
                ) from None

        out = out or {}
        out[col] = (_bound(parts[1]), _bound(parts[2]))
    return out


def cmd_lookup(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable

    spark = _spark(args)
    table = LakeTable.load(spark, args.table)
    snap = (
        table.snapshot_as_of(_parse_ts_ms(args.as_of))
        if args.as_of
        else None
    )
    df = table.read_keys(args.conv, snap=snap)
    import pyspark.sql.functions as F

    df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
    if not getattr(args, "privileged", False):
        # lookup is a consumer surface: masks + row filter bind it like
        # the SQL views (a key lookup is the easiest targeted leak)
        from credix_data_pipeline_spark.operators.apply import (
            apply_governance,
        )

        df = apply_governance(df, table.current())
    df.orderBy("conv_id", "turn_idx").show(n=args.limit, truncate=False)
    return 0


def cmd_sql(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.apply import register_sql_views

    spark = _spark(args)
    table = LakeTable.load(spark, args.table)
    ts_between = None
    if args.ts_from or args.ts_to:
        ts_between = (
            _parse_ts_ms(args.ts_from) if args.ts_from else None,
            _parse_ts_ms(args.ts_to) if args.ts_to else None,
        )
    try:
        # --between bounds coerce/validate against the schema the read is
        # PINNED to: an --as-of slice on a since-dropped or since-retyped
        # column must work exactly as it did at that snapshot
        pin = (
            table.snapshot_as_of(_parse_ts_ms(args.as_of))
            if args.as_of
            else table.current()
        )
        between = parse_between(args.between, pin.schema)
        register_sql_views(
            table,
            args.view,
            as_of_ms=_parse_ts_ms(args.as_of) if args.as_of else None,
            ts_between=ts_between,
            privileged=args.privileged,
            between=between,
        )
    except (ValueError, PermissionError) as e:
        print(f"sql: {e}", file=sys.stderr)
        return 2
    df = spark.sql(args.query)
    if args.json:
        for line in df.toJSON().toLocalIterator():
            print(line)
    else:
        df.show(n=args.limit, truncate=False)
    return 0


def _load_catalog(args):
    from credix_data_pipeline_spark.lakehouse.catalog import Catalog

    return Catalog.load(args.catalog)


def cmd_catalog_publish(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.lakehouse.catalog import Catalog

    spark = _spark(args)
    cat = Catalog.create_if_not_exists(args.catalog)
    updates = {}
    for pin in args.pin or []:
        name, _, spec = pin.partition("=")
        if not name or not spec:
            raise SystemExit(f"--pin wants name=path[@snapshot], got {pin!r}")
        path, _, sid = spec.partition("@")
        t = LakeTable.load(spark, path)
        updates[name] = (t, int(sid)) if sid else t
    cv = cat.publish(updates, drop=args.drop or None, retries=args.retries)
    print(json.dumps({"version": cv.version, "ts_ms": cv.ts_ms,
                      "tables": cv.tables}))
    return 0


def cmd_catalog_show(args) -> int:
    cat = _load_catalog(args)
    if args.history:
        out = [
            {"version": cv.version, "ts_ms": cv.ts_ms, "tables": cv.tables,
             "summary": cv.summary}
            for cv in cat.history()
        ]
        print(json.dumps(out, indent=1))
        return 0
    if args.as_of:
        cv = cat.as_of(_parse_ts_ms(args.as_of))
    elif args.version is not None:
        cv = cat._read(args.version)
    else:
        cv = cat.current()
    print(json.dumps({"version": cv.version, "ts_ms": cv.ts_ms,
                      "tables": cv.tables, "summary": cv.summary}))
    return 0


def cmd_catalog_sql(args) -> int:
    spark = _spark(args)
    cat = _load_catalog(args)
    cat.register_views(
        spark,
        version=args.version,
        as_of_ms=_parse_ts_ms(args.as_of) if args.as_of else None,
    )
    df = spark.sql(args.query)
    if args.json:
        for line in df.toJSON().toLocalIterator():
            print(line)
    else:
        df.show(n=args.limit, truncate=False)
    return 0


def cmd_catalog_expire(args) -> int:
    cat = _load_catalog(args)
    print(json.dumps(cat.expire(keep_last=args.keep_last)))
    return 0


def cmd_catalog_rollback(args) -> int:
    spark = _spark(args)
    cat = _load_catalog(args)
    cv = cat.rollback(spark, args.to_version, retries=args.retries)
    print(json.dumps({"version": cv.version, "ts_ms": cv.ts_ms,
                      "tables": cv.tables, "summary": cv.summary}))
    return 0


def cmd_gold_refresh(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.gold_incremental import (
        refresh_conversation_summary,
        refresh_turn_analytics,
    )

    spark = _spark(args)
    src = LakeTable.load(spark, args.table)
    refresh = (
        refresh_turn_analytics
        if args.model == "turns"
        else refresh_conversation_summary
    )
    out = refresh(src, args.gold)
    if args.catalog:
        # publish the CONSISTENT pair atomically: the source pinned at the
        # exact snapshot this refresh read (recorded in the gold summary),
        # gold at the state it just produced — downstream SQL through the
        # catalog can never see mixed generations
        from credix_data_pipeline_spark.lakehouse.catalog import Catalog

        cat = Catalog.create_if_not_exists(args.catalog)
        gold = LakeTable.load(spark, args.gold)
        # a refresh that skipped on a NEVER-refreshed gold (empty source)
        # has no recorded source snapshot — the empty pair at current is
        # the consistent state
        src_sid = gold.current().summary.get(
            "source_snapshot_id", src.current().snapshot_id
        )
        cv = cat.publish(
            {
                args.catalog_source: (src, src_sid),
                args.catalog_gold: gold,
            },
            summary={"operation": "gold-refresh"},
            retries=args.catalog_retries,
        )
        out["catalog_version"] = cv.version
    print(json.dumps(out))
    return 0


def cmd_validate(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.contracts import validate

    spark = _spark(args)
    report = validate(LakeTable.load(spark, args.table))
    print(json.dumps(report, sort_keys=True))
    # non-zero exit on violations, like `dbt build` failing a schema test
    return 0 if report["passed"] else 1


def cmd_fsck(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.lakehouse.fsck import fsck

    spark = _spark(args)
    report = fsck(LakeTable.load(spark, args.table), deep=args.deep)
    print(json.dumps(report, indent=2))
    return 0 if report["ok"] else 1


def cmd_diff(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.repair import diff_tables

    spark = _spark(args)
    d = diff_tables(
        LakeTable.load(spark, args.left), LakeTable.load(spark, args.right)
    )
    out = {k: v for k, v in d.items() if k != "keys"}
    if not d["identical"]:
        kinds = {
            r["kind"]: r["n"]
            for r in d["keys"].groupBy("kind").count()
            .withColumnRenamed("count", "n").collect()
        }
        out["divergent_keys"] = kinds
        out["sample"] = [
            r.asDict() for r in d["keys"].limit(args.sample).collect()
        ]
    print(json.dumps(out, sort_keys=True, default=str))
    return 0 if d["identical"] else 1


def cmd_repair(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.repair import repair_replica

    spark = _spark(args)
    res = repair_replica(
        LakeTable.load(spark, args.replica),
        LakeTable.load(spark, args.upstream),
    )
    print(json.dumps(res, sort_keys=True, default=str))
    return 0


def cmd_changes(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.changelog import read_changes

    spark = _spark(args)
    table = LakeTable.load(spark, args.table)
    if (args.from_snapshot is None) == (args.from_ts is None) or (
        args.to_snapshot is not None and args.to_ts is not None
    ):
        print("changes: pass exactly one of --from-snapshot / --from-ts "
              "(and at most one of --to-snapshot / --to-ts)",
              file=sys.stderr)
        return 2
    from_id = (
        args.from_snapshot
        if args.from_snapshot is not None
        else table.snapshot_as_of(_parse_ts_ms(args.from_ts)).snapshot_id
    )
    to_id = (
        table.snapshot_as_of(_parse_ts_ms(args.to_ts)).snapshot_id
        if args.to_ts is not None
        else args.to_snapshot
    )
    df = read_changes(table, from_id, to_id)
    if not getattr(args, "privileged", False):
        # masks bind the change stream; the row filter does NOT (hiding a
        # filtered row's DELETE would strand it on consumers' replicas)
        from credix_data_pipeline_spark.operators.apply import (
            apply_governance,
        )

        df = apply_governance(df, table.current(), masks_only=True)
    if args.summary:
        from pyspark.sql import functions as F

        rows = (
            df.groupBy("_change_type").agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
        print(json.dumps(
            {"from": from_id, "to": to_id,
             "changes": {r["_change_type"]: r["rows"] for r in rows}},
            sort_keys=True,
        ))
        return 0
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"rows": df.count(), "out": args.out}))
    else:
        df.orderBy(*table.current().key).show(n=args.limit, truncate=False)
    return 0


def cmd_history(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.lakehouse.metadata import (
        files_df,
        history_df,
        partitions_df,
    )

    spark = _spark(args)
    table = LakeTable.load(spark, args.table)
    if args.files:
        files_df(table).orderBy("bucket", "file_path").show(
            n=args.limit, truncate=False
        )
    elif getattr(args, "partitions", False):
        partitions_df(table).orderBy("bucket").show(
            n=args.limit, truncate=False
        )
    else:
        history_df(table).orderBy("version").drop("summary").show(
            n=args.limit, truncate=False
        )
    return 0


def cmd_tag(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable

    spark = _spark(args)
    t = LakeTable.load(spark, args.table)
    if args.drop:
        t.untag(args.name)
    else:
        t.tag(args.name, snapshot_id=args.snapshot)
    print(json.dumps({"tags": t.tags()}))
    return 0


def cmd_clone(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable

    spark = _spark(args)
    src = LakeTable.load(spark, args.table)
    dest = src.clone_to(
        args.dest,
        snapshot_id=args.snapshot,
        as_of_ms=_parse_ts_ms(args.as_of) if args.as_of else None,
        pin=not args.no_pin,
    )
    snap = dest.current()
    print(
        json.dumps(
            {
                "dest": args.dest,
                "clone_source_snapshot_id": snap.summary[
                    "clone_source_snapshot_id"
                ],
                "version": snap.version,
                "files_referenced": sum(
                    len(fl) for fl in snap.files.values()
                ),
                "pinned_tag": snap.summary.get("clone_pin_tag"),
            }
        )
    )
    return 0


def cmd_import(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable

    spark = _spark(args)
    try:
        t = LakeTable.import_dataset(
            spark,
            args.src,
            args.table,
            key=[k for k in args.key.split(",") if k],
            validate=not args.no_validate,
        )
    except (ValueError, FileNotFoundError) as e:
        print(json.dumps({"error": str(e)}))
        return 1
    cur = t.current()
    print(
        json.dumps(
            {
                "table": args.table,
                "files_imported": cur.summary["files_imported"],
                "import_source": cur.summary["import_source"],
                "num_buckets": cur.num_buckets,
            }
        )
    )
    return 0


def cmd_branch(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable

    from credix_data_pipeline_spark.lakehouse.table import CommitConflict

    if args.action != "list" and not args.name:
        print(json.dumps({"error": "--name is required"}))
        return 1
    spark = _spark(args)
    t = LakeTable.load(spark, args.table)
    try:
        return _branch_action(args, t)
    except (CommitConflict, RuntimeError, ValueError, FileExistsError) as e:
        print(json.dumps({"error": str(e)}))
        return 1


def _branch_action(args, t) -> int:
    if args.action == "create":
        br = t.create_branch(
            args.name,
            snapshot_id=args.snapshot,
            as_of_ms=_parse_ts_ms(args.as_of) if args.as_of else None,
        )
        print(json.dumps({"branch": args.name, "path": br.path,
                          "base_version": int(
                              br.current().properties["branch.base-version"]
                          )}))
    elif args.action == "ff":
        snap = t.fast_forward(args.name)
        print(json.dumps({"branch": args.name, "version": snap.version,
                          "operation": snap.summary["operation"]}))
    elif args.action == "drop":
        res = t.drop_branch(args.name, force=args.force)
        print(json.dumps({"branch": args.name, **res}))
    elif args.action == "rebase":
        from credix_data_pipeline_spark.operators.rebase import rebase_branch

        nb = rebase_branch(t, args.name)
        print(json.dumps({
            "branch": args.name,
            "base_version": int(
                nb.current().properties["branch.base-version"]
            ),
        }))
    else:  # list
        print(json.dumps({"branches": t.list_branches()}))
    return 0


def cmd_rollback(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable

    spark = _spark(args)
    snap = LakeTable.load(spark, args.table).rollback_to(args.snapshot)
    print(
        json.dumps(
            {
                "snapshot_id": snap.snapshot_id,
                "version": snap.version,
                "rolled_back_to": args.snapshot,
                "batch_id": snap.summary.get("batch_id"),
            }
        )
    )
    return 0


def cmd_expire(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable

    spark = _spark(args)
    res = LakeTable.load(spark, args.table).expire_snapshots(
        keep_last=args.keep_last,
        older_than_ms=args.older_than_ms,
    )
    print(json.dumps(res))
    return 0


def cmd_export(args) -> int:
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.export import export_snapshot

    spark = _spark(args)
    table = LakeTable.load(spark, args.table)
    try:
        pin = (
            table.snapshot_as_of(_parse_ts_ms(args.as_of))
            if args.as_of
            else table.current()
        )
        between = parse_between(args.between, pin.schema)
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 2
    try:
        summary = export_snapshot(
            table,
            args.dest,
            as_of_ms=_parse_ts_ms(args.as_of) if args.as_of else None,
            partition_by=(
                [c for c in args.partition_by.split(",") if c]
                if args.partition_by
                else None
            ),
            privileged=args.privileged,
            between=between,
        )
    except (ValueError, FileExistsError, PermissionError) as e:
        print(json.dumps({"error": str(e)}))
        return 1
    print(json.dumps(summary, sort_keys=True))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="credix_data_pipeline_spark")
    p.add_argument("--master", default=None, help="spark master (default: env)")
    p.add_argument("--shuffle-partitions", type=int, default=32)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write a synthetic change feed")
    g.add_argument("--feed", required=True)
    g.add_argument("--events", type=int, default=100_000)
    g.add_argument("--conversations", type=int, default=1_000)
    g.add_argument("--turns", type=int, default=10)
    g.add_argument("--delete-pct", type=int, default=5)
    g.add_argument("--duplicate-pct", type=int, default=3)
    g.add_argument("--hot-pct", type=int, default=5)
    g.add_argument("--events-per-chunk", type=int, default=10_000)
    g.add_argument("--shards", type=int, default=1,
                   help="emit only the shard owning conv %% shards == "
                        "--shard (sharded-upstream fan-in)")
    g.add_argument("--shard", type=int, default=0)
    g.add_argument("--patch-pct", type=int, default=0,
                   help="%% of updates emitted as op='P' PARTIAL rows "
                        "carrying only their patch_cols subset")
    g.set_defaults(fn=cmd_generate)

    rf = sub.add_parser(
        "replay-fanin",
        help="fan-in replay: N sharded feeds (name=path,...) into one table "
             "with per-source exactly-once fences",
    )
    rf.add_argument("--feeds", required=True,
                    help="comma-separated name=path pairs")
    rf.add_argument("--table", required=True)
    rf.add_argument("--buckets", type=int, default=32)
    rf.add_argument("--chunks-per-batch", type=int, default=4)
    rf.add_argument("--no-normalize", action="store_true")
    rf.add_argument("--fast", action="store_true")
    rf.add_argument("--merge-mode", choices=["cow", "mor", "mor-append"],
                    default="cow")
    rf.add_argument("--occ-retries", type=int, default=0)
    rf.set_defaults(fn=cmd_replay_fanin)

    bs = sub.add_parser(
        "bootstrap",
        help="seed a fresh table from an existing dataset (initial "
             "snapshot; Datastream backfill_all analogue), then replay "
             "the change feed on top",
    )
    bs.add_argument("--src", required=True, help="source dataset path")
    bs.add_argument("--table", required=True)
    bs.add_argument("--key", default=None, help="comma-separated key cols")
    bs.add_argument("--buckets", type=int, default=32)
    bs.add_argument("--lsn-col", default=None,
                    help="column carrying the snapshot LSN (events above "
                         "it supersede seeded rows)")
    bs.add_argument("--format", default="parquet")
    bs.add_argument("--merge-mode", choices=["cow", "mor", "mor-append"],
                    default="cow")
    bs.set_defaults(fn=cmd_bootstrap)

    fk = sub.add_parser(
        "fsck",
        help="table integrity audit: referenced files exist, manifests/"
             "segments load, fences coherent, orphans reported; --deep "
             "re-hashes bucket placement row-by-row",
    )
    fk.add_argument("--table", required=True)
    fk.add_argument("--deep", action="store_true")
    fk.set_defaults(fn=cmd_fsck)

    df = sub.add_parser(
        "diff",
        help="anti-entropy check: per-bucket fingerprints, then a "
             "key-level diff of divergent buckets only; exit 1 if the "
             "tables differ",
    )
    df.add_argument("--left", required=True)
    df.add_argument("--right", required=True)
    df.add_argument("--sample", type=int, default=20,
                    help="max divergent keys to print")
    df.set_defaults(fn=cmd_diff)

    rr = sub.add_parser(
        "repair",
        help="converge a replica onto its upstream: merge_into scoped to "
             "the divergent keys (upsert what upstream has, delete what "
             "it lacks)",
    )
    rr.add_argument("--replica", required=True)
    rr.add_argument("--upstream", required=True)
    rr.set_defaults(fn=cmd_repair)

    rq = sub.add_parser(
        "requeue",
        help="repair quarantined (_failed/) events and re-enter them into "
             "the feed as a tail chunk (dead-letter redrive)",
    )
    rq.add_argument("--table", required=True)
    rq.add_argument("--feed", required=True)
    rq.add_argument("--set", action="append", metavar="COL=SQL_EXPR",
                    help="repair expression, repeatable")
    rq.add_argument("--source", default=None,
                    help="fan-in tables: redrive only this shard's rows "
                         "into its own feed")
    rq.set_defaults(fn=cmd_requeue)

    for name, fn in (("replay", cmd_replay), ("stream", cmd_stream)):
        r = sub.add_parser(name)
        r.add_argument("--feed", required=True)
        r.add_argument("--table", required=True)
        r.add_argument("--buckets", type=int, default=32)
        r.add_argument("--no-normalize", action="store_true")
        r.add_argument("--fast", action="store_true",
                       help="skip per-batch stats collection")
        r.add_argument("--occ-retries", type=int, default=0,
                       help="re-run merges that lose an optimistic-"
                            "concurrency race (concurrent writers)")
        r.add_argument("--merge-mode", choices=["cow", "mor", "mor-append"],
                       default="cow",
                       help="cow: rewrite dirty buckets (read-optimized); "
                            "mor: append + position deletes (balanced); "
                            "mor-append: blind delta append, LWW at read "
                            "(write-optimized)")
        if name == "replay":
            r.add_argument("--chunks-per-batch", type=int, default=4)
            r.add_argument("--max-batches", type=int, default=None,
                           help="stop after N micro-batches (partial "
                                "replay; resume from the checkpoint)")
            r.add_argument("--auto-compact", type=int, default=None,
                           help="compact buckets exceeding N files per batch")
            r.add_argument("--validate", action="store_true",
                           help="run data contracts after replay and exit "
                                "non-zero on violations (dbt build analogue)")
            r.add_argument("--wap", action="store_true",
                           help="write-audit-publish: stage each batch, run "
                                "contracts on the staged post-image, publish "
                                "only on a clean audit")
            r.add_argument("--publish-to", default=None,
                           help="relay this table's net changes to a "
                                "downstream change feed after every batch")
            r.add_argument("--source", default=None,
                           help="join a fan-in table as this named shard "
                                "(per-source fence; pair with "
                                "--occ-retries for concurrent jobs)")
        else:
            r.add_argument("--continuous", action="store_true")
            r.add_argument("--trigger", default="10 seconds")
            r.add_argument("--wap", action="store_true",
                           help="write-audit-publish each micro-batch; a "
                                "violation fails the streaming query with "
                                "the table unchanged")
            r.add_argument("--publish-to", default=None,
                           help="relay net changes to a downstream change "
                                "feed inside each foreachBatch")
            r.add_argument("--source", default=None,
                           help="join a fan-in table as this named shard")
            r.add_argument("--ddl", action="store_true",
                           help="DDL-bearing relay feed: drain-to-now via "
                                "per-segment availableNow queries, applying "
                                "relayed DDL at each boundary (restart-on-"
                                "schema-change)")
        r.set_defaults(fn=fn)

    for name, fn in (("metrics", cmd_metrics), ("gold", cmd_gold)):
        m = sub.add_parser(name)
        m.add_argument("--table", required=True)
        m.add_argument("--limit", type=int, default=50)
        m.set_defaults(fn=fn)

    mo = sub.add_parser("monitor", help="freshness/anomaly signals as JSON")
    mo.add_argument("--table", required=True)
    mo.add_argument("--catalog", default=None,
                    help="also report multi-table catalog staleness "
                         "(consumer lag behind the live tables)")
    mo.set_defaults(fn=cmd_monitor)

    rp = sub.add_parser("report", help="publish static HTML+JSON report")
    rp.add_argument("--table", required=True)
    rp.add_argument("--out", required=True)
    rp.set_defaults(fn=cmd_report)

    c = sub.add_parser("compact")
    c.add_argument("--table", required=True)
    c.set_defaults(fn=cmd_compact)

    pu = sub.add_parser(
        "purge",
        help="equality-delete key purge: O(keys) commit, no data read",
    )
    pu.add_argument("--table", required=True)
    pu.add_argument("--values", help="comma-separated key values")
    pu.add_argument("--keys-parquet", help="parquet file of key values")
    pu.add_argument(
        "--cols",
        type=lambda s: s.split(","),
        help="purge key columns (default: the table's bucket columns)",
    )
    pu.set_defaults(fn=cmd_purge)

    mg = sub.add_parser(
        "merge",
        help="conditional MERGE INTO (update/delete/insert) from a parquet "
        "source keyed like the table",
    )
    mg.add_argument("--table", required=True)
    mg.add_argument("--src", required=True, help="parquet dir of source rows")
    mg.add_argument(
        "--set",
        action="append",
        metavar="COL=SQL_EXPR",
        help="WHEN MATCHED THEN UPDATE SET col = expr (t./s. namespaces); "
        "repeatable",
    )
    mg.add_argument(
        "--delete-when",
        metavar="SQL_EXPR",
        help="WHEN MATCHED AND expr THEN DELETE (t./s. namespaces)",
    )
    mg.add_argument(
        "--no-insert",
        action="store_true",
        help="drop unmatched source rows instead of inserting them",
    )
    mg.set_defaults(fn=cmd_merge)

    tt = sub.add_parser(
        "ttl",
        help="retention delete: drop rows with event time before a cutoff "
             "(whole files by manifest stats; boundary buckets rewritten)",
    )
    tt.add_argument("--table", required=True)
    tt.add_argument("--older-than", required=True,
                    help="cutoff (ISO timestamp or epoch ms); rows with "
                         "ts strictly before it are deleted, NULL ts kept")
    tt.set_defaults(fn=cmd_ttl)

    mt = sub.add_parser(
        "maintain",
        help="policy-driven compaction + retention from table properties",
    )
    mt.add_argument("--table", required=True)
    mt.add_argument("--dry-run", action="store_true")
    mt.add_argument(
        "--set-property",
        action="append",
        metavar="KEY=VALUE",
        help="set a table property before maintaining (repeatable)",
    )
    mt.set_defaults(fn=cmd_maintain)

    pb = sub.add_parser(
        "publish", help="publish net changes as a replayable change feed"
    )
    pb.add_argument("--table", required=True)
    pb.add_argument("--out", required=True, help="feed directory to append to")
    pb.add_argument(
        "--rebase",
        action="store_true",
        help="publish the full live state as a re-anchor chunk (fresh "
        "replicas start here; vacuum-relay can then drop older chunks)",
    )
    pb.set_defaults(fn=cmd_publish)

    vr = sub.add_parser(
        "vacuum-relay",
        help="drop relay chunks older than the rebase chunk",
    )
    vr.add_argument("--out", required=True, help="relay feed directory")
    vr.set_defaults(fn=cmd_vacuum_relay)

    al = sub.add_parser(
        "alter", help="column DDL: rename/drop/widen (metadata-only)"
    )
    al.add_argument("--table", required=True)
    al.add_argument("--rename", metavar="OLD:NEW")
    al.add_argument("--drop", metavar="COLUMN")
    al.add_argument("--widen", metavar="COLUMN:TYPE")
    al.add_argument("--add", metavar="NAME:TYPE",
                    help="add a column (TYPE may itself contain colons, "
                         "e.g. struct<a:int>)")
    al.add_argument("--default", metavar="SQL",
                    help="with --add: CONSTANT SQL default (Iceberg v3 "
                         "initial/write default) — pre-add rows read it "
                         "with zero rewrite")
    al.set_defaults(fn=cmd_alter)

    rb = sub.add_parser(
        "rebucket", help="rewrite into a new bucket layout (spec evolution)"
    )
    rb.add_argument("--table", required=True)
    rb.add_argument("--num-buckets", type=int, required=True)
    rb.add_argument("--bucket-by", nargs="+", default=None)
    rb.set_defaults(fn=cmd_rebucket)

    lk = sub.add_parser("lookup", help="bucket-pruned key lookup")
    lk.add_argument("--table", required=True)
    lk.add_argument("--conv", nargs="+", required=True,
                    help="conversation id(s) to fetch")
    lk.add_argument("--limit", type=int, default=100)
    lk.add_argument("--as-of", default=None,
                    help="time-travel the lookup: ISO-8601 or epoch ms")
    lk.add_argument("--privileged", action="store_true",
                    help="bypass governance.mask.*/row-filter properties")
    lk.set_defaults(fn=cmd_lookup)

    sq = sub.add_parser(
        "sql",
        help="ad-hoc Spark SQL over the table's clean/_raw views "
        "(the dbt-model read surface)",
    )
    sq.add_argument("--table", required=True)
    sq.add_argument("--view", default="t",
                    help="view name the query refers to (default: t; "
                    "<view>_raw exposes _lsn/_deleted bookkeeping)")
    sq.add_argument("--query", required=True)
    sq.add_argument("--as-of", default=None,
                    help="pin the views to a past state: ISO-8601 or epoch ms")
    sq.add_argument("--ts-from", default=None,
                    help="event-time slice lower bound (ISO-8601 or epoch "
                    "ms, inclusive) — plans only warm files")
    sq.add_argument("--ts-to", default=None,
                    help="event-time slice upper bound (inclusive)")
    sq.add_argument("--privileged", action="store_true",
                    help="bypass governance.mask.*/row-filter table "
                    "properties (the pipeline-operator view)")
    sq.add_argument("--between", action="append", metavar="COL:LO:HI",
                    help="range-slice the views on a stats column "
                    "(repeatable; empty bound = open; files provably "
                    "outside every window are never planned)")
    sq.add_argument("--limit", type=int, default=100)
    sq.add_argument("--json", action="store_true",
                    help="print JSON lines instead of a table")
    sq.set_defaults(fn=cmd_sql)

    gr = sub.add_parser("gold-refresh", help="incremental gold materialization")
    gr.add_argument("--table", required=True)
    gr.add_argument("--gold", required=True)
    gr.add_argument("--model", choices=["summary", "turns"], default="summary",
                    help="aggregate-grain summary or fact-grain turn "
                         "analytics (payment_analytics_detailed analogue)")
    gr.add_argument("--catalog", default=None,
                    help="after the refresh, atomically publish the "
                         "(source@refresh-snapshot, gold@current) pair as "
                         "one catalog version — the consistent read "
                         "surface for downstream SQL")
    gr.add_argument("--catalog-source", default="silver",
                    help="catalog name for the source table")
    gr.add_argument("--catalog-gold", default="gold",
                    help="catalog name for the gold table")
    gr.add_argument("--catalog-retries", type=int, default=4,
                    help="OCC retries on a concurrent catalog publish")
    gr.set_defaults(fn=cmd_gold_refresh)

    v = sub.add_parser("validate", help="run data contracts (dbt-test analogue)")
    v.add_argument("--table", required=True)
    v.set_defaults(fn=cmd_validate)

    ch = sub.add_parser(
        "changes", help="changelog scan between two snapshots (CDF envelope)"
    )
    ch.add_argument("--table", required=True)
    ch.add_argument("--from-snapshot", type=int, default=None)
    ch.add_argument("--to-snapshot", type=int, default=None)
    ch.add_argument("--from-ts", default=None,
                    help="changes since this wall-clock time (ISO or epoch "
                         "ms; resolved via snapshot_as_of)")
    ch.add_argument("--to-ts", default=None,
                    help="upper wall-clock bound (default: current)")
    ch.add_argument("--out", default=None, help="write parquet instead of show")
    ch.add_argument("--limit", type=int, default=50)
    ch.add_argument("--summary", action="store_true",
                    help="print per-change-type row counts as JSON instead "
                         "of the row images (the diff-at-a-glance view)")
    ch.add_argument("--privileged", action="store_true",
                    help="bypass governance.mask.* properties (the row "
                    "filter never hides change events: a hidden DELETE "
                    "would strand rows on consumer replicas)")
    ch.set_defaults(fn=cmd_changes)

    hi = sub.add_parser(
        "history", help="snapshot lineage / file-level metadata tables"
    )
    hi.add_argument("--table", required=True)
    hi.add_argument("--files", action="store_true",
                    help="per-file footer stats (distributed metadata scan) "
                         "instead of the snapshot lineage")
    hi.add_argument("--partitions", action="store_true",
                    help="per-bucket layout health (file count/size/rows/"
                         "key range) instead of the snapshot lineage")
    hi.add_argument("--limit", type=int, default=50)
    hi.set_defaults(fn=cmd_history)

    tg = sub.add_parser(
        "tag", help="create/drop an immutable named snapshot ref (Iceberg tag)"
    )
    tg.add_argument("--table", required=True)
    tg.add_argument("--name", required=True)
    tg.add_argument("--snapshot", type=int, default=None,
                    help="snapshot_id to pin (default: current)")
    tg.add_argument("--drop", action="store_true")
    tg.set_defaults(fn=cmd_tag)

    cl = sub.add_parser(
        "clone",
        help="zero-copy shallow clone (Delta SHALLOW CLONE analogue)",
    )
    cl.add_argument("--table", required=True)
    cl.add_argument("--dest", required=True)
    cl.add_argument("--snapshot", type=int, default=None,
                    help="clone a past snapshot_id (default: current)")
    cl.add_argument("--as-of", default=None,
                    help="clone the state at this wall-clock time "
                         "(ISO-8601 or epoch ms)")
    cl.add_argument("--no-pin", action="store_true",
                    help="skip tagging the source snapshot (source "
                         "retention may then age out referenced files)")
    cl.set_defaults(fn=cmd_clone)

    im = sub.add_parser(
        "import",
        help="zero-copy adoption of an existing parquet dataset (Delta "
             "CONVERT / Iceberg add_files analogue): one metadata commit, "
             "no data read or rewritten; rebucket afterwards to spread",
    )
    im.add_argument("--src", required=True,
                    help="directory of parquet files to adopt in place")
    im.add_argument("--table", required=True)
    im.add_argument("--key", required=True,
                    help="comma-separated key column(s)")
    im.add_argument("--no-validate", action="store_true",
                    help="skip the read-only null/duplicate-key check")
    im.set_defaults(fn=cmd_import)

    ex = sub.add_parser(
        "export",
        help="unload one consistent snapshot as plain parquet for "
             "consumers that don't speak the table format (reverse of "
             "import); governance masks/filter apply unless --privileged",
    )
    ex.add_argument("--table", required=True)
    ex.add_argument("--dest", required=True,
                    help="destination directory (must not exist)")
    ex.add_argument("--as-of", default=None,
                    help="export a past state: ISO-8601 or epoch ms")
    ex.add_argument("--partition-by", default=None,
                    help="comma-separated hive-layout partition column(s)")
    ex.add_argument("--privileged", action="store_true",
                    help="bypass governance.mask.*/row-filter properties")
    ex.add_argument("--between", action="append", metavar="COL:LO:HI",
                    help="range-slice the unload on a stats column "
                    "(repeatable; manifest bounds prune the read)")
    ex.set_defaults(fn=cmd_export)

    bn = sub.add_parser(
        "branch",
        help="named writable branches: create / ff (fast-forward publish) "
             "/ drop / list (Iceberg branch-ref analogue)",
    )
    bn.add_argument("action",
                    choices=["create", "ff", "rebase", "drop", "list"])
    bn.add_argument("--table", required=True)
    bn.add_argument("--name", default=None,
                    help="branch name (required except for list)")
    bn.add_argument("--snapshot", type=int, default=None,
                    help="create: fork a past snapshot_id")
    bn.add_argument("--as-of", default=None,
                    help="create: fork the state at this wall-clock time")
    bn.add_argument("--force", action="store_true",
                    help="drop: discard unpublished branch commits")
    bn.set_defaults(fn=cmd_branch)

    ro = sub.add_parser(
        "rollback", help="roll back to a past snapshot (fence rolls back too)"
    )
    ro.add_argument("--table", required=True)
    ro.add_argument("--snapshot", type=int, required=True,
                    help="target snapshot_id (see history/changes)")
    ro.set_defaults(fn=cmd_rollback)

    e = sub.add_parser("expire", help="expire old snapshots (retention)")
    e.add_argument("--table", required=True)
    e.add_argument("--keep-last", type=int, default=5)
    e.add_argument("--older-than-ms", type=int, default=None)
    e.set_defaults(fn=cmd_expire)

    cp = sub.add_parser(
        "catalog-publish",
        help="atomically pin N tables' snapshots as one catalog version "
             "(consistent multi-table snapshot)",
    )
    cp.add_argument("--catalog", required=True, help="catalog root dir")
    cp.add_argument("--pin", action="append",
                    help="name=table_path[@snapshot_id]; repeatable — all "
                         "pins land in ONE atomic version")
    cp.add_argument("--drop", action="append",
                    help="remove a name from the catalog; repeatable")
    cp.add_argument("--retries", type=int, default=0,
                    help="OCC retries on a concurrent publish")
    cp.set_defaults(fn=cmd_catalog_publish)

    cs = sub.add_parser("catalog-show", help="print a catalog version")
    cs.add_argument("--catalog", required=True)
    cs.add_argument("--version", type=int, default=None)
    cs.add_argument("--as-of", default=None,
                    help="resolve the version live at this wall-clock time "
                         "(ISO-8601 or epoch ms)")
    cs.add_argument("--history", action="store_true")
    cs.set_defaults(fn=cmd_catalog_show)

    cq = sub.add_parser(
        "catalog-sql",
        help="run SQL over every cataloged table pinned at ONE consistent "
             "catalog version",
    )
    cq.add_argument("--catalog", required=True)
    cq.add_argument("--query", required=True)
    cq.add_argument("--version", type=int, default=None)
    cq.add_argument("--as-of", default=None)
    cq.add_argument("--json", action="store_true")
    cq.add_argument("--limit", type=int, default=20)
    cq.set_defaults(fn=cmd_catalog_sql)

    ce = sub.add_parser(
        "catalog-expire",
        help="drop old catalog versions and release their retention pins",
    )
    ce.add_argument("--catalog", required=True)
    ce.add_argument("--keep-last", type=int, default=5)
    ce.set_defaults(fn=cmd_catalog_expire)

    cr = sub.add_parser(
        "catalog-rollback",
        help="re-pin the catalog at a prior retained version (as a new "
             "version; nothing is deleted)",
    )
    cr.add_argument("--catalog", required=True)
    cr.add_argument("--to-version", type=int, required=True)
    cr.add_argument("--retries", type=int, default=0,
                    help="OCC retries against concurrent publishers")
    cr.set_defaults(fn=cmd_catalog_rollback)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
