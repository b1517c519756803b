"""Canonical schemas (SURVEY §1, FIXTURES.md).

The reference declares schemas externally (Terraform
``terraform/modules/bigquery/bigquery_tables.tf:3-187``) and enforces them at
load time (``credix_pipeline/resources/gcp_resource.py:121-131``).  The engine
does the same: explicit StructTypes, never inference in the hot path.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Target table: multi-turn conversation / agent transcripts (input_hint).
# `_lsn` is engine-maintained: LSN of the last applied event per row, needed
# for cross-batch last-writer-wins (SURVEY §7.3b) — an incoming event only
# wins if its lsn exceeds the stored one.  `_deleted` is the tombstone marker:
# deletes are retained as tombstone rows (payload NULL, `_lsn` = delete LSN)
# so a *late* lower-LSN update arriving in a later micro-batch cannot
# resurrect a deleted turn; the public read filters tombstones out and
# ``compact`` can expire them past the reorder horizon.
# ---------------------------------------------------------------------------
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)

TRANSCRIPT_KEY = ["conv_id", "turn_idx"]

# ---------------------------------------------------------------------------
# Change-event envelope + payload: the engine's front door.  Plays the role of
# the reference's Datastream Avro change files (ordered, op + source position;
# terraform/modules/datastream/datastream_streams.tf:66-79).
# ---------------------------------------------------------------------------
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # I | U | D
        T.StructField("lsn", T.LongType(), False),  # globally monotone, unique
        T.StructField("commit_ts", T.TimestampType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Mid-stream evolution adds this column (FIXTURES §2): events after the
# switch-point carry tool metadata.  The engine must add it to the target
# in-flight (SURVEY §2.8 evolution row).
EVOLVED_COLUMN = T.StructField("tool_meta", T.StringType(), True)

# ``patch_cols`` is envelope, not payload: a PARTIAL-update event (op="P",
# the Postgres-TOAST / Debezium unavailable-column reality — an UPDATE whose
# row image carries only the changed columns) lists the columns it actually
# sets; every other payload column in the event means "unchanged", not
# "set to NULL".  The column never reaches the target schema.
ENVELOPE_COLS = ["op", "lsn", "commit_ts", "patch_cols"]

# ---------------------------------------------------------------------------
# Lineage sidecar (FIXTURES §3) — mirrors the reference's per-run Dagster
# metadata (records_extracted / max watermark / gcs_uri,
# credix_pipeline/utils/cdc_helpers.py:29-38) as a queryable table, and is the
# fencing ledger for exactly-once (batch_id -> snapshot_id).
# ---------------------------------------------------------------------------
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("lsn_min", T.LongType(), True),
        T.StructField("lsn_max", T.LongType(), True),
        T.StructField("snapshot_id", T.LongType(), True),
        T.StructField("rows_applied", T.LongType(), True),
        T.StructField("rows_deduped", T.LongType(), True),
        T.StructField("rows_quarantined", T.LongType(), True),
        T.StructField("partition_stats", T.StringType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("note", T.StringType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)


def payload_fields(change_schema: T.StructType) -> list[T.StructField]:
    """Payload = everything outside the CDC envelope (op/lsn/commit_ts)."""
    return [f for f in change_schema.fields if f.name not in ENVELOPE_COLS]


# `_seq` exists only on merge-on-read tables: the batch ordinal persisted
# with each delta row, the LWW tie-break on `_lsn` ties (ADVICE r2).
# `_col_lsn` exists only on tables that have seen PARTIAL-update (patch)
# events: a SPARSE per-column version map {column -> lsn} holding entries
# ONLY where a column's last-set LSN differs from the row's `_lsn` (a full
# event resets every column to the row LSN, so the map is NULL on the vast
# majority of rows).  It is what makes column-level LWW exact under
# cross-batch reordering: a late patch must lose against a column set
# AFTER it but win against one set BEFORE it, which the row-level `_lsn`
# alone cannot distinguish.
ENGINE_COLS = ["_lsn", "_deleted", "_seq", "_col_lsn"]


def target_schema_for(change_schema: T.StructType) -> T.StructType:
    """Target-table schema implied by a change schema: payload + engine cols.

    This is the schema-evolution contract: when the feed grows a column, the
    target grows the same column (nullable), old rows read as NULL.
    """
    fields = payload_fields(change_schema)
    return T.StructType(
        [
            *fields,
            T.StructField("_lsn", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
    )
