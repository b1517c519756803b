"""Data-contract validation (SURVEY §5.1 — the dbt schema-test surface).

The reference's only executable correctness checks are dbt schema tests:
``unique``/``not_null`` on key columns, ``accepted_values`` on categories,
and a composite-key uniqueness test
(dbt/business_case/models/silver/schema.yml:9-11,26-29,66-78), run inside
``dbt build``.  The engine ships the same contracts as an operational
surface — ``validate(table)`` returns per-rule violation counts computed in
ONE aggregation pass over the clean table (a 100 TB validation must not
scan once per rule), and ``main.py validate`` exits non-zero on violations
so schedulers can gate downstream jobs exactly like ``dbt build`` does.

Rule sets are per table shape — the silver transcripts table and the gold
summary table each get the contracts the reference declares for the
corresponding dbt model (silver/schema.yml vs gold/schema.yml) — selected
automatically from the table's columns, like dbt matching tests to models.
``main.py replay --validate`` runs the gate in-line after ingestion, the
``dbt build`` (run + test in one invocation) analogue.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from credix_data_pipeline_spark.lakehouse.table import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean

ACCEPTED_ROLES = ("user", "assistant", "system", "tool")
ACCEPTED_TIERS = ("HEAVY", "ACTIVE", "LIGHT", "MINIMAL")


def transcript_checks() -> dict[str, Column]:
    """Row-level contracts for the silver transcripts table (each Column is
    TRUE iff the row VIOLATES the rule)."""
    return {
        "not_null_conv_id": F.col("conv_id").isNull(),
        "not_null_turn_idx": F.col("turn_idx").isNull(),
        "not_null_lsn": F.col("_lsn").isNull(),
        "accepted_role": ~(
            F.col("role").isNull() | F.col("role").isin(*ACCEPTED_ROLES)
        ),
        "non_negative_turn_idx": F.col("turn_idx") < 0,
    }


def gold_summary_checks() -> dict[str, Column]:
    """Contracts for the gold conversation-summary table (the reference's
    gold schema.yml shape: not-null key, accepted tier, bounded scores)."""
    return {
        "not_null_conv_id": F.col("conv_id").isNull(),
        "accepted_activity_tier": ~F.col("activity_tier").isin(*ACCEPTED_TIERS),
        "positive_turns": F.col("turns") <= 0,
        "role_counts_sum_to_turns": (
            F.col("user_turns")
            + F.col("assistant_turns")
            + F.col("tool_turns")
            + F.col("system_turns")
        )
        != F.col("turns"),
        "tool_rate_range": (F.col("tool_rate") < 0) | (F.col("tool_rate") > 100),
        "engagement_score_range": (F.col("engagement_score") < 0)
        | (F.col("engagement_score") > 100),
    }


def checks_for(columns: list[str]) -> dict[str, Column]:
    if "turns" in columns and "engagement_score" in columns:
        return gold_summary_checks()
    return transcript_checks()


def validate(table: LakeTable) -> dict:
    """Run the table's contracts; returns violation counts per rule."""
    snap = table.current()
    cols = [f.name for f in snap.schema.fields]
    # gold tables carry no tombstone column; silver reads filter tombstones
    df = read_clean(table) if "_deleted" in cols else table.read()
    return validate_df(df, snap.key)


def validate_df(df, key: list[str]) -> dict:
    """The contract pass over an explicit DataFrame — the same single-scan
    aggregation, reusable against a *staged* (write-audit-publish)
    snapshot's dirty-bucket post-image before publish.  Because the table is
    hash-bucketed by key, every per-key rule (uniqueness, not-null key,
    accepted values) is decidable on the dirty buckets alone — the audit is
    O(changed data), never O(table)."""
    cols = df.columns

    # composite-key uniqueness (dbt unique_combination_of_columns analogue):
    # one hash-agg, count of keys seen more than once
    dup_keys = (
        df.groupBy(*key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )

    # every row-level rule in a single aggregation pass
    checks = checks_for(cols)
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in checks.items()
        ],
    ).first()

    violations = {name: int(row[name] or 0) for name in checks}
    violations["unique_key"] = dup_keys
    return {
        "rows": int(row["rows"] or 0),
        "violations": violations,
        "passed": all(v == 0 for v in violations.values()),
    }
