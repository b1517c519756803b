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
"""

from __future__ import annotations

from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse.table import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean

ACCEPTED_ROLES = ("user", "assistant", "system", "tool")


def validate(table: LakeTable) -> dict:
    """Run the transcript contracts; returns violation counts per rule."""
    snap = table.current()
    df = read_clean(table)

    # composite-key uniqueness (dbt unique_combination_of_columns analogue):
    # one hash-agg, count of keys seen more than once
    dup_keys = (
        df.groupBy(*snap.key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )

    # every row-level rule in a single aggregation pass
    checks = {
        "not_null_conv_id": F.col("conv_id").isNull(),
        "not_null_turn_idx": F.col("turn_idx").isNull(),
        "not_null_lsn": F.col("_lsn").isNull(),
        "accepted_role": ~(
            F.col("role").isNull() | F.col("role").isin(*ACCEPTED_ROLES)
        ),
        "non_negative_turn_idx": F.col("turn_idx") < 0,
    }
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
