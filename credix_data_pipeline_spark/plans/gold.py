"""Gold analytics over the transcripts table (SURVEY §3.2 engine mapping).

Reproduces the reference's gold *shapes* — group-agg with conditional
aggregates (A1–A8), guarded ratios (F13), banded CASE classifications (F11),
clamped weighted score (F12), broadcast left join (J1/J2) — over the CDC
target, proving the engine's output is directly queryable.

Reference models mirrored: dbt/business_case/models/gold/
company_payment_summary.sql (CTE chain: aggregate → guarded ratios → risk
scoring → joined final) and payment_analytics_detailed.sql (banded ladders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def conversation_summary(transcripts: DataFrame) -> DataFrame:
    """Per-conversation rollup: turn counts by role, tool-usage rate,
    engagement score, activity tier."""
    agg = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("turns"),
        F.count(F.when(F.col("role") == "user", 1)).alias("user_turns"),
        F.count(F.when(F.col("role") == "assistant", 1)).alias("assistant_turns"),
        F.count(F.when(F.col("role") == "tool", 1)).alias("tool_turns"),
        F.count(F.when(F.col("role") == "system", 1)).alias("system_turns"),
        F.round(F.avg(F.length("text")), 4).alias("avg_text_len"),
        F.max("ts").alias("last_activity"),
        F.min("ts").alias("first_activity"),
        F.max("_lsn").alias("max_lsn"),
    )
    ratio = F.round(
        F.when(F.col("turns") > 0, F.col("tool_turns") * 100.0 / F.col("turns"))
        .otherwise(0.0),
        4,
    )
    out = agg.withColumn("tool_rate", ratio)
    score = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(100.0),
            F.round(
                0.4 * F.col("tool_rate")
                + 0.3
                * F.when(F.col("assistant_turns") > 0, 100.0).otherwise(0.0)
                + 0.3 * F.least(F.col("turns").cast("double") * 10.0, F.lit(100.0)),
                4,
            ),
        ),
    )
    out = out.withColumn("engagement_score", score)
    return out.withColumn(
        "activity_tier",
        F.when(F.col("turns") >= 8, "HEAVY")
        .when(F.col("turns") >= 4, "ACTIVE")
        .when(F.col("turns") >= 2, "LIGHT")
        .otherwise("MINIMAL"),
    )


def role_mix_report(transcripts: DataFrame) -> DataFrame:
    """Accepted-values contract surface (role ∈ user/assistant/system/tool)
    + share per role — the dbt accepted_values analogue as a query."""
    total = transcripts.count()
    return (
        transcripts.groupBy("role")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "share_pct",
            F.round(F.col("n") * 100.0 / F.lit(max(total, 1)), 4),
        )
        .withColumn(
            "is_valid_role",
            F.col("role").isin("user", "assistant", "system", "tool")
            | F.col("role").isNull(),
        )
    )
