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
    engagement score, activity tier.

    Rounding is exact-integer HALF_UP (the ``(2·num·10⁴ + den) div (2·den)``
    form, same as ``gold_customer_summary``) so the DuckDB oracle for the
    transcript e2e pipeline reproduces every value bit-for-bit — float
    ``ROUND`` semantics differ across engines on representation ties.
    """
    agg = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("turns"),
        F.count(F.when(F.col("role") == "user", 1)).alias("user_turns"),
        F.count(F.when(F.col("role") == "assistant", 1)).alias("assistant_turns"),
        F.count(F.when(F.col("role") == "tool", 1)).alias("tool_turns"),
        F.count(F.when(F.col("role") == "system", 1)).alias("system_turns"),
        F.sum(F.length("text")).alias("_sum_len"),
        F.count("text").alias("_cnt_len"),
        F.max("ts").alias("last_activity"),
        F.min("ts").alias("first_activity"),
        F.max("_lsn").alias("max_lsn"),
    )
    out = (
        agg.withColumn(
            "avg_text_len",
            F.expr(
                "CASE WHEN _cnt_len > 0 THEN"
                " ((_sum_len*20000 + _cnt_len) div (2*_cnt_len)) / 10000.0D"
                " END"
            ),
        )
        .withColumn(
            "_tr_i",
            F.expr(
                "CASE WHEN turns > 0 THEN"
                " (tool_turns*2000000 + turns) div (2*turns) ELSE 0 END"
            ),
        )
        .withColumn("tool_rate", F.expr("_tr_i / 10000.0D"))
        # 0.4·tool_rate + 0.3·(assistant? 100:0) + 0.3·min(10·turns, 100),
        # evaluated exactly as (4·tr_i + 30000·(ind + cap) + 5) div 10 over
        # a ×10⁵ integer basis, then HALF_UP to 4 dp
        .withColumn(
            "engagement_score",
            F.expr(
                "GREATEST(0.0D, LEAST(100.0D, ((4*_tr_i + 30000*("
                " (CASE WHEN assistant_turns > 0 THEN 100 ELSE 0 END)"
                " + LEAST(10*turns, 100)) + 5) div 10) / 10000.0D))"
            ),
        )
        .withColumn(
            "activity_tier",
            F.when(F.col("turns") >= 8, "HEAVY")
            .when(F.col("turns") >= 4, "ACTIVE")
            .when(F.col("turns") >= 2, "LIGHT")
            .otherwise("MINIMAL"),
        )
    )
    return out.select(
        "conv_id",
        "turns",
        "user_turns",
        "assistant_turns",
        "tool_turns",
        "system_turns",
        "avg_text_len",
        "last_activity",
        "first_activity",
        "max_lsn",
        "tool_rate",
        "engagement_score",
        "activity_tier",
    )


def turn_analytics(transcripts: DataFrame) -> DataFrame:
    """Per-turn detailed record — the second gold model, at the FACT grain.

    Mirrors the reference's ``payment_analytics_detailed.sql`` shape
    (dbt/business_case/models/gold/payment_analytics_detailed.sql:90-150):
    an incremental model keyed on the fact's composite key, with derived
    COALESCE columns, date-part extracts, and banded CASE ladders.  The
    conversation summary is the AGGREGATE-grain gold model; this one keeps
    row grain so the incremental MERGE maps 1:1 onto source turns.
    """
    tlen = F.length("text")
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.coalesce(F.col("tool"), F.lit("none")).alias("tool_used"),
        tlen.alias("text_len"),
        F.when(tlen.isNull(), "EMPTY")
        .when(tlen >= 40, "LONG")
        .when(tlen >= 20, "MEDIUM")
        .otherwise("SHORT")
        .alias("len_band"),
        (F.col("role") == F.lit("tool")).alias("is_tool_turn"),
        F.year("ts").alias("ts_year"),
        F.month("ts").alias("ts_month"),
        F.hour("ts").alias("ts_hour"),
        F.col("_lsn").alias("src_lsn"),
    )


def role_mix_report(transcripts: DataFrame) -> DataFrame:
    """Accepted-values contract surface (role ∈ user/assistant/system/tool)
    + share per role — the dbt accepted_values analogue as a query.

    Single pass: the total grosses up from the per-role counts via an
    unpartitioned window over the ALREADY-AGGREGATED rows (≤ #distinct
    roles, a handful) — no separate ``count()`` job over the full table
    (VERDICT r3 nit #1)."""
    from pyspark.sql import Window

    agg = transcripts.groupBy("role").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return agg.withColumn(
        "share_pct",
        F.round(F.col("n") * 100.0 / F.greatest(total, F.lit(1)), 4),
    ).withColumn(
        "is_valid_role",
        F.col("role").isin("user", "assistant", "system", "tool")
        | F.col("role").isNull(),
    )
