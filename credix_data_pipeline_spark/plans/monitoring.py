"""Oracle-checked monitoring signals (SURVEY §3.4 — Elementary analogue).

The reference's monitoring job computes freshness + volume-anomaly signals
over pipeline tables (Elementary, credix_pipeline/credix_pipeline/assets/
elementary_assets.py:9-75).  ``streaming/monitoring.py`` runs the same
signals over the engine's lineage sidecar; this module expresses them as a
pure DataFrame plan over the driver's ``events`` table so the capability has
a full rows+schema+hash oracle row.

Shapes: daily volume per event_type, deviation from the type's mean daily
volume in exact integer basis points (``|daily*n − total|·10⁴ DIV total`` —
no float compares, engine-portable), an anomaly flag at ≥25 %, and per-type
freshness as whole hours behind the global high-water timestamp.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

VOLUME_DEV_BP = 2500   # flag days deviating ≥ 25% from the type's daily mean
STALE_HOURS = 6        # flag types whose last event trails the max by ≥ 6 h


def q_volume_anomaly_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("daily_events"),
        F.max("ts").alias("day_max_ts"),
    )
    stats = daily.groupBy("event_type").agg(
        F.sum("daily_events").alias("type_total"),
        F.count(F.lit(1)).alias("n_days"),
        F.max("day_max_ts").alias("type_max_ts"),
    )
    glob = ev.agg(F.max("ts").alias("global_max_ts"))
    j = daily.join(F.broadcast(stats), "event_type").crossJoin(F.broadcast(glob))
    dev_bp = F.expr(
        "abs(daily_events * n_days - type_total) * 10000 DIV type_total"
    ).alias("dev_bp")
    hours_behind = F.expr(
        "(unix_timestamp(global_max_ts) - unix_timestamp(type_max_ts)) DIV 3600"
    ).alias("hours_behind")
    return j.select(
        "event_type",
        "day",
        "daily_events",
        "type_total",
        "n_days",
        dev_bp,
        hours_behind,
    ).withColumns(
        {
            "is_volume_anomaly": F.col("dev_bp") >= F.lit(VOLUME_DEV_BP),
            "is_stale": F.col("hours_behind") >= F.lit(STALE_HOURS),
        }
    )


SQL_VOLUME_ANOMALY_MONITOR = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         COUNT(*) AS daily_events, MAX(ts) AS day_max_ts
  FROM events GROUP BY 1, 2
),
stats AS (
  -- CAST: DuckDB SUM(BIGINT) is HUGEINT; the hash compare is type-exact
  SELECT event_type, CAST(SUM(daily_events) AS BIGINT) AS type_total,
         COUNT(*) AS n_days, MAX(day_max_ts) AS type_max_ts
  FROM daily GROUP BY 1
),
gm AS (SELECT MAX(ts) AS global_max_ts FROM events)
SELECT d.event_type, d.day, d.daily_events,
       s.type_total, s.n_days,
       ABS(d.daily_events * s.n_days - s.type_total) * 10000 // s.type_total
         AS dev_bp,
       (CAST(FLOOR(epoch(g.global_max_ts)) AS BIGINT)
        - CAST(FLOOR(epoch(s.type_max_ts)) AS BIGINT)) // 3600
         AS hours_behind,
       ABS(d.daily_events * s.n_days - s.type_total) * 10000 // s.type_total
         >= {VOLUME_DEV_BP} AS is_volume_anomaly,
       (CAST(FLOOR(epoch(g.global_max_ts)) AS BIGINT)
        - CAST(FLOOR(epoch(s.type_max_ts)) AS BIGINT)) // 3600
         >= {STALE_HOURS} AS is_stale
FROM daily d JOIN stats s USING (event_type) CROSS JOIN gm g
"""

MONITOR_QUERIES = {
    "volume_anomaly_monitor": (q_volume_anomaly_monitor, SQL_VOLUME_ANOMALY_MONITOR),
}
