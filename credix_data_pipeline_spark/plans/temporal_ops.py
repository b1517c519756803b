"""Temporal join operators over the driver testdata (SURVEY §2 extras).

Three operators the brief names explicitly and the reference's dbt/SQL
layer has no native word for — each re-expressed Spark-first with a
DuckDB-runnable oracle (the as-of oracle uses DuckDB's NATIVE ``ASOF
JOIN``, so the two engines compute the semantics through genuinely
different implementations):

* ``asof_join_last_purchase`` — point-in-time join: every click event
  picks up the latest prior-or-equal purchase by the same user (the
  quote→trade / feature-backfill shape).  Spark has no AsOf join node;
  an inequality join would plan BroadcastNestedLoop (O(n·m) — a scale
  killer).  The scale path here is the UNION + forward-fill pattern:
  tag both streams, ONE shuffle on ``user_id``, and a running
  ``last(..., ignorenulls=True)`` window carries each purchase forward
  to the clicks that follow it.  Cost is sort-within-partition — the
  same as any windowed agg — and it never materializes candidate pairs.
* ``scd2_user_state`` — change-data-to-dimension: compress each user's
  event-type stream into SCD Type-2 validity ranges (``valid_from`` /
  ``valid_to`` / ``is_current``), collapsing consecutive repeats so only
  genuine transitions mint a version.  Two windows over one ``user_id``
  shuffle (lag to detect change, lead over the survivors for the range
  end) — the standard warehouse build of a slowly-changing dimension
  from a CDC change stream.
* ``range_join_incident_window`` — interval join: every error event
  opens a 10-minute incident window; count/sum the same user's events
  inside it.  A raw ``l.s <= r.s < l.s+600`` join is again BNLJ; the
  scale path buckets time into window-sized grains — each event carries
  ONE grain key, each incident explodes to its (at most two) covered
  grains — so the join is a keyed equi-join on ``(user_id, grain)``
  whose candidate volume is bounded by grain co-residency, with the
  exact range predicate applied to candidates only (the same
  bucket-then-verify discipline as the dedup/ANN family).

Window semantics are defined in WHOLE SECONDS (``unix_timestamp`` /
``FLOOR(epoch(ts))`` on both sides) so the boundary math is identical
across engines despite microsecond timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# As-of join (point-in-time): clicks pick up the latest prior purchase.
# ---------------------------------------------------------------------------
def q_asof_join_last_purchase(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")

    # Tag and union the two streams.  At equal ts the purchase sorts FIRST
    # (is_right desc) so "prior-or-equal" matches DuckDB ASOF's `>=`;
    # event_id breaks any residual tie deterministically.
    r = purchases.select(
        "user_id",
        "ts",
        F.col("event_id").alias("tie_id"),
        F.lit(1).alias("is_right"),
        F.col("event_id").alias("p_eid"),
        F.col("value").alias("p_val"),
        F.col("ts").alias("p_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    l = clicks.select(
        "user_id",
        "ts",
        F.col("event_id").alias("tie_id"),
        F.lit(0).alias("is_right"),
        F.lit(None).cast("long").alias("p_eid"),
        F.lit(None).cast("double").alias("p_val"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        "event_id",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_right"), "tie_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ff = (
        r.unionByName(l)
        .withColumn("last_purchase_id", F.last("p_eid", ignorenulls=True).over(w))
        .withColumn("last_purchase_value", F.last("p_val", ignorenulls=True).over(w))
        .withColumn("last_purchase_ts", F.last("p_ts", ignorenulls=True).over(w))
    )
    return ff.filter(F.col("is_right") == 0).select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
        "last_purchase_id",
        F.round("last_purchase_value", 4).alias("last_purchase_value"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp("last_purchase_ts")
        ).alias("secs_since_purchase"),
    )


SQL_ASOF_JOIN_LAST_PURCHASE = """
SELECT l.event_id,
       l.user_id,
       l.ts AS click_ts,
       l.value AS click_value,
       r.event_id AS last_purchase_id,
       ROUND(r.value, 4) AS last_purchase_value,
       CAST(FLOOR(epoch(l.ts)) - FLOOR(epoch(r.ts)) AS BIGINT) AS secs_since_purchase
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# ---------------------------------------------------------------------------
# SCD Type 2 from a change stream: per-user event_type validity ranges.
# ---------------------------------------------------------------------------
def q_scd2_user_state(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_state", F.lag("event_type").over(w))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return (
        changes.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("version_no", F.row_number().over(w2).cast("long"))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            "user_id", "state", "valid_from", "valid_to", "version_no", "is_current"
        )
    )


SQL_SCD2_USER_STATE = """
WITH changes AS (
  SELECT user_id, event_type AS state, ts AS valid_from, event_id
  FROM (
    SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS prev_state
    FROM events
  )
  WHERE prev_state IS NULL OR prev_state <> state
)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER w AS valid_to,
       CAST(row_number() OVER w AS BIGINT) AS version_no,
       (lead(valid_from) OVER w IS NULL) AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
"""


# ---------------------------------------------------------------------------
# Range (interval) join: events inside each error's 10-minute window.
# ---------------------------------------------------------------------------
GRAIN_S = 600  # grain == window length ⇒ a window spans at most 2 grains


def q_range_join_incident_window(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    ev = e.select(
        "event_id",
        "user_id",
        "value",
        F.unix_timestamp("ts").alias("s"),
    ).withColumn("grain", F.floor(F.col("s") / GRAIN_S))

    inc = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("ts").alias("inc_ts"),
        F.unix_timestamp("ts").alias("s0"),
    )
    # Each candidate event lives in exactly ONE grain, so exploding the
    # incident to its two covered grains cannot duplicate a matched pair.
    g0 = F.floor(F.col("s0") / GRAIN_S)
    probes = inc.withColumn("grain", F.explode(F.array(g0, g0 + 1)))
    matched = (
        probes.join(ev, ["user_id", "grain"])
        .filter(
            (F.col("s") >= F.col("s0"))
            & (F.col("s") < F.col("s0") + GRAIN_S)
            & (F.col("event_id") != F.col("incident_id"))
        )
        .groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).alias("n_events_in_window"),
            F.round(F.sum("value"), 4).alias("window_value"),
        )
    )
    return (
        inc.join(matched, "incident_id", "left")
        .select(
            "incident_id",
            "user_id",
            "inc_ts",
            F.coalesce("n_events_in_window", F.lit(0)).alias("n_events_in_window"),
            F.coalesce("window_value", F.lit(0.0)).alias("window_value"),
        )
    )


SQL_RANGE_JOIN_INCIDENT_WINDOW = """
WITH inc AS (
  SELECT event_id AS incident_id, user_id, ts AS inc_ts,
         FLOOR(epoch(ts)) AS s0
  FROM events WHERE event_type = 'error'
), ev AS (
  SELECT event_id, user_id, value, FLOOR(epoch(ts)) AS s FROM events
)
SELECT i.incident_id, i.user_id, i.inc_ts,
       COUNT(e.event_id) AS n_events_in_window,
       ROUND(COALESCE(SUM(e.value), 0.0), 4) AS window_value
FROM inc i
LEFT JOIN ev e
  ON e.user_id = i.user_id
 AND e.s >= i.s0 AND e.s < i.s0 + 600
 AND e.event_id <> i.incident_id
GROUP BY 1, 2, 3
"""


TEMPORAL_QUERIES = {
    "asof_join_last_purchase": (
        q_asof_join_last_purchase,
        SQL_ASOF_JOIN_LAST_PURCHASE,
    ),
    "scd2_user_state": (q_scd2_user_state, SQL_SCD2_USER_STATE),
    "range_join_incident_window": (
        q_range_join_incident_window,
        SQL_RANGE_JOIN_INCIDENT_WINDOW,
    ),
}
