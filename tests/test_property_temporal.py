"""Property-based temporal joins: Hypothesis generates event streams with
COLLIDING timestamps — which the driver testdata never produces — so the
tie semantics the docstrings promise are actually pinned:

* as-of: a purchase AT the click's timestamp counts ("prior or equal");
  among several purchases sharing the winning timestamp, the max event_id
  wins (the documented deterministic tie-break).
* range join: the window is [s0, s0 + GRAIN_S) in whole seconds, the
  incident itself never self-matches, and grain-boundary straddles are
  exercised by construction (timestamps draw from a range wider than one
  grain).

Both compare the REAL Spark plan against a ten-line pure-Python oracle —
independent of the DuckDB formulations in the parity gate."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from credix_data_pipeline_spark.plans.temporal_ops import (
    GRAIN_S,
    q_asof_join_last_purchase,
    q_range_join_incident_window,
)

# (user_id, epoch_s, event_type) — tiny user space + a ts range spanning
# several grains forces collisions, same-second pairs, and boundary hits.
EVENT = st.tuples(
    st.integers(0, 2),
    st.integers(0, 3 * GRAIN_S),
    st.sampled_from(["click", "purchase", "error", "view"]),
)


def _write(spark, path, events):
    df = spark.createDataFrame(
        [
            (i, uid, s, typ, float(i) + 0.25)
            for i, (uid, s, typ) in enumerate(events)
        ],
        "event_id long, user_id long, s long, event_type string, value double",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_seconds("s").alias("ts"),
        "event_type",
        "value",
    )
    df.write.mode("overwrite").parquet(path + "/events.parquet")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(EVENT, min_size=1, max_size=30))
def test_asof_tie_semantics(spark, tmp_path_factory, events):
    path = str(tmp_path_factory.mktemp("asof"))
    _write(spark, path, events)
    got = {
        r.event_id: r.last_purchase_id
        for r in q_asof_join_last_purchase(spark, path).collect()
    }
    want = {}
    for i, (uid, s, typ) in enumerate(events):
        if typ != "click":
            continue
        prior = [
            (ps, j)
            for j, (pu, ps, pt) in enumerate(events)
            if pt == "purchase" and pu == uid and ps <= s
        ]
        want[i] = max(prior)[1] if prior else None
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(EVENT, min_size=1, max_size=30))
def test_range_join_boundaries(spark, tmp_path_factory, events):
    path = str(tmp_path_factory.mktemp("range"))
    _write(spark, path, events)
    got = {
        r.incident_id: r.n_events_in_window
        for r in q_range_join_incident_window(spark, path).collect()
    }
    want = {}
    for i, (uid, s, typ) in enumerate(events):
        if typ != "error":
            continue
        want[i] = sum(
            1
            for j, (eu, es, _et) in enumerate(events)
            if j != i and eu == uid and s <= es < s + GRAIN_S
        )
    assert got == want
