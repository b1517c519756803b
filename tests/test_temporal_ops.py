"""Semantic tests for the temporal join operators (plans/temporal_ops.py).

The oracle-parity gate (test_oracle_parity.py) already pins each query
against its DuckDB formulation; these tests pin the SEMANTICS against
independent brute-force recomputes and structural invariants, so an
oracle that drifted in the same direction as the plan would still fail.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark.plans.temporal_ops import (
    GRAIN_S,
    q_asof_join_last_purchase,
    q_range_join_incident_window,
    q_scd2_user_state,
    t,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    rows = t(spark, SF, "events").collect()
    return sorted(rows, key=lambda r: (r.ts, r.event_id))


def test_asof_matches_bruteforce(spark, events):
    got = {
        r.event_id: (r.last_purchase_id, r.secs_since_purchase)
        for r in q_asof_join_last_purchase(spark, SF).collect()
    }
    clicks = [r for r in events if r.event_type == "click"]
    assert len(got) == len(clicks) > 0
    any_match = False
    for c in clicks:
        prior = [
            p
            for p in events
            if p.event_type == "purchase"
            and p.user_id == c.user_id
            and p.ts <= c.ts
        ]
        if prior:
            best = max(prior, key=lambda p: (p.ts, p.event_id))
            want = (
                best.event_id,
                int(c.ts.timestamp()) - int(best.ts.timestamp()),
            )
            any_match = True
        else:
            want = (None, None)
        assert got[c.event_id] == want, c.event_id
    assert any_match  # the fixture data must exercise the matched branch


def test_scd2_invariants(spark, events):
    out = q_scd2_user_state(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == {r.user_id for r in events}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r.version_no)
        # versions are 1..n, ranges chain exactly (no gap, no overlap),
        # exactly one open current row, and no consecutive repeat states
        assert [r.version_no for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state
            assert not a.is_current
        assert rows[-1].is_current and rows[-1].valid_to is None
        # the version stream is the run-length-compressed event stream
        seq = [r.event_type for r in events if r.user_id == uid]
        compressed = [s for i, s in enumerate(seq) if i == 0 or seq[i - 1] != s]
        assert [r.state for r in rows] == compressed


def test_range_join_matches_bruteforce(spark, events):
    got = {
        r.incident_id: (r.n_events_in_window, round(r.window_value, 4))
        for r in q_range_join_incident_window(spark, SF).collect()
    }
    errors = [r for r in events if r.event_type == "error"]
    assert len(got) == len(errors) > 0
    nonzero = 0
    for inc in errors:
        s0 = int(inc.ts.timestamp())
        inside = [
            e
            for e in events
            if e.user_id == inc.user_id
            and e.event_id != inc.event_id
            and s0 <= int(e.ts.timestamp()) < s0 + GRAIN_S
        ]
        want = (len(inside), round(sum(e.value for e in inside), 4))
        assert got[inc.event_id] == want, inc.event_id
        nonzero += bool(inside)
    assert nonzero  # fixture data exercises non-empty windows


def test_no_nested_loop_joins(spark):
    """The scale contract: neither temporal join may plan a cartesian /
    BroadcastNestedLoop — the as-of is a single-shuffle window, the range
    join a keyed equi-join on (user_id, grain)."""
    for fn in (q_asof_join_last_purchase, q_range_join_incident_window):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_range_join_window_straddles_grain(spark):
    """An incident whose window crosses a grain boundary must still see
    events in the NEXT grain (the explode-to-two-grains path)."""
    df = spark.createDataFrame(
        [
            # incident at 599s: window [599, 1199) straddles grain 0 → 1
            (1, 7, "1970-01-01 00:09:59", "error", 1.0),
            (2, 7, "1970-01-01 00:10:01", "click", 2.5),  # grain 1, inside
            (3, 7, "1970-01-01 00:19:58", "view", 4.0),  # 1198s, inside
            (4, 7, "1970-01-01 00:19:59", "view", 8.0),  # 1199s, OUTSIDE
            (5, 8, "1970-01-01 00:10:01", "click", 16.0),  # other user
        ],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    import os

    path = "/tmp/temporal_grain_case"
    df.write.mode("overwrite").parquet(os.path.join(path, "events.parquet"))
    out = q_range_join_incident_window(spark, path).collect()
    assert len(out) == 1
    assert out[0].n_events_in_window == 2
    assert out[0].window_value == 6.5
