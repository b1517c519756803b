"""Property-based stream_ddl lifecycle (the SS analogue of
test_property_relay's DDL-mix property).

Hypothesis drives arbitrary interleavings of upstream batches, DDL
(rename chains / key widen / drop), normal publishes, REBASE publishes,
vacuums, and replica drains (``runner.stream_ddl`` at arbitrary points in
the feed's life).  The replica must converge to the upstream layout and
values for every interleaving — and when a vacuum provably dropped a span
the replica never consumed, ``stream_ddl`` must raise the documented
behind-the-horizon error, after which a FRESH replica bootstrapped at the
rebase chunk converges.  This is the property form of the round-4 review
findings: progress markers keyed by mutable segment boundaries silently
skipped merged segments and wedged rebase bootstraps.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings, strategies as st

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch
from credix_data_pipeline_spark.operators.relay import (
    publish_changes,
    vacuum_relay,
)
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for
from credix_data_pipeline_spark.streaming import runner
from tests.test_property_relay import (
    DDL_LADDER,
    EVENT,
    _apply_upstream_ddl,
    _clean_state,
    _layout_state,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=1, max_size=24),
    n_batches=st.integers(1, 4),
    ddl_mask=st.integers(0, 15),      # bit b: DDL_LADDER[b] after batch b
    publish_mask=st.integers(0, 15),  # bit b: publish after batch b
    rebase_mask=st.integers(0, 15),   # bit b: that publish is a rebase
    vacuum_mask=st.integers(0, 15),   # bit b: vacuum right after publish
    drain_mask=st.integers(0, 15),    # bit b: replica drains after batch b
)
def test_stream_ddl_replica_converges_under_any_lifecycle(
    spark, tmp_path, events, n_batches,
    ddl_mask, publish_mask, rebase_mask, vacuum_mask, drain_mask,
):
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (op, lsn, base, f"c{conv}", turn,
         None if op == "D" else "user",
         None if op == "D" else text,
         None, None if op == "D" else base)
        for lsn, (conv, turn, op, text) in enumerate(events, start=1)
    ]
    run = uuid.uuid4().hex
    up = LakeTable.create(
        spark,
        str(tmp_path / f"ups-{run}"),
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
    )
    relay = str(tmp_path / f"relays-{run}")
    gen = [0]

    def _replica_path() -> str:
        return str(tmp_path / f"downs-{run}-{gen[0]}")

    published = [False]

    def _drain() -> None:
        if not published[0]:
            return
        try:
            runner.stream_ddl(spark, relay, _replica_path(), num_buckets=2)
        except RuntimeError as e:
            # only the documented behind-the-horizon refusal is allowed;
            # re-bootstrap a fresh replica at the rebase chunk
            assert "vacuumed" in str(e)
            gen[0] += 1
            runner.stream_ddl(spark, relay, _replica_path(), num_buckets=2)

    per = max(1, -(-len(rows) // n_batches))
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            df = spark.createDataFrame(list(reversed(chunk)), CHANGE_SCHEMA)
            apply_batch(up, df, b, collect_stats=False)
        if ddl_mask & (1 << b):
            _apply_upstream_ddl(up, DDL_LADDER[b])
        if publish_mask & (1 << b):
            rep = publish_changes(
                up, relay, rebase=bool(rebase_mask & (1 << b))
            )
            published[0] = published[0] or not rep["skipped"]
            if published[0] and vacuum_mask & (1 << b):
                vacuum_relay(relay)
        if drain_mask & (1 << b):
            _drain()

    rep = publish_changes(up, relay)
    published[0] = published[0] or not rep["skipped"]
    if not published[0]:
        assert _clean_state(up) == {}
        return
    _drain()
    got_cols, got_rows = _layout_state(
        LakeTable.load(spark, _replica_path())
    )
    want_cols, want_rows = _layout_state(up)
    assert got_cols == want_cols
    assert got_rows == want_rows
