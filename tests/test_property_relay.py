"""Property-based CDC relay chain (the relay analogue of
test_property_lww).

Hypothesis generates arbitrary insert/update/delete sequences; the
upstream applies them through the real ``apply_batch`` path in arbitrary
batch splits, publishing the relay feed at ARBITRARY points between
batches (including never-between and after-every-batch).  A downstream
replay of the published feed must converge to the upstream clean state for
every generated sequence — the chained-pipeline invariant under every
publish cadence, not just the ones the example tests pick.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings, strategies as st

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.operators.relay import publish_changes
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for
from credix_data_pipeline_spark.streaming import runner

EVENT = st.tuples(
    st.integers(0, 4),                        # conv
    st.integers(0, 2),                        # turn
    st.sampled_from(["I", "U", "D"]),
    st.text(alphabet="ab <>é　", max_size=6),  # incl. unicode + ws
)


def _clean_state(t: LakeTable) -> dict:
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text)
        for r in read_clean(t)
        .select("conv_id", "turn_idx", "role", "text")
        .collect()
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=1, max_size=30),
    n_batches=st.integers(1, 4),
    publish_mask=st.integers(0, 15),  # bit b: publish after batch b
)
def test_downstream_replica_converges_under_any_publish_cadence(
    spark, tmp_path, events, n_batches, publish_mask
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
        str(tmp_path / f"up-{run}"),
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
    )
    relay = str(tmp_path / f"relay-{run}")
    down = str(tmp_path / f"down-{run}")

    per = max(1, -(-len(rows) // n_batches))
    published = False
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            df = spark.createDataFrame(list(reversed(chunk)), CHANGE_SCHEMA)
            apply_batch(up, df, b, collect_stats=False)
        if publish_mask & (1 << b):
            rep = publish_changes(up, relay)
            published = published or not rep["skipped"]
    # final publish so the feed always covers the full history
    rep = publish_changes(up, relay)
    published = published or not rep["skipped"]

    if not published:
        # every event was a no-op (e.g. delete-only stream): nothing to
        # relay and nothing downstream to check
        assert _clean_state(up) == {}
        return
    runner.replay(spark, relay, down, chunks_per_batch=1, num_buckets=2,
                  collect_stats=False)
    got = _clean_state(LakeTable.load(spark, down))
    assert got == _clean_state(up)


DDL_LADDER = [
    ("rename", "text", "body"),
    ("widen_turn",),
    ("rename", "body", "note"),
    ("drop", "tool"),
]


def _apply_upstream_ddl(t: LakeTable, step: tuple) -> None:
    from pyspark.sql import types as T

    names = {f.name for f in t.current().schema.fields}
    if step[0] == "rename":
        if step[1] in names and step[2] not in names:
            t.rename_column(step[1], step[2])
    elif step[0] == "widen_turn":
        t.widen_column("turn_idx", T.LongType())
    else:
        if step[1] in names:
            t.drop_column(step[1])


def _layout_state(t: LakeTable) -> tuple[list, dict]:
    df = read_clean(t)
    cols = sorted(c for c in df.columns if not c.startswith("_"))
    rows = {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in cols)
        for r in df.select(*cols).collect()
    }
    return cols, rows


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=1, max_size=24),
    n_batches=st.integers(1, 4),
    publish_mask=st.integers(0, 15),  # bit b: publish after batch b
    ddl_mask=st.integers(0, 15),      # bit b: DDL_LADDER[b] after batch b
)
def test_replica_converges_with_ddl_in_the_event_mix(
    spark, tmp_path, events, n_batches, publish_mask, ddl_mask
):
    """VERDICT r3 #1 property form: arbitrary interleavings of batches,
    publishes, and upstream DDL (rename chains, key widen, drop) — the
    replica must converge to the upstream LAYOUT and values with no manual
    alter.  Feed batches keep the ORIGINAL column names after a rename (a
    source that never heard about the DDL), so the upstream legitimately
    re-adds the old name as a fresh column — the replica must mirror that
    too (fresh field id, no resurrected data)."""
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
        str(tmp_path / f"upd-{run}"),
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
    )
    relay = str(tmp_path / f"relayd-{run}")
    down = str(tmp_path / f"downd-{run}")

    per = max(1, -(-len(rows) // n_batches))
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            df = spark.createDataFrame(list(reversed(chunk)), CHANGE_SCHEMA)
            apply_batch(up, df, b, collect_stats=False)
        if ddl_mask & (1 << b):
            _apply_upstream_ddl(up, DDL_LADDER[b])
        if publish_mask & (1 << b):
            publish_changes(up, relay)
    publish_changes(up, relay)

    import os

    if not os.path.exists(os.path.join(relay, "_feed.json")):
        assert _clean_state(up) == {}
        return
    runner.replay(spark, relay, down, chunks_per_batch=2, num_buckets=2,
                  collect_stats=False)
    got_cols, got_rows = _layout_state(LakeTable.load(spark, down))
    want_cols, want_rows = _layout_state(up)
    assert got_cols == want_cols
    assert got_rows == want_rows
