"""Property-based LWW replay (SURVEY §5.2.1/§5.2.4 generalized).

Hypothesis generates arbitrary insert/update/delete event sequences over a
small key space; the engine applies them through the real ``apply_batch``
path in arbitrary batch splits with within-batch reordering and verbatim
duplicate redelivery, and the final clean table state must equal a
ten-line dict-based LWW oracle — for EVERY generated sequence, not just
the seeded feed shapes."""

from __future__ import annotations

import uuid
from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings, strategies as st

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for

EVENT = st.tuples(
    st.integers(0, 4),                       # conv
    st.integers(0, 2),                       # turn
    st.sampled_from(["I", "U", "D"]),
    st.text(alphabet="ab <>é　", max_size=6),  # incl. unicode + ws
)


def _dict_oracle(events):
    state = {}
    for lsn, (conv, turn, op, text) in enumerate(events, start=1):
        k = (f"c{conv}", turn)
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (text, lsn)
    return {k: v[0] for k, v in state.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=1, max_size=40),
    n_batches=st.integers(1, 4),
    dup_stride=st.integers(0, 3),
)
def test_engine_state_equals_dict_oracle(spark, tmp_path, events, n_batches,
                                         dup_stride):
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (op, lsn, base, f"c{conv}", turn,
         None if op == "D" else "user",
         None if op == "D" else text,
         None, None if op == "D" else base)
        for lsn, (conv, turn, op, text) in enumerate(events, start=1)
    ]

    table = LakeTable.create(
        spark,
        str(tmp_path / f"t-{uuid.uuid4().hex}"),
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
    )
    per = max(1, -(-len(rows) // n_batches))
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if not chunk:
            continue
        if dup_stride:  # at-least-once: redeliver every k-th event verbatim
            chunk = chunk + chunk[::dup_stride + 1]
        chunk = list(reversed(chunk))  # out-of-order within the batch
        df = spark.createDataFrame(chunk, CHANGE_SCHEMA)
        apply_batch(table, df, b, collect_stats=False)

    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in read_clean(table).collect()
    }
    assert got == _dict_oracle(events)
