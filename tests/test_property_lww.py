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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=1, max_size=40),
    n_batches=st.integers(1, 4),
    purges=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 4)),  # (after batch, conv)
        max_size=3,
        unique=True,
    ),
)
def test_engine_with_purges_equals_dict_oracle(spark, tmp_path, events,
                                               n_batches, purges):
    """Equality-delete purges interleaved at arbitrary batch boundaries:
    the engine must equal the dict oracle where a purge removes the conv's
    state AS OF that point and later events re-create keys — for every
    generated sequence, purge placement, and batch split."""
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (op, lsn, base, f"c{conv}", turn,
         None if op == "D" else "user",
         None if op == "D" else text,
         None, None if op == "D" else base)
        for lsn, (conv, turn, op, text) in enumerate(events, start=1)
    ]
    purge_map: dict[int, list[str]] = {}
    for after_batch, conv in purges:
        purge_map.setdefault(after_batch, []).append(f"c{conv}")

    table = LakeTable.create(
        spark,
        str(tmp_path / f"t-{uuid.uuid4().hex}"),
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
    )
    state: dict[tuple, str] = {}
    per = max(1, -(-len(rows) // n_batches))
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            df = spark.createDataFrame(list(reversed(chunk)), CHANGE_SCHEMA)
            apply_batch(table, df, b, collect_stats=False)
            for op, _lsn, _ts, conv, turn, _role, text, _tool, _ts2 in chunk:
                if op == "D":
                    state.pop((conv, turn), None)
                else:
                    state[(conv, turn)] = text
        for conv in purge_map.get(b, []):
            table.delete_keys([conv])
            for k in [k for k in state if k[0] == conv]:
                state.pop(k)

    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in read_clean(table).collect()
    }
    assert got == state
    # compaction materializes every outstanding purge without changing state
    table.compact()
    got2 = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in read_clean(LakeTable.load(spark, table.path)).collect()
    }
    assert got2 == state and table.current().eq_deletes == []


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 4),                       # conv
            st.integers(0, 2),                       # turn
            st.sampled_from(["I", "U", "D"]),
            st.text(alphabet="ab <>é　", max_size=6),
            st.integers(0, 3),                       # event-time day offset
        ),
        min_size=1,
        max_size=40,
    ),
    n_batches=st.integers(1, 4),
    ttls=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 4)),  # (after batch, day)
        max_size=3,
        unique=True,
    ),
)
def test_engine_with_ttls_equals_dict_oracle(spark, tmp_path, events,
                                             n_batches, ttls):
    """Row TTLs interleaved at arbitrary batch boundaries: the engine must
    equal the dict oracle where a TTL removes rows whose CURRENT event time
    is before the cutoff (tombstones carry NULL ts and survive) and later
    events re-create keys — for every sequence, cutoff placement, day mix,
    and batch split."""
    from datetime import timedelta

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    day_ms = 86_400_000
    base_ms = int(base.timestamp() * 1000)
    rows = [
        (op, lsn, base, f"c{conv}", turn,
         None if op == "D" else "user",
         None if op == "D" else text,
         None, None if op == "D" else base + timedelta(days=day))
        for lsn, (conv, turn, op, text, day) in enumerate(events, start=1)
    ]
    ttl_map: dict[int, list[int]] = {}
    for after_batch, day in ttls:
        ttl_map.setdefault(after_batch, []).append(day)

    table = LakeTable.create(
        spark,
        str(tmp_path / f"t-{uuid.uuid4().hex}"),
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
    )
    state: dict[tuple, tuple] = {}  # k -> (text, day | None for tombstone)
    per = max(1, -(-len(rows) // n_batches))
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            df = spark.createDataFrame(list(reversed(chunk)), CHANGE_SCHEMA)
            apply_batch(table, df, b, collect_stats=False)
            for (op, _l, _c, conv, turn, _r, text, _t, ts), (
                *_x, day) in zip(chunk, events[b * per:(b + 1) * per]):
                state[(conv, turn)] = (
                    (None, None) if op == "D" else (text, day)
                )
        for day in sorted(ttl_map.get(b, [])):
            table.delete_older_than(base_ms + day * day_ms)
            state = {
                k: v for k, v in state.items()
                # tombstones (day None) survive; expired current rows go
                if v[1] is None or v[1] >= day
            }

    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in read_clean(table).collect()
    }
    want = {k: v[0] for k, v in state.items() if v[0] is not None}
    assert got == want
    # compaction after interleaved TTLs leaves the state untouched
    table.compact()
    got2 = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in read_clean(LakeTable.load(spark, table.path)).collect()
    }
    assert got2 == want
