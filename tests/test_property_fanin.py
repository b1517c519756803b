"""Property-based fan-in ingest (the fan-in analogue of
test_property_relay).

Hypothesis generates arbitrary insert/update/delete sequences over a small
key space; each conversation is owned by one of two sources (conv % 2 —
the disjoint-key sharding contract); each source's event stream is split
into arbitrary batches; the two sources' batches interleave in an
ARBITRARY hypothesis-drawn order, with arbitrary crash-redeliveries of
already-applied batches mixed in.  The final clean state must equal the
pure-Python LWW replay of the merged event sequence in global LSN order —
for every sequence, split, interleaving, and redelivery pattern.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings, strategies as st

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for

EVENT = st.tuples(
    st.integers(0, 4),                        # conv (owner = conv % 2)
    st.integers(0, 2),                        # turn
    st.sampled_from(["I", "U", "D"]),
    st.text(alphabet="ab <>é　", max_size=6),  # incl. unicode + ws
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=1, max_size=30),
    n_batches=st.integers(1, 3),              # batches per source
    schedule=st.lists(st.integers(0, 1), min_size=6, max_size=6),
    redeliver=st.lists(st.booleans(), min_size=6, max_size=6),
)
def test_fanin_converges_under_any_interleaving_and_redelivery(
    spark, tmp_path, events, n_batches, schedule, redeliver
):
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (op, lsn, base, f"c{conv}", turn,
         None if op == "D" else "user",
         None if op == "D" else text,
         None, None if op == "D" else base)
        for lsn, (conv, turn, op, text) in enumerate(events, start=1)
    ]
    by_src = {
        s: [r for r in rows if int(r[3][1:]) % 2 == s] for s in (0, 1)
    }
    batches: dict[int, list[list]] = {}
    for s in (0, 1):
        per = max(1, -(-len(by_src[s]) // n_batches))
        batches[s] = [
            by_src[s][i * per : (i + 1) * per] for i in range(n_batches)
        ]

    run = uuid.uuid4().hex
    table = LakeTable.create(
        spark,
        str(tmp_path / f"t-{run}"),
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
    )

    # hypothesis-drawn interleaving: walk the schedule, applying each
    # source's next batch; any source exhausted falls through to the other
    nxt = {0: 0, 1: 0}
    step = 0
    for pick in list(schedule) + [0, 1] * n_batches:  # drain tail
        s = pick if nxt[pick] < n_batches else 1 - pick
        if nxt[s] >= n_batches:
            continue
        b = nxt[s]
        chunk = batches[s][b]
        if chunk:
            df = spark.createDataFrame(list(reversed(chunk)), CHANGE_SCHEMA)
            res = apply_batch(table, df, b, source=f"s{s}",
                              collect_stats=False)
            assert not res.skipped
        else:
            # empty batches never commit; the fence must not advance past
            # them (batch ids are per-source monotone but gaps are fine —
            # the NEXT real batch has a higher id)
            df = spark.createDataFrame([], CHANGE_SCHEMA)
            apply_batch(table, df, b, source=f"s{s}", collect_stats=False)
        nxt[s] += 1
        # arbitrary crash-redelivery of an already-applied batch
        if redeliver[step % len(redeliver)] and b > 0 and batches[s][b - 1]:
            rdf = spark.createDataFrame(
                list(reversed(batches[s][b - 1])), CHANGE_SCHEMA
            )
            rres = apply_batch(table, rdf, b - 1, source=f"s{s}",
                               collect_stats=False)
            assert rres.skipped
        step += 1
    assert nxt == {0: n_batches, 1: n_batches}

    # pure-Python LWW over the merged sequence in global LSN order
    want: dict[tuple, tuple] = {}
    for op, lsn, _cts, conv, turn, role, text, _tool, _ts in rows:
        k = (conv, turn)
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = (role, text)
    got = {
        (r.conv_id, r.turn_idx): (r.role, r.text)
        for r in read_clean(table)
        .select("conv_id", "turn_idx", "role", "text")
        .collect()
    }
    assert got == want
