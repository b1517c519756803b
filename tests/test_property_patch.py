"""Property-based partial-update (patch) fold: hypothesis generates
arbitrary I/U/D/P event sequences over a small key space, the engine
applies them through the real ``apply_batch`` path under an ARBITRARY
GLOBAL PERMUTATION split into batches (with within-batch reversal and
verbatim duplicate redelivery), and the final clean state must equal the
sequential global-LSN fold oracle — the column-level-LWW claim is exactly
"order doesn't matter", so the property shuffles across batch boundaries,
which the row-level LWW suite never needs to."""

from __future__ import annotations

import random
import uuid
from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for

EVENT = st.tuples(
    st.integers(0, 3),                        # conv
    st.integers(0, 1),                        # turn
    st.sampled_from(["I", "U", "D", "P", "P"]),
    st.text(alphabet="xy z", max_size=4),     # text
    st.sampled_from(["user", "tool"]),        # role
    st.sets(st.sampled_from(["text", "role"]), min_size=1, max_size=2),
)

PATCH_SCHEMA = T.StructType([
    *CHANGE_SCHEMA.fields,
    T.StructField("patch_cols", T.ArrayType(T.StringType()), True),
])


def _fold_oracle(events):
    state: dict[tuple, dict] = {}
    for lsn, (conv, turn, op, text, role, pcols) in enumerate(events, 1):
        k = (f"c{conv}", turn)
        if op == "D":
            state.pop(k, None)
        elif op == "P":
            row = dict(state.get(k, {"text": None, "role": None}))
            vals = {"text": text, "role": role}
            for c in sorted(pcols):
                row[c] = vals[c]
            state[k] = row
        else:
            state[k] = {"text": text, "role": role}
    return {k: (v["role"], v["text"]) for k, v in state.items()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=1, max_size=36),
    n_batches=st.integers(1, 4),
    dup_stride=st.integers(0, 2),
    seed=st.integers(0, 2**31),
    mode=st.sampled_from(["cow", "mor"]),
)
def test_patched_state_equals_global_fold(spark, tmp_path, events, n_batches,
                                          dup_stride, seed, mode):
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)

    def row(lsn, conv, turn, op, text, role, pcols):
        if op == "D":
            return ("D", lsn, base, f"c{conv}", turn,
                    None, None, None, None, None)
        if op == "P":
            pc = sorted(pcols)
            return ("P", lsn, base, f"c{conv}", turn,
                    role if "role" in pc else None,
                    text if "text" in pc else None,
                    None, None, pc)
        return (op, lsn, base, f"c{conv}", turn, role, text, None, base,
                None)

    rows = [row(lsn, *ev) for lsn, ev in enumerate(events, start=1)]
    # the property: ANY arrival order folds to the same state
    random.Random(seed).shuffle(rows)

    table = LakeTable.create(
        spark,
        str(tmp_path / f"t-{uuid.uuid4().hex}"),
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
        merge_mode=mode,
    )
    per = max(1, -(-len(rows) // n_batches))
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if not chunk:
            continue
        if dup_stride:  # at-least-once redelivery, verbatim
            chunk = chunk + chunk[:: dup_stride + 1]
        chunk = list(reversed(chunk))
        df = spark.createDataFrame(chunk, PATCH_SCHEMA)
        apply_batch(table, df, b, collect_stats=False)

    got = {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
        for r in read_clean(table).collect()
    }
    assert got == _fold_oracle(events)
