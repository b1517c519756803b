"""Property-based data skipping: for ARBITRARY batch compositions (inserts,
updates, deletes across random key ranges), merge modes, and range
windows, ``read(between=...)`` must equal the plain filter over the full
read — file skipping is an optimization, never a semantics change.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)

EVENT = st.tuples(
    st.integers(0, 5),                      # conv
    st.integers(0, 19),                     # turn (the sliced column)
    st.sampled_from(["I", "U", "D"]),
    st.text(alphabet="pq", max_size=3),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=1, max_size=40),
    n_batches=st.integers(1, 3),
    merge_mode=st.sampled_from(["cow", "mor", "mor-append"]),
    lo=st.integers(0, 19),
    span=st.integers(0, 10),
)
def test_between_equals_filter_under_any_history(
    spark, tmp_path, events, n_batches, merge_mode, lo, span
):
    rows = [
        ("I" if op == "I" else op, lsn, BASE, f"c{conv}", turn,
         None if op == "D" else "user",
         None if op == "D" else text,
         None, None if op == "D" else BASE)
        for lsn, (conv, turn, op, text) in enumerate(events, start=1)
    ]
    t = LakeTable.create(
        spark,
        str(tmp_path / f"t-{uuid.uuid4().hex}"),
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
        merge_mode=merge_mode,
    )
    t.alter_properties({"stats.columns": "turn_idx,text"})
    t = LakeTable.load(spark, t.path)
    per = max(1, -(-len(rows) // n_batches))
    for b in range(n_batches):
        chunk = rows[b * per: (b + 1) * per]
        if chunk:
            apply_batch(
                t, spark.createDataFrame(chunk, CHANGE_SCHEMA), b,
                collect_stats=False,
            )
    t = LakeTable.load(spark, t.path)

    hi = lo + span
    got = sorted(
        map(tuple, read_clean(t, between={"turn_idx": (lo, hi)})
            .select("conv_id", "turn_idx", "text").collect())
    )
    want = sorted(
        map(tuple, read_clean(t)
            .filter((F.col("turn_idx") >= lo) & (F.col("turn_idx") <= hi))
            .select("conv_id", "turn_idx", "text").collect())
    )
    assert got == want

    # a string window must agree too (footer stats are str-typed there)
    got_s = sorted(
        map(tuple, read_clean(t, between={"text": ("p", "q")})
            .select("conv_id", "turn_idx", "text").collect())
    )
    want_s = sorted(
        map(tuple, read_clean(t)
            .filter(F.col("text").isNotNull()
                    & (F.col("text") >= "p") & (F.col("text") <= "q"))
            .select("conv_id", "turn_idx", "text").collect())
    )
    assert got_s == want_s
