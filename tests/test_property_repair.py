"""Property-based anti-entropy (operators/repair.py).

Hypothesis generates an arbitrary upstream state and an arbitrary
out-of-band corruption program over a zero-copy replica clone — key
deletions, payload mutations (possibly no-ops), ghost inserts, in any
mix including empty.  ``diff_tables`` must classify EXACTLY the corrupted
keys (computed by a pure-Python expectation, never the engine), and
``repair_replica`` must converge the replica back onto the upstream for
every program.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean
from credix_data_pipeline_spark.operators.merge import merge_into
from credix_data_pipeline_spark.operators.repair import (
    diff_tables,
    repair_replica,
)
from credix_data_pipeline_spark.schema import CHANGE_SCHEMA, target_schema_for

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)

# Upstream rows: unique (conv, turn) keys with arbitrary text.
UPSTREAM = st.dictionaries(
    st.tuples(st.integers(0, 3), st.integers(0, 2)),
    st.text(alphabet="xy é", max_size=4),
    min_size=1,
    max_size=8,
)


def _mk_upstream(spark, tmp_path, state: dict) -> LakeTable:
    rows = [
        ("I", lsn, BASE, f"c{conv}", turn, "user", text, None, BASE)
        for lsn, ((conv, turn), text) in enumerate(sorted(state.items()), 1)
    ]
    up = LakeTable.create(
        spark,
        str(tmp_path / f"up-{uuid.uuid4().hex}"),
        target_schema_for(CHANGE_SCHEMA),
        key=["conv_id", "turn_idx"],
        num_buckets=4,
        bucket_by=["conv_id"],
    )
    apply_batch(up, spark.createDataFrame(rows, CHANGE_SCHEMA), 0,
                collect_stats=False)
    return up


def _clean(t: LakeTable) -> dict:
    return {
        (r.conv_id, r.turn_idx): (r.role, r.text, r.tool)
        for r in read_clean(t)
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .collect()
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    state=UPSTREAM,
    del_mask=st.integers(0, 255),
    mut=st.dictionaries(
        st.tuples(st.integers(0, 3), st.integers(0, 2)),
        st.text(alphabet="xyz", max_size=3),
        max_size=4,
    ),
    ghosts=st.sets(st.integers(10, 13), max_size=3),
)
def test_diff_classifies_exactly_and_repair_converges(
    spark, tmp_path, state, del_mask, mut, ghosts
):
    up = _mk_upstream(spark, tmp_path, state)
    rep = up.clone_to(str(tmp_path / f"rep-{uuid.uuid4().hex}"), pin=False)

    keys = sorted(state)
    deleted = {k for i, k in enumerate(keys) if del_mask & (1 << (i % 8))}
    if deleted:
        kill = spark.createDataFrame(
            [(f"c{c}", t) for c, t in sorted(deleted)],
            "conv_id string, turn_idx int",
        )
        merge_into(rep, kill, when_matched_delete="true",
                   when_not_matched_insert=False)
    if mut:
        src = spark.createDataFrame(
            [(f"c{c}", t, txt) for (c, t), txt in sorted(mut.items())],
            "conv_id string, turn_idx int, text string",
        )
        # insert=False: mutating a deleted/absent key stays a no-op
        merge_into(rep, src, when_matched_update={"text": "s.text"},
                   when_not_matched_insert=False)
    if ghosts:
        gdf = spark.createDataFrame(
            [(f"g{g}", 0, "ghost", "boo", None, BASE) for g in sorted(ghosts)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
        merge_into(rep, gdf, when_not_matched_insert=True)

    # Pure-Python expectation of the diff classification.
    expected = {}
    for k in deleted:
        expected[(f"c{k[0]}", k[1])] = "missing_right"
    for k, txt in mut.items():
        if k in state and k not in deleted and txt != state[k]:
            expected[(f"c{k[0]}", k[1])] = "differing"
    for g in ghosts:
        expected[(f"g{g}", 0)] = "missing_left"

    d = diff_tables(up, rep)
    if not expected:
        assert d["identical"] is True
        return
    assert d["identical"] is False
    got = {
        (r.conv_id, r.turn_idx): r.kind
        for r in d["keys"].collect()
    }
    assert got == expected

    repair_replica(rep, up)
    rep = LakeTable.load(spark, rep.path)
    assert diff_tables(up, rep)["identical"] is True
    assert _clean(rep) == _clean(up)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(state=UPSTREAM)
def test_repair_is_idempotent_on_converged_pair(spark, tmp_path, state):
    up = _mk_upstream(spark, tmp_path, state)
    rep = up.clone_to(str(tmp_path / f"rep-{uuid.uuid4().hex}"), pin=False)
    res = repair_replica(rep, up)
    assert res == {"identical": True, "repaired": 0}
    v = rep.current().version
    repair_replica(rep, up)
    assert LakeTable.load(spark, rep.path).current().version == v
