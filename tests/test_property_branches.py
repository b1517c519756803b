"""Property-based branch lifecycle (the branch analogue of
test_property_relay): hypothesis generates arbitrary interleavings of main
merges, branch merges, fast-forwards, forced drops, and re-creates; a pure
Python LWW model tracks what main and the branch must contain after every
step.  Invariants under EVERY interleaving:

* branch writes never leak into main before a fast-forward;
* a fast-forward against an unmoved main adopts the branch state exactly;
* a fast-forward after main moved raises CommitConflict and changes
  NOTHING on either side (the ancestor rule is all-or-nothing);
* a forced drop never touches main's state;
* final main AND branch clean states equal the model.
"""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.table import CommitConflict
from credix_data_pipeline_spark.operators.apply import apply_batch, read_clean

_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

EVENT = st.tuples(
    st.integers(0, 3),                   # key
    st.sampled_from(["U", "D"]),
    st.text(alphabet="xy ", max_size=3),
)

STEP = st.tuples(
    st.sampled_from(["main", "branch", "ff", "drop"]),
    st.lists(EVENT, min_size=0, max_size=4),
)


def _apply(table, events, batch_id, lsn0):
    rows = [
        (op, lsn0 + i, f"k{key}", 0, None if op == "D" else text)
        for i, (key, op, text) in enumerate(events)
    ]
    df = table.spark.createDataFrame(rows, _BATCH_SCHEMA)
    apply_batch(table, df, batch_id, collect_stats=False)


def _model_apply(model, events, lsn0):
    for i, (key, op, text) in enumerate(events):
        k = (f"k{key}", 0)
        prev = model.get(k)
        if prev is not None and prev[0] >= lsn0 + i:
            continue
        model[k] = (lsn0 + i, None if op == "D" else text, op == "D")


def _clean(model):
    return {
        k: v[1] for k, v in model.items() if not v[2]
    }


def _table_clean(t):
    return {
        (r.conv_id, r.turn_idx): r.text for r in read_clean(t).collect()
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(steps=st.lists(STEP, min_size=1, max_size=8))
def test_branch_lifecycle_matches_model(spark, tmp_path, steps):
    run = uuid.uuid4().hex
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("_lsn", T.LongType(), True),
            T.StructField("_deleted", T.BooleanType(), True),
        ]
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / f"t-{run}"),
        schema,
        key=["conv_id", "turn_idx"],
        num_buckets=2,
    )
    main_model: dict = {}
    br_model: dict | None = None   # None = no branch
    diverged = False
    batch_id = 0
    lsn = 1
    br_n = 0

    for kind, events in steps:
        if kind == "main":
            _apply(t, events, batch_id, lsn)
            _model_apply(main_model, events, lsn)
            batch_id += 1
            lsn += len(events)
            if br_model is not None and events:
                # an EMPTY merge short-circuits before any commit (P8), so
                # main did not actually move — only a non-empty batch
                # diverges the fork (hypothesis found the hole: ff after an
                # empty main merge rightly succeeds)
                diverged = True
        elif kind == "branch":
            if br_model is None:
                br_n += 1
                t.create_branch(f"b{br_n}")
                br_model = dict(main_model)
                diverged = False
            else:
                _apply(t.branch(f"b{br_n}"), events, batch_id, lsn)
                _model_apply(br_model, events, lsn)
                batch_id += 1
                lsn += len(events)
        elif kind == "ff":
            if br_model is None:
                continue
            if diverged:
                # the branch may or may not hold unpublished work; only a
                # DIRTY diverged branch exercises the conflict (a clean one
                # no-ops), so make it dirty first
                _apply(t.branch(f"b{br_n}"), [(0, "U", "d")], batch_id, lsn)
                _model_apply(br_model, [(0, "U", "d")], lsn)
                batch_id += 1
                lsn += 1
                before_main = _table_clean(t)
                try:
                    t.fast_forward(f"b{br_n}")
                    raise AssertionError("ff must refuse a moved main")
                except CommitConflict:
                    pass
                assert _table_clean(t) == before_main  # all-or-nothing
            else:
                t.fast_forward(f"b{br_n}")
                main_model = dict(br_model)
        elif kind == "drop":
            if br_model is None:
                continue
            t.drop_branch(f"b{br_n}", force=True)
            br_model = None
            diverged = False

    assert _table_clean(t) == _clean(main_model)
    if br_model is not None:
        assert _table_clean(t.branch(f"b{br_n}")) == _clean(br_model)
