"""Property-based field-id schema evolution.

Hypothesis generates arbitrary interleavings of appends and column DDL
(rename / drop / re-add same name / widen / compact) against a LakeTable;
a dict oracle tracks values BY FIELD ID.  After every sequence the table
read must equal the oracle's projection through the final schema — for
every interleaving, which is exactly where by-name readers corrupt data
(stale values resurrecting under re-added names, renames reading NULL,
widened columns failing to cast across the boundary).
"""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from credix_data_pipeline_spark.lakehouse import LakeTable

# op encoding: (kind, payload)
OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(1, 3)),
        st.tuples(st.just("rename"), st.integers(0, 99)),
        st.tuples(st.just("drop_readd"), st.integers(0, 99)),
        st.tuples(st.just("widen"), st.just(0)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("add_default"), st.just(0)),
    ),
    min_size=1,
    max_size=7,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_table_matches_field_id_oracle(spark, tmp_path, ops):
    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("num", T.IntegerType(), True),
            T.StructField("txt", T.StringType(), True),
        ]
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / f"t-{uuid.uuid4().hex}"),
        schema,
        key=["k"],
        num_buckets=2,
    )
    # oracle: column state as (name -> (field_id, type)) + rows as
    # {key: {field_id: value}}
    cols: dict[str, tuple[int, str]] = {"num": (1, "int"), "txt": (2, "str")}
    next_id = 3
    rows: dict[str, dict[int, object]] = {}
    n_keys = 0
    n_renames = 0
    n_defaults = 0
    widened = False

    for kind, arg in ops:
        snap = t.current()
        if kind == "append":
            data = []
            for _ in range(arg):
                key = f"k{n_keys}"
                n_keys += 1
                vals: dict[int, object] = {}
                row = [key]
                for f in snap.schema.fields[1:]:
                    fid = cols[f.name][0]
                    if f.dataType.typeName() in ("integer", "long"):
                        v = n_keys * 10 + fid
                    else:
                        v = f"v{n_keys}_{fid}"
                    vals[fid] = v
                    row.append(v)
                rows[key] = vals
                data.append(tuple(row))
            t.append(spark.createDataFrame(data, snap.schema))
        elif kind == "rename":
            old = sorted(cols)[arg % len(cols)]
            new = f"r{n_renames}_{old.split('_')[-1]}"
            n_renames += 1
            t.rename_column(old, new)
            cols[new] = cols.pop(old)
        elif kind == "drop_readd":
            name = sorted(cols)[arg % len(cols)]
            if len(cols) == 1:
                continue  # keep at least one data column
            t.drop_column(name)
            del cols[name]
            # re-add the SAME name as string: fresh id, old data must NOT
            # resurrect
            t.add_columns([T.StructField(name, T.StringType(), True)])
            cols[name] = (next_id, "str")
            next_id += 1
        elif kind == "widen" and not widened:
            # widen whichever column is currently integer, if any
            intcols = [
                f.name
                for f in t.current().schema.fields
                if f.dataType.typeName() == "integer"
            ]
            if intcols:
                t.widen_column(intcols[0], T.LongType())
                widened = True
        elif kind == "compact":
            t.compact()
        elif kind == "add_default":
            # Iceberg v3 initial default: rows already written read the
            # default; the oracle bakes it into their field-id state
            # (read-time fill and materialization are equivalent)
            name = f"d{n_defaults}"
            dval = f"dft{n_defaults}"
            n_defaults += 1
            t.add_columns(
                [T.StructField(name, T.StringType(), True)],
                defaults={name: f"'{dval}'"},
            )
            cols[name] = (next_id, "str")
            for vals in rows.values():
                vals[next_id] = dval
            next_id += 1

    # verify: every row projects through the FINAL schema by field id
    final = t.current()
    got = {
        r["k"]: {f.name: r[f.name] for f in final.schema.fields[1:]}
        for r in t.read().collect()
    }
    want = {
        key: {
            name: vals.get(cols[name][0])
            for name in (f.name for f in final.schema.fields[1:])
        }
        for key, vals in rows.items()
    }
    assert got == want
