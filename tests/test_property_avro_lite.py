"""Property-based round trip for the vendored Avro OCF codec.

Hypothesis generates arbitrary row sets over every shape the codec
supports (nullable strings incl. unicode/control chars, full-range
longs/ints, booleans, doubles, microsecond timestamps, arrays with NULL
elements) and asserts encode→decode identity under both codecs, plus
header-only schema recovery.  Pure Python — no Spark session needed, so
the search is wide and fast."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from credix_data_pipeline_spark.sources import avro_lite

SCHEMA = T.StructType([
    T.StructField("s", T.StringType(), True),
    T.StructField("l", T.LongType(), True),
    T.StructField("i", T.IntegerType(), True),
    T.StructField("b", T.BooleanType(), True),
    T.StructField("d", T.DoubleType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("arr", T.ArrayType(T.StringType()), True),
])

# timestamps within datetime's representable span, microsecond-varied
_TS = st.integers(-62_000_000_000, 250_000_000_000_000_000 // 1000).map(
    lambda us: datetime(1970, 1, 1) + timedelta(microseconds=us)
)

ROW = st.fixed_dictionaries({
    "s": st.none() | st.text(max_size=20),
    "l": st.none() | st.integers(-(2**63), 2**63 - 1),
    "i": st.none() | st.integers(-(2**31), 2**31 - 1),
    "b": st.none() | st.booleans(),
    # NaN breaks == comparison; use finite doubles and compare exactly
    "d": st.none() | st.floats(allow_nan=False, allow_infinity=False,
                               width=64),
    "ts": st.none() | _TS,
    "arr": st.none() | st.lists(st.none() | st.text(max_size=8),
                                max_size=5),
})


@settings(max_examples=200, deadline=None)
@given(rows=st.lists(ROW, max_size=25), codec=st.sampled_from(
    ["deflate", "null"]))
def test_container_round_trip_identity(rows, codec):
    asch = avro_lite.to_avro_schema(SCHEMA)
    data = avro_lite.encode_container(rows, asch, codec=codec)
    assert data[:4] == b"Obj\x01"
    sch2, out = avro_lite.decode_container(data)
    assert sch2 == asch
    assert avro_lite.decode_schema(data) == asch
    assert len(out) == len(rows)
    for a, b in zip(out, rows):
        for k in b:
            va, vb = a[k], b[k]
            if isinstance(vb, float):
                assert va == vb or (math.isnan(va) and math.isnan(vb))
            else:
                assert va == vb, (k, va, vb)


@settings(max_examples=50, deadline=None)
@given(rows=st.lists(ROW, min_size=1, max_size=10))
def test_encoding_is_deterministic(rows):
    """Byte-identical output for identical input — what makes .avro chunk
    files reproducible across writers and retries."""
    asch = avro_lite.to_avro_schema(SCHEMA)
    assert avro_lite.encode_container(rows, asch) == \
        avro_lite.encode_container(rows, asch)
