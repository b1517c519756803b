"""Z-order compaction (``compaction.sort-order = zorder(a,b)``): Morton-
curve clustering where every z-dimension prunes at once, vs a
lexicographic sort that serves only its leading column."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.zorder import parse_zorder

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)

DAY_MS = 86_400_000
T0 = dt.datetime(2026, 3, 1, tzinfo=dt.timezone.utc)
T0_MS = int(T0.timestamp() * 1000)


def _grid_rows(spark, days=4, convs=24, lsn0=1, turn0=0):
    """Every conversation has rows on EVERY day — the two dimensions are
    independent, so a sort can only serve one of them lexicographically."""
    rows = [
        (
            f"conv{c:04d}", turn0 + d * 10 + i, f"d{d} c{c} {i}",
            T0 + dt.timedelta(days=d, minutes=c * 7 + i),
            lsn0 + (d * convs + c) * 2 + i, False,
        )
        for d in range(days)
        for c in range(convs)
        for i in range(2)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _mk(spark, path, order: str):
    t = LakeTable.create(
        spark, path, SCHEMA, key=["conv_id", "turn_idx"], num_buckets=2,
    )
    t.append(_grid_rows(spark, lsn0=1))
    t.append(_grid_rows(spark, lsn0=10_000, turn0=1000))  # 2 files/bucket
    t.alter_properties({
        "compaction.sort-order": order,
        "compaction.target-file-rows": "24",
    })
    t.compact()
    return LakeTable.load(spark, path)


def _win(day_lo: int, day_hi: int) -> tuple[int, int]:
    return (T0_MS + day_lo * DAY_MS, T0_MS + day_hi * DAY_MS - 1)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_zorder_preserves_content_exactly(spark, tmp_path):
    plain = _mk(spark, str(tmp_path / "plain"), "conv_id,ts")
    z = _mk(spark, str(tmp_path / "z"), "zorder(conv_id,ts)")
    assert _rows(z.read()) == _rows(plain.read())


def test_zorder_prunes_nonleading_dimension(spark, tmp_path):
    """A one-day slice on a conv-leading LEX sort scans every file (each
    file spans all days); the same slice on zorder(conv_id,ts) prunes
    files — the non-leading dimension stays prunable."""
    lex = _mk(spark, str(tmp_path / "lex"), "conv_id,ts")
    z = _mk(spark, str(tmp_path / "z"), "zorder(conv_id,ts)")
    lo, hi = _win(1, 2)  # exactly day 1

    lex_slice = lex.read(ts_between=(lo, hi))
    z_slice = z.read(ts_between=(lo, hi))
    # identical answers
    assert _rows(z_slice) == _rows(lex_slice)
    assert z_slice.count() == 96  # 24 convs x 2 rows x 2 appends on day 1

    n_lex = len(lex_slice.inputFiles())
    n_z = len(z_slice.inputFiles())
    total = len(z.read().inputFiles())
    # conv-leading lex: nearly every file spans all days (only conv-boundary
    # files can exclude the window); zorder: the ts dimension prunes hard
    assert 0 < n_z < total
    assert n_z < n_lex


def test_zorder_key_lookup_exact(spark, tmp_path):
    z = _mk(spark, str(tmp_path / "z"), "zorder(conv_id,ts)")
    got = z.read_keys(["conv0003"]).filter(F.col("turn_idx") == 11)
    assert got.count() == 1
    assert got.first()["text"] == "d1 c3 1"


def test_zorder_validation(spark, tmp_path):
    assert parse_zorder("conv_id,ts") is None
    assert parse_zorder("zorder(a, b)") == ["a", "b"]
    with pytest.raises(ValueError, match="at least one"):
        parse_zorder("zorder()")
    with pytest.raises(ValueError, match="at most"):
        parse_zorder("zorder(a,b,c,d,e)")

    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key=["conv_id", "turn_idx"], num_buckets=2,
    )
    t.append(_grid_rows(spark, days=1, convs=4))
    t.append(_grid_rows(spark, days=1, convs=4, lsn0=999, turn0=100))
    # validation moved to DECLARATION time (cross-feature hardening: a bad
    # order used to fail every scheduled maintain() instead of the alter)
    with pytest.raises(ValueError, match="unknown"):
        t.alter_properties({"compaction.sort-order": "zorder(conv_id,nope)"})
    assert "compaction.sort-order" not in t.current().properties
    t.compact()  # table stays healthy — the bad property never landed


def test_zorder_constant_and_null_dimensions(spark, tmp_path):
    """An all-null or constant dimension degrades to one z-cell instead of
    failing — the rewrite still lands and reads stay exact."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA,
        key=["conv_id", "turn_idx"], num_buckets=2,
    )
    rows = _grid_rows(spark, days=2, convs=8).withColumn(
        "ts", F.lit(None).cast("timestamp")
    )
    rows2 = _grid_rows(spark, days=2, convs=8, lsn0=50_000,
                       turn0=500).withColumn(
        "ts", F.lit(None).cast("timestamp")
    )
    t.append(rows)
    t.append(rows2)
    t.alter_properties({"compaction.sort-order": "zorder(conv_id,ts)"})
    before = _rows(t.read())
    t.compact()
    assert _rows(LakeTable.load(spark, str(tmp_path / "t")).read()) == before


def test_zorder_four_dims_stays_positive(spark, tmp_path):
    """4 dims x 16 bits would put the last interleaved bit on the long's
    SIGN bit, splitting the curve; the 15-bit cap keeps z-values
    non-negative end to end."""
    from credix_data_pipeline_spark.lakehouse.zorder import zorder_expr

    df = _grid_rows(spark, days=4, convs=16)
    z = zorder_expr(df, ["conv_id", "turn_idx", "ts", "_lsn"], SCHEMA)
    lo = df.select(F.min(z).alias("lo")).first()["lo"]
    assert lo >= 0
