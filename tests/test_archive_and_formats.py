"""S10 archive-on-success + S4 change-file formats (SURVEY §2.1).

The reference moves successfully-loaded landing files to an `archive/`
prefix (gcp_resource.py:88-109) and its Datastream feed is Avro
(datastream_streams.tf:73-79).  Archive is fully testable here; avro needs
the external spark-avro module, so its test asserts the gated behavior and
exercised end-to-end everywhere: spark-avro when the module is present,
the vendored pure-Python OCF codec (sources/avro_lite.py) otherwise.
"""

from __future__ import annotations

import os

import pytest

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.operators.apply import read_clean
from credix_data_pipeline_spark.sources.feed import (
    FeedSpec,
    write_feed,
)
from credix_data_pipeline_spark.streaming import runner

SPEC = dict(
    n_events=3_000,
    n_conversations=40,
    turns_per_conversation=8,
    events_per_chunk=1_000,
)


def _rows(spark, table_path):
    t = LakeTable.load(spark, table_path)
    df = read_clean(t)
    return sorted(tuple(str(r[c]) for c in sorted(df.columns)) for r in df.collect())


def test_archive_on_success(spark, tmp_path):
    feed, table = str(tmp_path / "feed"), str(tmp_path / "table")
    feed2, table2 = str(tmp_path / "feed2"), str(tmp_path / "table2")
    write_feed(spark, feed, FeedSpec(**SPEC))
    write_feed(spark, feed2, FeedSpec(**SPEC))

    stats = runner.replay(
        spark, feed, table, chunks_per_batch=2, num_buckets=4,
        collect_stats=False, archive=True,
    )
    assert stats.batches > 0

    # every processed chunk moved out of the landing zone...
    landing = os.path.join(feed, "pre")
    assert not any(d.startswith("chunk=") for d in os.listdir(landing))
    # ...and into _archive/ preserving the relative layout
    arch = os.path.join(feed, runner.ARCHIVE_DIR, "pre")
    archived = sorted(d for d in os.listdir(arch) if d.startswith("chunk="))
    assert len(archived) == 3  # 3000 events / 1000 per chunk

    # resume after full archive is a clean no-op (checkpoint is past them)
    stats2 = runner.replay(
        spark, feed, table, chunks_per_batch=2, num_buckets=4,
        collect_stats=False, archive=True,
    )
    assert stats2.batches == 0

    # archived replay state == un-archived replay state of the same feed
    runner.replay(
        spark, feed2, table2, chunks_per_batch=2, num_buckets=4,
        collect_stats=False,
    )
    assert _rows(spark, table) == _rows(spark, table2)
    # the un-archived feed keeps its landing chunks
    assert any(
        d.startswith("chunk=") for d in os.listdir(os.path.join(feed2, "pre"))
    )


def test_avro_feed_round_trip(spark, tmp_path):
    """S4 end-to-end on real .avro container files.  Without spark-avro
    the vendored pure-Python OCF codec (sources/avro_lite.py) carries the
    write AND the distributed binaryFile→mapInPandas read, so this runs
    everywhere; final state must equal the parquet twin byte-for-byte."""
    feed, table = str(tmp_path / "af"), str(tmp_path / "at")
    spec = FeedSpec(file_format="avro", **SPEC)
    write_feed(spark, feed, spec)
    # the chunks really are Avro object container files
    pre = os.path.join(feed, "pre")
    avro_files = [
        os.path.join(r, fn)
        for r, _, fns in os.walk(pre)
        for fn in fns
        if fn.endswith(".avro")
    ]
    assert avro_files, "avro feed wrote no .avro files"
    with open(avro_files[0], "rb") as fh:
        assert fh.read(4) == b"Obj\x01"
    stats = runner.replay(
        spark, feed, table, chunks_per_batch=2, num_buckets=4,
        collect_stats=False,
    )
    assert stats.rows_in > 0
    pfeed, ptable = str(tmp_path / "pf"), str(tmp_path / "pt")
    write_feed(spark, pfeed, FeedSpec(**SPEC))
    runner.replay(spark, pfeed, ptable, chunks_per_batch=2, num_buckets=4,
                  collect_stats=False)
    assert _rows(spark, table) == _rows(spark, ptable)


def test_avro_evolution_round_trip(spark, tmp_path):
    """S4 full parity: an avro feed WITH in-flight evolution replays like
    the parquet one (per-chunk reader schemas from the manifest registry +
    unionByName alignment) — via spark-avro when present, the vendored
    codec otherwise."""
    spec = FeedSpec(file_format="avro", evolution_frac=0.5, **SPEC)
    feed, table = str(tmp_path / "ae"), str(tmp_path / "aet")
    write_feed(spark, feed, spec)
    runner.replay(spark, feed, table, chunks_per_batch=2, num_buckets=4,
                  collect_stats=False)
    pfeed, ptable = str(tmp_path / "pe"), str(tmp_path / "pet")
    write_feed(spark, pfeed, FeedSpec(evolution_frac=0.5, **SPEC))
    runner.replay(spark, pfeed, ptable, chunks_per_batch=2, num_buckets=4,
                  collect_stats=False)
    assert _rows(spark, table) == _rows(spark, ptable)


def test_registry_schema_read_matches_merge_schema(spark, tmp_path):
    """The per-chunk schema-registry read path (what avro evolution needs,
    and what spares parquet the footer merge) is byte-equal to parquet
    mergeSchema discovery across the evolution switch-point."""
    from pyspark.sql import functions as F

    from credix_data_pipeline_spark.sources.feed import (
        read_chunks,
        read_manifest,
    )

    feed = str(tmp_path / "feed")
    write_feed(spark, feed, FeedSpec(evolution_frac=0.5, **SPEC))
    man = read_manifest(feed)
    assert set(man["schemas"]) == {"pre", "post"}
    # a batch spanning the evolution boundary
    boundary = man["chunks"][1:3]
    via_registry = read_chunks(
        spark, feed, boundary, schemas=man["schemas"]
    )
    via_merge = read_chunks(spark, feed, boundary, schemas=None)
    assert sorted(via_registry.columns) == sorted(via_merge.columns)
    key = lambda df: sorted(  # noqa: E731
        tuple(str(r[c]) for c in sorted(df.columns)) for r in df.collect()
    )
    assert key(via_registry) == key(via_merge)
    # pre-boundary events read NULL for the late-added column either way
    pre_lsns = via_registry.filter(F.col("tool_meta").isNull()).count()
    assert pre_lsns > 0


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported feed format"):
        write_feed(
            spark, str(tmp_path / "uf"), FeedSpec(file_format="orc2", **SPEC)
        )


def test_avro_lite_codec_round_trip():
    """Pure-codec unit test: all supported shapes survive encode→decode
    under both codecs, and the header-only schema peek agrees."""
    from datetime import datetime

    from pyspark.sql import types as T

    from credix_data_pipeline_spark.sources import avro_lite

    schema = T.StructType([
        T.StructField("s", T.StringType(), True),
        T.StructField("l", T.LongType(), True),
        T.StructField("i", T.IntegerType(), True),
        T.StructField("b", T.BooleanType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("arr", T.ArrayType(T.StringType()), True),
    ])
    rows = [
        {"s": "héllo Ｗｉｄｅ", "l": -(2**40), "i": -7, "b": True,
         "d": 1.5, "ts": datetime(2024, 1, 2, 3, 4, 5, 123456),
         "arr": ["a", "b", None]},
        {"s": None, "l": 0, "i": None, "b": False, "d": None,
         "ts": None, "arr": []},
        {"s": "", "l": 2**41 + 1, "i": 2**30, "b": None, "d": -0.25,
         "ts": datetime(1969, 12, 31, 23, 59, 59), "arr": None},
    ]
    asch = avro_lite.to_avro_schema(schema)
    for codec in ("deflate", "null"):
        data = avro_lite.encode_container(rows, asch, codec=codec)
        assert data[:4] == b"Obj\x01"
        sch2, out = avro_lite.decode_container(data)
        assert sch2 == asch
        assert out == rows
        assert avro_lite.decode_schema(data) == asch
    # spark schema round-trips through the avro schema too
    assert avro_lite.from_avro_schema(asch) == T.StructType([
        T.StructField(f.name, f.dataType, True) for f in schema.fields
    ])


def test_stream_refuses_lite_avro_feed_loudly(spark, tmp_path):
    """Structured Streaming's file source cannot route through the
    vendored codec — stream()/stream_ddl() over an avro feed without
    spark-avro must refuse with the fix named, while replay() works."""
    from credix_data_pipeline_spark.sources.feed import avro_available

    if avro_available(spark):
        pytest.skip("spark-avro present: SS reads avro natively here")
    feed = str(tmp_path / "af")
    write_feed(spark, feed, FeedSpec(file_format="avro", **SPEC))
    with pytest.raises(RuntimeError, match="spark-avro"):
        runner.stream(spark, feed, str(tmp_path / "t1"))
    with pytest.raises(RuntimeError, match="spark-avro"):
        runner.stream_ddl(spark, feed, str(tmp_path / "t2"))
    st = runner.replay(spark, feed, str(tmp_path / "t3"),
                       chunks_per_batch=2, num_buckets=4,
                       collect_stats=False)
    assert st.batches > 0


def test_avro_lite_timestamps_are_utc_and_microsecond_exact():
    """Encode must not reinterpret naive datetimes in the HOST zone, and
    decode must not round microseconds through float seconds — pinned by
    encoding under a non-UTC TZ env and by extreme-precision values."""
    import os
    import subprocess
    import sys
    import textwrap
    from datetime import datetime

    from pyspark.sql import types as T

    from credix_data_pipeline_spark.sources import avro_lite

    schema = T.StructType([T.StructField("ts", T.TimestampType(), True)])
    asch = avro_lite.to_avro_schema(schema)
    rows = [
        {"ts": datetime(2024, 1, 2, 3, 4, 5, 999999)},
        {"ts": datetime(2038, 1, 19, 3, 14, 7, 1)},
        {"ts": datetime(1969, 12, 31, 23, 59, 59, 500001)},
    ]
    data = avro_lite.encode_container(rows, asch)
    _, out = avro_lite.decode_container(data)
    assert out == rows  # microsecond-exact both directions
    # host-TZ independence: a subprocess pinned to a +14h zone must
    # produce byte-identical container payloads
    code = textwrap.dedent("""
        import sys
        from datetime import datetime
        sys.path.insert(0, %r)
        from pyspark.sql import types as T
        from credix_data_pipeline_spark.sources import avro_lite
        schema = T.StructType([T.StructField("ts", T.TimestampType(), True)])
        rows = [{"ts": datetime(2024, 1, 2, 3, 4, 5, 999999)},
                {"ts": datetime(2038, 1, 19, 3, 14, 7, 1)},
                {"ts": datetime(1969, 12, 31, 23, 59, 59, 500001)}]
        data = avro_lite.encode_container(rows, avro_lite.to_avro_schema(schema))
        sys.stdout.buffer.write(data)
    """) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "TZ": "Pacific/Kiritimati"}
    other = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, check=True).stdout
    assert other == data
