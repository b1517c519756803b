"""Parquet bloom filters on the bucket column — maintenance writes only.

``compact``/``rebucket`` rewrites carry
``parquet.bloom.filter.enabled#<bucket_col>`` so point lookups skip row
groups by bloom in addition to the sorted min/max ranges.  The INGEST path
deliberately writes no bloom: a measured A/B put bitset construction at
~3x replay wall on a high-cardinality insert-heavy feed, so fresh batch
files rely on dictionary/min-max skipping until compaction rewrites them.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable


def _bloom_bytes(spark, abs_path: str, column: str) -> int | None:
    """Bloom bitset size for ``column`` in row group 0, via the JVM
    parquet-mr reader (pyarrow does not expose bloom metadata)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path("file://" + abs_path)
    inf = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        path, conf
    )
    rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inf)
    try:
        rg = rdr.getFooter().getBlocks().get(0)
        for i in range(rg.getColumns().size()):
            cc = rg.getColumns().get(i)
            if cc.getPath().toDotString() == column:
                bf = rdr.getBloomFilterDataReader(rg).readBloomFilter(cc)
                return bf.getBitsetSize() if bf is not None else None
        raise AssertionError(f"column {column} not found in {abs_path}")
    finally:
        rdr.close()


SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)


def _high_card_df(spark, n=60_000):
    return spark.range(n).select(
        F.concat(F.lit("conv"), F.col("id").cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
        F.col("id").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )


def test_ingest_writes_no_bloom_compaction_adds_it(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key=["conv_id", "turn_idx"],
        num_buckets=2,
        bucket_by=["conv_id"],
    )
    snap = t.append(_high_card_df(spark))
    # hot path: no bitset even at high cardinality (measured write tax)
    sizes = {
        _bloom_bytes(spark, os.path.join(t.path, f), "conv_id")
        for f in snap.all_files()
    }
    assert sizes == {None}

    # maintenance rewrite: sorted AND bloom'd
    # (append twice so every bucket has >1 file and compaction rewrites it)
    t.append(_high_card_df(spark, 5_000))
    snap = t.compact()
    sizes = {
        _bloom_bytes(spark, os.path.join(t.path, f), "conv_id")
        for f in snap.all_files()
    }
    assert None not in sizes and all(s > 0 for s in sizes)

    # bloom'd files read back correctly through the point-lookup path
    got = t.read_keys(["conv12345"]).select("turn_idx", "_lsn").collect()
    assert [(r.turn_idx, r._lsn) for r in got] == [(0, 12345)]


def test_rebucket_carries_bloom(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key=["conv_id", "turn_idx"],
        num_buckets=2,
        bucket_by=["conv_id"],
    )
    t.append(_high_card_df(spark))
    snap = t.rebucket(4)
    some_file = snap.all_files()[0]
    assert _bloom_bytes(spark, os.path.join(t.path, some_file), "conv_id")
