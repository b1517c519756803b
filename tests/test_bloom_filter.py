"""Parquet bloom filters on the bucket column.

Every data-file write carries ``parquet.bloom.filter.enabled#<bucket_col>``
so point lookups can skip row groups in UNSORTED ingest files (where key
min/max ranges are too wide to prune).  parquet-mr's adaptive writer omits
the filter for chunks that stay fully dictionary-encoded — the dictionary
already provides exact row-group skipping — so this pins both sides:
a high-cardinality write carries a bloom bitset; lookups stay correct.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F, types as T

from credix_data_pipeline_spark.lakehouse import LakeTable
from credix_data_pipeline_spark.lakehouse.table import BUCKET_COL


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


def test_high_cardinality_write_carries_bloom_and_lookup_works(
    spark, tmp_path
):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key=["conv_id", "turn_idx"],
        num_buckets=2,
        bucket_by=["conv_id"],
    )
    # 60k distinct conv ids in one unsorted write: the dictionary falls
    # back to plain encoding, so the adaptive writer emits a bloom bitset
    df = spark.range(60_000).select(
        F.concat(F.lit("conv"), F.col("id").cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
        F.col("id").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    snap = t.append(df)
    some_file = snap.all_files()[0]
    size = _bloom_bytes(spark, os.path.join(t.path, some_file), "conv_id")
    assert size and size > 0

    # bloom'd files read back correctly through the point-lookup path
    got = t.read_keys(["conv12345"]).select("turn_idx", "_lsn").collect()
    assert [(r.turn_idx, r._lsn) for r in got] == [(0, 12345)]


def test_low_cardinality_write_stays_dictionary_encoded(spark, tmp_path):
    """Few distinct keys ⇒ chunk stays dict-encoded ⇒ parquet-mr omits the
    bloom (the dictionary is the better filter) — no bitset tax on small
    batch files."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        key=["conv_id", "turn_idx"],
        num_buckets=1,
        bucket_by=["conv_id"],
    )
    df = spark.range(5_000).select(
        F.concat(
            F.lit("conv"), (F.col("id") % 20).cast("string")
        ).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("x").alias("text"),
        F.col("id").alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    snap = t.append(df)
    sizes = {
        _bloom_bytes(spark, os.path.join(t.path, f), "conv_id")
        for f in snap.all_files()
    }
    assert sizes == {None}
