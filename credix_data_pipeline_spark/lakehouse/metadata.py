"""Metadata tables — the Iceberg ``snapshots`` / ``history`` / ``files``
inspection surface as DataFrames.

The reference's only table-state observability is the BigQuery console and
Dagster run logs; Iceberg exposes queryable metadata tables instead
(``SELECT * FROM tbl.snapshots``), which is what operators actually script
against.  This module is that surface for LakeTable:

* ``snapshots_df`` / ``history_df`` — driver-side manifest listing (tiny:
  one row per snapshot; manifests are already local JSON).
* ``files_df`` — one row per data file with parquet FOOTER statistics
  (row count, row groups, key min/max).  Footers are read in a DISTRIBUTED
  ``mapInPandas`` pass over the file list — the same shape as Iceberg's
  manifest scan — so inspecting a 100 TB table's million files is a
  parallel O(files) metadata job, never a data scan and never a driver
  loop.
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import DataFrame, functions as F, types as T

from credix_data_pipeline_spark.lakehouse.table import LakeTable, _commit_dir

SNAPSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("version", T.IntegerType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("parent_id", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), False),
        T.StructField("operation", T.StringType(), True),
        T.StructField("merge_mode", T.StringType(), False),
        T.StructField("num_buckets", T.IntegerType(), False),
        T.StructField("file_count", T.IntegerType(), False),
        T.StructField("batch_id", T.LongType(), True),
        T.StructField("summary", T.StringType(), False),
        T.StructField("is_current", T.BooleanType(), False),
        T.StructField("refs", T.ArrayType(T.StringType()), False),
    ]
)

FILES_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("file_path", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("row_group_count", T.IntegerType(), False),
        T.StructField("key_min", T.StringType(), True),
        T.StructField("key_max", T.StringType(), True),
    ]
)


def snapshots_df(table: LakeTable) -> DataFrame:
    """One row per snapshot (Iceberg ``snapshots`` metadata table)."""
    cur = table.current().snapshot_id
    refs_by_sid: dict[int, list[str]] = {}
    for name, sid in table.tags().items():
        refs_by_sid.setdefault(sid, []).append(name)
    rows = []
    for s in table.history():
        bid = s.summary.get("batch_id")
        rows.append(
            (
                s.version,
                s.snapshot_id,
                s.parent_id,
                datetime.datetime.fromtimestamp(s.committed_at_ms / 1000.0),
                s.summary.get("operation"),
                s.merge_mode,
                s.num_buckets,
                len(s.all_files()),
                None if bid is None else int(bid),
                json.dumps(s.summary, sort_keys=True),
                s.snapshot_id == cur,
                sorted(refs_by_sid.get(s.snapshot_id, [])),
            )
        )
    return table.spark.createDataFrame(rows, SNAPSHOTS_SCHEMA)


def history_df(table: LakeTable) -> DataFrame:
    """Commit lineage (Iceberg ``history`` metadata table): ancestry of the
    CURRENT snapshot — a rollback makes abandoned commits visible here as
    ``is_ancestor_of_current = false``."""
    ancestors = set()
    by_id = {s.snapshot_id: s for s in table.history()}
    node = table.current()
    while node is not None:
        ancestors.add(node.snapshot_id)
        # a rollback commit's logical parent is its TARGET snapshot
        target = node.summary.get("rolled_back_to")
        nxt = target if target is not None else node.parent_id
        node = by_id.get(nxt)
    return snapshots_df(table).withColumn(
        "is_ancestor_of_current",
        F.col("snapshot_id").isin([int(a) for a in ancestors]),
    )


def files_df(table: LakeTable, snapshot_id: int | None = None) -> DataFrame:
    """One row per data file with footer statistics (Iceberg ``files``
    metadata table).  Distributed: the file list parallelizes across
    executors and each task reads only parquet FOOTERS via pyarrow —
    O(files) metadata work with zero data pages touched.

    ``key_min`` / ``key_max`` aggregate the first key column's row-group
    min/max — after ``compact(sort=True)`` / ``rebucket`` these ranges are
    disjoint within a bucket, which is the row-group-skip evidence for
    key-targeted reads surfaced as data instead of a doc claim.
    """
    snap = table.snapshot(snapshot_id) if snapshot_id else table.current()
    key0 = snap.key[0] if snap.key else None
    root = table.path
    # the key column's WRITE-TIME name per commit dir: files written before
    # a rename store the old name in their footers — map through the stable
    # field id (same rule as the read path's per-dir projection)
    key_id = snap.column_ids.get(key0) if key0 is not None else None

    def _dir_key_name(dirname: str) -> str | None:
        dinfo = snap.dir_schemas.get(dirname)
        if dinfo is None:
            return key0  # legacy/by-name dir: never renamed
        rev = {i: n for n, i in dinfo["ids"].items()}
        return rev.get(key_id)

    listing = [
        (int(b), f, _dir_key_name(_commit_dir(f)))
        for b, fl in snap.files.items()
        for f in fl
    ]
    if not listing:
        return table.spark.createDataFrame([], FILES_SCHEMA)
    src = table.spark.createDataFrame(
        listing,
        T.StructType(
            [
                T.StructField("bucket", T.IntegerType(), False),
                T.StructField("file_path", T.StringType(), False),
                T.StructField("key_name", T.StringType(), True),
            ]
        ),
    ).repartition(max(1, min(len(listing), table.spark.sparkContext.defaultParallelism)))

    def scan(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for bucket, rel, kname in zip(
                pdf["bucket"], pdf["file_path"], pdf["key_name"]
            ):
                path = os.path.join(root, rel)
                md = pq.ParquetFile(path).metadata
                kmin = kmax = None
                if kname is not None:
                    names = {
                        md.schema.column(i).name: i
                        for i in range(md.num_columns)
                    }
                    ki = names.get(kname)
                    if ki is not None:
                        # compare stats in their NATIVE type (int 9 < 10;
                        # lexicographic '10' < '9' is wrong — ADVICE r3),
                        # stringify only for the output column below
                        for rg in range(md.num_row_groups):
                            st = md.row_group(rg).column(ki).statistics
                            if st is None or not st.has_min_max:
                                continue
                            lo, hi = st.min, st.max
                            kmin = lo if kmin is None else min(kmin, lo)
                            kmax = hi if kmax is None else max(kmax, hi)
                if kmin is not None:
                    kmin, kmax = str(kmin), str(kmax)
                out.append(
                    (
                        int(bucket),
                        rel,
                        os.path.getsize(path),
                        md.num_rows,
                        md.num_row_groups,
                        kmin,
                        kmax,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FILES_SCHEMA.fields]
            )

    return src.mapInPandas(scan, FILES_SCHEMA)


PARTITIONS_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("file_count", T.LongType(), False),
        T.StructField("total_size_bytes", T.LongType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("avg_file_bytes", T.LongType(), False),
        T.StructField("key_min", T.StringType(), True),
        T.StructField("key_max", T.StringType(), True),
    ]
)


def partitions_df(table: LakeTable, snapshot_id: int | None = None) -> DataFrame:
    """One row per bucket (Iceberg ``partitions`` metadata table): the
    layout-health view operators script against — small-file buildup
    (``avg_file_bytes`` vs target), row skew across buckets (a hot
    conversation shows up as one bucket's ``row_count`` outlier), and
    compaction targeting.  Same distributed footer-only scan as
    ``files_df``, aggregated per bucket."""
    snap = table.snapshot(snapshot_id) if snapshot_id else table.current()
    # aggregate per-file bounds in the KEY COLUMN'S type, not as strings —
    # string min/max on numeric keys is lexicographic and wrong (ADVICE r3)
    key_t = snap.schema[snap.key[0]].dataType if snap.key else T.StringType()
    f = files_df(table, snapshot_id=snapshot_id)
    return (
        f.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("file_count"),
            F.sum("size_bytes").alias("total_size_bytes"),
            F.sum("row_count").alias("row_count"),
            (F.sum("size_bytes") / F.count(F.lit(1)))
            .cast("long")
            .alias("avg_file_bytes"),
            F.min(F.col("key_min").cast(key_t)).cast("string").alias("key_min"),
            F.max(F.col("key_max").cast(key_t)).cast("string").alias("key_max"),
        )
        .select(*[f.name for f in PARTITIONS_SCHEMA.fields])
    )
