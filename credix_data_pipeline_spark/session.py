"""SparkSession factory.

Capability parity: the reference wires its engines (Postgres/pandas/BigQuery)
together with per-service configuration (dbt profiles, Dagster resources); the
engine's single knob surface is this session factory.  Scale posture: AQE on
(runtime shuffle-partition coalescing + skew-join splitting), Arrow on (all
Python crossings are vectorized), UTC timestamps (reference coerces to UTC
microseconds in credix_pipeline/utils/data_processing.py:29-41).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "credix_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in-sandbox; on a real
    cluster pass ``None`` and let spark-submit decide (the engine ships as a
    ``--py-files`` zip, per the north rule).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    # Python workers (pandas UDFs / mapInPandas) import this package by name;
    # make sure they can resolve it even when the driver added the repo root
    # to sys.path manually.  On a real cluster this is what --py-files does —
    # locally we extend the worker PYTHONPATH before the JVM starts.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 (the legacy default) carries NO min/max column statistics;
        # TIMESTAMP_MICROS restores footer stats so event-time file
        # pruning (ts_stats) and row-group skipping work on `ts`
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # File-source listing parallelism for the change-feed directory scan.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        # Direct task-commit (v2): our lakehouse writes into immutable
        # uuid-named commit dirs that only become visible via the manifest
        # swap, so v2's weaker job-abort guarantees are safe here and the
        # serial driver-side rename pass of v1 disappears from every batch.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
