#!/usr/bin/env python
"""Zero-copy import latency: the CONVERT-without-rewrite claim, measured.

``LakeTable.import_dataset`` adopts an existing parquet dataset with ONE
metadata commit — O(files) footer stat reads, zero data read or rewritten —
while the rewrite alternative (``runner.bootstrap``, the Datastream
backfill_all analogue) reads and re-writes every row to stamp ``_lsn`` and
bucket placement.  This bench builds the SAME source dataset at two sizes
and times, at each size:

* ``import_sec``      — the metadata-only adoption (validate=False: the
                        convert itself; validation is priced separately)
* ``validate_sec``    — the optional read-only null/duplicate-key pass
* ``read_import_sec`` — full ``read_clean`` wall over the adopted table
* ``bootstrap_sec``   — the comparator: the rewrite-based seed of the
                        same data
* ``rebucket_sec``    — the deferred spread (32 buckets), priced so the
                        "defer the rewrite until asked" story is honest

The pass criterion is the shape: ``import_sec`` stays ~flat (it scales with
FILE COUNT, held constant here) while ``bootstrap_sec`` grows with rows —
at 100 TB that is the difference between seconds and a cluster-day to bring
a foreign dataset under the table format.  Results land in
``BENCH/import.json``.  Usage: ``python bench_import.py`` (env:
SPARK_GRAFT_IMPORT_ROWS — the SMALLER size, the second is 4x — and
SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

N_FILES = 64  # held constant across sizes: import cost is O(files)


def main() -> None:
    base_rows = int(os.environ.get("SPARK_GRAFT_IMPORT_ROWS", "1000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sizes = {"base": base_rows, "4x": base_rows * 4}

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from bench import host_calibration
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.apply import read_clean
    from credix_data_pipeline_spark.session import get_spark
    from credix_data_pipeline_spark.streaming import runner

    spark = get_spark(
        app_name="bench-import",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen/writer machinery so the FIRST timed size does
    # not absorb one-time JIT (bench.py's rule)
    warm = tempfile.mkdtemp(prefix="bench_import_warm_", dir=SHM)
    try:
        wsrc = os.path.join(warm, "src")
        (
            spark.range(50_000)
            .select(F.col("id").alias("doc_id"),
                    F.col("id").cast("string").alias("text"))
            .repartition(8)
            .write.parquet(wsrc)
        )
        runner.bootstrap(
            spark, wsrc, os.path.join(warm, "t"), key=["doc_id"],
            num_buckets=8,
        )
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    out = {"host_calibration": {"before": host_calibration()},
           "n_files": N_FILES, "cpus": cpus, "sizes": {}}

    for label, n in sizes.items():
        work = tempfile.mkdtemp(prefix=f"bench_import_{label}_", dir=SHM)
        try:
            src = os.path.join(work, "src")
            (
                spark.range(n)
                .select(
                    F.col("id").alias("doc_id"),
                    F.concat(F.lit("document body "), F.col("id"))
                    .alias("text"),
                    (F.col("id") % 20).cast("string").alias("source"),
                )
                .repartition(N_FILES)
                .write.parquet(src)
            )

            t0 = time.monotonic()
            t = LakeTable.import_dataset(
                spark, src, os.path.join(work, "t_import"),
                key=["doc_id"], validate=False,
            )
            import_sec = time.monotonic() - t0
            # the adoption provably wrote no data files
            local = sum(
                len(fs)
                for _, _, fs in os.walk(os.path.join(t.path, "data"))
            )
            assert local == 0, f"import wrote {local} data files"

            t0 = time.monotonic()
            LakeTable.import_dataset(
                spark, src, os.path.join(work, "t_val"),
                key=["doc_id"], validate=True,
            )
            validate_sec = time.monotonic() - t0

            t0 = time.monotonic()
            read_clean(t).write.format("noop").mode("overwrite").save()
            read_import_sec = time.monotonic() - t0

            t0 = time.monotonic()
            runner.bootstrap(
                spark, src, os.path.join(work, "t_boot"), key=["doc_id"],
                num_buckets=32,
            )
            bootstrap_sec = time.monotonic() - t0

            t0 = time.monotonic()
            t.rebucket(32)
            rebucket_sec = time.monotonic() - t0

            out["sizes"][label] = {
                "rows": n,
                "import_sec": round(import_sec, 3),
                "validate_sec": round(validate_sec, 3),
                "read_import_sec": round(read_import_sec, 3),
                "bootstrap_sec": round(bootstrap_sec, 3),
                "rebucket_sec": round(rebucket_sec, 3),
            }
        finally:
            shutil.rmtree(work, ignore_errors=True)

    out["host_calibration"]["after"] = host_calibration()
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "import.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
