#!/usr/bin/env python
"""Row-TTL latency: the O(affected) claim, measured.

``LakeTable.delete_older_than`` plans from manifest ts-stats: on a
time-clustered layout (one append/compaction slice per day) an expired day
drops as WHOLE FILES — no data read, no data written — and only the bucket
files straddling the cutoff rewrite.  The industry alternative without
file-level stats is a full filter + rewrite of every surviving row, which
scales with the table.  This bench builds the SAME day-appended table at
two sizes and times, at each size:

* ``ttl_drop_sec``      — a day-boundary TTL (pure metadata: files drop,
                          zero buckets rewritten — asserted)
* ``ttl_straddle_sec``  — a mid-day TTL (only the straddling day's buckets
                          rewrite — O(boundary), not O(table))
* ``full_refresh_sec``  — the comparator: filter + rewrite all survivors
* ``read_before/after`` — ``read`` wall before vs after (no read-side tax)

Pass criterion: ``ttl_drop`` stays ~flat as the table grows 4x while
``full_refresh`` grows ~linearly — at 10^10 rows that gap is a manifest
write vs a cluster-hour per retention run.  Results land in
``BENCH/ttl.json``.  Usage: ``python bench_ttl.py`` (env:
SPARK_GRAFT_TTL_ROWS — the SMALLER size, the second is 4x — and
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

N_DAYS = 8
DAY_S = 86_400
T0_S = 1_767_225_600  # 2026-01-01T00:00:00Z
N_BUCKETS = 32


def _read_wall(t) -> float:
    best = float("inf")
    for _ in range(2):
        r0 = time.monotonic()
        t.read().write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - r0)
    return best


def main() -> None:
    base_rows = int(os.environ.get("SPARK_GRAFT_TTL_ROWS", "1000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sizes = {"base": base_rows, "4x": base_rows * 4}

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F, types as T

    from bench import host_calibration
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="bench_ttl",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.local.dir": os.path.join(SHM, "sparktmp"),
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "512k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ])

    def day_df(day: int, n_rows: int, conv0: int):
        e = F.col("id")
        return spark.range(n_rows).select(
            F.format_string(
                "conv%09d", (F.lit(conv0) + (e / 4)).cast("int")
            ).alias("conv_id"),
            F.pmod(e, F.lit(4)).cast("int").alias("turn_idx"),
            F.concat(F.lit(f"d{day} x"), e.cast("string")).alias("text"),
            F.timestamp_seconds(
                F.lit(T0_S + day * DAY_S) + F.pmod(e * 37, F.lit(86_000))
            ).alias("ts"),
            (F.lit(day * 100_000_000) + e + 1).cast("long").alias("_lsn"),
            F.lit(False).alias("_deleted"),
        )

    cal_before = host_calibration()
    work = tempfile.mkdtemp(prefix="bench_ttl_", dir=SHM)
    results: dict[str, dict] = {}
    try:
        for size_name, n_rows in sizes.items():
            per_day = n_rows // N_DAYS
            tbl_path = os.path.join(work, f"t_{size_name}")
            t = LakeTable.create(
                spark, tbl_path, schema,
                key=["conv_id", "turn_idx"], num_buckets=N_BUCKETS,
            )
            b0 = time.monotonic()
            for d in range(N_DAYS):
                # disjoint conv ranges per day: appends never duplicate keys
                t.append(day_df(d, per_day, conv0=d * per_day))
            build_sec = time.monotonic() - b0
            rows0 = t.read().count()
            files0 = len(t.current().all_files())
            read_before = _read_wall(t)

            # day-boundary TTL: days 0..3 expire as whole files
            cutoff = (T0_S + 4 * DAY_S) * 1000
            d0 = time.monotonic()
            snap = t.delete_older_than(cutoff)
            ttl_drop_sec = time.monotonic() - d0
            assert snap.summary["buckets_rewritten"] == 0, snap.summary
            assert snap.summary["files_dropped"] > 0
            dropped = snap.summary["files_dropped"]
            rows_after_drop = t.read().count()
            read_after = _read_wall(t)

            # mid-day TTL: cutoff inside day 4's spread — only its buckets
            # rewrite; days 5..7 files survive untouched
            cutoff2 = (T0_S + 4 * DAY_S + 43_000) * 1000
            s0 = time.monotonic()
            snap2 = t.delete_older_than(cutoff2)
            ttl_straddle_sec = time.monotonic() - s0
            assert snap2.summary["buckets_rewritten"] > 0
            survivors = set(snap2.all_files())
            day5_plus = {
                p for p, s in snap.ts_stats.items()
                if s[0] >= (T0_S + 5 * DAY_S) * 1000
            }
            assert day5_plus <= survivors, "later days were rewritten"
            rows_after_straddle = t.read().count()

            # comparator: full filter + rewrite of every surviving row
            out = os.path.join(work, f"refresh_{size_name}")
            full_refresh_sec = float("inf")
            for _ in range(2):
                f0 = time.monotonic()
                (t.read()
                 .filter(F.col("ts")
                         >= F.timestamp_millis(F.lit(cutoff2)))
                 .write.mode("overwrite").parquet(out))
                full_refresh_sec = min(
                    full_refresh_sec, time.monotonic() - f0
                )
            shutil.rmtree(out, ignore_errors=True)

            results[size_name] = {
                "rows": rows0,
                "data_files": files0,
                "build_sec": round(build_sec, 3),
                "ttl_drop_sec": round(ttl_drop_sec, 3),
                "ttl_drop_files_dropped": dropped,
                "ttl_drop_buckets_rewritten": 0,
                "rows_after_drop": rows_after_drop,
                "ttl_straddle_sec": round(ttl_straddle_sec, 3),
                "ttl_straddle_buckets_rewritten":
                    snap2.summary["buckets_rewritten"],
                "rows_after_straddle": rows_after_straddle,
                "full_refresh_sec": round(full_refresh_sec, 3),
                "read_before_sec": round(read_before, 3),
                "read_after_drop_sec": round(read_after, 3),
            }
            shutil.rmtree(tbl_path, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    cal_after = host_calibration()

    out = {
        "bench": "ttl",
        "cpus": cpus,
        "n_days": N_DAYS,
        "host_calibration": {"before": cal_before, "after": cal_after},
        "sizes": results,
        "ratios": {
            "rows": results["4x"]["rows"] / max(1, results["base"]["rows"]),
            "ttl_drop": round(
                results["4x"]["ttl_drop_sec"]
                / max(1e-9, results["base"]["ttl_drop_sec"]), 2),
            "ttl_straddle": round(
                results["4x"]["ttl_straddle_sec"]
                / max(1e-9, results["base"]["ttl_straddle_sec"]), 2),
            "full_refresh": round(
                results["4x"]["full_refresh_sec"]
                / max(1e-9, results["base"]["full_refresh_sec"]), 2),
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ttl.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
