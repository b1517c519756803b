#!/usr/bin/env python
"""Equality-delete purge latency: the O(keys) claim, measured.

``LakeTable.delete_keys`` commits a purge as one tiny delete file plus a
manifest link — no data file is read or rewritten — so its latency must be
independent of table size.  The industry alternative (the reference's only
option, dbt full-refresh: ``credix_pipeline/dbt_project`` rebuilds the model
table) rewrites every surviving row, so it scales with the table.  This
bench builds the SAME pipeline table at two sizes and times, at each size:

* ``purge_sec``          — the ``delete_keys`` commit itself
* ``read_before/after``  — ``read_clean`` wall before vs after the purge
                           (the broadcast anti-join's read-side overhead)
* ``full_refresh_sec``   — the comparator: filter + rewrite of all
                           surviving rows (what a purge costs WITHOUT
                           equality deletes)
* ``compact_sec``        — the deferred physical materialization (amortized
                           maintenance, not purge latency)

The pass criterion is the ratio row: ``purge`` stays ~flat as the table
grows 4x while ``full_refresh`` grows ~linearly — at 10^10 rows that gap is
the difference between milliseconds and a cluster-hour per GDPR request.
Results land in ``BENCH/purge.json``; summary table in ``BENCH/BASELINE.md``.
Usage: ``python bench_purge.py`` (env: SPARK_GRAFT_PURGE_EVENTS — the
SMALLER size, the second is 4x — and SPARK_GRAFT_CPUS).
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

N_PURGE_KEYS = 10


def _read_wall(read_clean, t) -> float:
    best = float("inf")
    for _ in range(2):
        r0 = time.monotonic()
        read_clean(t).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - r0)
    return best


def main() -> None:
    base_events = int(os.environ.get("SPARK_GRAFT_PURGE_EVENTS", "1000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sizes = {"base": base_events, "4x": base_events * 4}

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from bench import host_calibration
    from credix_data_pipeline_spark.functions.normalize import (
        with_normalized_text,
    )
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.apply import read_clean
    from credix_data_pipeline_spark.session import get_spark
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
    from credix_data_pipeline_spark.streaming import runner

    spark = get_spark(
        app_name="bench_purge",
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

    cal_before = host_calibration()
    work = tempfile.mkdtemp(prefix="bench_purge_", dir=SHM)
    results: dict[str, dict] = {}
    try:
        # warm-up replay: python-UDF workers + writer init, untimed
        warm_feed = os.path.join(work, "warm_feed")
        write_feed(spark, warm_feed, FeedSpec(n_events=100_000,
                                              n_conversations=10_000,
                                              events_per_chunk=50_000))
        runner.replay(spark, warm_feed, os.path.join(work, "warm"),
                      chunks_per_batch=2, num_buckets=32,
                      transform=with_normalized_text, collect_stats=False)

        for size_name, n_events in sizes.items():
            spec = FeedSpec(
                n_events=n_events,
                n_conversations=n_events // 10,
                turns_per_conversation=10,
                events_per_chunk=max(5_000, n_events // 32),
            )
            feed = os.path.join(work, f"feed_{size_name}")
            write_feed(spark, feed, spec)
            tbl_path = os.path.join(work, f"t_{size_name}")
            runner.replay(spark, feed, tbl_path, chunks_per_batch=8,
                          num_buckets=32, transform=with_normalized_text,
                          collect_stats=False)
            t = LakeTable.load(spark, tbl_path)
            logical = read_clean(t).count()
            all_victims = [
                r[0]
                for r in read_clean(t).select("conv_id").distinct()
                .orderBy("conv_id").limit(3 * N_PURGE_KEYS).collect()
            ]

            read_before = _read_wall(read_clean, t)

            # best-of-3 purge commits (distinct key sets — each an equal
            # metadata commit) to get under job-scheduling noise
            purge_sec, victims = float("inf"), []
            snap = None
            for i in range(3):
                vs = all_victims[i * N_PURGE_KEYS:(i + 1) * N_PURGE_KEYS]
                victims.extend(vs)
                p0 = time.monotonic()
                snap = t.delete_keys(vs)
                purge_sec = min(purge_sec, time.monotonic() - p0)
                assert snap.files == t.snapshot(snap.parent_id).files, \
                    "purge touched data files"
            manifest_bytes = os.path.getsize(
                os.path.join(tbl_path, "_meta", f"v{snap.version:011d}.json")
            )

            read_after = _read_wall(read_clean, t)

            # comparator: full-refresh rewrite of every surviving row
            # (best-of-2 — same trial discipline as the reads)
            out = os.path.join(work, f"refresh_{size_name}")
            full_refresh_sec = float("inf")
            for _ in range(2):
                f0 = time.monotonic()
                (read_clean(t).filter(~F.col("conv_id").isin(victims))
                 .write.mode("overwrite").parquet(out))
                full_refresh_sec = min(
                    full_refresh_sec, time.monotonic() - f0
                )
            shutil.rmtree(out, ignore_errors=True)

            c0 = time.monotonic()
            t.compact()
            compact_sec = time.monotonic() - c0
            read_compacted = _read_wall(read_clean, t)

            results[size_name] = {
                "events": n_events,
                "logical_rows": logical,
                "data_files": len(snap.all_files()),
                "manifest_bytes": manifest_bytes,
                # structurally proven above: the purge commit's file set is
                # IDENTICAL to its parent's — zero data files read/written;
                # purge_sec is one tiny key-hash Spark job + a key parquet
                # + an O(files) manifest JSON write, i.e. metadata-sized
                "purge_touched_data_files": False,
                "purge_keys": N_PURGE_KEYS,
                "purge_sec": round(purge_sec, 3),
                "read_clean_before_sec": round(read_before, 3),
                "read_clean_after_purge_sec": round(read_after, 3),
                "full_refresh_sec": round(full_refresh_sec, 3),
                "compact_sec": round(compact_sec, 3),
                "read_after_compact_sec": round(read_compacted, 3),
            }
            shutil.rmtree(feed, ignore_errors=True)
            shutil.rmtree(tbl_path, ignore_errors=True)

        results["ratios_4x_vs_base"] = {
            "table_growth": 4.0,
            "purge": round(
                results["4x"]["purge_sec"] / results["base"]["purge_sec"], 2
            ),
            "full_refresh": round(
                results["4x"]["full_refresh_sec"]
                / results["base"]["full_refresh_sec"], 2
            ),
            "purge_vs_full_refresh_at_4x": round(
                results["4x"]["full_refresh_sec"]
                / results["4x"]["purge_sec"], 1
            ),
        }
        results["host_calibration"] = {
            "before": cal_before,
            "after": host_calibration(),
        }
        out_path = os.path.join(REPO, "BENCH", "purge.json")
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        print(json.dumps(results, indent=2, sort_keys=True))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
