#!/usr/bin/env python
"""CoW vs merge-on-read: ingest + read-amplification bench (VERDICT r2 #9).

MoR ingest is O(batch) appends (no bucket rewrite) but defers the LWW
collapse to read time; CoW pays the rewrite at ingest and reads flat files.
This bench quantifies BOTH sides of the trade at two update ratios so a user
can pick a table mode from data:

* ``insert-heavy``  — keys ≈ events (~1 version/key): the CoW sweet spot
* ``update-heavy``  — keys ≈ events/40 (~40 versions/key, scattered across
  every bucket): the MoR sweet spot

For each (ratio, mode) it reports ingest wall, full-read wall (clean state,
noop-materialized), physical/logical row amplification, and for MoR the
post-``compact()`` read wall — the maintenance point that restores CoW read
speed.  Results land in ``BENCH/mor.json`` and the table in
``BENCH/BASELINE.md``.  Usage: ``python bench_mor.py``
(env: SPARK_GRAFT_MOR_EVENTS, SPARK_GRAFT_CPUS).
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


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n_events = int(os.environ.get("SPARK_GRAFT_MOR_EVENTS", "1000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    sys.path.insert(0, REPO)
    from credix_data_pipeline_spark.functions.normalize import (
        with_normalized_text,
    )
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.apply import read_clean
    from credix_data_pipeline_spark.session import get_spark
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
    from credix_data_pipeline_spark.streaming import runner

    spark = get_spark(
        app_name="bench_mor",
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

    # total distinct keys per ratio (keys = conversations × 10 turns)
    ratios = {
        "insert_heavy": n_events,        # ~1 version/key
        "update_heavy": n_events // 40,  # ~40 versions/key, all buckets dirty
    }
    work = tempfile.mkdtemp(prefix="bench_mor_", dir=SHM)
    results: dict[str, dict] = {}
    try:
        # shared warm-up: python-UDF workers + writer init, untimed
        warm_feed = os.path.join(work, "warm_feed")
        write_feed(spark, warm_feed, FeedSpec(n_events=100_000,
                                              n_conversations=10_000,
                                              events_per_chunk=50_000))
        runner.replay(spark, warm_feed, os.path.join(work, "warm"),
                      chunks_per_batch=2, num_buckets=32,
                      transform=with_normalized_text, collect_stats=False)

        for ratio_name, n_keys in ratios.items():
            spec = FeedSpec(
                n_events=n_events,
                n_conversations=max(10, n_keys // 10),
                turns_per_conversation=10,
                delete_pct=5,
                duplicate_pct=3,
                hot_pct=5,
                shuffle_window=64,
                events_per_chunk=max(5_000, n_events // 32),
            )
            feed = os.path.join(work, f"feed_{ratio_name}")
            write_feed(spark, feed, spec)
            row: dict[str, dict] = {}
            for mode in ("cow", "mor", "mor-append"):
                tbl_path = os.path.join(work, f"t_{ratio_name}_{mode}")
                t0 = time.monotonic()
                runner.replay(
                    spark, feed, tbl_path,
                    chunks_per_batch=8, num_buckets=32,
                    transform=with_normalized_text, collect_stats=False,
                    merge_mode=mode,
                )
                ingest = time.monotonic() - t0
                t = LakeTable.load(spark, tbl_path)

                def _read_wall():
                    best = float("inf")
                    for _ in range(2):
                        r0 = time.monotonic()
                        _materialize(read_clean(t))
                        best = min(best, time.monotonic() - r0)
                    return best

                read_w = _read_wall()
                phys = t.read().count()
                logical = read_clean(t).count()
                entry = {
                    "ingest_sec": round(ingest, 3),
                    "ingest_events_per_sec": round(n_events / ingest, 1),
                    "read_clean_sec": round(read_w, 3),
                    "physical_rows": phys,
                    "logical_rows": logical,
                    "read_amplification": round(phys / max(logical, 1), 2),
                }
                if mode.startswith("mor"):
                    entry["delete_files"] = len(
                        t.current().all_delete_files()
                    )
                    c0 = time.monotonic()
                    t.compact()
                    entry["compact_sec"] = round(time.monotonic() - c0, 3)
                    entry["read_after_compact_sec"] = round(_read_wall(), 3)
                row[mode] = entry
            for m in ("mor", "mor-append"):
                row[f"ingest_speedup_{m}_vs_cow"] = round(
                    row["cow"]["ingest_sec"] / row[m]["ingest_sec"], 2
                )
                row[f"read_slowdown_{m}_vs_cow"] = round(
                    row[m]["read_clean_sec"] / row["cow"]["read_clean_sec"], 2
                )
            results[ratio_name] = row

        # Steady-state read (the MoR shape that matters in production): a
        # big COMPACTED base plus one small recent delta batch.  Position-
        # delete MoR reads scan + BROADCAST anti-join (no table shuffle);
        # append-MoR must LWW-shuffle the whole table for the same answer.
        from pyspark.sql import functions as F

        from credix_data_pipeline_spark.operators.apply import (
            apply_batch,
            last_applied_batch_id,
        )

        spec = FeedSpec(
            n_events=n_events, n_conversations=max(100, n_events // 10),
            turns_per_conversation=10, delete_pct=5, duplicate_pct=3,
            hot_pct=5, shuffle_window=64,
            events_per_chunk=max(5_000, n_events // 32),
        )
        feed = os.path.join(work, "feed_steady")
        write_feed(spark, feed, spec)
        steady: dict[str, dict] = {}
        for mode in ("cow", "mor", "mor-append"):
            tbl_path = os.path.join(work, f"t_steady_{mode}")
            runner.replay(
                spark, feed, tbl_path, chunks_per_batch=8, num_buckets=32,
                transform=with_normalized_text, collect_stats=False,
                merge_mode=mode,
            )
            t = LakeTable.load(spark, tbl_path)
            t.compact()
            n_delta = max(1000, n_events // 100)
            const_ts = F.timestamp_seconds(F.lit(1_800_000_000))
            delta = (
                read_clean(t)
                .select("conv_id", "turn_idx")
                .limit(n_delta)
                .select(
                    F.lit("U").alias("op"),
                    (F.lit(2_000_000_000)
                     + F.monotonically_increasing_id()).alias("lsn"),
                    const_ts.alias("commit_ts"),
                    "conv_id",
                    "turn_idx",
                    F.lit("user").alias("role"),
                    F.lit("steady-state update").alias("text"),
                    F.lit(None).cast("string").alias("tool"),
                    const_ts.alias("ts"),
                )
            )
            # materialize the delta first: its construction reads the table
            # and must not pollute the timed apply
            delta_path = os.path.join(work, f"delta_{mode}")
            delta.write.mode("overwrite").parquet(delta_path)
            delta = spark.read.parquet(delta_path)
            t0 = time.monotonic()
            apply_batch(t, delta, last_applied_batch_id(t) + 1,
                        collect_stats=False)
            delta_sec = time.monotonic() - t0

            best = float("inf")
            for _ in range(3):
                r0 = time.monotonic()
                _materialize(read_clean(t))
                best = min(best, time.monotonic() - r0)
            steady[mode] = {
                "delta_apply_sec": round(delta_sec, 3),
                "read_clean_sec": round(best, 3),
            }
        for m in ("mor", "mor-append"):
            steady[f"read_slowdown_{m}_vs_cow"] = round(
                steady[m]["read_clean_sec"] / steady["cow"]["read_clean_sec"],
                2,
            )
        results["steady_state_small_delta"] = steady
    finally:
        shutil.rmtree(work, ignore_errors=True)

    report = {
        "metric": "cow_vs_mor_ingest_and_read",
        "events": n_events,
        "cpus": cpus,
        "ratios": results,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "mor.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
