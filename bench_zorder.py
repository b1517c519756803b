#!/usr/bin/env python
"""Z-order vs lexicographic clustering: the multi-dimension pruning claim,
measured.

``compaction.sort-order = zorder(conv_id, ts)`` lays each bucket down along
a Morton curve, so BOTH a key point-lookup and an event-time slice prune.
A lexicographic order serves only its leading column: ``conv_id,ts``
scans every file for a time slice, ``ts,conv_id`` gives up key-sorted
row-group locality for lookups.  This bench builds the SAME multi-day
table three times (lex key-leading / lex ts-leading / zorder), compacts
each under its policy, and measures:

* ``slice_files / total_files``   — files planned for a 1-of-N-day
                                    ``read(ts_between=…)`` slice
* ``slice_sec``                   — wall for the slice (noop sink, best of 2)
* ``lookup_sec``                  — wall for a 20-conversation
                                    ``read_keys`` lookup (best of 2)

Pass criterion: zorder's slice plans a strict subset of the lex
key-leading layout's files (which plans ~all), while its lookup stays in
the same range as the key-leading layout — one clustering serving both
access paths.  At 100 TB the pruned files are the difference between a
warm-cache dashboard query and a full-table scan.  Results land in
``BENCH/zorder.json``.  Usage: ``python bench_zorder.py``
(env: SPARK_GRAFT_ZORDER_EVENTS, SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

N_DAYS = 8
N_BUCKETS = 8


def _wall(df_fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        df_fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    n_events = int(os.environ.get("SPARK_GRAFT_ZORDER_EVENTS", "2000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from bench import host_calibration
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.session import get_spark

    cal_before = host_calibration()
    spark = get_spark(
        app_name="bench-zorder",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    t0_ms = int(t0.timestamp() * 1000)
    day_ms = 86_400_000
    n_convs = max(1000, n_events // 200)

    def rows_df():
        # conversations and days are INDEPENDENT dimensions: every conv is
        # active every day (the worst case for any single-column sort)
        e = F.col("id")
        conv = F.pmod(e * 2654435761, F.lit(n_convs))
        day = F.pmod(e * 40503, F.lit(N_DAYS))
        return spark.range(n_events).select(
            F.concat(F.lit("conv"), F.lpad(conv.cast("string"), 8, "0"))
            .alias("conv_id"),
            e.cast("int").alias("turn_idx"),
            F.concat(F.lit("text body "), e.cast("string")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_millis(
                F.lit(t0_ms) + day * day_ms
                + F.pmod(e * 97, F.lit(day_ms))
            ).alias("ts"),
            (e + 1).alias("_lsn"),
            F.lit(False).alias("_deleted"),
        )

    target_rows = max(2_000, n_events // (N_BUCKETS * 8))
    layouts = {
        "lex_key_leading": "conv_id,ts",
        "lex_ts_leading": "ts,conv_id",
        "zorder": "zorder(conv_id,ts)",
    }
    lookup_keys = [f"conv{c:08d}" for c in range(0, n_convs, n_convs // 20)][:20]
    win = (t0_ms + 3 * day_ms, t0_ms + 4 * day_ms - 1)  # exactly day 3

    out: dict = {
        "n_events": n_events, "n_convs": n_convs, "n_days": N_DAYS,
        "cpus": cpus, "target_file_rows": target_rows,
        "host_calibration": {"before": cal_before},
        "layouts": {},
    }
    for name, order in layouts.items():
        work = os.path.join(SHM, f"bench_zorder_{name}")
        shutil.rmtree(work, ignore_errors=True)
        t = LakeTable.create(
            spark, work, rows_df().schema,
            key=["conv_id", "turn_idx"], num_buckets=N_BUCKETS,
        )
        t.append(rows_df())
        t.append(rows_df().withColumn("_lsn", F.col("_lsn") + n_events)
                 .withColumn("turn_idx", F.col("turn_idx") + n_events))
        t.alter_properties({
            "compaction.sort-order": order,
            "compaction.target-file-rows": str(target_rows),
        })
        c0 = time.monotonic()
        t.compact()
        compact_sec = round(time.monotonic() - c0, 3)
        t = LakeTable.load(spark, work)
        total = len(t.read().inputFiles())
        sliced = t.read(ts_between=win)
        n_slice = len(sliced.inputFiles())
        slice_sec = _wall(lambda: t.read(ts_between=win))
        lookup_sec = _wall(lambda: t.read_keys(lookup_keys))
        slice_rows = sliced.count()
        out["layouts"][name] = {
            "compact_sec": compact_sec,
            "total_files": total,
            "slice_files": n_slice,
            "slice_frac": round(n_slice / total, 3),
            "slice_rows": slice_rows,
            "slice_sec": slice_sec,
            "lookup_sec": lookup_sec,
        }
        print(f"{name}: slice {n_slice}/{total} files "
              f"({slice_sec}s), lookup {lookup_sec}s", flush=True)
        shutil.rmtree(work, ignore_errors=True)

    rows_equal = len({v["slice_rows"] for v in out["layouts"].values()}) == 1
    out["slice_rows_equal_across_layouts"] = rows_equal
    z = out["layouts"]["zorder"]
    lex = out["layouts"]["lex_key_leading"]
    out["zorder_prunes_vs_key_leading"] = z["slice_files"] < lex["slice_files"]
    out["host_calibration"]["after"] = host_calibration()
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "zorder.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
