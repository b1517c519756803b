#!/usr/bin/env python
"""Partial-update fold bench: what does column-level LWW cost?

Three replays of the SAME event volume at ``local[8]``:

* ``classic``      — patch_pct=0 feed on a patch-free table: the classic
  single ``max_by(row_struct)`` plan (control).
* ``fold_nopatch`` — patch_pct=0 feed on a table WITH ``_col_lsn``
  (installed by DDL before the replay): every batch pays the per-column
  fold machinery with zero patches in the data — the pure overhead of
  the K-column aggregation vs the row-struct one.
* ``fold_patch``   — patch_pct=30 feed: the real workload (smaller row
  images in exchange for the fold).

All three still plan ONE hash aggregation (one Exchange); the question
this bench answers is whether widening it to K max_by expressions moves
sustained events/s — the number that scales to 10^10 events.  Results →
``BENCH/patch.json`` with host calibration embedded.

Usage: ``python bench_patch.py``  (env: SPARK_GRAFT_PATCH_EVENTS,
SPARK_GRAFT_PATCH_TRIALS).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
CPUS = 8

TUNING = {
    "spark.local.dir": os.path.join(SHM, "sparktmp"),
    "spark.sql.files.maxPartitionBytes": "8m",
    "spark.sql.files.openCostInBytes": "512k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    "spark.driver.memory": "24g",
}


def _worker(mode: str, feed: str, warm_feed: str) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import types as T

    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.apply import read_clean
    from credix_data_pipeline_spark.schema import (
        CHANGE_SCHEMA,
        target_schema_for,
    )
    from credix_data_pipeline_spark.session import get_spark
    from credix_data_pipeline_spark.streaming import runner

    spark = get_spark(
        app_name=f"patch-{mode}", master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS, extra_conf=dict(TUNING),
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix=f"patch_{mode}_", dir=SHM)
    tp = os.path.join(work, "t")
    try:
        runner.replay(spark, warm_feed, os.path.join(work, "warm"),
                      chunks_per_batch=4, num_buckets=16,
                      collect_stats=False)
        if mode == "fold_nopatch":
            # install _col_lsn by DDL: every batch of the plain feed then
            # runs the fold machinery with zero patches in its data — the
            # pure overhead of K per-column max_by vs one row-struct one
            t = LakeTable.create(
                spark, tp, target_schema_for(CHANGE_SCHEMA),
                key=["conv_id", "turn_idx"], num_buckets=16,
                bucket_by=["conv_id"],
            )
            t.add_columns([T.StructField(
                "_col_lsn", T.MapType(T.StringType(), T.LongType()), True
            )])
        t0 = time.monotonic()
        runner.replay(spark, feed, tp, chunks_per_batch=8, num_buckets=16,
                      collect_stats=False)
        wall = time.monotonic() - t0
        t = LakeTable.load(spark, tp)
        rows = read_clean(t).count()
        fold = "_col_lsn" in {f.name for f in t.current().schema.fields}
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "wall_sec": round(wall, 3),
        "rows": rows,
        "fold_path": fold,
    }))


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3], sys.argv[4])
        return

    n_events = int(os.environ.get("SPARK_GRAFT_PATCH_EVENTS", "2000000"))
    trials = int(os.environ.get("SPARK_GRAFT_PATCH_TRIALS", "2"))

    sys.path.insert(0, REPO)
    from bench import host_calibration
    from credix_data_pipeline_spark.session import get_spark
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed

    gen = tempfile.mkdtemp(prefix="patchfeed_", dir=SHM)
    cal_before = host_calibration()
    results: dict[str, dict] = {}
    try:
        spark = get_spark(app_name="patchgen", master="local[32]",
                          shuffle_partitions=32, extra_conf=TUNING)
        spark.sparkContext.setLogLevel("ERROR")
        base = dict(
            n_events=n_events,
            n_conversations=n_events // 10,
            turns_per_conversation=10,
            delete_pct=4,
            duplicate_pct=3,
            events_per_chunk=max(50_000, n_events // 32),
        )
        write_feed(spark, os.path.join(gen, "plain"), FeedSpec(**base))
        write_feed(spark, os.path.join(gen, "patchy"),
                   FeedSpec(**{**base, "patch_pct": 30}))
        # TOAST-realistic: 30% patches all touching ONE column (the big
        # text column changed, everything else unavailable) — the shape
        # the fold's per-column pruning collapses to 3+1 agg states
        write_feed(spark, os.path.join(gen, "toast"),
                   FeedSpec(**{**base, "patch_pct": 30,
                               "patch_variants": (("text",),)}))
        write_feed(spark, os.path.join(gen, "warm"), FeedSpec(
            n_events=200_000, n_conversations=20_000))
        spark.stop()

        legs = {
            "classic": os.path.join(gen, "plain"),
            "fold_nopatch": os.path.join(gen, "plain"),
            "fold_patch": os.path.join(gen, "patchy"),
            "fold_patch_toast": os.path.join(gen, "toast"),
        }
        for mode, feed in legs.items():
            walls, meta = [], {}
            for _ in range(trials):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--worker",
                     mode, feed, os.path.join(gen, "warm")],
                    capture_output=True, text=True, check=True,
                )
                r = json.loads(out.stdout.strip().splitlines()[-1])
                walls.append(r["wall_sec"])
                meta = r
                print(json.dumps({"mode": mode, "trial": r}), flush=True)
            assert meta["fold_path"] == (mode != "classic")
            best = min(walls)
            results[mode] = {
                "wall_sec_best": best,
                "wall_sec_trials": walls,
                "events_per_sec": round(n_events / best),
                "final_rows": meta["rows"],
                "fold_path": meta["fold_path"],
            }
    finally:
        shutil.rmtree(gen, ignore_errors=True)

    artifact = {
        "bench": "partial-update fold cost",
        "cpus": CPUS,
        "n_events": n_events,
        "modes": results,
        "host_calibration": {"before": cal_before,
                             "after": host_calibration()},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "patch.json"), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
