#!/usr/bin/env python
"""Hot-key skew bench: throughput under skewed change streams.

The north-star workload calls out hot-conversation skew explicitly: change
events are salted and the MERGE is a map-side-combining hash aggregation so
one viral conversation cannot serialize the stream.  This bench MEASURES
that claim by replaying the same-size feed at ``local[8]`` under four
shapes and reporting sustained events/sec for each:

* ``uniform``       — insert-heavy baseline (keys ~ events, hot_pct=0).
* ``hot_churn``     — 50% of all events redirected to ONE conversation's
  10 turn keys: the stream-skew worst case (1M updates on 10 keys).  The
  LWW ``max_by`` agg combines map-side, so each reducer sees ~(map tasks ×
  10) rows regardless of the churn volume.
* ``giant_conv``    — 4 conversations × 125k turns with 40% of events on
  conversation 0: the STATE-skew case (one bucket holds ~4× its fair
  share of final rows).  The REBALANCE(bucket, salt) write plus AQE's
  skew-split keeps write tasks byte-sized.
* ``giant_nosalt``  — the same feed with ``write_salt=1`` (salting
  disabled): the control showing what the salt contributes on top of
  AQE's optimizeSkewsInRebalancePartitions.

Each scenario runs in a fresh subprocess (own JVM) after a warm-up replay;
feed/table/shuffle live on tmpfs (see bench_scaling.py for why).  Per-
scenario per-bucket row shares are reported so the artifact itself proves
the input skew was real.  Results land in ``BENCH/skew.json``.

Usage: ``python bench_skew.py``  (env: SPARK_GRAFT_SKEW_EVENTS,
SPARK_GRAFT_SKEW_TRIALS).
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
CPUS = 8  # inside the host's honest-parallelism region (BENCH/BASELINE.md)

TUNING = {
    "spark.local.dir": os.path.join(SHM, "sparktmp"),
    "spark.sql.files.maxPartitionBytes": "8m",
    "spark.sql.files.openCostInBytes": "512k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    "spark.driver.memory": "24g",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
}


def _specs(n_events: int) -> dict[str, tuple[dict, int]]:
    """scenario -> (FeedSpec kwargs, write_salt)."""
    churn = dict(
        n_events=n_events,
        n_conversations=max(100, n_events // 10),
        turns_per_conversation=10,
        delete_pct=5,
        duplicate_pct=3,
        shuffle_window=64,
        events_per_chunk=max(5_000, n_events // 32),
    )
    giant = dict(churn, n_conversations=4,
                 turns_per_conversation=max(10, n_events // 16))
    return {
        "uniform": (dict(churn, hot_pct=0), 4),
        "hot_churn": (dict(churn, hot_pct=50), 4),
        "giant_conv": (dict(giant, hot_pct=40), 4),
        "giant_nosalt": (dict(giant, hot_pct=40), 1),
    }


def _worker(feed: str, warm_feed: str, write_salt: int) -> None:
    sys.path.insert(0, REPO)
    from credix_data_pipeline_spark.functions.normalize import (
        with_normalized_text,
    )
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.lakehouse.metadata import partitions_df
    from credix_data_pipeline_spark.session import get_spark
    from credix_data_pipeline_spark.streaming import runner

    spark = get_spark(
        app_name=f"skew{write_salt}",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        extra_conf=dict(TUNING),
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="skew_", dir=SHM)
    try:
        runner.replay(
            spark, warm_feed, os.path.join(work, "warm"),
            chunks_per_batch=4, num_buckets=16,
            transform=with_normalized_text, collect_stats=False,
        )
        t0 = time.monotonic()
        runner.replay(
            spark, feed, os.path.join(work, "t"),
            chunks_per_batch=32, num_buckets=16,
            transform=with_normalized_text, collect_stats=False,
            write_salt=write_salt,
        )
        wall = time.monotonic() - t0
        t = LakeTable.load(spark, os.path.join(work, "t"))
        shares = {
            str(r["bucket"]): r["row_count"]
            for r in partitions_df(t).collect()
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    total = sum(shares.values())
    top = max(shares.values()) if shares else 0
    print(json.dumps({
        "wall_sec": round(wall, 3),
        "rows": total,
        "top_bucket_share_pct": round(100.0 * top / max(1, total), 1),
    }))


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return

    n_events = int(os.environ.get("SPARK_GRAFT_SKEW_EVENTS", "2000000"))
    trials = int(os.environ.get("SPARK_GRAFT_SKEW_TRIALS", "2"))

    sys.path.insert(0, REPO)
    from bench import host_calibration
    from credix_data_pipeline_spark.session import get_spark
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed

    gen = tempfile.mkdtemp(prefix="skewfeed_", dir=SHM)
    cal_before = host_calibration()
    results: dict[str, dict] = {}
    try:
        spark = get_spark(app_name="skewgen", master="local[32]",
                          shuffle_partitions=32, extra_conf=TUNING)
        spark.sparkContext.setLogLevel("ERROR")
        warm = os.path.join(gen, "warm")
        write_feed(spark, warm, FeedSpec(n_events=200_000,
                                         n_conversations=20_000))
        feeds: dict[str, tuple[str, int]] = {}
        for name, (kw, salt) in _specs(n_events).items():
            path = os.path.join(gen, name.split("_")[0] if name.startswith(
                "giant") else name)
            if not os.path.isdir(path):  # giant feeds shared across salts
                write_feed(spark, path, FeedSpec(**kw))
            feeds[name] = (path, salt)
        spark.stop()

        for name, (path, salt) in feeds.items():
            walls, meta = [], {}
            for _ in range(trials):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--worker",
                     path, warm, str(salt)],
                    capture_output=True, text=True, check=True,
                )
                r = json.loads(out.stdout.strip().splitlines()[-1])
                walls.append(r["wall_sec"])
                meta = r
                print(json.dumps({"scenario": name, "trial": r}), flush=True)
            best = min(walls)
            results[name] = {
                "wall_sec_best": best,
                "wall_sec_trials": walls,
                "events_per_sec": round(n_events / best),
                "final_rows": meta["rows"],
                "top_bucket_share_pct": meta["top_bucket_share_pct"],
                "write_salt": salt,
            }
    finally:
        shutil.rmtree(gen, ignore_errors=True)

    artifact = {
        "bench": "hot-key skew",
        "cpus": CPUS,
        "n_events": n_events,
        "scenarios": results,
        "host_calibration": {"before": cal_before,
                             "after": host_calibration()},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "skew.json"), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
