#!/usr/bin/env python
"""OCC conflict-recovery bench: full re-merge retry vs metadata rebase.

N independent fan-in shard jobs race commits on ONE position-delete MoR
table.  Every lost version CAS costs the loser either a WHOLE re-merge
(profile + LWW arbitration + write — the only recovery before round 4) or,
with ``occ.additive-rebase=true``, an O(manifest) re-link onto the new
head.  At 1000 executors the commit rate scales with the shard count while
each merge's data job stays expensive, so conflict-recovery cost is the
difference between fan-in throughput scaling with shards or collapsing
into retry storms.

Three measured legs, same total event volume:

* ``serial``       — replay_fanin round-robin (one commit stream, zero
  conflicts): the no-contention reference.
* ``full_retry``   — N threads, rebase OFF (occ_retries re-merges).
* ``rebase``       — N threads, rebase ON (additive commits re-link).

Each leg reports wall, sustained events/s, and (for the concurrent legs)
how many commits record an ``occ_rebase`` marker.  Both concurrent legs
assert the final state row-count equals the serial leg's — conflicts must
never change the answer, only the cost.  Results land in
``BENCH/occ_rebase.json`` with host calibration embedded.

Usage: ``python bench_occ.py``  (env: SPARK_GRAFT_OCC_EVENTS total events,
SPARK_GRAFT_OCC_SHARDS, SPARK_GRAFT_OCC_TRIALS).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
CPUS = 8  # the host's honest-parallelism region (BENCH/BASELINE.md)

TUNING = {
    "spark.local.dir": os.path.join(SHM, "sparktmp"),
    "spark.sql.files.maxPartitionBytes": "8m",
    "spark.sql.files.openCostInBytes": "512k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    "spark.driver.memory": "24g",
}


def _worker(mode: str, feed_root: str, n_shards: int) -> None:
    sys.path.insert(0, REPO)
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.session import get_spark
    from credix_data_pipeline_spark.streaming import runner

    spark = get_spark(
        app_name=f"occ-{mode}", master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS, extra_conf=dict(TUNING),
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix=f"occ_{mode}_", dir=SHM)
    tp = os.path.join(work, "t")
    feeds = {f"s{k}": os.path.join(feed_root, f"s{k}")
             for k in range(n_shards)}
    try:
        t0 = time.monotonic()
        if mode == "serial":
            runner.replay_fanin(spark, feeds, tp, chunks_per_batch=1,
                                num_buckets=16, merge_mode="mor",
                                collect_stats=False)
        else:
            # create + first batch sequentially (absorbs the create race
            # outside the measurement of steady-state contention), then
            # declare the policy for the rebase leg
            runner.replay(spark, feeds["s0"], tp, chunks_per_batch=1,
                          num_buckets=16, source="s0", merge_mode="mor",
                          max_batches=1, collect_stats=False)
            if mode == "rebase":
                LakeTable.load(spark, tp).alter_properties(
                    {"occ.additive-rebase": "true"})
            errors: list[BaseException] = []

            def job(name: str, feed: str) -> None:
                try:
                    runner.replay(spark, feed, tp, chunks_per_batch=1,
                                  num_buckets=16, source=name,
                                  merge_mode="mor", occ_retries=64,
                                  collect_stats=False)
                except BaseException as e:  # pragma: no cover
                    errors.append(e)

            ts = [threading.Thread(target=job, args=(n, f))
                  for n, f in feeds.items()]
            for th in ts:
                th.start()
            for th in ts:
                th.join()
            if errors:
                raise errors[0]
        wall = time.monotonic() - t0
        t = LakeTable.load(spark, tp)
        from credix_data_pipeline_spark.operators.apply import read_clean

        rows = read_clean(t).count()
        rebases = sum(
            int(s.summary["occ_rebase"]["rebased_over"])
            for s in t.history() if "occ_rebase" in s.summary
        )
        commits = len(t.history())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "wall_sec": round(wall, 3),
        "rows": rows,
        "rebased_commits": rebases,
        "commits": commits,
    }))


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return

    n_events = int(os.environ.get("SPARK_GRAFT_OCC_EVENTS", "1600000"))
    n_shards = int(os.environ.get("SPARK_GRAFT_OCC_SHARDS", "4"))
    trials = int(os.environ.get("SPARK_GRAFT_OCC_TRIALS", "2"))

    sys.path.insert(0, REPO)
    from bench import host_calibration
    from credix_data_pipeline_spark.session import get_spark
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed

    gen = tempfile.mkdtemp(prefix="occfeed_", dir=SHM)
    cal_before = host_calibration()
    results: dict[str, dict] = {}
    try:
        spark = get_spark(app_name="occgen", master="local[32]",
                          shuffle_partitions=32, extra_conf=TUNING)
        spark.sparkContext.setLogLevel("ERROR")
        # small chunks => one commit per ~events/chunk rows => the commit
        # rate (and so the conflict rate) is the experimental variable
        base = dict(
            n_events=n_events,
            n_conversations=n_events // 50,
            turns_per_conversation=10,
            delete_pct=4,
            duplicate_pct=3,
            events_per_chunk=max(10_000, n_events // n_shards // 24),
            n_shards=n_shards,
        )
        for k in range(n_shards):
            write_feed(spark, os.path.join(gen, f"s{k}"),
                       FeedSpec(**{**base, "shard": k}))
        spark.stop()

        serial_rows = None
        for mode in ("serial", "full_retry", "rebase"):
            walls, meta = [], {}
            for _ in range(trials):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--worker",
                     mode, gen, str(n_shards)],
                    capture_output=True, text=True, check=True,
                )
                r = json.loads(out.stdout.strip().splitlines()[-1])
                walls.append(r["wall_sec"])
                meta = r
                print(json.dumps({"mode": mode, "trial": r}), flush=True)
            if mode == "serial":
                serial_rows = meta["rows"]
            else:
                assert meta["rows"] == serial_rows, (
                    f"{mode} diverged: {meta['rows']} vs {serial_rows}")
            best = min(walls)
            results[mode] = {
                "wall_sec_best": best,
                "wall_sec_trials": walls,
                "events_per_sec": round(n_events / best),
                "final_rows": meta["rows"],
                "commits": meta["commits"],
                "rebased_commits": meta["rebased_commits"],
            }
    finally:
        shutil.rmtree(gen, ignore_errors=True)

    artifact = {
        "bench": "occ conflict recovery (fan-in)",
        "cpus": CPUS,
        "n_events": n_events,
        "n_shards": n_shards,
        "modes": results,
        "host_calibration": {"before": cal_before,
                             "after": host_calibration()},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "occ_rebase.json"), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
