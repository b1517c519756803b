#!/usr/bin/env python
"""Sustained-scale soak on the round-4 table format (r4 verdict ask #4).

r3 proved 64M events on plain CoW; this soak replays 128M+ (env-tunable)
events through the FULL round-4 surface in one run:

* merge_mode="mor" (position-delete MoR) with policy maintenance
  (``maintenance.small-files-per-bucket`` + ``retention.auto``) run
  between phases;
* a mid-run GDPR purge (``delete_keys`` of 500 conversations) after
  ~40% of the stream;
* a mid-run row-TTL (``delete_older_than``) after ~70%;
* final ``maintain()`` + a byte-equality check of ``read_clean`` against
  an INDEPENDENT distributed oracle: a from-scratch Spark LWW fold of
  the same feed chunks, phase-cut at the same batch boundaries with the
  same purge/TTL applied between folds (different plan family than the
  engine's incremental posdel merges — one groupBy max_by per phase).

Reported per phase: wall, sustained events/s, driver RSS (VmRSS — the
10^10 extrapolation needs it FLAT: all driver state is O(buckets), never
O(rows)), snapshot count and live-file count.  Results →
``BENCH/soak.json`` with host calibration embedded.

Usage: ``python bench_soak.py``  (env: SPARK_GRAFT_SOAK_EVENTS=128000000,
SPARK_GRAFT_SOAK_CPUS=16).
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

TUNING = {
    "spark.local.dir": os.path.join(SHM, "sparktmp"),
    "spark.sql.files.maxPartitionBytes": "16m",
    "spark.sql.files.openCostInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32m",
    "spark.driver.memory": "48g",
}

PURGE_CONVS = 500
BASE_EPOCH_S = 1_700_000_000  # sources/feed.py fixed epoch


def _rss_mb(pid: int | None = None) -> int:
    """VmRSS in MB — of the JVM DRIVER process when ``pid`` is given (the
    python launcher's own RSS is not where table metadata lives)."""
    path = f"/proc/{pid}/status" if pid else "/proc/self/status"
    with open(path) as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) // 1024
    return -1


def main() -> None:
    n_events = int(os.environ.get("SPARK_GRAFT_SOAK_EVENTS", "128000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_SOAK_CPUS", "16"))

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from bench import host_calibration
    from credix_data_pipeline_spark.lakehouse import LakeTable
    from credix_data_pipeline_spark.operators.apply import read_clean
    from credix_data_pipeline_spark.operators.maintenance import maintain
    from credix_data_pipeline_spark.session import get_spark
    from credix_data_pipeline_spark.sources.feed import FeedSpec, write_feed
    from credix_data_pipeline_spark.streaming import runner

    cal_before = host_calibration()
    spark = get_spark(app_name="soak", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus, extra_conf=dict(TUNING))
    spark.sparkContext.setLogLevel("ERROR")

    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
    work = tempfile.mkdtemp(prefix="soak_", dir=SHM)
    feed = os.path.join(work, "feed")
    tp = os.path.join(work, "t")
    spec = FeedSpec(
        n_events=n_events,
        n_conversations=n_events // 40,     # keys = n/4: update-heavy
        turns_per_conversation=10,
        delete_pct=4,
        duplicate_pct=3,
        events_per_chunk=int(os.environ.get(
            "SPARK_GRAFT_SOAK_CHUNK", str(max(500_000, n_events // 64)))),
    )
    chunks_per_batch = 4
    n_batches = -(-spec.n_chunks // chunks_per_batch)
    cut_a = max(1, int(n_batches * 0.4))
    cut_b = max(cut_a + 1, int(n_batches * 0.7))
    ttl_cutoff_ms = (BASE_EPOCH_S + int(n_events * 0.35)) * 1000
    purge_vals = [f"conv{i:08d}" for i in range(PURGE_CONVS)]

    phases: list[dict] = []
    try:
        t0 = time.monotonic()
        write_feed(spark, feed, spec)
        gen_sec = time.monotonic() - t0
        print(json.dumps({"feed_gen_sec": round(gen_sec, 1)}), flush=True)

        def snap_stats():
            t = LakeTable.load(spark, tp)
            s = t.current()
            return {
                "version": s.version,
                "live_files": sum(len(v) for v in s.files.values()),
                "rss_mb": _rss_mb(jvm_pid),
            }

        def run_phase(name, max_batches, after=None):
            t1 = time.monotonic()
            st = runner.replay(
                spark, feed, tp, chunks_per_batch=chunks_per_batch,
                num_buckets=64, collect_stats=False, merge_mode="mor",
                max_batches=max_batches,
            )
            wall = time.monotonic() - t1
            extra = {}
            if after:
                t2 = time.monotonic()
                extra = after()
                extra["post_ops_sec"] = round(time.monotonic() - t2, 1)
            ph = {
                "phase": name,
                "batches": st.batches,
                "rows_in": st.rows_in,
                "wall_sec": round(wall, 1),
                "events_per_sec": round(st.rows_in / wall) if wall else 0,
                **snap_stats(),
                **extra,
            }
            phases.append(ph)
            print(json.dumps(ph), flush=True)

        def after_a():
            t = LakeTable.load(spark, tp)
            t.alter_properties({
                "maintenance.small-files-per-bucket": "6",
                "retention.auto": "true",
                "retention.keep-last": "5",
            })
            r = t.delete_keys(purge_vals)
            m = maintain(t)
            return {"purged_snapshot": r.version,
                    "maintain_compacted": bool(m.get("compacted"))}

        def after_b():
            t = LakeTable.load(spark, tp)
            r = t.delete_older_than(ttl_cutoff_ms)
            m = maintain(t)
            return {"ttl_snapshot": r.version,
                    "maintain_ran": bool(m is not None)}

        def after_c():
            m = maintain(LakeTable.load(spark, tp))
            return {"final_maintain_compacted": bool(m.get("compacted"))}

        run_phase("A", cut_a, after=after_a)
        run_phase("B", cut_b - cut_a, after=after_b)
        run_phase("C", None, after=after_c)

        # ---------------- independent distributed oracle ----------------
        t3 = time.monotonic()
        man = json.load(open(os.path.join(feed, "_feed.json")))
        chunk_dirs = [os.path.join(feed, c) for c in man["chunks"]]

        def fold(ev, prior):
            # ev: raw change events (op/lsn/commit_ts + payload)
            side = ev.select(
                "conv_id", "turn_idx", "role", "text", "tool", "ts",
                F.col("lsn"), (F.col("op") == "D").alias("_d"),
                F.coalesce(F.unix_micros(F.col("commit_ts")), F.lit(0))
                .alias("_c"),
                F.lit(1).alias("_s"),
            )
            if prior is not None:
                side = prior.select(
                    "conv_id", "turn_idx", "role", "text", "tool", "ts",
                    F.col("_lsn").alias("lsn"), F.col("_d"),
                    F.lit(0).cast("long").alias("_c"),
                    F.lit(0).alias("_s"),
                ).unionByName(side)
            w = F.max_by(
                F.struct("role", "text", "tool", "ts", "lsn", "_d"),
                F.struct(F.col("lsn"), F.col("_s"), F.col("_c")),
            ).alias("w")
            g = side.groupBy("conv_id", "turn_idx").agg(w)
            return g.select(
                "conv_id", "turn_idx",
                *[F.when(F.col("w._d"), F.lit(None).cast(t)).otherwise(
                    F.col(f"w.{c}")).alias(c)
                  for c, t in (("role", "string"), ("text", "string"),
                               ("tool", "string"), ("ts", "timestamp"))],
                F.col("w.lsn").alias("_lsn"), F.col("w._d").alias("_d"),
            )

        cpb = chunks_per_batch
        cuts = [cut_a * cpb, cut_b * cpb, len(chunk_dirs)]
        st = None
        for i, hi in enumerate(cuts):
            lo = 0 if i == 0 else cuts[i - 1]
            ev = spark.read.option("mergeSchema", "false").parquet(
                *chunk_dirs[lo:hi])
            st = fold(ev, st).localCheckpoint(eager=True)
            if i == 0:
                st = st.filter(~F.col("conv_id").isin(purge_vals))
            if i == 1:
                st = st.filter(
                    F.col("_d") | F.col("ts").isNull()
                    | (F.unix_millis(F.col("ts")) >= ttl_cutoff_ms)
                )
        oracle_live = st.filter(~F.col("_d")).select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts", "_lsn")

        got = read_clean(LakeTable.load(spark, tp)).select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts", "_lsn")
        extra = got.exceptAll(oracle_live).count()
        missing = oracle_live.exceptAll(got).count()
        oracle_sec = time.monotonic() - t3
        n_rows = got.count()
        print(json.dumps({"oracle_sec": round(oracle_sec, 1),
                          "rows": n_rows, "extra": extra,
                          "missing": missing}), flush=True)
        assert extra == 0 and missing == 0, (extra, missing)

        total_wall = sum(p["wall_sec"] for p in phases)
        artifact = {
            "bench": "128M+ MoR soak with mid-run purge + TTL + policy "
                     "maintenance, oracle-verified",
            "cpus": cpus,
            "n_events": n_events,
            "phases": phases,
            "total_replay_sec": round(total_wall, 1),
            "sustained_events_per_sec": round(
                sum(p["rows_in"] for p in phases) / total_wall),
            "driver_rss_mb": [p["rss_mb"] for p in phases],
            "final_rows": n_rows,
            "oracle": {"sec": round(oracle_sec, 1), "extra": extra,
                       "missing": missing, "match": True},
            "host_calibration": {"before": cal_before,
                                 "after": host_calibration()},
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "soak.json"), "w") as f:
            json.dump(artifact, f, indent=2)
        print(json.dumps(artifact, indent=2))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
