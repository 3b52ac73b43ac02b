#!/usr/bin/env python
"""Sessionize whale-key datapoint: the bot-user hazard the operator
docstring names (one key with millions of events = one window partition
sorted in one task). Unlike the PIT melt there is no salted variant to
compare — the point is to measure that the lag + running-sum window is
sort-bound and spill-safe, not state-bound: per-row state after the sort
is O(1) (previous timestamp + running counter), so the only pressure is
the partition sort itself, which UnsafeExternalSorter spills.

Prints one JSON line per run with wall + spill deltas from the UI REST
API (same readers as pit_whale_spill.py).

Usage: python scripts/sessionize_whale.py [--whale-rows 20000000]
       [--driver-mem 3g] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from pit_whale_spill import max_task_profile, next_stage_id, spill_totals

from feast_ibm_spark.operators.sessionize import sessionize


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--whale-rows", type=int, default=20_000_000)
    ap.add_argument("--bg-rows", type=int, default=1_000_000)
    ap.add_argument("--n-bg-keys", type=int, default=1000)
    ap.add_argument("--gap-seconds", type=int, default=1800)
    ap.add_argument("--driver-mem", default="3g")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sessionize-whale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # whale key 0: one event every ~37s with jitter-free arithmetic so
    # session structure is deterministic (gap 1800s is never exceeded →
    # one giant session; the alternate stride every 50k rows forces a
    # boundary so the groupBy also sees many sessions)
    whale = spark.range(args.whale_rows).select(
        F.lit(0).cast("bigint").alias("user_id"),
        F.timestamp_micros(
            F.lit(1704067200000000)
            + F.col("id") * 37_000_000
            + (F.col("id") / 50_000).cast("bigint") * 3_600_000_000
        ).alias("ts"),
    )
    bg = spark.range(args.bg_rows).select(
        (F.col("id") % args.n_bg_keys + 1).alias("user_id"),
        F.timestamp_micros(
            F.lit(1704067200000000) + F.col("id") * 11_000_000
        ).alias("ts"),
    )
    events = whale.unionByName(bg).persist()
    n = events.count()
    print(json.dumps({"setup": {"rows": n, "whale_rows": args.whale_rows,
                                "gap_s": args.gap_seconds}}), flush=True)

    for i in range(args.runs):
        before = spill_totals(spark)
        first_stage = next_stage_id(spark)
        t0 = time.time()
        out = sessionize(events, ["user_id"], "ts",
                         gap_seconds=args.gap_seconds)
        n_sessions = out.count()
        whale_sessions = out.filter("user_id = 0").count()
        wall = round(time.time() - t0, 1)
        after = spill_totals(spark)
        print(json.dumps({
            "run": i, "sessions": n_sessions,
            "whale_sessions": whale_sessions, "wall_s": wall,
            "spill_mem_gb": round(
                (after["memoryBytesSpilled"] - before["memoryBytesSpilled"]) / 2**30, 2),
            "spill_disk_gb": round(
                (after["diskBytesSpilled"] - before["diskBytesSpilled"]) / 2**30, 2),
            **max_task_profile(spark, first_stage),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
