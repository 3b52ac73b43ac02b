#!/usr/bin/env python
"""Interval-union hot-key whale (round 11): does ONE key owning tens of
millions of intervals sink merge_intervals?

Hazard under test: the gaps-and-islands merge runs two window frames
over one (key, start) sort — all of a key's intervals land in ONE task.
The claim in COVERAGE.md is that the shape "survives any per-key
interval count the window's spillable row buffer survives"; this script
turns that claim into numbers: a single whale supplier with --whale
intervals (default 20M) beside --noise background rows spread over 10k
normal keys. Reports wall, islands found on the whale key, spill, and
the max-task profile.

The fixture interleaves short overlapping runs with strict gaps so the
island count is large and known analytically: starts at i*3 with length
4 merge consecutive runs (3 <= 4), so one island per contiguous block;
blocks of B=1000 runs separated by a 10-unit gap give whale/B islands.

Usage: python scripts/interval_whale.py [--whale 20000000] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from pit_whale_spill import max_task_profile, next_stage_id, spill_totals

from feast_ibm_spark.operators.interval import merge_intervals

BLOCK = 1000  # runs per contiguous block on the whale key


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--whale", type=int, default=20_000_000)
    ap.add_argument("--noise", type=int, default=10_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--driver-mem", default="8g")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("interval-whale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # whale key 0: run i covers [base(i), base(i)+4] where base advances
    # 3 per run inside a block and jumps 10 between blocks -> islands of
    # exactly BLOCK runs each
    whale = spark.range(args.whale).select(
        F.lit(0).cast("bigint").alias("k"),
        (
            (F.col("id") % BLOCK) * 3
            + (F.col("id") / BLOCK).cast("bigint") * (BLOCK * 3 + 10)
        ).alias("s"),
    ).withColumn("e", F.col("s") + 4)
    noise = spark.range(args.noise).select(
        (1 + F.pmod(F.col("id"), F.lit(10_000))).alias("k"),
        (F.col("id") * 7 % 1_000_000).alias("s"),
    ).withColumn("e", F.col("s") + 3)
    df = whale.unionByName(noise).localCheckpoint(eager=True)

    want_islands = -(-args.whale // BLOCK)  # ceil
    for run in range(args.runs):
        since = next_stage_id(spark)
        before = spill_totals(spark)
        t0 = time.time()
        out = merge_intervals(df, ["k"], "s", "e")
        whale_islands = out.filter(F.col("k") == 0).count()
        wall = time.time() - t0
        after = spill_totals(spark)
        prof = max_task_profile(spark, since)
        print(json.dumps({
            "whale_rows": args.whale, "run": run,
            "wall_s": round(wall, 1),
            "whale_islands": whale_islands,
            "islands_ok": whale_islands == want_islands,
            "spill_disk_gb": round(
                (after["diskBytesSpilled"] - before["diskBytesSpilled"])
                / 2**30, 2),
            "spill_mem_gb": round(
                (after["memoryBytesSpilled"] - before["memoryBytesSpilled"])
                / 2**30, 2),
            **{k: round(v, 2) for k, v in prof.items()},
        }), flush=True)


if __name__ == "__main__":
    main()
