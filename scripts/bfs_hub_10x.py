#!/usr/bin/env python
"""BFS frontier-expansion hub datapoint (round 10): does a celebrity hub
make bfs_levels a whale?

Hazard under test: level-synchronous BFS joins the FRONTIER against the
edge list each round. A hub with fan-out f puts f rows into one round's
discovery set — if those f rows had to sort or build state in one task,
the hub would be a whale. They do not: the dedup is distinct() (hash
aggregate with map-side partial combine, the same absorption the
PageRank hub datapoint measured), and the anti-join probes the visited
set with the frontier as the streamed side.

Fixture: a hub node 0 with --fan-out direct neighbors (default 2M), each
neighbor chaining to --chain more nodes (second ring), plus --noise
random background edges. BFS from the hub at max_hops=3 must label
1 + fan_out + chain rings exactly. Prints one JSON line per run with
wall, per-ring counts, and max-task profile from the UI REST API.

Usage: python scripts/bfs_hub_10x.py [--fan-out 2000000] [--runs 2]
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

from feast_ibm_spark.operators.graph import bfs_levels


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fan-out", type=int, default=2_000_000)
    ap.add_argument("--chain", type=int, default=2_000_000)
    ap.add_argument("--noise", type=int, default=4_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--driver-mem", default="8g")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bfs-hub-10x")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ring 1: hub 0 -> [1, fan_out]; ring 2: i -> i + fan_out (chain of
    # the first `chain` ring-1 nodes); noise: far-id pairs never reached
    ring1 = spark.range(1, args.fan_out + 1).select(
        F.lit(0).cast("bigint").alias("src"), F.col("id").alias("dst"))
    ring2 = spark.range(1, args.chain + 1).select(
        F.col("id").alias("src"),
        (F.col("id") + args.fan_out).alias("dst"))
    base = 10 * (args.fan_out + args.chain)
    noise = spark.range(args.noise).select(
        (base + F.col("id")).alias("src"),
        (base + F.pmod(F.col("id") * 2654435761, F.lit(args.noise)))
        .alias("dst"))
    edges = ring1.unionByName(ring2).unionByName(noise) \
        .localCheckpoint(eager=True)
    src = spark.createDataFrame([(0,)], "node bigint")

    for run in range(args.runs):
        since = next_stage_id(spark)
        before = spill_totals(spark)
        t0 = time.time()
        out = bfs_levels(edges, src, max_hops=3)
        rings = {int(r.lvl): r.n for r in
                 out.groupBy("lvl").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
        wall = time.time() - t0
        after = spill_totals(spark)
        prof = max_task_profile(spark, since)
        print(json.dumps({
            "fan_out": args.fan_out, "run": run,
            "wall_s": round(wall, 1), "rings": rings,
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
