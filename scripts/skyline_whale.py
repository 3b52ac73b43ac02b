#!/usr/bin/env python
"""Skyline whale datapoint: all-distinct minimize values — the worst
case for the global_window tier, whose running max is ONE unpartitioned
window (the groupBy(minimize) stage-1 reduction collapses nothing, so
the single sorted partition sees every row). The bucketed tier spreads
the same running max over n_buckets partitioned windows plus a bounded
driver collect, so its worst task is ~rows/n_buckets.

Expectation (taxonomy): global_window is sessionize-class — sort-bound,
spill-safe, O(1) post-sort state — so it should COMPLETE with spill and
one long task; bucketed should show no single-task concentration. Both
must return the identical frontier.

Prints one JSON line per (strategy, run) with wall + spill deltas from
the UI REST API (same readers as pit_whale_spill.py).

Usage: python scripts/skyline_whale.py [--rows 20000000]
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

from feast_ibm_spark.operators.skyline import pareto_frontier_2d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--driver-mem", default="3g")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--n-buckets", type=int, default=256)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("skyline-whale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # every row a DISTINCT minimize value (p = id), s hash-derived and
    # deterministic: stage-1 groupBy(p) collapses nothing — the whole
    # input reaches the running max
    df = spark.range(args.rows).select(
        F.col("id").cast("double").alias("p"),
        F.pmod(F.hash(F.col("id")), F.lit(1_000_000)).alias("s"),
    ).persist()
    n = df.count()
    print(json.dumps({"setup": {"rows": n, "n_buckets": args.n_buckets}}),
          flush=True)

    frontiers = {}
    for strategy in ("bucketed", "global_window", "auto"):
        for i in range(args.runs):
            before = spill_totals(spark)
            first_stage = next_stage_id(spark)
            t0 = time.time()
            try:
                out = pareto_frontier_2d(
                    df, "p", "s", strategy=strategy,
                    n_buckets=args.n_buckets,
                )
                rows = sorted(map(tuple, out.collect()))
            except Exception as e:  # a tier at its heap edge must not
                print(json.dumps({   # kill the other tiers' datapoints
                    "strategy": strategy, "run": i,
                    "error": type(e).__name__,
                    "wall_s": round(time.time() - t0, 1),
                }), flush=True)
                continue
            wall = round(time.time() - t0, 1)
            after = spill_totals(spark)
            frontiers.setdefault(strategy, rows)
            print(json.dumps({
                "strategy": strategy, "run": i,
                "frontier_rows": len(rows), "wall_s": wall,
                "spill_mem_gb": round(
                    (after["memoryBytesSpilled"]
                     - before["memoryBytesSpilled"]) / 2**30, 2),
                "spill_disk_gb": round(
                    (after["diskBytesSpilled"]
                     - before["diskBytesSpilled"]) / 2**30, 2),
                **max_task_profile(spark, first_stage),
            }), flush=True)
    done = [s for s in frontiers if frontiers[s]]
    assert all(frontiers[s] == frontiers[done[0]] for s in done), (
        "tier mismatch on the whale fixture"
    )
    print(json.dumps({"tiers_identical": sorted(done),
                      "frontier": frontiers[done[0]][:5]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
