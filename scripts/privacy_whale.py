#!/usr/bin/env python
"""Privacy-suppression whale datapoint: ONE quasi-identifier class with
millions of rows (the bot-user / default-value shape). The operator's
docstring claims the agg + semi-join-back formulation is whale-safe
where the ``count() OVER (PARTITION BY qi)`` window formulation
concentrates the whale class in one sort task — this measures both on
the same fixture.

Expectation (taxonomy): the window formulation is sessionize-class
(sort-bound, spill-safe, one long task); the semi-join formulation's
aggregate combines map-side (the whale class collapses to ONE row
before the shuffle) and the join-back streams, so no task should
concentrate.

Prints one JSON line per (formulation, run) with wall + spill deltas
from the UI REST API (same readers as pit_whale_spill.py).

Usage: python scripts/privacy_whale.py [--whale-rows 20000000]
       [--driver-mem 3g] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window, functions as F

from pit_whale_spill import max_task_profile, next_stage_id, spill_totals

from feast_ibm_spark.operators.privacy import suppress_small_classes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--whale-rows", type=int, default=20_000_000)
    ap.add_argument("--bg-rows", type=int, default=1_000_000)
    ap.add_argument("--n-bg-classes", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--driver-mem", default="3g")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("privacy-whale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # whale QI class (0, 0) with whale_rows rows; background classes of
    # size ~bg_rows/n_bg_classes (size 10 at the defaults — all >= k, so
    # the survivor set is every row; singletons would not change the
    # concentration story, only the output size)
    whale = spark.range(args.whale_rows).select(
        F.lit(0).alias("qa"), F.lit(0).alias("qb"),
        F.col("id").alias("payload"),
    )
    bg = spark.range(args.bg_rows).select(
        (F.col("id") % args.n_bg_classes + 1).cast("int").alias("qa"),
        F.lit(1).alias("qb"),
        F.col("id").alias("payload"),
    )
    df = whale.unionByName(bg).persist()
    n = df.count()
    print(json.dumps({"setup": {"rows": n, "whale_rows": args.whale_rows,
                                "k": args.k}}), flush=True)

    def via_window():
        w = Window.partitionBy("qa", "qb")
        return (
            df.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter(F.col("__n") >= args.k)
            .drop("__n")
        )

    def via_semi_join():
        return suppress_small_classes(df, ["qa", "qb"], args.k)

    for name, fn in (("semi_join", via_semi_join), ("window", via_window)):
        for i in range(args.runs):
            before = spill_totals(spark)
            first_stage = next_stage_id(spark)
            t0 = time.time()
            kept = fn().count()
            wall = round(time.time() - t0, 1)
            after = spill_totals(spark)
            print(json.dumps({
                "formulation": name, "run": i, "kept": kept,
                "wall_s": wall,
                "spill_mem_gb": round(
                    (after["memoryBytesSpilled"]
                     - before["memoryBytesSpilled"]) / 2**30, 2),
                "spill_disk_gb": round(
                    (after["diskBytesSpilled"]
                     - before["diskBytesSpilled"]) / 2**30, 2),
                **max_task_profile(spark, first_stage),
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
