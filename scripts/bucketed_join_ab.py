#!/usr/bin/env python
"""Bucketed-vs-raw co-located join A/B (round 10): the measured datapoint
behind sources/bucketed.py's write-once-shuffle-never claim, at a scale
where the shuffle actually costs something.

Fixture: a synthetic fact (``--fact-rows``, default 20M) over a ``--keys``
key space (default 1M) plus a per-key dim, both persisted twice — once as
plain parquet, once as catalog tables bucketed by key. The measured query
is the layout_bucketed_join shape: per-key fact aggregate joined to the
dim (merge hint, broadcast disabled). Prints one JSON line per (variant,
run) with wall + shuffle-write bytes from the UI REST API — the bucketed
variant's shuffleWrite should be ~0 (scan-side exchanges gone), the raw
variant pays the full fact + dim shuffle every query.

Usage: python scripts/bucketed_join_ab.py [--fact-rows 20000000]
       [--keys 1000000] [--runs 2] [--driver-mem 8g]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from pit_whale_spill import spill_totals

from feast_ibm_spark.sources.bucketed import write_bucketed

N_BUCKETS = 32


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fact-rows", type=int, default=20_000_000)
    ap.add_argument("--keys", type=int, default=1_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--driver-mem", default="8g")
    ap.add_argument("--dest", default="/tmp/fis_bucketed_ab")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bucketed-join-ab")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.sql.warehouse.dir", os.path.join(args.dest, "wh"))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(args.dest, ignore_errors=True)

    fact = spark.range(args.fact_rows).select(
        (F.col("id") % args.keys).alias("k"),
        (F.pmod(F.col("id") * 2654435761, F.lit(100_000))).alias("cents"),
    )
    dim = spark.range(args.keys).select(
        F.col("id").alias("k"),
        F.conv(F.col("id") * 1000003 % 10**12, 10, 36).alias("attr"),
    )
    fact.write.mode("overwrite").parquet(os.path.join(args.dest, "fact_raw"))
    dim.write.mode("overwrite").parquet(os.path.join(args.dest, "dim_raw"))
    write_bucketed(fact, "ab_fact_b", ["k"], N_BUCKETS, sort_cols=["k"])
    write_bucketed(dim, "ab_dim_b", ["k"], N_BUCKETS, sort_cols=["k"])

    def q(f, d):
        agg = f.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        return agg.join(d.hint("merge"), "k")

    variants = {
        "bucketed": lambda: q(spark.table("ab_fact_b"),
                              spark.table("ab_dim_b")),
        "raw": lambda: q(
            spark.read.parquet(os.path.join(args.dest, "fact_raw")),
            spark.read.parquet(os.path.join(args.dest, "dim_raw"))),
    }
    for name, mk in variants.items():
        for run in range(args.runs):
            before = spill_totals(spark)
            t0 = time.time()
            n = mk().count()
            wall = time.time() - t0
            after = spill_totals(spark)
            print(json.dumps({
                "variant": name, "run": run, "rows": n,
                "wall_s": round(wall, 2),
                "shuffle_write_gb": round(
                    (after["shuffleWriteBytes"]
                     - before["shuffleWriteBytes"]) / 2**30, 3),
            }), flush=True)
    shutil.rmtree(args.dest, ignore_errors=True)


if __name__ == "__main__":
    main()
