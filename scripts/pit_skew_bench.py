#!/usr/bin/env python
"""Hot-SPINE skew benchmark for the PIT melt strategies (VERDICT r6 item 3).

Round 4 measured a 50%-hot-key FEATURE side (NOTES.md "PIT strategy
choice"); the open question was the hot SPINE at 10x: a key holding
millions of SPINE rows puts them all in one plain-melt window partition.
This script synthesizes that shape from sf0.1 events:

- feature side: sf0.1 events replicated REPL_FEAT times (~5M rows,
  natural key distribution, user_id as join key)
- spine: N_SPINE rows, HOT_FRAC of them on user_id=0 with distinct
  timestamps, the rest uniform over the other keys

and times plain melt vs salted melt (3 warm runs each), printing one
JSON line per cell so the crossover can be recorded in NOTES.md and the
``salt_partition_budget_rows`` default calibrated.

Usage: python scripts/pit_skew_bench.py [--spine-rows 1000000]
           [--hot-frac 0.5] [--repl-feat 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from feast_ibm_spark.operators.pit_join import (
    FeatureViewSpec,
    point_in_time_join,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--spine-rows", type=int, default=1_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    ap.add_argument("--repl-feat", type=int, default=50)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--auto-budget", type=int, default=400_000)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pit-skew-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(os.path.join(args.sf, "events.parquet"))
    n_keys = events.agg(F.max("user_id")).first()[0] + 1

    # feature side: replicate events REPL_FEAT times with jittered ts so
    # rows stay distinct; persist so each timed run pays join cost only.
    repl = spark.range(args.repl_feat).withColumnRenamed("id", "__r")
    feat = (
        events.crossJoin(F.broadcast(repl))
        .withColumn("ts", F.col("ts") + F.make_interval(secs=F.col("__r") * 7 + 1))
        .drop("__r")
        .select("user_id", "ts", "value")
        .persist()
    )
    n_feat = feat.count()

    # spine: hot_frac of rows on user_id=0, distinct second-spaced
    # timestamps inside the events time range; the rest uniform over keys.
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    span = int((hi - lo).total_seconds())
    n_hot = int(args.spine_rows * args.hot_frac)
    spine = (
        spark.range(args.spine_rows)
        .withColumn(
            "user_id",
            F.when(F.col("id") < n_hot, F.lit(0)).otherwise(
                (F.col("id") * 2654435761) % n_keys
            ),
        )
        .withColumn(
            "event_timestamp",
            F.lit(lo) + F.make_interval(secs=(F.col("id") * 37) % span),
        )
        .drop("id")
        .persist()
    )
    n_spine = spine.count()
    hot_max = (
        spine.groupBy("user_id").count().agg(F.max("count")).first()[0]
    )
    print(
        json.dumps(
            {
                "setup": {
                    "n_feat": n_feat,
                    "n_spine": n_spine,
                    "hot_key_rows": hot_max,
                    "n_keys": n_keys,
                }
            }
        ),
        flush=True,
    )

    view = FeatureViewSpec(
        name="ev",
        source=feat,
        join_keys=["user_id"],
        features=["value"],
        timestamp_field="ts",
        ttl_seconds=30 * 86400,
    )

    for strat in ("union_window", "union_window_salted"):
        times = []
        for i in range(args.runs):
            t0 = time.time()
            out = point_in_time_join(
                spine,
                [view],
                strategy=strat,
                salt_partition_budget_rows=None,
            )
            n = out.count()
            times.append(round(time.time() - t0, 3))
        print(
            json.dumps({"strategy": strat, "rows": n, "runs": times}),
            flush=True,
        )

    # auto with the probe: confirms the escalation decision and its cost
    t0 = time.time()
    out = point_in_time_join(
        spine, [view], strategy="auto",
        salt_partition_budget_rows=args.auto_budget,
    )
    n = out.count()
    print(
        json.dumps(
            {"strategy": f"auto(budget={args.auto_budget})", "rows": n,
             "runs": [round(time.time() - t0, 3)]}
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
