#!/usr/bin/env python
"""PIT whale-key spill artifact (VERDICT r7 item 7 done-condition).

The salted melt's scale claim is that per-key window STATE is bounded by
the time-bucket size (n_buckets partitions of ~budget rows), not by the
key's total row count — so a whale key that would sort-spill (or OOM a
real executor) as ONE plain-melt window partition becomes many bounded
partitions plus the tiny carry pass. This script builds the
double-whale shape the claim is about, at sf1-equivalent scale:

- SPINE: --spine-rows total, --hot-frac of them on user_id=0 with
  distinct timestamps (default 8M x 0.625 = 5M hot rows — a whale spine
  key past the 4M default budget);
- FEATURES: sf0.1 events replicated --repl-feat times (natural key mix)
  PLUS --whale-feat-rows extra rows on user_id=0 (default 4M, second-
  spaced) — the whale FEATURE key sharing the whale spine key.

It times plain melt vs salted melt (same result set, counted) and reads
per-run executor SPILL deltas (memoryBytesSpilled / diskBytesSpilled,
summed over stages) from the Spark UI REST API — the direct measurement
of the bounded-state claim: the plain melt must sort one ~9M-row
partition (spills once the 64 MiB-per-task sort budget at 32 threads is
gone); the salted melt's largest sort is ~bucket-sized.

Usage: python scripts/pit_whale_spill.py [--spine-rows 8000000] ...
Prints one JSON line per cell; the NOTES table is generated from these.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from feast_ibm_spark.operators.pit_join import (
    FeatureViewSpec,
    point_in_time_join,
)


def max_task_profile(spark, since_stage: int) -> dict[str, float]:
    """Worst single TASK over stages >= since_stage — the cluster-relevant
    bound: a plain-melt whale key concentrates its entire sort in one
    task (one straggler/OOM candidate on a real executor), while the
    salted melt's per-task state is bucket-sized. Aggregate spill alone
    hides this (the salted path moves MORE total bytes over its two
    window passes); the per-task maximum is the claim under test."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=30))
    worst = {"task_max_spill_gb": 0.0, "task_max_runtime_s": 0.0}
    for s in stages:
        if s["stageId"] < since_stage:
            continue
        try:
            q = json.load(urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages/{s['stageId']}"
                f"/{s['attemptId']}/taskSummary?quantiles=1.0", timeout=30))
        except Exception:
            continue
        spill = (q.get("memoryBytesSpilled") or [0])[-1]
        rt = (q.get("executorRunTime") or [0])[-1]
        worst["task_max_spill_gb"] = max(worst["task_max_spill_gb"],
                                         round(spill / 2**30, 2))
        worst["task_max_runtime_s"] = max(worst["task_max_runtime_s"],
                                          round(rt / 1000, 1))
    return worst


def next_stage_id(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages", timeout=30))
    return max((s["stageId"] for s in stages), default=-1) + 1


def spill_totals(spark) -> dict[str, int]:
    """Sum spill + shuffle counters over all completed stages via the UI
    REST API (cheap, no listener plumbing)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url, timeout=30))
    out = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0,
           "shuffleWriteBytes": 0, "peakExecutionMemory": 0}
    for s in stages:
        out["memoryBytesSpilled"] += s.get("memoryBytesSpilled", 0)
        out["diskBytesSpilled"] += s.get("diskBytesSpilled", 0)
        out["shuffleWriteBytes"] += s.get("shuffleWriteBytes", 0)
        out["peakExecutionMemory"] = max(
            out["peakExecutionMemory"], s.get("peakExecutionMemory", 0))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--spine-rows", type=int, default=8_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.625)
    ap.add_argument("--repl-feat", type=int, default=50)
    ap.add_argument("--whale-feat-rows", type=int, default=4_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--strategies", default="union_window,union_window_salted",
                    help="comma list; one strategy per process isolates the "
                    "measurement when the other strategy OOMs the shared JVM "
                    "(the plain melt does at the 40M-row whale cell)")
    ap.add_argument("--driver-mem", default="4g",
                    help="heap SMALL ON PURPOSE: the spill contrast only "
                    "appears when the plain melt's single whale partition "
                    "outgrows its execution-memory share; at 24g this host "
                    "absorbs a 9M-row partition without spilling (measured)")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pit-whale-spill")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(os.path.join(args.sf, "events.parquet"))
    n_keys = events.agg(F.max("user_id")).first()[0] + 1
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    span = int((hi - lo).total_seconds())

    repl = spark.range(args.repl_feat).withColumnRenamed("id", "__r")
    natural = (
        events.crossJoin(F.broadcast(repl))
        .withColumn("ts", F.col("ts") + F.make_interval(secs=F.col("__r") * 7 + 1))
        .drop("__r")
        .select("user_id", "ts", "value")
    )
    # row-UNIQUE timestamps spread over the full span: seconds from a
    # modular walk plus a distinct microsecond remainder — collisions
    # would let the melt's distinct() shrink the whale (first version of
    # this bench lost 80% of the hot key that way), and the salt needs
    # the hot rows spread over many time buckets to have anything to cut.
    def spread_ts(id_col):
        return F.timestamp_micros(
            F.lit(int(lo.timestamp() * 1_000_000))
            + (id_col % span) * 1_000_000 + (id_col / span).cast("bigint")
        )

    whale_feat = (
        spark.range(args.whale_feat_rows)
        .select(
            F.lit(0).cast("bigint").alias("user_id"),
            spread_ts(F.col("id") * 13).alias("ts"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
    )
    feat = natural.unionByName(whale_feat).persist()
    n_feat = feat.count()

    n_hot = int(args.spine_rows * args.hot_frac)
    spine = (
        spark.range(args.spine_rows)
        .withColumn(
            "user_id",
            F.when(F.col("id") < n_hot, F.lit(0)).otherwise(
                (F.col("id") * 2654435761) % n_keys
            ),
        )
        .withColumn("event_timestamp", spread_ts(F.col("id") * 37))
        .drop("id")
        .persist()
    )
    n_spine = spine.count()
    print(json.dumps({"setup": {
        "n_feat": n_feat, "n_spine": n_spine,
        "whale_spine_rows": n_hot, "whale_feat_rows": args.whale_feat_rows,
        "n_keys": int(n_keys)}}), flush=True)

    view = FeatureViewSpec(
        name="ev", source=feat, join_keys=["user_id"], features=["value"],
        timestamp_field="ts", ttl_seconds=30 * 86400,
    )

    for strat in args.strategies.split(","):
        for i in range(args.runs):
            before = spill_totals(spark)
            first_stage = next_stage_id(spark)
            t0 = time.time()
            out = point_in_time_join(
                spine, [view], strategy=strat,
                salt_partition_budget_rows=None,
            )
            n = out.count()
            wall = round(time.time() - t0, 1)
            after = spill_totals(spark)
            print(json.dumps({
                "strategy": strat, "run": i, "rows": n, "wall_s": wall,
                "spill_mem_gb": round(
                    (after["memoryBytesSpilled"] - before["memoryBytesSpilled"]) / 2**30, 2),
                "spill_disk_gb": round(
                    (after["diskBytesSpilled"] - before["diskBytesSpilled"]) / 2**30, 2),
                "shuffle_write_gb": round(
                    (after["shuffleWriteBytes"] - before["shuffleWriteBytes"]) / 2**30, 2),
                "peak_stage_exec_mem_gb": round(
                    after["peakExecutionMemory"] / 2**30, 2),
                **max_task_profile(spark, first_stage),
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
