#!/usr/bin/env python
"""BFS deep-hops datapoint (round 11, VERDICT r10 item 5): what does a
round cost when the frontier is SMALL and the edge list is BIG?

Hazard under test: level-synchronous BFS joins the frontier against the
FULL edge list every round. With a tiny frontier Spark broadcasts it, so
there is no shuffle — but the probe side still SCANS all E edges, and a
deep walk pays rounds x scan(E). The candidate mitigation from the r10
verdict ("early densification": switch to a visited-set semi-join when
the frontier stops growing) also scans all E edges per round, so it
cannot reduce this term — the real 100 TB lever is a src-bucketed edge
layout plus partition pruning on frontier keys, which turns scan(E) into
scan(E_frontier-adjacent). This script measures the term so the decision
is a number, not a guess.

Fixture: a width-W chain of depth D (frontier stays exactly W nodes for
D rounds — the worst rounds-to-work ratio) over N background noise
edges. Wall clock at max_hops in {3, 6, 12} on the SAME edge list; the
slope (seconds per additional hop) IS the per-round edge-scan cost.

Prints one JSON line per max_hops with wall, per-hop slope vs the
previous point, ring checksum, and spill/max-task profile.

Usage: python scripts/bfs_deep_10x.py [--width 1000] [--depth 12]
       [--noise 10000000] [--driver-mem 8g]
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
    ap.add_argument("--width", type=int, default=1_000)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--noise", type=int, default=10_000_000)
    ap.add_argument("--hops", type=int, nargs="*", default=[3, 6, 12])
    ap.add_argument("--driver-mem", default="8g")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bfs-deep-10x")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # level h holds nodes [h*width, (h+1)*width); every level-h node
    # points at ONE level-(h+1) node (a braided chain keeps the frontier
    # exactly `width` for `depth` rounds); noise edges sit far away
    w, d = args.width, args.depth
    chain = (
        spark.range(w * d)
        .select(
            F.col("id").alias("src"),
            (F.col("id") + w).alias("dst"),
        )
    )
    base = 10 * w * (d + 2)
    noise = spark.range(args.noise).select(
        (base + F.col("id")).alias("src"),
        (base + F.pmod(F.col("id") * 2654435761, F.lit(args.noise)))
        .alias("dst"),
    )
    edges = chain.unionByName(noise).localCheckpoint(eager=True)
    n_edges = edges.count()
    src = spark.range(w).select(F.col("id").alias("node"))

    prev = None
    for hops in args.hops:
        since = next_stage_id(spark)
        before = spill_totals(spark)
        t0 = time.time()
        out = bfs_levels(edges, src, max_hops=hops)
        n_by_lvl = {
            int(r.lvl): r.n
            for r in out.groupBy("lvl").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        wall = time.time() - t0
        after = spill_totals(spark)
        prof = max_task_profile(spark, since)
        row = {
            "width": w, "depth": d, "n_edges": n_edges,
            "max_hops": hops, "wall_s": round(wall, 1),
            "sec_per_extra_hop": (
                round((wall - prev[1]) / (hops - prev[0]), 2)
                if prev else None
            ),
            "levels_ok": all(n_by_lvl.get(h) == w for h in range(hops + 1)),
            "spill_disk_gb": round(
                (after["diskBytesSpilled"] - before["diskBytesSpilled"])
                / 2**30, 2),
            "spill_mem_gb": round(
                (after["memoryBytesSpilled"] - before["memoryBytesSpilled"])
                / 2**30, 2),
            **{k: round(v, 2) for k, v in prof.items()},
        }
        print(json.dumps(row), flush=True)
        prev = (hops, wall)


if __name__ == "__main__":
    main()
