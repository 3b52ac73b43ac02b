#!/usr/bin/env python
"""ExactSubstr whale-document datapoint (VERDICT r8 item 5): one huge
document whose text is entirely duplicated (a second copy exists), so
every gram offset is covered and the interval-merge window sees ONE
doc_id partition with ~doc_length rows — the sessionize-class hazard.

Two things are under test:

1. gram GENERATION must not materialize the whale's full gram array in
   one task (a 32 MB doc is a ~32M-element array of 40-char strings —
   multi-GB in one row). The round-9 chunked explode bounds per-row
   memory at O(chunk_chars * min_len) regardless of document size.
2. the interval-merge window's per-doc sort must be sort-bound and
   spill-safe (O(1) running state after the sort, like sessionize), not
   state-bound.

Prints one JSON line per (size, run) with wall + spill deltas from the
UI REST API (same readers as pit_whale_spill.py).

Usage: python scripts/exact_substr_whale.py [--mb 8 16 32]
       [--driver-mem 3g] [--runs 2]
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

from feast_ibm_spark.operators.exact_substr import duplicated_spans

MIN_LEN = 40


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--bg-docs", type=int, default=2000)
    ap.add_argument("--driver-mem", default="3g")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("exact-substr-whale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for mb in args.mb:
        n_chars = mb * 1024 * 1024
        # whale text built IN-PLAN (no driver-side giant string): a
        # non-periodic digit stream (id * prime mod space), repeated in
        # doc 0 and doc 1 so every offset of both is duplicated text;
        # background docs are unique filler with a shared boilerplate
        # tail so the dup-gram table is not whale-only.
        piece = 16
        whale_piece = F.concat(
            F.lpad(F.conv(F.col("id") * 2654435761 % 10**12, 10, 16), piece, "0")
        )
        whale_txt = (
            spark.range(n_chars // piece)
            .select(whale_piece.alias("p"), F.lit(1).alias("g"))
            .groupBy("g")
            .agg(F.concat_ws("", F.collect_list("p")).alias("text"))
        )
        docs = whale_txt.select(
            F.explode(F.array(F.lit(0), F.lit(1))).alias("doc_id"),
            "text",
        ).unionByName(
            spark.range(2, 2 + args.bg_docs).select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.repeat(F.conv(F.col("id") * 1000003 % 10**15, 10, 36),
                             30),
                    F.lit("SHARED-BOILERPLATE-TAIL-" * 4),
                ).alias("text"),
            )
        )
        docs = docs.localCheckpoint(eager=True)  # freeze input, time the operator

        for run in range(args.runs):
            since = next_stage_id(spark)
            before = spill_totals(spark)
            t0 = time.time()
            out = duplicated_spans(docs, min_len=MIN_LEN)
            n_spans = out.count()
            wall = time.time() - t0
            after = spill_totals(spark)
            prof = max_task_profile(spark, since)
            print(json.dumps({
                "whale_mb": mb,
                "run": run,
                "wall_s": round(wall, 1),
                "n_spans": n_spans,
                "spill_disk_gb": round(
                    (after["diskBytesSpilled"] - before["diskBytesSpilled"]) / 2**30, 2),
                "spill_mem_gb": round(
                    (after["memoryBytesSpilled"] - before["memoryBytesSpilled"]) / 2**30, 2),
                **{k: round(v, 2) for k, v in prof.items()},
            }), flush=True)


if __name__ == "__main__":
    main()
