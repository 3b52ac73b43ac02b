#!/usr/bin/env python
"""Flooded-corpus containment datapoint (VERDICT r6 item 5 done-condition).

Mirrors the round-6 Jaccard-prefix flood bench: 10x the sf0.1 documents
(bijective per-copy token tag, so each copy reproduces the original pair
structure and no cross-copy pairs appear) with a shared BOILERPLATE
sentence appended to EVERY document — its shingles reach df = |corpus|
and the exact inverted-index tier's shuffle output (sum over shingles of
c^2) explodes, while prefix filtering sorts them to the back of every
containee prefix (prefix_count ~ 0) with zero recall loss.

Cells: ngram_containment_pairs (exact inverted index, NO freq cap — the
zero-loss brute tier) vs containment_prefix_pairs, same threshold;
asserts the ordered pair sets are IDENTICAL, prints wall per tier.

Usage: python scripts/containment_flood_10x.py [--copies 10]
           [--threshold 0.8]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from feast_ibm_spark.operators.dedup import (
    containment_prefix_pairs,
    ngram_containment_pairs,
)
from feast_ibm_spark.sources.reader import load_table

BOILERPLATE = (
    "this document is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied "
    "warranties of merchantability and fitness for a particular purpose"
)



def _copy_tagger(k: int):
    """Single-parameter element lambda for F.transform. A two-parameter
    ``lambda t, _k=k`` looks like the classic late-binding guard but
    pyspark treats ANY two-parameter lambda as (element, index) and binds
    the INDEX column to the second parameter — the tag rendered as
    ``str(Column)`` instead of the integer k. (Each transform call
    allocates a fresh lambda variable, so the broken tags were still
    DISTINCT per copy and the old corpora stayed bijectively tagged by
    accident — see the NOTES.md round-8 correction; fixed for clarity in
    all three flood/smoke fixtures.)"""
    tag = "c%dx" % k
    return lambda t: F.concat(F.lit(tag), t)

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument(
        "--flood-frac", type=float, default=0.08,
        help="fraction of docs that receive the boilerplate block. The "
        "default 0.08 lets the exact tier complete for the identical-"
        "pairs check; at 1.0 its shuffle (sum_s c_s^2 ~ 28 * (n*frac)^2 "
        "rows) exceeds this host's 79GB free disk at 50k docs and dies "
        "with ENOSPC — measured; pair 1.0 with --skip-exact.",
    )
    ap.add_argument("--skip-exact", action="store_true")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("containment-flood-10x")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, args.sf, "documents")
    n_docs = docs.count()
    tagged = functools.reduce(
        lambda a, b: a.unionByName(b),
        [
            docs.select(
                (F.col("doc_id") + k * n_docs).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.trim("text"), r"\s+"),
                        _copy_tagger(k),
                    ),
                ).alias("text"),
            )
            for k in range(args.copies)
        ],
    )
    flooded = tagged.select(
        "doc_id",
        F.when(
            F.pmod(F.xxhash64("doc_id"), F.lit(1000))
            < F.lit(int(round(args.flood_frac * 1000))),
            F.concat_ws(" ", "text", F.lit(BOILERPLATE)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).persist()
    n = flooded.count()
    n_flooded = flooded.filter(
        F.col("text").contains("merchantability")
    ).count()
    print(
        json.dumps(
            {"setup": {"n_docs": n, "n_flooded": n_flooded,
                       "threshold": args.threshold}}
        ),
        flush=True,
    )

    tiers = [("prefix", containment_prefix_pairs)]
    if not args.skip_exact:
        tiers.append(("exact_inverted_index", ngram_containment_pairs))
    results = {}
    for name, fn in tiers:
        t0 = time.time()
        rows = fn(flooded, threshold=args.threshold).collect()
        wall = round(time.time() - t0, 1)
        results[name] = {(r["doc_id"], r["container_id"]) for r in rows}
        print(json.dumps({"tier": name, "wall_s": wall,
                          "pairs": len(rows)}), flush=True)

    if not args.skip_exact:
        same = results["prefix"] == results["exact_inverted_index"]
        print(json.dumps({"identical_pairs": same}), flush=True)
        if not same:
            raise SystemExit("tiers disagree — NOT a valid datapoint")
    spark.stop()


if __name__ == "__main__":
    main()
