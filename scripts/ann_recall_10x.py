#!/usr/bin/env python
"""ANN recall-vs-exact at 10x (VERDICT r6 item 4).

``lsh_auto_config``'s recall estimate is analytic (the collision bound
1-(1-p1^planes)^tables); the gate scales (500 / 2k vectors) are too small
to stress it. This script builds the structure-preserving 10x embeddings
corpus (~20k vectors, the r5 blowup scale — rotation per copy, norm
preserving, same recipe as scripts/sf1_smoke.py) where the exact tier is
still affordable, then records:

1. pair-recall of auto-config ``near_dup_pairs_lsh`` vs brute
   ``near_dup_pairs`` at the gate threshold (0.4, documented degraded
   zone) AND at 0.7 (where the config claims ~0.97);
2. top-k recall@k of ``lsh_cosine_topk`` vs exact ``cosine_topk`` for a
   query sample.

Prints one JSON line per measurement for the NOTES.md datapoint.

Usage: python scripts/ann_recall_10x.py [--copies 10] [--k 5]
           [--n-queries 200]
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

from feast_ibm_spark.operators.similarity import (
    cosine_topk,
    lsh_auto_config,
    lsh_cosine_topk,
    near_dup_pairs,
    near_dup_pairs_lsh,
)
from feast_ibm_spark.sources.reader import load_table


def scaled_embeddings(spark, src: str, copies: int):
    emb = load_table(spark, src, "embeddings")
    n_vec = emb.count()
    dim = len(emb.first()["embedding"])
    return (
        functools.reduce(
            lambda a, b: a.unionByName(b),
            [
                emb.select(
                    (F.col("vec_id") + k * n_vec).alias("vec_id"),
                    (
                        F.col("embedding")
                        if k == 0
                        else F.concat(
                            F.slice("embedding", k + 1, dim - k),
                            F.slice("embedding", 1, k),
                        )
                    ).alias("embedding"),
                    "label",
                )
                for k in range(copies)
            ],
        ),
        dim,
    )


def pair_set(df) -> set:
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--n-queries", type=int, default=200)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ann-recall-10x")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus, dim = scaled_embeddings(spark, args.sf, args.copies)
    corpus = corpus.persist()
    n = corpus.count()
    print(json.dumps({"setup": {"n_vectors": n, "dim": dim}}), flush=True)

    # --- 1. near-dup pair recall at two thresholds ---------------------
    for thr in (0.4, 0.7):
        planes, tables, cap, est = lsh_auto_config(n, thr)
        t0 = time.time()
        exact = pair_set(near_dup_pairs(corpus, threshold=thr))
        t_exact = round(time.time() - t0, 1)
        t0 = time.time()
        approx = pair_set(near_dup_pairs_lsh(corpus, threshold=thr, dim=dim))
        t_lsh = round(time.time() - t0, 1)
        recall = len(approx & exact) / max(1, len(exact))
        print(
            json.dumps(
                {
                    "measure": "near_dup_pair_recall",
                    "threshold": thr,
                    "auto_config": {
                        "n_planes": planes,
                        "n_tables": tables,
                        "max_bucket_size": cap,
                        "est_recall": round(est, 4),
                    },
                    "exact_pairs": len(exact),
                    "lsh_pairs": len(approx),
                    "recall": round(recall, 4),
                    "false_pairs": len(approx - exact),
                    "t_exact_s": t_exact,
                    "t_lsh_s": t_lsh,
                }
            ),
            flush=True,
        )

    # --- 2. top-k recall of lsh_cosine_topk vs exact --------------------
    queries = corpus.filter(F.col("vec_id") % (n // args.n_queries) == 0)
    nq = queries.count()
    t0 = time.time()
    ex = cosine_topk(corpus, queries, k=args.k, vec_col="embedding").collect()
    t_exact = round(time.time() - t0, 1)
    t0 = time.time()
    ap_rows = lsh_cosine_topk(
        corpus, queries, k=args.k, vec_col="embedding", dim=dim
    ).collect()
    t_lsh = round(time.time() - t0, 1)
    ex_set = {(r["q_vec_id"], r["vec_id"]) for r in ex}
    ap_set = {(r["q_vec_id"], r["vec_id"]) for r in ap_rows}
    recall_k = len(ap_set & ex_set) / max(1, len(ex_set))
    print(
        json.dumps(
            {
                "measure": "knn_lsh_topk_recall",
                "k": args.k,
                "n_queries": nq,
                "recall_at_k": round(recall_k, 4),
                "t_exact_s": t_exact,
                "t_lsh_s": t_lsh,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
