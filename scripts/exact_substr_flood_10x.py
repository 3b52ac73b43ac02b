#!/usr/bin/env python
"""Flooded-corpus ExactSubstr datapoint (VERDICT r7 item 2 done-condition).

Mirrors the containment/Jaccard flood benches: 10x the sf0.1 documents
(bijective per-copy token tag — each copy reproduces the original
structure, no cross-copy 40-grams) with a shared BOILERPLATE sentence
appended to a fraction of documents. Boilerplate 40-grams reach
df = flood_count, so:

- the PAIR tier's self-join output grows as sum over grams of c^2 —
  ~130 boilerplate grams x (n*frac)^2; quadratic in the flood, the
  reason the pair view is the oracle twin, not the production tier;
- the SPAN tier (duplicated_spans) touches each occurrence exactly once
  (per-gram min!=max aggregate, then a covered-offset window): LINEAR
  in the flood — the 100 TB shape. The 100%-flood cell runs the span
  tier over all 50k flooded docs where the uncapped pair tier would
  explode by construction (not attempted; see the containment bench's
  measured ENOSPC for the same sum-c^2 shape).

Cells:
 1. flood=0:   span-tier baseline wall.
 2. flood=1%:  uncapped pairs vs max_gram_freq-capped pairs vs spans;
    asserts capped pairs form a subset of uncapped and that every
    uncapped-only pair is boilerplate-driven (both docs flooded).
 3. flood=100%: spans (+capped pairs) — flood-linearity datapoint;
    asserts every flooded doc carries a span covering the boilerplate.

Usage: python scripts/exact_substr_flood_10x.py [--copies 10]
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

from feast_ibm_spark.operators.exact_substr import (
    duplicated_spans,
    exact_substr_pairs,
)
from feast_ibm_spark.sources.reader import load_table

BOILERPLATE = (
    "this document is provided as is without warranty of any kind either "
    "express or implied including but not limited to the implied "
    "warranties of merchantability and fitness for a particular purpose"
)
L = 40



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

def build(spark, sf, copies, flood_frac):
    docs = load_table(spark, sf, "documents")
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
            for k in range(copies)
        ],
    )
    flooded = tagged.select(
        "doc_id",
        F.when(
            F.pmod(F.xxhash64("doc_id"), F.lit(1000))
            < F.lit(int(round(flood_frac * 1000))),
            F.concat_ws(" ", "text", F.lit(BOILERPLATE)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).persist()
    return flooded


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("exact-substr-flood-10x")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # cell 1: clean-corpus span baseline
    clean = build(spark, args.sf, args.copies, 0.0)
    t0 = time.time()
    n_spans_clean = duplicated_spans(clean, min_len=L).count()
    print(json.dumps({"cell": "flood0_spans",
                      "n_docs": clean.count(),
                      "wall_s": round(time.time() - t0, 1),
                      "spans": n_spans_clean}), flush=True)
    clean.unpersist()

    # cell 2: 1% flood — pair-tier subset check + walls. The pair sets
    # run to millions of rows (the tagged-token corpus shares 4-5-word
    # runs densely), so the set relations are computed DISTRIBUTED
    # (anti-join counts), never collected.
    low = build(spark, args.sf, args.copies, 0.01)
    flooded = low.filter(F.col("text").contains("merchantability")).select(
        "doc_id").persist()
    n_flooded = flooded.count()
    t0 = time.time()
    uncapped = exact_substr_pairs(low, min_len=L).persist()
    n_unc = uncapped.count()
    w_unc = round(time.time() - t0, 1)
    t0 = time.time()
    capped = exact_substr_pairs(low, min_len=L, max_gram_freq=100).persist()
    n_cap = capped.count()
    w_cap = round(time.time() - t0, 1)
    t0 = time.time()
    n_spans_low = duplicated_spans(low, min_len=L).count()
    w_span = round(time.time() - t0, 1)
    pair_key = ["doc_a", "doc_b"]
    capped_extra = capped.join(uncapped, pair_key, "left_anti").count()
    extra = uncapped.join(capped, pair_key, "left_anti")
    fa = flooded.withColumnRenamed("doc_id", "doc_a")
    fb = flooded.withColumnRenamed("doc_id", "doc_b")
    extra_not_boiler = (
        extra.join(F.broadcast(fa), "doc_a", "left_anti").count()
        + extra.join(F.broadcast(fb), "doc_b", "left_anti").count()
    )
    print(json.dumps({
        "cell": "flood1pct", "n_flooded": n_flooded,
        "pairs_uncapped": n_unc, "wall_uncapped_s": w_unc,
        "pairs_capped": n_cap, "wall_capped_s": w_cap,
        "spans": n_spans_low, "wall_spans_s": w_span,
        "capped_is_subset": capped_extra == 0,
        "extra_pairs_all_boilerplate": extra_not_boiler == 0,
    }), flush=True)
    assert capped_extra == 0 and extra_not_boiler == 0
    uncapped.unpersist(); capped.unpersist()
    flooded.unpersist(); low.unpersist()

    # cell 3: 100% flood — span tier stays linear where sum-c^2 explodes
    full = build(spark, args.sf, args.copies, 1.0)
    n_full = full.count()
    t0 = time.time()
    spans_full = duplicated_spans(full, min_len=L)
    docs_with_span = spans_full.select("doc_id").distinct().count()
    w_span_full = round(time.time() - t0, 1)
    t0 = time.time()
    n_cap_full = exact_substr_pairs(full, min_len=L, max_gram_freq=100).count()
    w_cap_full = round(time.time() - t0, 1)
    print(json.dumps({
        "cell": "flood100pct", "n_docs": n_full,
        "wall_spans_s": w_span_full, "docs_with_span": docs_with_span,
        "wall_capped_pairs_s": w_cap_full, "pairs_capped": n_cap_full,
        "every_doc_has_span": docs_with_span == n_full,
    }), flush=True)
    assert docs_with_span == n_full

    # cell 4: the CUT at 100% flood — the production deliverable end to
    # end (spans -> Catalyst aggregate rebuild). The paper's guarantee
    # is input-relative: every duplicated substring PRESENT IN THE INPUT
    # is removed, but splices can mint new junction grams (measured: 80
    # here, from 122k input spans over 50k docs — the finding that
    # corrected the operator's docstring). Report the pass-1 residual
    # and show passes=2 drives it down; assert it never grows.
    from feast_ibm_spark.operators.exact_substr import cut_duplicated_spans

    t0 = time.time()
    cut = cut_duplicated_spans(full, min_len=L).persist()
    n_cut = cut.count()
    w_cut = round(time.time() - t0, 1)
    t0 = time.time()
    residual1 = duplicated_spans(cut, min_len=L).count()
    w_verify = round(time.time() - t0, 1)
    t0 = time.time()
    cut2 = cut_duplicated_spans(full, min_len=L, passes=2).persist()
    cut2.count()
    w_cut2 = round(time.time() - t0, 1)
    residual2 = duplicated_spans(cut2, min_len=L).count()
    print(json.dumps({
        "cell": "flood100pct_cut", "rows": n_cut, "wall_cut_s": w_cut,
        "residual_spans_pass1": residual1, "wall_verify_s": w_verify,
        "wall_cut_passes2_s": w_cut2, "residual_spans_pass2": residual2,
    }), flush=True)
    assert n_cut == n_full and residual2 <= residual1
    cut.unpersist(); cut2.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
