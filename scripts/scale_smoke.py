#!/usr/bin/env python
"""Scale smoke: generate a synthetic event table ~8x the bench data with
300x the key cardinality (5M rows, 50k users) in /tmp and run the
flagship operators end-to-end. Validates the scale claims the operators
document — in particular that the union-window ("melt") PIT strategy
overtakes the broadcast strategy once the spine is large.

Usage: python scripts/scale_smoke.py [--rows 5000000] [--keys 50000]

Last recorded run (local[32]; wall-clock varies ±40% with machine load):
    latest_per_key   5M rows            3.0-4.7 s   (50,000 keys)
    sessionize       5M rows            3.9-4.5 s   (4.36M sessions)
    pit_join[broadcast]    5M x 50k     4.4-10 s
    pit_join[union_window] 5M x 50k     2.1-2.7 s   <- melt wins at this spine size
    latest_per_key, 20% of rows on ONE hot key:   1.0-6 s (partial agg absorbs it)
    sessionize, same skew:                        3.7-11 s (hot key = one window
        partition — the known straggler shape; salt by day if a single key
        exceeds an executor's partition budget)
    dedup at 50k docs (10x bench corpus), ~5k true near-dup pairs:
        minhash_lsh  16-30 s, exact inverted-index 7-16 s — both find all
        4,999 pairs. NOTE the synthetic corpus has collision-free tokens,
        i.e. NO hot shingles, which is the exact path's best case (its
        self-join output stays ~linear); on real corpora with boilerplate
        shingles the exact tier's sum(c^2) term explodes and the LSH
        tier's bounded bucket join takes over. Dup-saturated corpora
        should run exact_dedup first (as corpus_curation does) so the
        verify stage isn't paying for pairs exact hashing removes free.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--keys", type=int, default=50_000)
    ap.add_argument("--path", default="/tmp/feast_ibm_spark_scale_events")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from feast_ibm_spark.operators.pit_join import (
        FeatureViewSpec,
        point_in_time_join,
    )
    from feast_ibm_spark.operators.pull_latest import latest_per_key
    from feast_ibm_spark.operators.sessionize import sessionize
    from feast_ibm_spark.session import get_spark

    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    day_us = 86_400 * 1_000_000
    t = time.time()
    ev = spark.range(args.rows).select(
        F.col("id").alias("event_id"),
        (F.col("id") % args.keys).alias("user_id"),
        F.timestamp_micros(
            (
                F.lit(1_704_067_200_000_000)
                + ((F.xxhash64("id") % (30 * day_us)) + 30 * day_us) % (30 * day_us)
            ).cast("long")
        ).alias("ts"),
        (F.xxhash64("id", F.lit(1)) % 10_000 / 100.0).alias("value"),
    )
    ev.write.mode("overwrite").parquet(args.path)
    print(f"generate+write {args.rows:,} rows: {time.time()-t:.1f}s")
    ev = spark.read.parquet(args.path)

    t = time.time()
    n = latest_per_key(ev, ["user_id"], ["value"], "ts", "event_id",
                       "2024-01-01", "2024-01-31").count()
    print(f"latest_per_key: {time.time()-t:.1f}s ({n:,} keys)")

    t = time.time()
    n = sessionize(ev, ["user_id"], "ts", 3600, tiebreak_cols=["event_id"]).count()
    print(f"sessionize: {time.time()-t:.1f}s ({n:,} sessions)")

    spine = ev.groupBy("user_id").agg(F.max("ts").alias("event_timestamp"))
    view = FeatureViewSpec(
        "v", ev, ["user_id"], ["value"], "ts",
        created_timestamp_column="event_id", ttl_seconds=7 * 86_400,
    )
    for strat in ("broadcast", "union_window"):
        t = time.time()
        n = point_in_time_join(spine, [view], strategy=strat).count()
        print(f"pit_join[{strat}]: {time.time()-t:.1f}s ({n:,} rows)")

    # skew: route 20% of ALL rows to one hot key (a bot user) and rerun the
    # window-heavy operators — AQE skew handling + the single-exchange
    # window plans must absorb it without a straggler blowup
    skewed = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(0)).otherwise(F.col("user_id")),
    )
    t = time.time()
    n = latest_per_key(skewed, ["user_id"], ["value"], "ts", "event_id",
                       "2024-01-01", "2024-01-31").count()
    print(f"latest_per_key[skewed 20%->1key]: {time.time()-t:.1f}s ({n:,} keys)")
    t = time.time()
    n = sessionize(skewed, ["user_id"], "ts", 3600,
                   tiebreak_cols=["event_id"]).count()
    print(f"sessionize[skewed]: {time.time()-t:.1f}s ({n:,} sessions)")

    # dedup at 10x the bench corpus: 50k synthetic docs, ~10% near-dup
    # pairs by construction (doc i and i+1 share most tokens when
    # i % 10 == 0). The LSH path must stay near-linear while the exact
    # inverted-index tier is expected to grow superlinearly with corpus
    # size — this is the crossover the operator docstrings claim.
    from feast_ibm_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    n_docs = 50_000
    # ~10% of docs copy their predecessor's tokens; all other token ids
    # are collision-free hashes, so the ~5k intended pairs are the ONLY
    # near-dups (a realistic density — a dup-saturated corpus should be
    # run through exact_dedup first, as corpus_curation does)
    eff = (F.when(F.col("id") % 10 == 0, F.col("id") - 1)
           .otherwise(F.col("id")))
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"w{j}_"),
                    F.abs(F.xxhash64(eff, F.lit(j))).cast("string"),
                )
                for j in range(40)
            ],
        ).alias("text"),
    )
    doc_path = args.path + "_docs"
    base.write.mode("overwrite").parquet(doc_path)
    docs = spark.read.parquet(doc_path)

    t = time.time()
    n = minhash_lsh_pairs(docs, n=3, threshold=0.5).count()
    print(f"dedup_minhash_lsh[{n_docs:,} docs]: {time.time()-t:.1f}s ({n:,} pairs)")
    t = time.time()
    n = ngram_jaccard_pairs(docs, n=3, threshold=0.5).count()
    print(f"dedup_ngram_exact[{n_docs:,} docs]: {time.time()-t:.1f}s ({n:,} pairs)")


if __name__ == "__main__":
    main()
