#!/usr/bin/env python
"""Theil-Sen hot-key datapoint at 10x (VERDICT r6 item 2 done-condition).

Builds the 10x events table (structure-preserving, sf1_smoke recipe) PLUS
one synthetic whale user with k = 10,000 events (C(k,2) = 5x10^7 pairwise
slopes uncapped — the executor-OOM shape the r6 verdict flagged), then
times q_trend_theil_sen:

- capped (max_pairs_per_key=100_000): the whale subsamples to the largest
  m with C(m,2) <= cap (m=448) BEFORE the self-join — bounded memory by
  construction;
- uncapped (the oracle-pinned gate shape): the windowed two-middle-rank
  median means the 5x10^7 slopes flow through a sortable, SPILLABLE window
  partition instead of one collect_list aggregation buffer — slow but no
  OOM (the r6 rewrite's point).

Prints one JSON line per cell for the NOTES.md datapoint.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from feast_ibm_spark.queries.behavioral import q_trend_theil_sen
from feast_ibm_spark.sources.reader import load_table


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("theil-sen-hot-10x")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = "/root/testdata/sf0.1"
    dest = "/tmp/fis_theil_10x"
    ev = load_table(spark, src, "events")
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    import functools

    scaled = functools.reduce(
        lambda a, b: a.unionByName(b),
        [
            ev.select(
                (F.col("event_id") + k * n_ev).alias("event_id"),
                "ts",
                (F.col("user_id") + k * n_users).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for k in range(10)
        ],
    )
    # whale: user_id = 10*n_users, k=10_000 hourly events, linear + noise
    k_hot = 10_000
    whale = (
        spark.range(k_hot)
        .select(
            (F.col("id") + 10 * n_ev).alias("event_id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(hours=F.col("id"))
            ).alias("ts"),
            F.lit(10 * n_users).cast("bigint").alias("user_id"),
            F.lit("purchase").alias("event_type"),
            (F.col("id") * 0.5 + (F.col("id") * 37 % 100) / 10.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    scaled.unionByName(whale).write.mode("overwrite").parquet(
        os.path.join(dest, "events.parquet")
    )
    print(json.dumps({"setup": {"rows": 10 * n_ev + k_hot, "whale_k": k_hot,
                                "whale_pairs_uncapped": k_hot * (k_hot - 1) // 2}}),
          flush=True)

    for cap in (100_000, None):
        t0 = time.time()
        out = q_trend_theil_sen(spark, dest, max_pairs_per_key=cap)
        whale_row = out.filter(F.col("user_id") == 10 * n_users).collect()
        n_out = out.count()
        print(
            json.dumps(
                {
                    "cap": cap,
                    "wall_s": round(time.time() - t0, 1),
                    "n_users_out": n_out,
                    "whale_n_pairs": whale_row[0]["n_pairs"],
                    "whale_slope": round(whale_row[0]["slope_cents_per_day"], 3),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
