#!/usr/bin/env python
"""Interval range-join bucket-width A/B (round 12, VERDICT r11 item 6):
the auto (~p95 sampled length) width vs deliberately bad manual widths
on the ship-windows workload at sf0.1. Both failure directions are
exercised: bucket=1 inflates the interval EXPLODE (a 7-day window
becomes 8 bucket rows), bucket=365 inflates the CANDIDATE SET (52x too wide: each point
meets every interval within its year-bucket, so the hash join
degenerates toward all-pairs-per-bucket and the exact filter does all
the work; wider still — bucket=10000 — is a measured full cartesian
that ran past 10 minutes at sf0.1 before being killed). Row counts must agree — the width is a physical
knob, never a semantic one.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from feast_ibm_spark.operators.interval import _auto_bucket, range_join
    from feast_ibm_spark.session import get_spark
    from feast_ibm_spark.sources.reader import load_table

    spark = get_spark(app_name="interval-bucket-ab")
    spark.sparkContext.setLogLevel("ERROR")

    epoch = F.lit("1970-01-01")
    points = load_table(spark, sf_dir, "lineitem").select(
        F.datediff(F.col("l_shipdate"), epoch).alias("ship_day")
    )
    ivals = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("win_orderkey"),
        F.datediff(F.col("o_orderdate"), epoch).alias("win_start"),
        (F.datediff(F.col("o_orderdate"), epoch) + F.lit(6)).alias("win_end"),
    )
    points.count(), ivals.count()  # warm the scans out of the timings

    picked = _auto_bucket(ivals, "win_start", "win_end")

    def run(bucket):
        t0 = time.time()
        n = range_join(
            points, ivals, "ship_day", "win_start", "win_end",
            bucket=bucket, broadcast_intervals=True,
        ).count()
        return n, round(time.time() - t0, 2)

    results = {}
    for label, bucket in [("auto", None), ("manual_7", 7),
                          ("bad_explode_1", 1), ("bad_candidates_365", 365)]:
        n, secs = run(bucket)
        results[label] = {"rows": n, "sec": secs}

    rows = {v["rows"] for v in results.values()}
    print(json.dumps({
        "sf_dir": sf_dir,
        "auto_picked_bucket": picked,
        "rows_agree": len(rows) == 1,
        **{k: v for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
