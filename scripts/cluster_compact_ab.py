#!/usr/bin/env python
"""Clustered-vs-plain compaction A/B (round 12b): the same interleaved
8-segment events chain (each append spans the FULL time range — the
micro-batch shape that makes commit-time zone maps useless) compacted
two ways, then the same 10-day windowed read measured on both:

- PLAIN compaction: one merged stat-less segment — the windowed read
  scans everything, forever;
- CLUSTERED compaction (sort_by=ts, 16 target segments): range-bucketed
  sorted segments with fresh stats — the windowed read prunes to the
  overlapping handful from the manifest alone.

Row counts must agree everywhere — clustering is a physical reorder,
never a semantic change. Prints one JSON line.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

WINDOWS = {
    "10d": (datetime.datetime(2024, 1, 10), datetime.datetime(2024, 1, 20)),
    "1d": (datetime.datetime(2024, 1, 15), datetime.datetime(2024, 1, 16)),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from feast_ibm_spark.session import get_spark
    from feast_ibm_spark.sources.reader import load_table
    from feast_ibm_spark.sources.snapshots import (
        compact_snapshots,
        read_snapshot,
        read_snapshot_between,
        write_snapshot,
    )

    spark = get_spark(app_name="cluster-compact-ab")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "ts"
    )
    ev.count()  # warm the source scan out of the timings

    out = {"metric": "cluster_compact_ab", "sf_dir": sf_dir}
    for mode in ("plain", "clustered"):
        path = os.path.join(tempfile.gettempdir(), f"fis_ccab_{mode}")
        shutil.rmtree(path, ignore_errors=True)
        for r in range(8):
            write_snapshot(
                ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(8)) == r),
                path, stats_cols=["ts"],
            )
        t0 = time.time()
        if mode == "plain":
            compact_snapshots(spark, path)
        else:
            compact_snapshots(spark, path, sort_by="ts",
                              target_segments=16)
        compact_s = time.time() - t0

        full = read_snapshot(spark, path)
        rec = {"compact_s": round(compact_s, 2),
               "total_files": len(full.inputFiles())}
        for wname, (lo, hi) in WINDOWS.items():
            t0 = time.time()
            win = read_snapshot_between(spark, path, "ts", lo, hi)
            rows = win.count()
            win_s = time.time() - t0
            rec[wname] = {
                "rows": rows,
                "files_scanned": len(win.inputFiles()),
                "read_s": round(win_s, 3),
            }
        out[mode] = rec
        shutil.rmtree(path, ignore_errors=True)

    for wname in WINDOWS:
        assert out["plain"][wname]["rows"] == out["clustered"][wname]["rows"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
