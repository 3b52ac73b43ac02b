#!/usr/bin/env python
"""Optimistic-commit contention datapoint (round 11): what does writer
contention cost the snapshot format's CAS protocol?

N threads race M appends each against one table. Correctness is pinned
by the suite (test_snapshot_concurrent_writers_serialize_without_loss);
this script measures the PRICE: wall clock, commits/sec, and the lost
CAS races, counted by wrapping fsio.LocalFS.write_text_exclusive for
the duration of the run (a reposition-and-retry loser leaves no
on-disk trace by design, so the wrapper is the honest counter). A
single-writer baseline at the same total commit count anchors the
comparison.

Usage: python scripts/snapshot_contention_10x.py [--writers 4]
       [--commits 5] [--rows 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from feast_ibm_spark.sources import fsio  # noqa: E402
from feast_ibm_spark.sources.snapshots import (  # noqa: E402
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)

_LOST = [0]
_orig_cas = fsio.LocalFS.write_text_exclusive


def _counting_cas(self, p, text):
    won = _orig_cas(self, p, text)
    if not won:
        _LOST[0] += 1
    return won


fsio.LocalFS.write_text_exclusive = _counting_cas


def run(spark, base: str, n_writers: int, n_commits: int, rows: int) -> dict:
    path = os.path.join(base, f"tbl_w{n_writers}")
    errors: list[Exception] = []

    def writer(wid: int):
        try:
            for i in range(n_commits):
                df = spark.range(rows).select(
                    F.lit(wid).alias("writer"), F.lit(i).alias("batch"),
                    F.col("id"),
                )
                write_snapshot(df, path)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    _LOST[0] = 0
    t0 = time.time()
    threads = [threading.Thread(target=writer, args=(w,))
               for w in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    total = n_writers * n_commits
    versions = snapshot_versions(path)
    distinct = read_snapshot(spark, path).select(
        "writer", "batch").distinct().count()
    return {
        "writers": n_writers, "commits_per_writer": n_commits,
        "wall_s": round(wall, 1),
        "commits_per_s": round(total / wall, 2),
        "lost_races": _LOST[0],
        "errors": len(errors),
        "versions_ok": versions == list(range(1, total + 1)),
        "content_ok": distinct == total,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--writers", type=int, default=4)
    ap.add_argument("--commits", type=int, default=5)
    ap.add_argument("--rows", type=int, default=1000)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("snapshot-contention-10x")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.scheduler.mode", "FAIR")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="fis_contend_")
    try:
        # single-writer baseline at the same TOTAL commit count
        print(json.dumps(run(spark, base, 1,
                             args.writers * args.commits, args.rows)),
              flush=True)
        print(json.dumps(run(spark, base, args.writers, args.commits,
                             args.rows)), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
