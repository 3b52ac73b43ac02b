#!/usr/bin/env python
"""Manifest-bloom point-lookup whale (round 12b): a 64-segment chain
whose key ranges FULLY overlap (key % 64 interleave — zone maps can
never prune a point lookup), bloom-indexed at commit. Measures the
three answers that matter at a 10^5-segment streaming-upsert table:

- present-key lookup: segments scanned (ideally 1) + wall vs the full
  filter scan the same predicate costs without blooms;
- absent-key lookup: the (near) metadata-only answer;
- measured false-positive rate: 2,000 absent keys probed DRIVER-side
  against the committed bits (no Spark job — the point of the
  two-sided md5 hash), keep-fraction over 64 segments vs the ~0.2%
  design figure.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_SEGMENTS = 64
KEYS_PER_SEGMENT = 2_000


def main() -> None:
    from feast_ibm_spark.session import get_spark
    from feast_ibm_spark.sources.snapshots import (
        _bloom_prune,
        _read_manifest,
        _resolve_manifest,
        get_fs,
        read_snapshot,
        read_snapshot_lookup,
        write_snapshot,
    )

    spark = get_spark(app_name="bloom-lookup-whale")
    spark.sparkContext.setLogLevel("ERROR")

    n_keys = N_SEGMENTS * KEYS_PER_SEGMENT
    path = os.path.join(tempfile.gettempdir(), "fis_bloom_whale")
    shutil.rmtree(path, ignore_errors=True)
    base = spark.range(n_keys).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("v"),
    )
    t0 = time.time()
    for r in range(N_SEGMENTS):
        write_snapshot(
            base.filter(F.pmod(F.col("k"), F.lit(N_SEGMENTS)) == r),
            path, bloom_cols=["k"],
        )
    build_s = time.time() - t0

    full = read_snapshot(spark, path)
    full.count()  # warm
    n_files = len(full.inputFiles())

    t0 = time.time()
    hit = read_snapshot_lookup(spark, path, "k", [4242])
    hit_rows = hit.count()
    hit_s = time.time() - t0
    hit_files = len(hit.inputFiles())

    t0 = time.time()
    rows_scan = full.filter(F.col("k") == 4242).count()
    scan_s = time.time() - t0

    t0 = time.time()
    miss = read_snapshot_lookup(spark, path, "k", [10**12 + 7])
    miss_rows = miss.count()
    miss_s = time.time() - t0
    miss_files = len(miss.inputFiles())

    # driver-side FP sweep: no Spark involved — the probe IS metadata
    fs = get_fs(path, spark)
    from feast_ibm_spark.sources.snapshots import _snapshot_versions

    latest = _snapshot_versions(fs, path)[-1]
    manifest = _resolve_manifest(fs, path, latest)
    t0 = time.time()
    n_absent = 2_000
    kept = sum(
        len(_bloom_prune(manifest, "k", [10**12 + i]))
        for i in range(n_absent)
    )
    probe_s = time.time() - t0
    fp_rate = kept / (n_absent * N_SEGMENTS)
    manifest_bytes = len(
        json.dumps(_read_manifest(fs, path, latest))
    )

    print(json.dumps({
        "metric": "bloom_lookup_whale",
        "n_segments": N_SEGMENTS,
        "keys_per_segment": KEYS_PER_SEGMENT,
        "build_s": round(build_s, 2),
        "present_lookup": {"rows": hit_rows, "files": hit_files,
                           "of_files": n_files, "s": round(hit_s, 3)},
        "full_scan_filter": {"rows": rows_scan, "s": round(scan_s, 3)},
        "absent_lookup": {"rows": miss_rows, "files": miss_files,
                          "s": round(miss_s, 3)},
        "fp_rate_measured": round(fp_rate, 5),
        "fp_probe_2000_keys_s": round(probe_s, 3),
        "newest_manifest_bytes": manifest_bytes,
    }))
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
