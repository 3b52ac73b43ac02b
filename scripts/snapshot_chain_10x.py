#!/usr/bin/env python
"""Snapshot manifest-chain scaling datapoint (round 11): what do the
metadata paths cost when a streaming sink has committed HUNDREDS of
micro-batch versions?

Claims under measurement (module docstring of sources/snapshots.py):
per-version metadata is O(appends); reading the latest version is one
manifest read + a multi-dir scan; the CDF plans the delta from the
manifest chain alone. A long chain stresses exactly these: version
listing (one listdir), latest read (one manifest, N segment dirs in the
scan), whole-chain CDF planning (N manifest reads + set diffs), one
consume cycle, compaction (N tiny files -> 1 segment), and post-compact
read — the small-files story end to end.

Prints one JSON line with per-path timings and row checks.

Usage: python scripts/snapshot_chain_10x.py [--commits 500] [--rows 20]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from feast_ibm_spark.sources.snapshots import (  # noqa: E402
    ack_snapshot_consume,
    compact_snapshots,
    consume_snapshot_changes,
    read_snapshot,
    read_snapshot_changes,
    snapshot_versions,
    vacuum_snapshots,
    write_snapshot,
    write_snapshot_batch,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=500)
    ap.add_argument("--rows", type=int, default=20)
    ap.add_argument("--driver-mem", default="8g")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("snapshot-chain-10x")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", args.driver_mem)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="fis_chain_")
    tbl = os.path.join(base, "tbl")
    cursor = os.path.join(base, "cursor.json")
    try:
        t0 = time.time()
        batch = spark.range(args.rows).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        ).coalesce(1)
        # the STREAMING SINK path (write_snapshot_batch): every commit
        # runs the replay-dedup probe, which pre-round-12 walked the
        # whole manifest chain — O(chain) per commit, quadratic
        # cumulative. The bounded batch ledger makes it one manifest
        # read; per-commit wall time across the chain is the proof.
        per_commit: list[float] = []
        for i in range(args.commits):
            c0 = time.time()
            write_snapshot_batch(batch.withColumn("b", F.lit(i)), tbl,
                                 batch_id=i)
            per_commit.append(time.time() - c0)
        t_build = time.time() - t0
        w = max(10, args.commits // 10)
        flat_first = sum(per_commit[:w]) / w
        flat_last = sum(per_commit[-w:]) / w
        # commits that wrote a FULL checkpoint (delta depth wrapped):
        # version 1 and every 32nd after — index i commits version i+1
        ckpt = [t for j, t in enumerate(per_commit) if j % 32 == 0]

        # replay probes at both ends of the chain: the newest batch hits
        # the ledger (O(1) manifest reads); batch 0 is older than the
        # ledger window and takes the exhaustive-fallback walk
        t0 = time.time()
        assert write_snapshot_batch(batch, tbl, args.commits - 1) == args.commits
        t_replay_newest = time.time() - t0
        t0 = time.time()
        assert write_snapshot_batch(batch, tbl, 0) == 1
        t_replay_oldest_fallback = time.time() - t0

        # manifest BYTES: the round-12 delta tier bounds per-commit
        # metadata — a full-manifest format restates the whole segment
        # list every commit (O(n) bytes per commit, quadratic
        # cumulative); deltas keep the last-window mean flat at the
        # first-window mean, with only every 32nd commit paying a full
        # checkpoint
        man_dir = os.path.join(tbl, "_snapshots")
        man_sizes = sorted(
            (f, os.path.getsize(os.path.join(man_dir, f)))
            for f in os.listdir(man_dir)
        )
        man_first = sum(s for _, s in man_sizes[:w]) / w
        man_last = sum(s for _, s in man_sizes[-w:]) / w
        man_total = sum(s for _, s in man_sizes)

        t0 = time.time()
        versions = snapshot_versions(tbl)
        t_list = time.time() - t0

        t0 = time.time()
        n_latest = read_snapshot(spark, tbl).count()
        t_read_latest = time.time() - t0

        t0 = time.time()
        cdf = read_snapshot_changes(spark, tbl, from_version=0)
        t_cdf_plan = time.time() - t0
        t0 = time.time()
        n_cdf = cdf.count()
        t_cdf_count = time.time() - t0

        t0 = time.time()
        v, delta = consume_snapshot_changes(spark, tbl, cursor)
        n_consume = delta.count()
        ack_snapshot_consume(cursor, v)
        t_consume = time.time() - t0

        t0 = time.time()
        compact_snapshots(spark, tbl)
        t_compact = time.time() - t0
        t0 = time.time()
        dropped, deleted = vacuum_snapshots(tbl, keep_last=1)
        t_vacuum = time.time() - t0
        t0 = time.time()
        n_post = read_snapshot(spark, tbl).count()
        t_read_post = time.time() - t0

        want = args.commits * args.rows
        print(json.dumps({
            "commits": args.commits, "rows_per_commit": args.rows,
            "build_s": round(t_build, 1),
            "per_commit_first_window_ms": round(flat_first * 1000, 1),
            "per_commit_last_window_ms": round(flat_last * 1000, 1),
            "per_commit_flatness_ratio": round(flat_last / flat_first, 2),
            # the FULL-checkpoint residual (r13 plan item 4): every
            # 32nd commit restates the whole segment list — these means
            # isolate whether that O(segments) rewrite grows enough to
            # need a manifest-LIST indirection tier
            "ckpt_commit_first_window_ms": round(
                1000 * (sum(ckpt[:max(1, len(ckpt) // 10)])
                        / max(1, len(ckpt) // 10)), 1),
            "ckpt_commit_last_window_ms": round(
                1000 * (sum(ckpt[-max(1, len(ckpt) // 10):])
                        / max(1, len(ckpt) // 10)), 1),
            "per_commit_last_window_max_ms": round(
                1000 * max(per_commit[-w:]), 1),
            "replay_newest_ms": round(t_replay_newest * 1000, 1),
            "replay_oldest_fallback_ms": round(
                t_replay_oldest_fallback * 1000, 1),
            "manifest_bytes_first_window_mean": round(man_first, 1),
            "manifest_bytes_last_window_mean": round(man_last, 1),
            "manifest_bytes_total": man_total,
            "version_list_ms": round(t_list * 1000, 1),
            "read_latest_s": round(t_read_latest, 2),
            "cdf_plan_s": round(t_cdf_plan, 2),
            "cdf_count_s": round(t_cdf_count, 2),
            "consume_cycle_s": round(t_consume, 2),
            "compact_s": round(t_compact, 2),
            "vacuum_s": round(t_vacuum, 2),
            "vacuum_dropped": dropped, "vacuum_deleted": deleted,
            "read_post_compact_s": round(t_read_post, 2),
            "rows_ok": n_latest == n_cdf == n_consume == n_post == want,
        }), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
