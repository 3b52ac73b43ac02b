#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is executed N_RUNS times (default 5) after a warm-up pass of
the input scans (parquet footer/OS page cache), timed wall-clock to a
count()-style materialization. Reported per-query time is the MEDIAN of
the runs — single runs on this box swing ±30-50% with machine load
(NOTES.md), which made round-over-round deltas undiagnosable; the
min/max across runs is recorded under "spread" so variance stays
visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # the reference surface
    "pull_all_time_range",
    "pull_latest_per_key",
    "pit_join_ttl",
    "pit_join_union_window",
    "pit_join_multiview",
    # analytics shapes
    "agg_pricing_summary",
    "agg_revenue_forecast",
    "agg_event_type_stats",
    "join_top_orders",
    "join_region_revenue",
    "join_semi_late_orders",
    "agg_rollup_region_revenue",
    "window_running_total",
    "sessionize_events",
    "pit_join_partitioned",
    # north-star extensions
    "corpus_curation",
    "corpus_curation_lsh",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_cosine_topk",
    "knn_ivf",
    "knn_pq",
    "text_fingerprint",
    "multimodal_byte_features",
    "multimodal_decode_stats",
    # round-9 operator families (VERDICT r9 item 2: one representative
    # per family so round-over-round diffs catch regressions in them)
    "privacy_suppression",
    "skyline_pareto",
    "eval_bootstrap_ci",
    "layout_hilbert_roundtrip",
    "dedup_exact_substr_spans",
    # round-10 families (VERDICT r10 item 3): the iterative-join shape
    # (BFS frontier rounds) and the zero-Exchange bucketed-join pin
    "graph_bfs_levels",
    "layout_bucketed_join",
    # round-11 families: gaps-and-islands window merge + integer CUSUM
    # (one representative each; SSSP is covered by the BFS entry's
    # iterative shape and is too heavy for a 5-run bench slot)
    "interval_coverage",
    "trend_cusum_changepoint",
    # round-12 family: the snapshot-format write path end to end (3
    # commits + 2 pipeline cycles + a no-op cycle per run, fresh dirs
    # every run) — the format's write-path regression canary
    "layout_snapshot_pipeline",
    # round-12b family: the snapshot READ-path levers — stats-recording
    # commits plus a stat-pruned windowed read (dest cleared before
    # every timed run so the zone-map write stays inside the
    # measurement; the r13-plan bench representative)
    "layout_snapshot_zonemap",
]


def _clear_hilbert_dest(sf_dir: str) -> None:
    """The Hilbert roundtrip caches its clustered copy under /tmp and
    later runs only read it back; clearing the dest before EVERY timed
    run keeps the clustered WRITE (the regression target) inside the
    measurement."""
    import hashlib
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(
        os.path.join(tempfile.gettempdir(), f"fis_events_hilbert_{tag}"),
        ignore_errors=True,
    )


def _clear_zonemap_dest(sf_dir: str) -> None:
    """The zone-map chain is built once per sf tag and reused by the
    gate; for the BENCH the 3 stats-recording commits ARE the write
    path under measurement, so clear the chain before every timed
    run."""
    import hashlib
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shutil.rmtree(
        os.path.join(tempfile.gettempdir(), f"fis_events_zm_{tag}"),
        ignore_errors=True,
    )


_PRE_RUN = {
    "layout_hilbert_roundtrip": _clear_hilbert_dest,
    "layout_snapshot_zonemap": _clear_zonemap_dest,
}


def _calibrate(seconds: float = 1.0) -> int:
    """Fixed-work single-thread spin: iterations of a pure-Python loop
    completed in ``seconds`` of wall clock. Absolute BENCH numbers on
    this host swing 14.8-33s same-binary with ambient load/cgroup state
    (NOTES.md "idle-host bench bisect"); recording a calibration count
    at bench time lets later rounds normalize round-over-round deltas
    without a same-host A/B worktree run (VERDICT r6 item 7)."""
    count = 0
    x = 0
    deadline = time.perf_counter() + seconds
    while time.perf_counter() < deadline:
        for _ in range(10_000):
            x = (x * 1103515245 + 12345) % 2147483648
        count += 10_000
    return count


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    loadavg_start = os.getloadavg()
    calibration_start = _calibrate()
    from feast_ibm_spark.queries import QUERIES
    from feast_ibm_spark.session import get_spark

    spark = get_spark(app_name="feast-ibm-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the page cache + JVM (one cheap pass over each input)
    from feast_ibm_spark.sources.reader import load_table

    for t in ("events", "lineitem", "orders", "customer", "documents", "embeddings"):
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass

    # warm the Python UDF workers too (Arrow lanes spawn on first use; that
    # one-time daemon fork is session setup, not query cost). The kernel
    # imports numpy + zlib so every forked worker pays its module-import
    # cost here, not inside the first measured LSH/signature query.
    import pandas as _pd
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm(s):  # no hints: _pd is main()-local, stringized annotations
        # would not resolve in pyspark's type-hint inference
        import zlib

        import numpy as _np

        return _pd.Series(
            _np.asarray(s, dtype=_np.int64) + zlib.crc32(b"warm") % 2
        )

    # range(1000) spawns only the few workers whose tasks run before the
    # tiny job drains — later queries then pay numpy-import stalls on the
    # REMAINING slots mid-measurement. Hold every core busy long enough
    # (~100k rows/task through the Arrow lane) that all defaultParallelism
    # worker slots fork and import concurrently; run twice so the second
    # pass verifies reuse (it should be ~instant).
    par = spark.sparkContext.defaultParallelism
    for _ in range(2):
        spark.range(par * 100_000, numPartitions=par).select(
            _warm("id")
        ).count()

    # median of FIVE since round 5: this host generation shows co-tenant
    # stalls of 10-50s that can hit two consecutive runs of one query
    # (observed: a 2.7s query with runs [2.7, 9.9, 51.6] -> median 9.9);
    # five runs keep the median on the quiet-majority side.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        qd = QUERIES[name]
        runs = []
        for _ in range(n_runs):
            if name in _PRE_RUN:
                _PRE_RUN[name](sf_dir)
            # Round 12 (measurement honesty, not a speedup): several
            # operators now persist a reused intermediate INSIDE the
            # query (PIT spine, curation survivors) — a within-query
            # win. Spark's CacheManager would silently substitute that
            # cache into the IDENTICAL plan of the next timed run, so
            # runs 2..n would skip the recompute and the median would
            # measure warm-cache behavior rounds 1-11 never had. Drop
            # all cached data before every timed run so each run
            # computes from the parquet inputs (cache writes included),
            # keeping medians comparable round-over-round.
            spark.catalog.clearCache()
            t0 = time.time()
            # full materialization without driver transfer of payloads
            n = qd.fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)
        spread[name] = [round(runs[0], 3), round(runs[-1], 3)]
        print(
            f"# {name}: median {timings[name]}s "
            f"(min {spread[name][0]} / max {spread[name][1]}, {n} rows)",
            file=sys.stderr,
        )

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Detail line FIRST (spread / loadavg / calibration / runs — the
    # host-state ledger), compact headline line LAST: the driver keeps
    # only a ~2,000-char tail of stdout, and round 10's single combined
    # line outgrew it (BENCH_r10.json parsed:null — VERDICT r10 item 2).
    # Whatever happens to the detail line, the machine-readable headline
    # (metric/value/unit/queries/sf) must survive the tail capture.
    detail = {
        "detail": "spread [min,max] per query + host state; headline on last line",
        "runs": n_runs,
        "spread": spread,
        # host-state context (VERDICT r6 item 7): 1/5/15-min loadavg at
        # start/end + single-thread fixed-work spin counts. Normalize
        # cross-round comparisons by the calibration ratio before
        # reading anything into a wall-clock delta.
        "loadavg": {
            "start": [round(v, 2) for v in loadavg_start],
            "end": [round(v, 2) for v in os.getloadavg()],
        },
        "calibration": {
            "unit": "loop iterations / sec (single thread)",
            "start": calibration_start,
            "end": _calibrate(),
        },
    }
    # Calibration gate (round 13, VERDICT r12 item 8 — additions-only):
    # the r12 driver bench started on a half-speed host (2.58M vs 5.33M
    # at its own end) and minted 17 phantom "regressions" on untouched
    # code. Flag LOUDLY when the start calibration sits >25% below the
    # end one, so readers (and the next round's judge) discount the
    # medians instead of reading host recovery as code change.
    cal = detail["calibration"]
    cal["degraded_start"] = cal["start"] < 0.75 * cal["end"]
    if cal["degraded_start"]:
        print(
            "# WARNING: start calibration {} is >25% below end {} — the "
            "host was degraded while this bench ran; treat per-query "
            "medians as contaminated and re-run before comparing "
            "rounds".format(cal["start"], cal["end"]),
            file=sys.stderr,
        )
    print(json.dumps(detail))
    out = {
        "metric": "headline queries wall-clock (median of runs)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    line = json.dumps(out)
    assert len(line) < 1800, (
        f"headline line {len(line)} chars — would overflow the driver's "
        "2,000-char tail capture; shorten keys or split the output"
    )
    print(line)


if __name__ == "__main__":
    main()
