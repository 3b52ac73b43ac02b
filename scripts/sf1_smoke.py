#!/usr/bin/env python
"""sf1-equivalent scale smoke for the heaviest driver queries.

The driver ships testdata only up to sf0.1, so this script synthesizes a
10x scaled copy of the sf0.1 tables into /tmp and runs the heaviest
queries end-to-end — the point is to catch cliffs sf0.1 hides (bucket-join
blowups, window spill, verify-stage fanout), not to produce comparable
medians. Scaling is structure-preserving so workload SHAPE scales
linearly instead of degenerating:

- events:     10 copies, user_id shifted per copy (10x keys, same per-key
              row count and time distribution), event_id kept unique;
- documents:  10 copies, every token prefixed with a per-copy tag — a
              bijective shingle rename, so each copy reproduces the
              original near-dup pair structure and NO cross-copy pairs
              appear (10x docs => 10x pairs, exactly);
- embeddings: 10 copies, vector rotated by the copy index (norm-
              preserving, decorrelates copies), vec_id shifted;
- lineitem:   10 plain copies (scan/agg queries only).

Usage: python scripts/sf1_smoke.py [--src /root/testdata/sf0.1]
       [--dest /tmp/fis_sf1] [--copies 10] [--keep]

Last recorded run: see NOTES.md "sf1 smoke".
"""

from __future__ import annotations

import argparse
import functools
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_QUERIES = [
    # heaviest by bench median at sf0.1, plus the scan-agg baseline
    "pit_join_ttl",
    "pit_join_multiview",
    "dedup_minhash_lsh",
    "corpus_curation",
    "corpus_curation_lsh",
    "sessionize_events",
    "knn_ivf",
    "knn_pq",
    "agg_pricing_summary",
    # iterative / join-heavy round-3 additions
    "dedup_clusters",
    "decontaminate_overlap",
    "text_repetition",
    # pipeline additions: sampling/mixing/profiling + Q21-shape + the
    # drained streaming query (state-store scaling) + partitioned refresh
    "mix_domains",
    "sample_stratified",
    "profile_columns",
    "join_waiting_suppliers",
    "streaming_sessionize",
    "materialize_partitioned",
    # round-3 batch 3: new join operators + composed text/cluster shapes
    "asof_join_nearest",
    "range_join_auto_bucket",
    "range_join_ship_windows",
    "rollup_ohlc_daily",
    "cluster_representatives",
    "text_vocab_coverage",
    # round-4 additions: the remaining verdict-item-7 operators + the new
    # real-codec queries + the LSH clustering tier + the auto curation
    # switch AT its crossover (64 MiB default sits right at 10x sf0.1
    # documents, so tier=auto exercises the LSH branch here)
    "asof_join_forward",
    "merge_cdc_snapshot",
    "resample_locf",
    "corpus_curation_auto",
    "dedup_clusters_lsh",
    "multimodal_decode_stats",
    "multimodal_audio_stats",
    # round-4 batch 2: new analytics/join classes + streaming + IVM
    "funnel_conversion",
    "retention_cohorts",
    "features_multi_horizon",
    "normalize_zscore",
    "join_market_share",
    "join_min_cost_supplier",
    "agg_supplier_variety",
    "streaming_window_counts",
    "streaming_interval_join",
    "fuzzy_part_names",
    "hierarchy_chain",
    "scd2_intervals",
    "materialize_agg_incremental",
    # round-4 batch 3: quality gate, reconciliation, gap-fill, streaming
    # dedup, window suite, recursive CTE
    "quality_report",
    "snapshot_diff",
    "agg_daily_gapfill",
    "streaming_dedup",
    "window_rank_suite",
    "agg_grouping_sets_custom",
    "scan_variant_props",
    # round-4 batch 4: training-pipeline + behavioral compositions
    "chunk_documents",
    "text_top_tokens_by_lang",
    "attribution_last_touch",
    "rfm_segments",
    "event_transitions",
    "knn_ivfpq",
    "chunk_and_pack",
    "training_pipeline_e2e",
    "streaming_latest",
    "streaming_enrich",
    "layout_zorder_roundtrip",
    "join_lateral_topn",
    # round-5 additions: new physical paths + training-pipeline shapes.
    # embedding_clusters is NOT here: its registered form rides the exact
    # O(n^2) pair generator (the oracle twin, gate-scale only by design);
    # the scale composition — near_dup_pairs_lsh + the same ccomp — is
    # smoked inline instead (NOTES.md round-5 smoke).
    "fuzzy_part_names_bucketed",
    "streaming_pit_join",
    "features_time_decay",
    "sample_weighted",
    "text_similarity_topk",
    "peak_open_orders",
    "text_bigram_logprob",
    "window_sliding_distinct",
    "copurchase_pairs",
    "event_paths",
    "text_keywords",
    "dedup_incremental",
    "corpus_curation_incremental",
    "agg_value_mad",
    "sessionize_bounce_rate",
    # round-6: the sign-LSH auto-config cliff fix (20k vectors is exactly
    # the measured r5 blowup point — default args must now terminate) and
    # its clustering composition; both auto-resolve to (9 planes, 64
    # tables, cap 512) at this scale
    "embedding_near_dup_lsh",
    "embedding_clusters_lsh",
    # round-6 batch 2: containment's inverted-index fanout is the scale
    # risk; pii/shuffle/resize pin the map-only and Arrow-chain paths
    # (scan_binary_files is excluded: 10x its per-doc partition-dir write
    # is a filesystem stress, not a query-shape signal)
    "dedup_containment",
    "text_pii_scan",
    "training_shuffle",
    "multimodal_resize_stats",
    "event_interarrival",
    "market_basket_rules",
    "streaming_cdc_merge",
    "golden_record",
    "scan_merge_schema",
    "feature_engineering_e2e",
    "scan_json_quarantine",
    "table_checksum",
    "graph_pagerank",
    "multimodal_frame_sample",
    "scan_csv_quarantine",
    "cluster_representatives_lsh",
    # round-6 second session: graph family (iterative joins are the scale
    # risk), the boilerplate broadcast anti-join, the two-window
    # interpolation melt, and the new map-heavy shapes
    "graph_triangles",
    "graph_pagerank_incremental",
    "graph_kcore",
    "graph_ppr_recommend",
    "streaming_topk",
    "scan_text_logs",
    "corpus_boilerplate_removal",
    "resample_interpolate",
    "drift_ks",
    "training_negative_pairs",
    "compliance_erasure_audit",
    "multimodal_image_dedup",
    "features_last_k_events",
    "mix_temperature_weights",
    "agg_equidepth_bins",
    "write_audit_publish",
    "streaming_router",
    "streaming_python_source",
    "sink_python_roundtrip",
    "graph_pagerank_weighted",
    "multimodal_audio_silence",
    # third session: the exact-at-scale similarity-join tier
    "dedup_jaccard_prefix",
    "window_moving_median",
    "streaming_session_window",
    "streaming_state_inspect",
    "text_bpe_train",
    "text_bpe_encode",
    "embed_linear_probe",
    "eval_pr_curve",
    "erasure_deletion_vectors",
    "sessionize_dynamic_gap",
    "features_target_encoding",
    "trend_theil_sen",
    "features_time_weighted_avg",
    "features_hashing_trick",
    "eval_auc",
    "streaming_interval_join_outer",
    # round-8: the ExactSubstr family (the pair view rides the flood
    # bench's capped path; spans/cut are the flood-linear production
    # tiers) and the 15th streaming class
    "dedup_exact_substr_spans",
    "dedup_exact_substr_cut",
    "streaming_interval_join_semi",
    "corpus_curation_exact_substr",
    "materialize_moments_incremental",
    "eval_lang_confusion",
    # round-9: the hash-stable ln-ingredient twins, the 16th streaming
    # class, and the ln float twins' scale sanity
    "text_bm25_counts",
    "text_unigram_logprob_counts",
    "text_bigram_logprob_counts",
    "drift_psi_counts",
    "streaming_interval_join_anti",
    "chunk_documents_cdc",
    # round-9 continuation: layout/privacy/skyline/chained-streaming/
    # winsorize additions
    "layout_hilbert_roundtrip",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_suppression",
    "skyline_pareto",
    "skyline_pareto_bucketed",
    "streaming_join_then_window",
    "features_winsorize",
    "eval_bootstrap_ci",
    "privacy_t_closeness",
    "privacy_generalization",
    # round-10 additions: BFS reachability rings, weighted order
    # statistics, bucketed co-located join
    "graph_bfs_levels",
    "agg_weighted_median",
    "layout_bucketed_join",
    "layout_snapshot_time_travel",
    "streaming_snapshot_sink",
    "eval_retrieval_ranks",
    "join_incremental_refresh",
    "text_cms_heavy_hitters",
    # round-11 additions: weighted SSSP, interval union, CUSUM
    # changepoint, snapshot CDF + MERGE, zone-map skipping
    "graph_sssp_hops",
    "interval_coverage",
    "trend_cusum_changepoint",
    "layout_snapshot_changes",
    "layout_snapshot_merge",
    "layout_data_skipping",
    "layout_snapshot_compact_consume",
    "layout_snapshot_partition_overwrite",
    "layout_snapshot_zonemap",
    "layout_snapshot_bloom",
    "layout_snapshot_cluster_compact",
    "streaming_snapshot_source",
    "layout_snapshot_format_write",
    "streaming_snapshot_sink_stats",
    "trend_mann_kendall",
    "layout_snapshot_consume",
    "trend_ols_counts",
    "agg_mode_exact",
    "layout_snapshot_pipeline",
    "layout_snapshot_mor_delete",
]



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
    from pyspark.sql import functions as F

    tag = "c%dx" % k
    return lambda t: F.concat(F.lit(tag), t)

def build_scaled(spark, src: str, dest: str, copies: int) -> None:
    from pyspark.sql import functions as F

    from feast_ibm_spark.sources.reader import load_table

    os.makedirs(dest, exist_ok=True)

    ev = load_table(spark, src, "events")
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
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
            for k in range(copies)
        ],
    )
    scaled.write.mode("overwrite").parquet(os.path.join(dest, "events.parquet"))

    docs = load_table(spark, src, "documents")
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
                "lang",
                "source",
                "n_chars",
            )
            for k in range(copies)
        ],
    )
    tagged.write.mode("overwrite").parquet(os.path.join(dest, "documents.parquet"))

    emb = load_table(spark, src, "embeddings")
    n_vec = emb.count()
    dim = len(emb.first()["embedding"])
    rotated = functools.reduce(
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
    )
    rotated.write.mode("overwrite").parquet(os.path.join(dest, "embeddings.parquet"))

    # lineitem + orders: copies shift the ORDER key by the same stride so
    # fact-fact joins (Q21 shape) stay key-consistent — each copy is an
    # identical order universe over the SHARED dimension tables, so
    # per-supplier aggregates scale exactly linearly. Scan/agg queries
    # never group on the raw orderkey, so shifting is invisible to them.
    li = load_table(spark, src, "lineitem")
    orders = load_table(spark, src, "orders")
    n_ok = orders.agg(F.max("o_orderkey")).first()[0] + 1
    functools.reduce(
        lambda a, b: a.unionByName(b),
        [
            li.withColumn("l_orderkey", F.col("l_orderkey") + k * n_ok)
            for k in range(copies)
        ],
    ).write.mode("overwrite").parquet(os.path.join(dest, "lineitem.parquet"))
    functools.reduce(
        lambda a, b: a.unionByName(b),
        [
            orders.withColumn("o_orderkey", F.col("o_orderkey") + k * n_ok)
            for k in range(copies)
        ],
    ).write.mode("overwrite").parquet(os.path.join(dest, "orders.parquet"))

    # dimensions ride along unscaled (shared across the copied universes)
    for dim in ("supplier", "nation", "region", "customer", "part"):
        load_table(spark, src, dim).write.mode("overwrite").parquet(
            os.path.join(dest, f"{dim}.parquet")
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default="/tmp/fis_sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--keep", action="store_true",
                    help="reuse an existing --dest instead of regenerating")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of queries to smoke")
    args = ap.parse_args()

    from feast_ibm_spark.queries import QUERIES
    from feast_ibm_spark.session import get_spark

    spark = get_spark(app_name="sf1-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    if not (args.keep and os.path.isdir(args.dest)):
        shutil.rmtree(args.dest, ignore_errors=True)
        t0 = time.time()
        build_scaled(spark, args.src, args.dest, args.copies)
        print(f"generate {args.copies}x sf0.1 -> {args.dest}: "
              f"{time.time()-t0:.1f}s")

    for name in (args.only.split(",") if args.only else SMOKE_QUERIES):
        t0 = time.time()
        try:
            n = QUERIES[name].fn(spark, args.dest).count()
        except Exception as e:  # keep the sweep going; report the failure
            print(f"{name}: FAILED after {time.time()-t0:.1f}s — "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        print(f"{name}: {time.time()-t0:.1f}s ({n:,} rows)", flush=True)


if __name__ == "__main__":
    main()
