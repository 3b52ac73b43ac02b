"""Replica of the driver's correctness gate for the queries NOT exported
through ``__spark_entry__`` (plus invariants of the curated export).

Both recorded driver rounds gated exactly 50 of 51 registered queries, so
``DRIVER_QUERIES`` exports exactly 50 and the remaining inventory is pinned
HERE with the same DuckDB compare the driver uses (see
scripts/check_oracle.py for the standalone full sweep).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feast_ibm_spark.queries import DRIVER_QUERIES, QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def test_driver_export_is_exactly_50():
    assert len(DRIVER_QUERIES) == 50
    # every exported entry exists in the full inventory, same object
    for name, qd in DRIVER_QUERIES.items():
        assert QUERIES[name] is qd


def _driver_hashed_through(root: str, last_round: int) -> set[str]:
    import json

    hashed = set()
    for r in range(1, last_round + 1):
        p = os.path.join(root, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(p):
            hashed |= set(json.load(open(p)))
    return hashed


def _driver_value_hashed_through(root: str, last_round: int) -> set[str]:
    """Queries with at least one hash_match=true driver row — presence
    in a CORRECTNESS file is NOT enough (r1-r2 recorded "no_oracle" rows
    for then-oracle-less queries; r8 recorded them for the rows-only
    experiment)."""
    import json

    hashed = set()
    for r in range(1, last_round + 1):
        pth = os.path.join(root, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(pth):
            for name, row in json.load(open(pth)).items():
                if row.get("hash_match"):
                    hashed.add(name)
    return hashed


def _driver_last_hash_round(root: str, last_round: int) -> dict[str, int]:
    """Per-query LAST round with a hash_match=true driver row (0 if
    never value-hashed)."""
    import json

    last: dict[str, int] = {}
    for r in range(1, last_round + 1):
        pth = os.path.join(root, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(pth):
            for name, row in json.load(open(pth)).items():
                if row.get("hash_match"):
                    last[name] = r
    return last


# The 4 r7-last-hashed rows deliberately left for the r13 refresh pool —
# each keeps a same-family sibling in the r12 gate, so no operator
# family goes unrefreshed this round.
_R7_LEFT_FOR_R13: frozenset[str] = frozenset({
    "dedup_jaccard_prefix",           # sibling in gate: dedup_containment_prefix
    "features_time_weighted_avg",     # siblings: features_hashing_trick /
                                      # _last_k_events / _target_encoding
    "graph_pagerank_weighted",        # siblings: graph_pagerank_incremental,
                                      # graph_ppr_recommend, graph_kcore
    "streaming_interval_join_outer",  # siblings: streaming_cdc_merge, _router,
                                      # _session_window, _state_inspect,
                                      # _python_source
})


def test_driver_export_r12_rotation_invariants():
    """VERDICT r11 item 1: the 11 _QUEUED_FOR_R12_GATE registrations take
    their first driver hashes and the remaining 39 slots go to the
    stalest-hash refresh pool (the r11 twin of this test retired with
    its gate; history in NOTES.md 'Gate rotation ledger'). Invariants:
    every slot carries a full oracle; GATE_ROWS_ONLY is empty; all 11
    queued queries are in the gate; every refresh slot has its last
    driver hash in r7 exactly (nothing recently-hashed wastes a slot);
    and the entire r7 pool is taken except the 4 documented
    same-family-sibling leave-outs."""
    from feast_ibm_spark.queries import GATE_ROWS_ONLY

    assert GATE_ROWS_ONLY == frozenset()
    no_oracle = [n for n, qd in DRIVER_QUERIES.items() if qd.oracle is None]
    assert no_oracle == []

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert _QUEUED_FOR_R12_GATE <= set(DRIVER_QUERIES)
    last = _driver_last_hash_round(root, 11)
    refresh = set(DRIVER_QUERIES) - _QUEUED_FOR_R12_GATE
    assert len(refresh) == 39
    not_r7 = sorted(n for n in refresh if last.get(n, 0) != 7)
    assert not_r7 == [], f"r12 refresh slots not from the r7 pool: {not_r7}"
    pool_r7 = {
        n for n in QUERIES
        if last.get(n, 0) == 7 and QUERIES[n].oracle is not None
    }
    assert pool_r7 - refresh == _R7_LEFT_FOR_R13


# New-capability registrations made AFTER the round-12 gate list froze:
# carry a full local oracle pin from day one, first in line for the
# round-13 gate. Keep this list SHORT — it is the only sanctioned
# source of new never-driver-hashed queries.
_QUEUED_FOR_R13_GATE: frozenset[str] = frozenset({
    "trend_mann_kendall",               # integer Mann-Kendall S +
                                        # pair counts on the daily
                                        # series; replica property net
                                        # + 3-scale pins from day one
    "streaming_snapshot_sink_stats",    # streaming sink + per-batch ts
                                        # stats: pruned windowed read +
                                        # metadata COUNT(*); 3-scale pins
                                        # from day one
    "layout_snapshot_bloom",            # manifest bloom filters: point
                                        # lookups on an interleaved key
                                        # prune segments stats cannot;
                                        # unit net (test_sources.py
                                        # test_snapshot_bloom_lookup) +
                                        # 3-scale pins from day one
    "layout_snapshot_format_write",     # write path through the Spark
                                        # DataSource API: staged Arrow
                                        # batches -> shared CAS commit;
                                        # unit net
                                        # (test_snapshot_datasource) +
                                        # 3-scale pins from day one
    "streaming_snapshot_source",        # snapshot table as a Structured
                                        # Streaming SOURCE (Python
                                        # DataSource API): version
                                        # offsets, manifest-planned
                                        # batches; unit net
                                        # (test_snapshot_datasource) +
                                        # 3-scale pins from day one
    "layout_snapshot_cluster_compact",  # range-clustered compaction:
                                        # windowed reads prune after the
                                        # rewrite; unit net
                                        # (test_clustered_compaction) +
                                        # 3-scale pins from day one
    "layout_snapshot_zonemap",          # manifest zone maps: stat-pruned
                                        # windowed reads; unit net +
                                        # plan pin + 3-scale pins from
                                        # day one
    "layout_snapshot_partition_overwrite",  # dynamic partition
                                        # overwrite: metadata-level swap,
                                        # pruned read; lifecycle unit net
                                        # + 3-scale pins from day one
    "range_join_auto_bucket",           # data-driven bucket width
                                        # (~p95 sampled interval length);
                                        # A/B vs bad manual widths in
                                        # scripts/interval_bucket_ab.py;
                                        # 3-scale pins from day one
    "layout_snapshot_compact_consume",  # CDF across a certified
                                        # compaction: fresh + lagging +
                                        # fully-acked consumer positions;
                                        # unit net (test_sources.py
                                        # test_cdf_survives_certified_
                                        # compaction) + 3-scale pins
                                        # from day one
})
# (historical) the r11-queued list — rotated into the r12 gate, where the
# rotation invariants above still reference it:
_QUEUED_FOR_R12_GATE: frozenset[str] = frozenset({
    "graph_sssp_hops",          # bounded-hop weighted shortest paths
                                # (frontier Bellman-Ford) vs chained
                                # min-plus rounds oracle; property net
                                # + 3-scale pins from day one
    "interval_coverage",        # gaps-and-islands interval union per
                                # supplier; sweep-replay property net +
                                # 3-scale pins from day one
    "trend_cusum_changepoint",  # integer-exact CUSUM changepoint
                                # (argmax |n*S_k - k*S_n|); replica
                                # property net + 3-scale pins day one
    "layout_snapshot_changes",  # snapshot CDF: segment-diff
                                # incremental read; unit-tested refusal
                                # semantics + 3-scale pins day one
    "layout_snapshot_merge",    # MERGE INTO (upserts+deletes) as a
                                # copy-on-write commit; unit-tested
                                # duplicate-key/delete semantics +
                                # 3-scale pins day one
    "layout_data_skipping",     # file-level zone-map skipping with a
                                # persisted stats table; pruning plan
                                # pin + 3-scale content oracle day one
    "layout_snapshot_consume",  # exactly-once CDF consumer (cursor
                                # checkpoint + ack); empty re-consume
                                # under the hash; unit net + 3-scale
                                # pins from day one
    "trend_ols_counts",         # OLS sufficient statistics, all
                                # BIGINT; reconstruction-identity net
                                # + 3-scale pins from day one
    "agg_mode_exact",           # deterministic per-key mode (count
                                # desc, value asc); property net +
                                # 3-scale pins from day one
    "layout_snapshot_pipeline", # exactly-once table-to-table pipeline
                                # (consume -> agg -> version-keyed
                                # commit -> ack); crash-window unit net
                                # + 3-scale pins from day one
    "layout_snapshot_mor_delete",  # merge-on-read key tombstones
                                   # (O(deletes) suppression, appends
                                   # carry, compaction materializes);
                                   # lifecycle unit net + 3-scale pins
})
# (the r10 and r11 queues retired with their rotation tests — history
# in NOTES.md 'Gate rotation ledger' and git)


def test_never_hashed_are_documented_local_only():
    """After the r11 rotation every registered query is either (a) driver
    value-hashed in some recorded round, (b) at the current gate, or
    (c) a documented local-only query: the rtol ln() float twins (their
    hash-stable *_counts twins took gate rows in r9), the approximate
    sketches, or the pinned next-round queue."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hashed = _driver_value_hashed_through(root, 99) | set(DRIVER_QUERIES)
    local_only = set(_RTOL_LOCAL) | set(_EXCLUDED_ROWS_ONLY) | _QUEUED_FOR_R13_GATE
    stragglers = sorted(set(QUERIES) - hashed - local_only)
    assert stragglers == [], f"undocumented never-hashed queries: {stragglers}"
    for n in _QUEUED_FOR_R13_GATE:
        assert QUERIES[n].oracle is not None


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _load_check_oracle():
    """The canonicalizer is shared with scripts/check_oracle.py — one
    implementation, imported here, so the test gate and the standalone
    sweep can never disagree on normalization (null-first date columns
    were mishandled by an earlier per-file copy)."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "check_oracle", os.path.join(root, "scripts", "check_oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_canon = _load_check_oracle().canon


# Every registered query NOT in the driver export and carrying a full
# oracle - pinned here with the driver's own compare at gate scale.
# Round 10 parked the entire r9 gate (each slot 1+ green driver rows,
# 50/50 hash-green in CORRECTNESS_r09) plus everything last hashed in
# r7-r8 and 35 of the r6-hashed; every member has at least one green
# driver row of its own. Rotation history: NOTES.md 'Gate rotation
# ledger'.
_EXCLUDED_WITH_ORACLE = [
    "agg_activity_profile",
    "agg_cube_status_priority",
    "agg_daily_gapfill",
    "agg_event_type_stats",
    "agg_global_avg_filter",
    "agg_grouping_sets_custom",
    "agg_important_parts",
    "agg_pricing_summary",
    "agg_promo_share",
    "agg_revenue_forecast",
    "agg_rollup_region_revenue",
    "agg_salted_hot_keys",
    "agg_smallqty_revenue",
    "agg_supplier_variety",
    "agg_value_histogram",
    "agg_value_mad",
    "agg_value_percentiles",
    "agg_weighted_median",
    "array_norm_stats",
    "asof_join_forward",
    "asof_join_nearest",
    "attribution_last_touch",
    "chunk_and_pack",
    "chunk_documents",
    "chunk_documents_cdc",
    "cluster_representatives",
    "copurchase_pairs",
    "corpus_boilerplate_removal",
    "corpus_curation",
    "corpus_curation_exact_substr",
    "corpus_curation_incremental",
    "corpus_curation_lsh",
    "decontaminate_overlap",
    "dedup_clusters",
    "dedup_clusters_lsh",
    "dedup_containment",
    "dedup_exact",
    "dedup_exact_substr",
    "dedup_exact_substr_cut",
    "dedup_exact_substr_spans",
    "dedup_incremental",
    "dedup_jaccard_prefix",
    "dedup_keep_latest",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "drift_ks",
    "drift_psi_counts",
    "embedding_clusters",
    "embedding_clusters_lsh",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "eval_auc",
    "eval_bootstrap_ci",
    "eval_retrieval_ranks",
    "event_interarrival",
    "event_paths",
    "event_transitions",
    "feature_engineering_e2e",
    "features_multi_horizon",
    "features_time_decay",
    "features_time_weighted_avg",
    "features_winsorize",
    "filter_value_outliers",
    "funnel_conversion",
    "fuzzy_part_names",
    "fuzzy_part_names_bucketed",
    "graph_bfs_levels",
    "graph_pagerank",
    "graph_pagerank_weighted",
    "graph_triangles",
    "hierarchy_chain",
    "join_anti_quiet_customers",
    "join_excess_suppliers",
    "join_incremental_refresh",
    "join_large_orders",
    "join_lateral_topn",
    "join_market_share",
    "join_min_cost_supplier",
    "join_nation_profit",
    "join_nation_trade_flow",
    "join_order_count_distribution",
    "join_promo_revenue",
    "join_region_revenue",
    "join_returned_customers",
    "join_semi_late_orders",
    "join_top_orders",
    "join_top_supplier",
    "join_waiting_suppliers",
    "knn_cosine_topk",
    "knn_ivf",
    "knn_ivfpq",
    "knn_lsh",
    "knn_pq",
    "layout_bucketed_join",
    "layout_hilbert_roundtrip",
    "layout_snapshot_bloom",
    "layout_snapshot_cluster_compact",
    "layout_snapshot_compact_consume",
    "layout_snapshot_format_write",
    "layout_snapshot_partition_overwrite",
    "layout_snapshot_time_travel",
    "layout_snapshot_zonemap",
    "layout_zorder_roundtrip",
    "materialize_agg_incremental",
    "materialize_incremental",
    "materialize_moments_incremental",
    "materialize_partitioned",
    "merge_cdc_snapshot",
    "mix_domains",
    "multimodal_audio_stats",
    "multimodal_byte_features",
    "multimodal_decode_stats",
    "multimodal_frame_sample",
    "multimodal_resize_stats",
    "normalize_zscore",
    "pack_sequences",
    "peak_open_orders",
    "pit_join_multiview",
    "pit_join_nottl",
    "pit_join_partitioned",
    "pit_join_shuffle",
    "pit_join_ttl",
    "pit_join_union_window",
    "pivot_event_counts",
    "privacy_generalization",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_suppression",
    "privacy_t_closeness",
    "profile_columns",
    "pull_all_query_source",
    "pull_all_time_range",
    "pull_latest_keep_ties",
    "pull_latest_per_key",
    "pull_latest_tiebreak",
    "quality_report",
    "range_join_auto_bucket",
    "range_join_ship_windows",
    "resample_interpolate",
    "resample_locf",
    "retention_cohorts",
    "rfm_segments",
    "rollup_ohlc_daily",
    "sample_stratified",
    "sample_weighted",
    "scan_binary_files",
    "scan_csv_source",
    "scan_json_props",
    "scan_merge_schema",
    "scan_orc_source",
    "scan_part_filter",
    "scan_partitioned_events",
    "scan_text_logs",
    "scan_variant_props",
    "scan_xml_source",
    "scd2_intervals",
    "sessionize_bounce_rate",
    "sessionize_dynamic_gap",
    "sessionize_events",
    "sessionize_native_window",
    "set_user_cohorts",
    "skyline_pareto",
    "skyline_pareto_bucketed",
    "snapshot_diff",
    "split_train_val_test",
    "streaming_dedup",
    "streaming_enrich",
    "streaming_first_seen",
    "streaming_interval_join",
    "streaming_interval_join_anti",
    "streaming_interval_join_outer",
    "streaming_interval_join_semi",
    "streaming_join_then_window",
    "streaming_latest",
    "streaming_pit_join",
    "streaming_sessionize",
    "streaming_sessionize_files",
    "streaming_snapshot_sink",
    "streaming_snapshot_sink_stats",
    "streaming_snapshot_source",
    "streaming_topk",
    "streaming_window_counts",
    "text_bigram_logprob_counts",
    "text_bm25_counts",
    "text_bpe_tokens",
    "text_bpe_train",
    "text_cms_heavy_hitters",
    "text_fingerprint",
    "text_keywords",
    "text_lang_id",
    "text_quality",
    "text_repetition",
    "text_similarity_topk",
    "text_token_count",
    "text_top_tokens",
    "text_top_tokens_by_lang",
    "text_unigram_logprob_counts",
    "text_vocab_coverage",
    "training_pipeline_e2e",
    "trend_mann_kendall",
    "unpivot_part_attrs",
    "window_moving_median",
    "window_rank_suite",
    "window_rolling_24h",
    "window_running_total",
    "window_sliding_distinct",
    "window_spend_quartiles",
]
# The 4 rtol ln() float queries are LOCAL-ONLY permanently (the r8
# rows-only gate experiment produced unverified no_oracle rows): their
# exact-rtol compare is pinned HERE, and their hash-stable
# integer-ingredient *_counts twins take driver rows instead (r9 gate;
# reconstruction identities in tests/test_analytics_shapes.py).
_RTOL_LOCAL = ["text_bm25", "text_unigram_logprob",
               "text_bigram_logprob", "drift_psi"]
_EXCLUDED_ROWS_ONLY = ["agg_approx_event_stats",
                       "window_sliding_distinct_hll"]


def test_exclusions_partition_correctly():
    excluded = set(QUERIES) - set(DRIVER_QUERIES)
    assert excluded == (
        set(_EXCLUDED_WITH_ORACLE) | set(_EXCLUDED_ROWS_ONLY)
        | set(_RTOL_LOCAL)
    )
    # the rtol float twins never re-enter the gate (r9 policy)
    assert not set(_RTOL_LOCAL) & set(DRIVER_QUERIES)


def test_gate_rows_only_export_shape():
    """GATE_ROWS_ONLY members are exported by ``queries()`` but withheld
    from ``oracle_sql()``. The set is EMPTY since round 9 (the driver
    performs no check at all on oracle-withheld slots), so this now pins
    that every exported query ships its oracle — the export-shape
    contract survives should the set ever be repopulated."""
    from feast_ibm_spark.queries import GATE_ROWS_ONLY

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(GATE_ROWS_ONLY) <= set(q)
    assert not (set(GATE_ROWS_ONLY) & set(o))
    assert set(o) == set(q) - set(GATE_ROWS_ONLY)


@pytest.mark.sweep
@pytest.mark.parametrize("name", _EXCLUDED_WITH_ORACLE)
def test_excluded_query_matches_oracle(spark, duck, name):
    qd = QUERIES[name]
    got = _canon(qd.fn(spark, SF_DIR).toPandas())
    want = _canon(duck.execute(qd.oracle).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_exact=True)


@pytest.mark.sweep
@pytest.mark.parametrize("name", _RTOL_LOCAL)
def test_rtol_query_matches_oracle(spark, duck, name):
    """These use ln(), which differs by ~1 ulp between DuckDB (libm) and
    the JVM — compare with rtol instead of the exact hash."""
    qd = QUERIES[name]
    got = _canon(qd.fn(spark, SF_DIR).toPandas())
    want = _canon(duck.execute(qd.oracle).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)


@pytest.mark.sweep
@pytest.mark.parametrize("name", _EXCLUDED_ROWS_ONLY)
def test_excluded_rows_only_query_runs(spark, name):
    # approximate-by-design: accuracy vs the exact twins is asserted in
    # test_analytics_shapes / test_north_star; here pin that they execute
    # and return rows at gate scale
    assert QUERIES[name].fn(spark, SF_DIR).count() > 0


def test_every_query_is_documented_in_coverage():
    """COVERAGE.md is the judge-facing operator inventory — every
    registered query (driver-exported or local-gate) must appear in it."""
    doc = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "COVERAGE.md")
    ).read()
    missing = [n for n in QUERIES if f"`{n}`" not in doc and n not in doc]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_coverage_generated_index_is_current():
    """The query index at the bottom of COVERAGE.md is emitted by
    scripts/gen_coverage.py; registering a query without regenerating it
    must fail here (round-3's merge_cdc_snapshot drift, made impossible).
    """
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_coverage", os.path.join(root, "scripts", "gen_coverage.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    doc = open(os.path.join(root, "COVERAGE.md")).read()
    assert mod.BEGIN in doc and mod.END in doc, "generated index missing"
    current = doc[doc.index(mod.BEGIN) : doc.index(mod.END) + len(mod.END)] + "\n"
    assert current == mod.render(), (
        "COVERAGE.md generated index is stale — run "
        "`python scripts/gen_coverage.py --write`"
    )
