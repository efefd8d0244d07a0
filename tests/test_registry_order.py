"""Registration-order invariants for the driver's correctness window.

The driver checks only the FIRST 50 registered queries (CORRECTNESS_r01
cut exactly at position 50), so the curated ``PRIORITY`` prefix must put
at least one query for every SURVEY §2 id inside that window. Redundant
variants (same survey ids covered elsewhere in the window) ride behind.
"""

from __future__ import annotations

DRIVER_WINDOW = 50


def _ordered_specs():
    from echem_dft_etl_spark.registry import all_queries

    return list(all_queries().values())


def test_priority_names_all_registered():
    from echem_dft_etl_spark.registry import PRIORITY, all_queries

    names = set(all_queries())
    assert set(PRIORITY) <= names
    assert len(PRIORITY) == len(set(PRIORITY)), "duplicate PRIORITY names"


def test_first_window_covers_every_survey_id():
    specs = _ordered_specs()
    window_ids = {i for s in specs[:DRIVER_WINDOW] for i in s.survey_ids}
    all_ids = {i for s in specs for i in s.survey_ids}
    assert window_ids == all_ids, (
        f"survey ids outside the driver window: {sorted(all_ids - window_ids)}"
    )


#: Canonical SURVEY §2 ids — all 41, including S5 since round 8 gave
#: it an engine-shaped query (`s05_chart_sink`). The window must keep
#: ≥ 1 query claiming each — this is the guard that fails if a future
#: registration change evicts an id's LAST in-window query (the union
#: test below cannot catch the case where the id's only claimants were
#: all inside the window).
CANONICAL_SURVEY_IDS = frozenset(
    [f"Q{i}" for i in range(1, 23)]
    + ["S1", "S2", "S3", "S4", "S5"]
    + [f"X{i}" for i in range(1, 15)]
)


def test_window_retains_every_canonical_survey_id():
    specs = _ordered_specs()
    window_ids = {i for s in specs[:DRIVER_WINDOW] for i in s.survey_ids}
    missing = CANONICAL_SURVEY_IDS - window_ids
    assert not missing, (
        f"SURVEY ids with no query left in the driver window: {sorted(missing)}"
    )


#: Every name that has occupied a driver-window slot in a PAST round
#: (r1-r7 shared one 50-name window; r8 rotated 27 fresh names in —
#: its window is the second block, == CORRECTNESS_r08.json's keys).
#: The rotation policy (VERDICT r7 item 6) requires each round's
#: window to give driver-grade evidence to queries that never had it.
PREVIOUS_WINDOW_MEMBERS = frozenset(
    {
        # round-11 window (CORRECTNESS_r11.json; names already in
        # earlier windows are listed in their first block)
        "d23_source_priority_dedup", "d30_group_split", "mm_video_frames",
        "q10_serializer_pandas_udf", "s12_negative_pairs",
        "s18_benford_digits", "sql_lateral_topk", "sql_pipe_syntax",
        "sql_recursive_hierarchy", "sql_surface_disjunct_revenue",
        "sql_surface_dominant_supplier", "sql_surface_global_avg_anti",
        "sql_surface_large_orders", "sql_surface_lateral_topk",
        "sql_surface_priority_backlog", "sql_surface_priority_mix",
        "sql_surface_promo_share", "sql_surface_returned_items",
        "sql_surface_shipping_priority", "sql_surface_small_qty_revenue",
        "sql_surface_supplier_variety", "sql_surface_trade_volume",
        "sql_surface_value_share", "sql_surface_waiting_supplier",
        "t13_heavy_hitters", "t13_pack_firstfit", "x01_skyline_pareto",
        "x02_union_by_name", "x04_ewma_dyadic", "x04_interpolate",
        "x04_max_drawdown", "x04_missing_ranges", "x04_rolling_range",
        "x04_time_weighted_avg", "x06_magnitude_hist", "x09_event_gaps",
        "x10_stream_custom_source", "x10_stream_dedup_keys",
        "x10_stream_foreach_merge", "x10_stream_outer_join",
        "x10_stream_sliding", "x10_stream_static_join",
        # round-10 window (CORRECTNESS_r10.json)
        "s01_partition_evolution", "s01_zorder_scan", "s01_compaction",
        "s01_schema_evolution", "s02_csv_roundtrip", "s02_jsonl_roundtrip",
        "s02_orc_roundtrip", "s02_xml_roundtrip", "s03_snapshot_changes",
        "s03_time_travel", "s03_scd2_history", "mm_resize_bmp",
        "mm_frame_sample", "mm_audio_chunks", "mm_audio_fingerprint_pairs",
        "d15_decontaminate", "d16_semdedup", "d17_mixture_sample",
        "d18_incremental_dedup", "d19_fuzzy_join", "d20_training_pipeline",
        "d21_chunk_dedup", "d22_token_budget_mix", "d24_source_overlap",
        "d25_entity_resolution", "d27_matcher_eval", "x05_pagerank",
        "x06_weighted_median", "q11_split_assign", "x01_topk_orders",
        "x03_pivot", "x04_hampel_outliers", "x08_feature_map",
        "x09_funnel_conversion", "s12_embed_quantize", "t13_pii_redact",
        "s18_profile_table",
        # round-9 window additions (CORRECTNESS_r09.json; names also
        # present in earlier windows are listed in their first block)
        "sql_surface_market_share", "sql_surface_min_cost_supplier",
        "sql_surface_order_count_dist", "s05_chart_sink",
        "x04_cusum_drift", "x05_spatial_near_join", "x05_contact_pairs",
        "x06_equidepth_hist", "t13_bpe_tokens", "d28_split_leakage_audit",
        "s18_k_anonymity", "x10_stream_cusum", "s02_fixed_width",
        "x07_business_days", "sql_surface_top_supplier", "mm_scene_cuts",
        "t13_keyword_extract", "x06_sketch_mergeable", "s17_bucketed_join",
        "s01_dpp_scan", "s03_merge_upsert", "x03_unpivot",
        "sql_correlated_subquery", "q02_keylist_semijoin",
        "x03_time_rollup",
        # round-8 window (CORRECTNESS_r08.json)
        "s02_custom_datasource", "q11_stratified_sample",
        "pipeline_reference_e2e", "s03_deletion_vectors",
        "sql_surface_revenue_by_nation", "sql_surface_pricing",
        "s04_custom_sink", "x01_global_rownum", "x02_set_ops_all",
        "x03_grouping_sets", "x04_rolling_wau", "x05_full_outer",
        "x05_nullsafe_join", "x05_range_join_binned",
        "s18_outlier_mad", "x07_cohort_retention",
        "x08_variant_shred", "x09_dynamic_gap_sessions",
        "x10_stream_trending", "d12_minhash_lsh_prod", "d13_simhash",
        "d26_containment_pairs", "s12_pq_topk", "s12_ivfpq_topk",
        "t13_language_id", "mm_image_phash_pairs",
        # rounds 1-7 window
        "echem_flagship", "q01_pushdown_scan", "q02_keylist_scan",
        "q04_string_to_digits", "q05_last_match_per_key",
        "q08_scalar_arithmetic", "q09_path_strings",
        "q10_serializer_expr", "q11_det_sample", "q12_det_pick_one",
        "q13_generate_grid", "q14_group_index", "q16_upsert_first_wins",
        "q17_multi_join", "q21_pricing_summary", "s01_sink_roundtrip",
        "pipe_external_solver", "d01_nested_sites", "x01_group_topk",
        "x02_set_ops", "x03_rollup", "x03_time_rollup",
        "x04_analytic_windows", "x05_left_outer_agg", "x05_semi_anti",
        "x05_range_join", "s16_asof_join", "s15_salted_join",
        "x06_percentiles_distinct", "x07_datetime", "x08_json_extract",
        "x09_sessionize", "x10_stream_tumbling", "x10_stream_sessions",
        "x10_stream_stateful_profile", "x10_stream_stream_join",
        "d11_dedup_exact", "d12_minhash_lsh", "d12_dup_clusters",
        "d13_simhash_pairs", "d14_ngram_jaccard", "s12_cosine_topk",
        "s12_cosine_near_pairs", "s12_near_pairs_pruned",
        "s12_ann_lsh_multiprobe", "s12_ivf_topk", "s12_kmeans_refine",
        "t13_token_stats", "x14_grouped_fit_pandas", "mm_decode_features",
    }
)


def test_window_rotation_gives_fresh_driver_evidence():
    """This round's window must give first-time driver evidence to
    min(15, |remaining fresh pool|) queries (VERDICT r7 item 6). The
    floor degrades as the never-windowed pool drains: once every query
    has been driver-checked at least once, the window can't contain
    fresh members at all, and the invariant becomes vacuous — the
    rotation's purpose is to exhaust the pool, not to churn forever."""
    specs = _ordered_specs()
    window = {s.name for s in specs[:DRIVER_WINDOW]}
    pool = {s.name for s in specs} - PREVIOUS_WINDOW_MEMBERS
    fresh = window - PREVIOUS_WINDOW_MEMBERS
    need = min(15, len(pool))
    assert len(fresh) >= need, (
        f"only {len(fresh)} first-time window members (need {need}, "
        f"pool {len(pool)}): {sorted(fresh)}"
    )
    assert "pipeline_reference_e2e" in window
