"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ranking query on sf0.001;
``queries()`` exposes every declared query from the tradecat_spark
registry; ``oracle_sql()`` gives the DuckDB-equivalent SQL for the
hash-match correctness gate (queries with no SQL-expressible semantics
are intentionally absent there and get the rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tradecat_spark.plans.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = load_all()
    return specs["flagship_rank_24h_change"].fn(spark, "/root/testdata/sf0.001")


#: The r15 gate-front declaration, validated mechanically by
#: ``tools/gate_ledger.py::composition``. This is the r14 verdict's
#: Next #1: the r14 gate window was composed at round start and the
#: optimizer then rewrote lanes OUTSIDE it, so every r14-rewritten
#: lane is carried changed-lane debt owed a driver re-check here —
#: the meta_join single-aggregation rewrite, the window-dedup pair,
#: the bm25 tokenize-spread consumers, the full ann_ivfadc chain
#: (materialization + probe broadcast + pq_train rework), the
#: cosine/gram/pq embedding rewrites, the streaming phash
#: checkpoint drop, and the shingle-expansion consumers. Lanes whose
#: code changes again THIS round (indicator engine/library
#: vectorization → the four checksum twins; bm25 postings store →
#: streaming_pipeline_bm25) are in the same categories.
#: ``stale_twins`` = what tools/gate_ledger.stale_twins computes: the
#: four indicator/signal twins, last driver-checked r13. Every
#: remaining slot is filled oldest-ledger-cohort-first from the r8
#: cohort (oldest after r14 cleared r7); the composition line below
#: is the tool's output, pinned by test_gate_rotation.
#:
#: front r15 = 24 changed-lane + 4 stale-twin + 22 r8 (50 slots); deferred 11 r8
_GATE_FRONT = {
    "round": 15,
    "born": (),
    "changed": (
        # r14 rewrites outside the r14 window (carried debt, verdict
        # Next #1 list) + this round's bm25-store consumers:
        "meta_join_1h", "ind_bollinger", "ind_vwap_bands",
        "text_bm25_topk", "hybrid_rrf_fusion", "retrieval_fusion_eval",
        "retrieval_rank_quality", "streaming_pipeline_bm25",
        "ann_ivfadc_search", "ann_ivfadc_search_frozen",
        "ann_ivfadc_recall", "ann_ivfadc_nprobe_curve",
        "ann_cosine_topk", "embedding_gram_matrix",
        "embedding_top_pc_power", "embedding_anisotropy",
        "embedding_pq_residual_codes", "embedding_pq_codes",
        "ann_pq_recall", "streaming_pipeline_phash",
        "streaming_pipeline_phash_delta", "dedup_ngram_jaccard",
        "streaming_dedup_ingest", "streaming_ann_index",
    ),
    "stale_twins": (
        # last driver-checked r13 (gap = 2 = TWIN_STALE_GAP); their
        # rows-only lanes are also rewritten this round (indicator
        # library vectorization), so they re-enter on both policies
        "indicator_batch_checksum", "indicator_surface_checksum",
        "signal_pack_subset_checksum", "signal_rule_events_checksum",
    ),
}

#: 22 of the 33 uncategorized r8-vintage rows (oldest cohort after the
#: r14 artifact cleared r7); the remaining 11 r8 rows are this round's
#: deferred set. The picks prioritize lanes adjacent to this round's
#: optimization targets (the ind_* monitor lanes, streaming_rollup_5m,
#: signal_threshold_cross_sql) and then fill alphabetically.
_R8_COHORT = (
    "ind_adx_di", "ind_base_data", "ind_buy_sell_ratio",
    "ind_data_monitor", "ind_ema_gc_regime", "streaming_rollup_5m",
    "signal_threshold_cross_sql",
    "chart_kline_envelope", "chart_market_vpvr_heat",
    "chart_vpvr_zone_strip", "cluster_kmeans_lloyd",
    "cluster_semdedup_candidates", "cms_error_eval",
    "corpus_source_stats", "decontaminate_ngram_overlap",
    "dedup_quality_canonical", "dedup_quality_keep_rank",
    "embedding_norms_quality", "mm_resize_images", "ohlcv_cascade_1M",
    "orderbook_depth_bands", "orderbook_depth_hourly",
)

_FRONT = (
    *_GATE_FRONT["born"], *_GATE_FRONT["changed"],
    *_GATE_FRONT["stale_twins"], *_R8_COHORT,
)

#: Previously green, unchanged code — behind the front, order
#: irrelevant past the cap (duplicates of _FRONT are filtered out when
#: _GATE_PRIORITY is assembled below).
_GATE_TAIL = (
    "streaming_canonical_corpus",
    "streaming_pipeline_labels",
    "streaming_pipeline_phash", "streaming_pipeline_phash_delta",
    "components_path_islands", "bpe_learn_merges_wide_2048",
    "mm_phash_hashes", "mm_phash_near_dup", "mm_phash_multiprobe_pairs",
    "mm_phash_recall_eval", "mm_phash_clusters",
    "text_bm25_topk", "hybrid_rrf_fusion", "retrieval_fusion_eval",
    "streaming_pipeline_bm25", "ts_cusum_drift", "ts_level_shift",
    "ts_seasonal_hour_profile", "join_strategy_advice",
    "retrieval_rank_quality",
    "bpe_learn_merges_saturated", "bpe_learn_merges_types_hist",
    "bpe_learn_merges_wide", "bpe_learn_merges_wide_hist",
    "bpe_encode_frozen_wide",
    "streaming_pipeline_stores", "streaming_pipeline_checksum",
    "bpe_learn_merges_64", "bpe_learn_merges_deep", "bpe_encode_frozen",
    "bpe_encode_fertility_deep", "bpe_learn_merges",
    "bpe_compression_curve", "bpe_encode_fertility",
    "approx_quantiles_sample", "bloom_prejoin_law", "cluster_assignments",
    "cohort_retention", "data_contract_expectations", "funnel_conversion",
    "ind_cdl_pairs_parity", "ind_cdl_singles_parity",
    "ind_cdl_triples_parity", "ind_chart_patterns_parity",
    "indicator_batch_150x7", "indicator_surface_1h",
    "instruments_asof_enrich", "mm_audio_windows", "ntile_value_quartiles",
    "pack_context_windows",
    "range_bin_join_law", "rollup_region_revenue", "signal_rule_events",
    "signal_rule_pack_129", "skew_salted_join_law",
    "streaming_chained_stateful", "streaming_cvd_parity",
    "streaming_dedup_ingest", "streaming_obv_parity",
    "streaming_session_windows", "streaming_stream_join",
    "streaming_stream_outer_join", "text_tfidf_topk",
    "tpch_q10_returned_items", "tpch_q12_priority_class",
    "tpch_q14_promo_effect", "tpch_q19_bracket_revenue",
    "tpch_q22_global_sales_opportunity", "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "unpivot_daily_metrics",
    "ann_ivfadc_search_frozen", "ann_ivfadc_search", "ann_ivfadc_recall",
    "ann_ivfadc_nprobe_curve", "streaming_ann_index", "ind_fib_vwma_bands",
    "ind_futures_gap_monitor", "ind_futures_risk_score",
    "ind_harmonic_score", "ind_heikin_long_short", "ind_liquidity_profile",
    "ind_madrid_ribbon", "ind_market_share_rank", "ind_precision_trend",
    "ind_scalping_emas", "ind_smart_rsi", "ind_smc_structure",
    "ind_supertrend_fold", "ind_support_resistance",
    "ind_trend_cloud_side", "ind_trend_line", "ind_volume_ratio",
    "ind_zero_lag_bands", "pg_realtime_checks", "quality_alert_rules_eval",
    "quality_anomaly_log", "quality_backfill_tasks",
    "quality_ingest_batches", "quality_lineage_closure",
    "retention_policy_plan", "sample_stratified_split",
    "sample_temperature_mix", "signal_pack_sql_rules",
    "streaming_atr_parity", "streaming_emagc_parity",
    "streaming_kdj_parity", "streaming_macd_parity",
    "text_repetition_stats", "text_scrub_patterns",
    "token_length_histogram", "indicator_surface_checksum",
    "indicator_batch_checksum", "signal_rule_events_checksum",
    "signal_pack_subset_checksum", "embedding_pq_residual_codes",
    "cms_error_eval", "dedup_quality_keep_rank", "dedup_quality_canonical",
    "embedding_gram_matrix", "embedding_top_pc_power",
    "embedding_anisotropy", "embedding_pq_codes", "ann_pq_recall",
    "ann_ivf_pq_search", "mm_resize_images", "ohlcv_cascade_1M",
    "orderbook_depth_bands", "orderbook_depth_hourly",
    "quality_filter_funnel", "ranking_card_1h", "ranking_card_rendered",
    "rest_ohlc_history", "rest_oi_history", "rest_supported_coins",
    "serving_retention_trim", "signal_threshold_cross_sql",
    "single_token_panel", "stats_profile_by_type", "streaming_rollup_5m",
    "streaming_signals_parity", "text_vocab_topk", "chart_kline_envelope",
    "chart_market_vpvr_heat", "chart_vpvr_zone_strip",
    "cluster_kmeans_lloyd", "cluster_semdedup_candidates",
    "corpus_source_stats", "decontaminate_ngram_overlap",
    "embedding_norms_quality", "ind_adx_di", "ind_base_data",
    "ind_buy_sell_ratio", "ind_data_monitor", "ind_ema_gc_regime",
    "hll_estimate", "hll_error_eval", "mix_epoch_manifest",
    "dedup_minhash_est_jaccard", "minhash_jaccard_calibration",
    "minhash_lsh_quality", "kmv_source_jaccard", "kmv_jaccard_error_eval",
    "source_containment_matrix", "streaming_hll_registers",
    "lang_id_confusion", "streaming_cms_counters", "dedup_minhash_bands",
    "dedup_incremental_delta", "ai_context_snapshot", "ann_ivf_search",
    "ann_label_centroids", "ann_lsh_buckets", "ann_multiprobe_search",
    "ann_recall_eval", "approx_distinct_kmv", "chart_bb_zone_strip",
    "chart_cvd_cumulative", "chart_equity_drawdown",
    "chart_intraday_volume_heatmap", "chart_kline_ma_volume",
    "chart_long_short_ratio", "chart_macd_series", "chart_oi_change",
    "chart_taker_ratio_heatmap", "chart_vpvr_ridge",
    "dedup_canonical_corpus", "dedup_embedding_cosine", "freshness_gate",
    "global_totals_latest", "ind_atr_wilder_fold", "ind_donchian_williams",
    "metrics_cascade_1d", "mm_decode_features", "mm_frame_sample",
    "dedup_span_trim_ranges", "corpus_trim_stats", "token_decile_tiers",
    "corpus_exact_quantiles", "embedding_component_quantiles",
    "embedding_winsorized_stats", "embedding_sq8_error", "ann_sq8_recall",
    "heavy_hitters_exact", "bpe_pair_candidates", "chunk_compression_plan",
    "ann_ivf_sq8_search", "source_overlap_matrix", "hll_register_law",
    "mix_epoch_plan", "quality_unigram_logprob", "sample_dsir_importance",
    "corpus_training_manifest", "partial_bar_merge",
    "sample_per_group_reservoir", "ann_cosine_topk", "backfill_plan_days",
    "dedup_clusters", "dedup_exact_groups", "dedup_minhash_pairs",
    "dedup_ngram_jaccard", "dedup_simhash", "ind_bollinger",
    "ind_candle_patterns", "ind_cci", "ind_ema20_fold", "ind_ichimoku",
    "ind_kdj_fold", "ind_keltner_fold", "ind_mfi", "ind_obv_cvd",
    "ind_pivot_points", "ind_regr_slope", "ind_sma_cross_signals",
    "ind_vpvr_profile", "ind_vwap_bands", "ind_zscore_percentile",
    "metrics_weighted_ratio_1h", "text_fingerprint", "text_lang_id",
    "text_quality_score", "text_token_stats", "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue", "tpch_q20_excess_shippers",
    "tpch_q21_suppliers_kept_waiting", "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit", "tpch_q11_important_stock",
    "tpch_q13_customer_distribution", "tpch_q16_parts_supplier_counts",
    "embedding_random_projection", "rp_recall_eval",
    "dedup_substring_spans", "kmv_merge_law", "cube_corpus_stats",
    "bucketed_colocated_join", "gapfill_locf_1h", "cms_frequency_law",
    "pagerank_similarity_graph", "cdc_incremental_equivalence",
    "quantile_error_eval", "chart_intraday_volatility",
    "orderbook_l1_stats", "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority", "tpch_q5_region_revenue",
    "top_customers_by_spend", "orders_with_discounted_lines",
    "customers_without_orders", "priority_symbol_union",
    "nation_revenue_share", "flagship_rank_24h_change", "ohlcv_rollup_5m",
    "ohlcv_cascade_1h", "meta_join_1h", "latest_event_per_user",
    "top3_events_per_user", "lead_gaps_10m", "calendar_completeness",
    "daily_market_share", "asof_purchase_context", "ind_tail_runs",
    "realtime_union_view", "ind_cdl_wide_parity", "sessionize_user_events",
    "asof_direction_variants", "ai_context_assembly",
    "streaming_session_append", "instruments_scd2_dim",
    "tpch_q18_large_orders", "tpch_q8_market_share", "zorder_curve_layout", "pivot_event_matrix",
    "quality_bigram_logprob",
)

_GATE_PRIORITY = _FRONT + tuple(
    n for n in _GATE_TAIL if n not in set(_FRONT)
)

#: Empty since round 5: the r4 overflow pair (tpch_q15/q17) rotated
#: into slots 1-2, and the gate-ledger retirement rule for oracle-less
#: rows (tools/gate_ledger.py) means debt can no longer exceed the
#: window unless a round adds >50 genuinely new queries.
_ACKNOWLEDGED_OVERFLOW = ()


def _ordered_specs():
    specs = load_all()
    prio = [n for n in _GATE_PRIORITY if n in specs]
    rest = [n for n in specs if n not in set(prio)]
    return [(n, specs[n]) for n in (*prio, *rest)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``."""
    return {
        name: spec.oracle
        for name, spec in _ordered_specs()
        if spec.oracle is not None
    }
