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


#: Names front-loaded in queries()/oracle_sql() iteration order. The
#: driver's gate checks the first ~50, so the rotation policy is:
#: queries added THIS round first, then queries never driver-checked,
#: then the round-1-only rows (every r02-checked row was green and
#: unchanged, so they rotate to the back and re-enter next round).
_GATE_PRIORITY = (
    # new this round (r3)
    "signal_pack_sql_rules",  # re-check: snapshot grew to all 129 rules
    "streaming_macd_parity",
    "streaming_atr_parity",
    "streaming_kdj_parity",
    "streaming_emagc_parity",
    "cluster_kmeans_lloyd",
    "cluster_semdedup_candidates",
    # never driver-checked (flagged in r2 verdict) — must make the cap
    "sample_stratified_split",
    "pack_context_windows",
    "ind_volume_ratio",
    "ind_support_resistance",
    "ind_base_data",
    "ind_buy_sell_ratio",
    "ind_data_monitor",
    "ind_futures_gap_monitor",
    "ind_futures_risk_score",
    "ind_market_share_rank",
    "quality_unigram_logprob",
    "text_scrub_patterns",
    "token_length_histogram",
    "sample_temperature_mix",
    "embedding_norms_quality",
    "quality_ingest_batches",
    "quality_anomaly_log",
    "quality_alert_rules_eval",
    "quality_backfill_tasks",
    "quality_lineage_closure",
    "pg_realtime_checks",
    "text_repetition_stats",
    "decontaminate_ngram_overlap",
    "corpus_source_stats",
    "ind_liquidity_profile",
    "ind_fib_vwma_bands",
    "ind_harmonic_score",
    "ind_scalping_emas",
    "ind_trend_cloud_side",
    "ind_zero_lag_bands",
    "ind_adx_di",
    "ind_supertrend_fold",
    "ind_ema_gc_regime",
    "ind_heikin_long_short",
    "ind_madrid_ribbon",
    "ind_smc_structure",
    "ind_precision_trend",
    "ind_trend_line",
    "ind_smart_rsi",
    # new last round, never driver-checked yet
    "retention_policy_plan",
    "chart_market_vpvr_heat",
    "chart_vpvr_zone_strip",
    "chart_kline_envelope",
    # first in line for r4
    "ind_cdl_singles_parity",
    "ind_cdl_pairs_parity",
    "ind_cdl_triples_parity",
    "ind_cdl_wide_parity",
    "ind_chart_patterns_parity",
    # simple cumsum folds, restart-parity-tested
    "streaming_obv_parity",
    "streaming_cvd_parity",
    "text_tfidf_topk",
    "mm_audio_windows",
    "quality_bigram_logprob",
    "sessionize_user_events",
    "streaming_session_windows",
    "cohort_retention",
    "approx_quantiles_sample",
    "funnel_conversion",
    "skew_salted_join_law",
    "data_contract_expectations",
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_effect",
    "tpch_q10_returned_items",
    "pivot_event_matrix",
    "rollup_region_revenue",
    "unpivot_daily_metrics",
    "streaming_dedup_ingest",
    "range_bin_join_law",
    "cluster_assignments",
    "asof_direction_variants",
    "ntile_value_quartiles",
    # checked r01 only — re-verify under the current data generation
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue", "top_customers_by_spend",
    "orders_with_discounted_lines", "customers_without_orders",
    "priority_symbol_union", "nation_revenue_share",
    "flagship_rank_24h_change", "ohlcv_rollup_5m", "ohlcv_cascade_1h",
    "meta_join_1h", "latest_event_per_user", "top3_events_per_user",
    "lead_gaps_10m", "calendar_completeness", "daily_market_share",
    "asof_purchase_context", "partial_bar_merge", "ind_tail_runs",
    "realtime_union_view", "metrics_weighted_ratio_1h",
    "backfill_plan_days", "ind_bollinger", "ind_obv_cvd",
    "ind_vwap_bands", "ind_sma_cross_signals", "ind_pivot_points",
    "ind_zscore_percentile", "ind_regr_slope", "ind_ema20_fold",
    "ind_vpvr_profile", "ind_candle_patterns", "ind_mfi",
    "ind_ichimoku", "ind_cci", "ind_kdj_fold", "ind_keltner_fold",
    "dedup_exact_groups", "dedup_minhash_bands", "dedup_minhash_pairs",
    "dedup_clusters", "dedup_ngram_jaccard", "dedup_simhash",
    "text_token_stats", "text_lang_id", "text_quality_score",
    "text_fingerprint", "ann_cosine_topk",
)


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
