"""Query registry: the engine's declared operator surface.

Every implemented operator/query gets one entry: a builder
``(spark, sf_dir) -> DataFrame`` and, when the semantics are
ANSI-SQL-expressible, a DuckDB oracle SQL string run against the same
parquet tables. The driver contract (__spark_entry__.py) is a thin
view over this registry; tests iterate it too.

Parity rules (SURVEY.md §7.4):
- alias every computed column identically in Spark and SQL;
- round floating aggregates to a fixed scale in BOTH engines so
  summation-order epsilon differences can't flip the value hash;
- avoid nondeterministic functions; break ordering ties explicitly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Decorator: add a query builder (and optional oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Driver-check rotation (COVERAGE.md "verification rotation"): the
# driver's CORRECTNESS run verifies the FIRST 50 entries of the
# queries() dict, so ordering IS the verification schedule.
# History: r1 48/50; r2 49/50; r3-r4 50/50; r5 49/50; r6 49/50; r7
# 50/50 (the one repeat red, pipeline_pack_sequences, root-caused and
# re-greened in r7; every historical red has since re-verified green).
# After r7 all 282 then-registered queries had a green latest verdict.
# ROUND-8 RECUT: slots 1-13 the thirteen round-8 additions (never
# driver-checked); slots 10-14 queries whose BEHAVIOR changed in
# round 8 (Holt floor-device state snap, exact-cents mean, MCC
# double+guard, 64-bit SimHash with the 97% floor restored); slots
# 19-50 the oldest refresh debt (32 of the 47 r2-only verdicts —
# strict-canon-era re-verification). The 11 remaining r2 verdicts
# (14 trivial scalar_*/subquery_*/sort/topk + dedup_simhash re-slotted)
# lead the trailing list, then the 45-strong r3 cohort queues for
# round 9+. Names not listed trail in registration order.
CHECK_ORDER: list[str] = [
    # slots 1-2: round-8 WAVE-17 additions (newest, never checked)
    "agg_lorenz_curve_deciles",
    "window_gaps_islands_dates",
    # round-8 WAVE-16 addition (never checked)
    "timeseries_hurst_rs",
    # round-8 WAVE-15 additions (never checked)
    "ml_mann_whitney_u",
    "ml_price_elasticity_by_brand",
    # round-8 WAVE-14 additions (never checked)
    "ml_isotonic_calibration_bins",
    "agg_hill_tail_index",
    "timeseries_periodogram_fixed",
    # round-8 WAVE-13 additions (never checked)
    "subquery_not_in_null_semantics",
    "stream_outer_interval_join",
    "quality_date_gaps",
    # round-8 WAVE-12 additions (never checked)
    "events_anova_weekday",
    "pandas_cogroup_reconcile",
    # round-8 WAVE-11 additions (never checked)
    "timeseries_dtw_distance",
    "scan_csv_multiline_quoted",
    # round-8 WAVE-10 additions (never checked)
    "graph_community_modularity",
    "ml_feature_hash_collisions",
    "agg_countmin_width_sweep",
    # round-8 WAVE-9 additions (never checked)
    "agg_corr_matrix_daily",
    "timeseries_granger_lag1",
    "text_inverted_index_phrase",
    "embedding_matryoshka_agreement",
    # round-8 WAVE-8 additions (never checked)
    "agg_pareto_frontier",
    "timeseries_cross_correlation",
    "embedding_pca_power_iteration",
    "ml_item_item_cf",
    "text_tfidf_cosine_pairs",
    # next: round-8 WAVE-7 addition (never checked)
    "timeseries_rolling_zscore_by_key",
    # slots 2-3: round-8 WAVE-6 additions (never checked)
    "graph_assortativity",
    "events_bot_regularity",
    # slots 3-6: round-8 WAVE-5 additions (never checked)
    "ml_average_precision",
    "ml_logreg_newton_probe",
    "timeseries_ljung_box",
    "agg_theil_inequality",
    # slots 5-11: round-8 WAVE-4 additions (never checked)
    "text_kneser_ney_bigram",
    "timeseries_bollinger_bands",
    "agg_abc_classification",
    "pipeline_source_cap_sample",
    "graph_kcore_peel",
    "ml_expected_calibration_error",
    "stream_windowed_topk",
    # slots 8-16: round-8 WAVE-3 additions (newest, never
    # driver-checked — these pre-empt the tail of the r2-refresh
    # block below, which re-queues for round 9)
    "ml_mcnemar_test",
    "ml_log_loss",
    "ml_kendall_tau_daily",
    "agg_mutual_information",
    "text_readability_flesch",
    "text_rake_keywords",
    "timeseries_sax_symbols",
    "scalar_bitwise_funcs",
    "graph_degree_distribution",
    # round-8 wave-1/2 additions
    "ml_cohen_kappa",
    "ml_gain_lift_deciles",
    "agg_ab_test_ztest",
    "timeseries_acf_lags",
    "timeseries_theil_sen",
    "agg_spearman_rank_corr",
    "events_session_gap_histogram",
    "text_hapax_legomena",
    "events_survival_curve",
    "events_markov_entropy_rate",
    "ml_brier_decomposition",
    "text_ngram_novelty",
    "text_source_vocab_jaccard",
    # slots 14-20: round-8 behavior changes (incl. the explicit
    # rank-selection percentile rewrite the round-8 sf0.001 sweep
    # forced — agg_approx_percentile doubles as an r2 refresh)
    "agg_exact_percentiles",
    "agg_approx_percentile",
    "timeseries_holt_trend",
    "agg_median_by_priority",
    "ml_confusion_matrix_metrics",
    "dedup_simhash_banded",
    "dedup_simhash",
    # slots 19-50: r2-era verdicts refreshed under the strict canon
    "agg_approx_distinct",
    "dedup_cluster_components",
    "dedup_embedding_cosine",
    "dedup_exact_documents",
    "dedup_exact_keep_first",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_ngram_jaccard",
    "ingest_ctb_end_to_end",
    "ingest_strict_date_parse",
    "ingest_trim_empty_null",
    "ingest_validity_accounting",
    "mailbox_datasource_scan",
    "mailbox_extract_pipeline",
    "pandas_grouped_weighted_avg",
    "pandas_map_batches_tokens",
    "pandas_scalar_net_value",
    "pipeline_training_data_curation",
    "scan_partitioned_pruning",
    "similarity_ivf_topk",
    "similarity_topk_bruteforce",
    "similarity_topk_lsh",
    "stream_dedup_first_event",
    "stream_tumbling_hourly",
    "text_lang_bigram_score",
    "text_lang_id_heuristic",
    "text_normalize_pipeline",
    "text_quality_score",
    "text_rolling_fingerprint",
    "text_token_stats",
    # trailing: deferred r2 (next round's first slots), then the r3 cohort
    "ingest_comma_int_roundtrip",
    "sort_global_nation",
    "topk_orders_by_price",
    "subquery_scalar_above_avg",
    "text_bpe_token_estimate",
    "scalar_conditional_funcs",
    "scalar_date_funcs",
    "scalar_from_json_struct",
    "scalar_json_extract",
    "scalar_map_funcs",
    "scalar_posexplode_embedding",
    "scalar_try_funcs",
    "subquery_exists_returned",
    "subquery_in_high_qty",
    "subquery_not_exists_customers",
    "agg_heavy_hitters_countmin",
    "agg_hll_partitioned_union",
    "dedup_duplicated_spans",
    "dedup_incremental_new_docs",
    "dedup_semantic_clusters",
    "embedding_l2_quantize",
    "multimodal_binary_metadata",
    "multimodal_byte_entropy",
    "pipeline_chunk_documents",
    "pipeline_decontaminate_benchmark",
    "pipeline_domain_mixture_weights",
    "profile_table_stats",
    "scalar_math_funcs",
    "scan_binary_files",
    "scan_csv_roundtrip",
    "scan_json_roundtrip",
    "scan_orc_roundtrip",
    "scan_parquet_schema_evolution",
    "scan_text_lines",
    "setop_except_all",
    "setop_intersect_all",
    "stream_interval_join",
    "stream_late_data_accounting",
    "stream_session_window_30m",
    "stream_sliding_hourly_30m",
    "stream_stateful_sessions",
    "text_c4_line_filter",
    "text_gopher_quality_rules",
    "text_pii_scrub",
    "text_repetition_stats",
    "timeseries_gap_fill_hourly",
    "timeseries_zscore_outliers",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q1_pricing_summary",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_supplier",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q9_product_type_profit",
    "udtf_sentence_split",
    "warehouse_upsert_latest",
    "window_percentile_bucket_scalable",
]




def check_ordered_names() -> list[str]:
    """Registry names in driver-check priority order: CHECK_ORDER
    first (skipping stale entries), then the rest in registration
    order (new queries, then round-1 greens)."""
    listed = [n for n in CHECK_ORDER if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(listed)]
    return listed + rest


def query_names() -> list[str]:
    return sorted(QUERIES)


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from etl_data_ingestion_spark.operators import (  # noqa: F401
        tpch,
        tpch_partsupp,
        tpch_dates,
        joins,
        aggregates,
        windows,
        setops,
        scalars,
        topk,
        dedup,
        similarity,
        textops,
        ingest_queries,
        curation,
        corpus,
        funnel,
        graph,
        streaming_queries,
        multimodal,
        subqueries,
        pandas_surface,
        sources_scan,
        warehouse,
        attribution,
        video,
        mlops,
    )
