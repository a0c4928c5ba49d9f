"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query executes via the no-op sink so timing covers the full
distributed plan without driver-side materialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_data_ingestion_spark.plans import registry
from etl_data_ingestion_spark.session import get_spark

# Representative spread: scan-agg, selective join+topk, multi-join,
# scan-filter-agg, plus extension operators as they land.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "window_running_total",
    "agg_rollup_status_priority",
    "join_asof_purchase_view",
    "stream_tumbling_hourly",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
    "similarity_ivf_topk",
    "text_token_stats",
    "text_rolling_fingerprint",
    "subquery_correlated_avg_qty",
    "pipeline_training_data_curation",
]

# Tier policy (written down per round-4 verdict): HEADLINE is FROZEN
# — it is the round-over-round comparable and never grows, so
# "value" means the same work in every BENCH_r*.json. New operators
# enter EXTENDED in the round they land and STAY there (min-of-2
# each, reported under "extended" with their oracle times — perf
# visibility without moving the baseline). If a future round ever
# needs to re-baseline (e.g. HEADLINE queries removed), it must bump
# the metric name, not silently change the set.
EXTENDED = [
    # round 4
    "similarity_pq_rerank",
    "join_bloom_pruned",
    "dedup_bloom_incremental",
    "multimodal_cdc_chunking",
    "agg_bitmap_exact_distinct",
    "agg_theta_sketch_setops",
    "timeseries_ewma_daily",
    "window_cumulative_distinct_users",
    "events_transition_matrix",
    "pipeline_dsir_weights",
    # round 5
    "graph_pagerank_bipartite",
    "dedup_end_to_end_canonical",
    "text_bigram_lm_perplexity",
    "multimodal_image_decode_real",
    "join_asof_nearest",
    "events_rfm_segmentation",
    "dedup_levenshtein_banded",
    "timeseries_resample_ohlc",
    "events_path_trigrams",
    "pipeline_pack_sequences_sharded",
    "events_attribution_last_touch",
    "events_interval_union_coverage",
    "warehouse_cdc_apply",
    "quality_column_expectations",
    "join_interval_overlap",
    "pipeline_shard_assignment",
    "agg_string_agg_ordered",
    "agg_weighted_median",
    "timeseries_anomaly_mad",
    "events_cohort_ltv",
    "multimodal_resize_real",
    "subquery_any_all_quantified",
    "pipeline_length_bucket_batching",
    "warehouse_snapshot_diff",
    "events_dau_wau_mau",
    "agg_winsorized_mean",
    "agg_quantile_histogram_rollup",
    # round 5, third wave
    "multimodal_video_frames_real",
    "dedup_repeated_lines_corpus",
    "text_zipf_slope",
    "quality_psi_drift",
    "dedup_url_canonical",
    "text_bpe_train_merges",
    "multimodal_spectrogram_real",
    "embedding_chunk_mean_pool",
    "scan_csv_permissive_corrupt",
    "text_compression_ratio",
    "pipeline_pack_binpack_ffd",
    "ml_kmeans_lloyd_exact",
    "multimodal_patch_embed_real",
    "text_bpe_apply_tokenize",
    "quality_ks_drift_test",
    "dedup_containment_quotes",
    "pipeline_naive_bayes_spam",
    "events_pattern_match_regex",
    "timeseries_holt_trend",
    "warehouse_incremental_moments",
    "join_geo_radius_grid",
    "scan_bucketed_join_zero_exchange",
    "pipeline_entity_resolution",
    "quality_k_anonymity",
    "similarity_index_persist_reuse",
    "stream_static_enrichment",
    "scalar_collation_group",
    "timeseries_lerp_fill",
    "agg_equi_depth_histogram",
    "timeseries_seasonal_decompose",
    "graph_triangle_count",
    "multimodal_image_ahash_dedup",
    "graph_link_prediction",
    "funnel_conversion_latency",
    "warehouse_zorder_skipping",
    "agg_welch_ttest",
    "multimodal_audio_vad_segments",
    "join_scd2_temporal",
    "agg_poisson_rate_anomaly",
    "pipeline_curriculum_buckets",
    "agg_higher_moments",
    "agg_ratio_delta_ci",
    "text_js_divergence_sources",
    "agg_gini_coefficient",
    "timeseries_cusum_changepoint",
    "agg_categorical_entropy_daily",
    "ml_auc_roc_exact",
    "ml_calibration_brier",
    "pipeline_weighted_sample_wor",
    "basket_association_rules",
    "pipeline_kfold_grouped",
    "ml_bootstrap_ci_poisson",
    "pipeline_contamination_curve",
    "timeseries_backtest_mape",
    "events_markov_stationary",
    "agg_benford_first_digit",
    "pipeline_filter_funnel_report",
    "text_heaps_vocab_growth",
    "events_peak_concurrency_daily",
    "agg_chi2_independence",
    "text_pmi_cooccurrence",
    "timeseries_max_drawdown",
    # round 7
    "text_bm25_topk",
    "ml_confusion_matrix_metrics",
    "ml_ndcg_at_k",
    "ml_precision_recall_curve",
    "pipeline_tokenizer_fertility",
    "similarity_range_search",
    # round 8
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
    # round 8 wave 3
    "ml_mcnemar_test",
    "ml_log_loss",
    "ml_kendall_tau_daily",
    "agg_mutual_information",
    "text_readability_flesch",
    "text_rake_keywords",
    "timeseries_sax_symbols",
    "graph_degree_distribution",
    # round 8 wave 4
    "text_kneser_ney_bigram",
    "timeseries_bollinger_bands",
    "agg_abc_classification",
    "pipeline_source_cap_sample",
    "graph_kcore_peel",
    "ml_expected_calibration_error",
    # round 8 wave 5
    "ml_average_precision",
    "ml_logreg_newton_probe",
    "timeseries_ljung_box",
    "agg_theil_inequality",
    # round 8 wave 6
    "graph_assortativity",
    "events_bot_regularity",
    # round 8 wave 7
    "timeseries_rolling_zscore_by_key",
    # round 8 wave 8
    "agg_pareto_frontier",
    "timeseries_cross_correlation",
    "embedding_pca_power_iteration",
    "ml_item_item_cf",
    "text_tfidf_cosine_pairs",
    # round 8 wave 9
    "agg_corr_matrix_daily",
    "timeseries_granger_lag1",
    "text_inverted_index_phrase",
    "embedding_matryoshka_agreement",
    # round 8 wave 10
    "graph_community_modularity",
    "ml_feature_hash_collisions",
    "agg_countmin_width_sweep",
    # round 8 wave 11
    "timeseries_dtw_distance",
    "scan_csv_multiline_quoted",
    # round 8 wave 12
    "events_anova_weekday",
    "pandas_cogroup_reconcile",
    # round 8 wave 13
    "subquery_not_in_null_semantics",
    "stream_outer_interval_join",
    "quality_date_gaps",
    # round 8 wave 14
    "ml_isotonic_calibration_bins",
    "agg_hill_tail_index",
    "timeseries_periodogram_fixed",
    # round 8 wave 15
    "ml_mann_whitney_u",
    "ml_price_elasticity_by_brand",
    # round 8 wave 16
    "timeseries_hurst_rs",
    # round 8 wave 17
    "agg_lorenz_curve_deciles",
    "window_gaps_islands_dates",
    # round 9 wave 18
    "agg_kruskal_wallis",
    "agg_benjamini_hochberg_fdr",
    "timeseries_runs_test",
    "timeseries_pacf_durbin",
    "agg_cochran_armitage_trend",
    # round 9 wave 19
    "ml_mrr_at_10",
    "ml_recall_at_10",
    "ml_ols_normal_equations",
    "text_oov_rate_cross_source",
    # round 9 wave 20
    "graph_local_clustering_coeff",
    "graph_adamic_adar_topk",
    "graph_label_propagation_2round",
    "graph_hits_fixed_iter",
    # round 9 wave 21
    "quality_unreferenced_parents",
    "dedup_savings_by_source",
    "pipeline_token_budget_waterfill",
    # round 9 wave 22
    "events_attribution_position_based",
    "timeseries_variance_ratio",
    "timeseries_wow_growth",
    "events_churn_rate_weekly",
    # round 9 wave 23
    "ml_simplified_silhouette",
    "scalar_higher_order_funcs",
    "pandas_map_in_arrow_tokens",
    # round 10 wave 24
    "agg_levene_variance_homogeneity",
    "agg_jarque_bera_normality",
    "agg_cramers_v",
    "graph_ktruss_edge_support",
    "events_exp_gap_fit",
    "text_word_burstiness",
    "timeseries_spectral_entropy",
    "window_hampel_outliers",
    # round 10 wave 25
    "agg_mann_kendall_trend",
    "agg_wilcoxon_signed_rank",
    "agg_robust_moments_octiles",
    "text_yule_k",
    "ml_ridge_normal_equations",
    "pipeline_neyman_allocation",
    # round 10 wave 26
    "quality_l_diversity",
    "events_decayed_engagement",
    "agg_grubbs_outlier",
    "timeseries_var_expected_shortfall",
    # round 10 wave 27
    "agg_hodges_lehmann_shift",
    "events_bounce_rate_by_entry",
    # round 11 wave 28 (added late — the first round-11 session
    # registered these but missed the enter-EXTENDED step; gap
    # closed here per the tier policy above)
    "quality_t_closeness",
    "pipeline_train_test_split_hash",
    "timeseries_ewma_crossover",
    "text_mattr_lexical_diversity",
    "ml_roc_curve_points",
    # round 11 wave 29
    "agg_friedman_test",
    "agg_cronbach_alpha",
    "ml_decision_stump_gini",
    "timeseries_permutation_entropy",
    "graph_rich_club_coefficient",
    # round 11 wave 30
    "agg_gumbel_block_maxima",
    "agg_cochran_q_test",
    "ml_fisher_lda_closed_form",
    "timeseries_sample_entropy",
    "quality_functional_dependencies",
    # round 11 wave 31
    "timeseries_engle_granger_coint",
    "ml_jackknife_ratio_variance",
    "agg_capture_recapture_chapman",
    "ml_poisson_deviance",
    "text_burrows_delta",
    # round 11 wave 32
    "timeseries_kpss_stationarity",
    "ml_loo_1nn_embedding_accuracy",
    "ml_empirical_bayes_shrinkage",
    "ml_conformal_interval_coverage",
    # round 11 wave 33
    "ml_logrank_test",
    "agg_energy_distance_weekend",
    "agg_circular_hour_stats",
    "events_post_stratified_lift",
    # round 11 wave 34
    "ml_xi_correlation",
    "agg_tail_dependence_extremes",
    "agg_partial_correlation",
    "ml_sprt_sequential_test",
    # round 11 wave 35
    "events_cuped_adjusted_lift",
    "agg_lmoments_daily",
    "pipeline_dedup_threshold_curve",
    # round 11 wave 36
    "agg_ledoit_wolf_shrinkage",
    "ml_power_analysis_two_prop",
    # round 11 wave 37
    "timeseries_turning_points_test",
    "timeseries_peak_prominence",
    # round 12 wave 38
    "agg_wasserstein_weekend",
    "agg_cramer_von_mises_weekend",
    "agg_durbin_watson_daily",
    "text_good_turing_estimates",
    "ml_km_survival_curve",
    # round 12 wave 39
    "agg_bartlett_variance_test",
    "agg_herfindahl_concentration",
    "agg_poisson_overdispersion",
    "events_page_hinkley_drift",
    # round 12 wave 40
    "agg_jonckheere_terpstra",
    "agg_cmh_stratified_test",
    "agg_mood_median_test",
    "similarity_ratio_margin",
    "pipeline_length_weight_ess",
    # round 13 wave 41
    "text_yule_k_characteristic",
    "pipeline_weighted_priority_sample",
    "agg_bh_fdr_source_drift",
    "similarity_label_mmd_drift",
    # round 13 wave 42
    "ml_cooks_distance_topk",
    "agg_mahalanobis_outliers",
    # round 14 wave 43 (added per the tier policy above: new operators
    # enter EXTENDED in the round they land — the mid-build round-14
    # session registered them but missed this step)
    "agg_cohens_d_weekend",
    "agg_chow_break_daily",
    "agg_breusch_pagan_order_size",
    "text_distinct_ngram_diversity",
]


def run_query(spark, name: str, sf_dir: str, resident: bool = False) -> float:
    fn = registry.QUERIES[name]
    # cold per sample: operators that persist intermediates (minhash
    # signatures, IVF assignment) must re-earn them each run, or the
    # second sample measures a cached different computation
    spark.catalog.clearCache()
    if resident:
        # resident tier: base-table scans stay hot (the warehouse
        # serving posture; DuckDB's best-of-N likewise re-reads warm
        # OS page cache) — re-materialize them OUTSIDE the timed
        # window so the timing covers query compute over resident
        # data, while per-query intermediates stay cold per sample
        from etl_data_ingestion_spark.catalog import rematerialize_resident

        rematerialize_resident(spark)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def time_oracles(
    names: list[str], sf_dir: str, cpus: int
) -> tuple[dict[str, float | None], list[str]]:
    """Best-of-N DuckDB timings for each query's oracle SQL on the same
    parquet — the 2x perf gate is defined against these, so the artifact
    should carry them instead of each judge re-timing by hand.

    Samples are INTERLEAVED across queries in passes — the SAME burst
    protection the Spark samples get. Round 4 learned this the hard
    way: back-to-back per-query sampling let one multi-minute host
    contention burst poison all three DuckDB samples of every query it
    covered, inflating the DuckDB side ~4x and making the artifact's
    ratio_total_comparable flattering-but-wrong (2.33 reported vs 9.1
    re-timed idle). Interleaving bounds a one-pass burst to one sample
    per query; the adaptive tail below re-samples queries whose spread
    says every pass was dirty.

    Expensive oracles (first sample >= 5s, e.g. the exact-Jaccard
    minhash ground truth: ~93s at sf0.1) get a single sample; cheap
    ones get best-of-3 (+ up to 2 adaptive retries when max >= 2x min).
    Queries with no registered oracle map to None.

    An oracle still running after $SPARK_GRAFT_ORACLE_TIMEOUT seconds
    (default 180) is interrupted and reported as None AND returned in
    the second element so the caller can list it as heavy/timed-out
    (previously silently absent): brute-force ground-truth oracles are
    superlinear (all-pairs Jaccard is O(docs²)) and stop terminating at
    the scale-curve sfs (sf>=0.3) long before the Spark side breaks a
    sweat.
    """
    import threading

    import duckdb

    from etl_data_ingestion_spark.catalog import TABLES, table_path

    budget = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "180"))
    con = duckdb.connect()
    con.execute(f"SET threads={cpus}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    timed_out: set[str] = set()
    samples: dict[str, list[float]] = {}

    def one_sample(name: str) -> None:
        sql = registry.ORACLES.get(name)
        if sql is None or name in timed_out:
            return
        timer = threading.Timer(budget, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
            samples.setdefault(name, []).append(time.perf_counter() - t0)
        except duckdb.InterruptException:
            timed_out.add(name)
        finally:
            timer.cancel()

    def done(name: str) -> bool:
        # timed out, no oracle, or heavy (first sample >= 5s -> single
        # sample: a second 90s pass buys no precision worth its cost)
        if name in timed_out or registry.ORACLES.get(name) is None:
            return True
        s = samples.get(name, [])
        return bool(s) and s[0] >= 5.0

    for _pass in range(3):
        for name in names:
            if _pass == 0 or not done(name):
                one_sample(name)
    for _retry in range(2):
        flagged = [
            n
            for n in names
            if not done(n)
            and len(samples.get(n, [])) >= 2
            and max(samples[n]) >= 2 * min(samples[n])
        ]
        if not flagged:
            break
        for name in flagged:
            one_sample(name)

    out: dict[str, float | None] = {}
    for name in names:
        if name in timed_out or name not in samples:
            out[name] = None
        else:
            out[name] = round(min(samples[name]), 3)
    return out, sorted(timed_out)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    registry.load_all()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in registry.QUERIES]
    # Warm the JVM/codegen once with the cheapest query so timings
    # reflect steady-state execution, not first-call classloading;
    # likewise spin up the Python/Arrow workers (numpy import per
    # worker) so UDF-stage queries measure compute, not process forks.
    if names:
        run_query(spark, names[0], sf_dir)
    from pyspark.sql.functions import pandas_udf as _pudf

    _warm = _pudf(lambda x: x * 0 + 1, "long")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, cpus, 1, cpus).select(_warm("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    # min of three runs per query: the host shows intermittent CPU
    # contention in multi-minute bursts (identical code measured 11.1s
    # and 17.5s totals minutes apart; round-3 caught an 8.2s min-of-3
    # for a query that measures 1.5s outside the burst), and a single
    # sample can read 2-3x high; the minimum is the standard
    # noise-robust estimator for cold-cache-free work. ALL samples are
    # recorded alongside the min so a regression (all samples high) is
    # distinguishable from a contention burst (high min, wide spread)
    # from the artifact alone.
    #
    # Samples are INTERLEAVED (pass over all queries, three passes),
    # not back-to-back per query: a burst lasting one pass (~30-60s)
    # then poisons at most one of each query's three samples instead
    # of all three of one query's (round-3 measured ivf_topk min-of-3
    # at 2.9s back-to-back inside a burst vs 1.4s clean). An untimed
    # warm-up pass runs first: a query's first-ever execution also
    # pays its own codegen/broadcast-thread/Python-worker setup
    # (round-3 pass-1 measured 2-8x pass-3 on EVERY query), which is
    # per-process overhead, not plan cost.
    for name in names:
        run_query(spark, name, sf_dir)
    samples: dict[str, list[float]] = {name: [] for name in names}
    for _pass in range(3):
        for name in names:
            samples[name].append(round(run_query(spark, name, sf_dir), 3))

    # Adaptive tail: a query whose max sample is >=2x its min sat
    # inside a contention burst for at least one pass — and a burst
    # long enough to span all three passes leaves the min itself
    # poisoned (round-3 observed min-of-3 2.1s for a query that
    # measures 0.6s clean). Give exactly those queries up to two
    # extra interleaved samples; clean queries don't pay for it.
    for _retry in range(2):
        flagged = [n for n in names if max(samples[n]) >= 2 * min(samples[n])]
        if not flagged:
            break
        for name in flagged:
            samples[name].append(round(run_query(spark, name, sf_dir), 3))
    timings = {name: min(runs) for name, runs in samples.items()}

    total = round(sum(timings.values()), 3)
    spread = {
        name: round(max(runs) - min(runs), 3) for name, runs in samples.items()
    }

    # Resident-scan tier (round-6, judge item: shave the per-query
    # floor): the SAME frozen headline set re-timed with base-table
    # scans persisted in executor memory — the warehouse serving
    # posture, and the symmetric counterpart of DuckDB's best-of-N
    # reading warm OS page cache. Reported SEPARATELY
    # (value_resident / ratio_total_comparable_resident); the frozen
    # cold-scan "value" above remains the round-over-round
    # comparable.
    spark.conf.set("spark.etl.scan.resident", "true")
    try:
        for name in names:  # warm pass builds + materializes the cache
            run_query(spark, name, sf_dir, resident=True)
        res_samples: dict[str, list[float]] = {name: [] for name in names}
        for _pass in range(2):
            for name in names:
                res_samples[name].append(
                    round(run_query(spark, name, sf_dir, resident=True), 3)
                )
        for _retry in range(2):
            flagged = [
                n
                for n in names
                if max(res_samples[n]) >= 2 * min(res_samples[n])
            ]
            if not flagged:
                break
            for name in flagged:
                res_samples[name].append(
                    round(run_query(spark, name, sf_dir, resident=True), 3)
                )
        res_timings = {n: min(s) for n, s in res_samples.items()}
    finally:
        spark.conf.set("spark.etl.scan.resident", "false")
        from etl_data_ingestion_spark.catalog import drop_resident

        drop_resident(spark)
    total_resident = round(sum(res_timings.values()), 3)

    # DuckDB oracle timings + ratios: the perf gate is spark/duckdb on
    # identical parquet, so the artifact carries both sides. Timed
    # after the Spark passes so the JVM is idle during DuckDB runs.
    ext_names = [n for n in EXTENDED if n in registry.QUERIES]
    ext_samples: dict[str, list[float]] = {n: [] for n in ext_names}
    for n in ext_names:
        run_query(spark, n, sf_dir)  # warm-up pass, untimed
    for _pass in range(2):
        for n in ext_names:
            ext_samples[n].append(round(run_query(spark, n, sf_dir), 3))
    ext_timings = {n: min(s) for n, s in ext_samples.items()}

    # Extended-tier rollups (round-9, judge item: these timings were
    # computed then LOST from the committed artifact, which is exactly
    # how the O(tokens²) tokenizer recompute hid for several rounds —
    # none of its victims are in the frozen headline). The totals and
    # worst-offender tables below go into the SHORT tail-surviving
    # line; the full per-query map goes to BENCH_FULL.json on disk.
    duck, timed_out = time_oracles(names + ext_names, sf_dir, cpus)
    ext_total = round(sum(ext_timings.values()), 3)
    ext_duck_total = round(
        sum(duck[n] for n in ext_names if duck[n]), 3
    )
    # worst-5 by ratio among NON-floor-dominated queries (oracle >=
    # 50ms — below that, Spark's fixed ~0.3s scheduling floor makes
    # every ratio read as tens-of-x regardless of plan quality) plus
    # worst-5 by absolute Spark seconds (catches offenders whose
    # oracle is also slow, e.g. shared quadratic work).
    ext_worst_ratio = dict(
        sorted(
            (
                (n, round(ext_timings[n] / duck[n], 1))
                for n in ext_names
                if duck[n] and duck[n] >= 0.05
            ),
            key=lambda kv: -kv[1],
        )[:5]
    )
    ext_worst_abs = dict(
        sorted(ext_timings.items(), key=lambda kv: -kv[1])[:5]
    )
    # Round-over-round drift alarm: any extended/headline query >=2x
    # slower than the previous committed full artifact (and >=1s
    # absolute, so sub-second jitter can't trip it) is named in BOTH
    # artifacts. This mechanism — not luck — is what should catch the
    # next shared-helper regression.
    # Round-11 host-noise fix (r10 verdict what's-wrong #1): the r10
    # driver artifact's sf0.01 lane was UNIFORMLY ~2.5-3x slower
    # (byte-identical code — host contention), and the raw >=2x rule
    # printed four phantom regressions. A lane-wide shift is not a
    # plan regression, so the per-query movement is now normalized by
    # the LANE MEDIAN movement: flag only queries that moved >=2x
    # RELATIVE to how the whole lane moved (still requiring >=2x
    # absolute vs prior and >=1s, so a lane that got faster can't
    # manufacture flags). The median movement itself is recorded per
    # lane so a reader can see the contention.
    here = os.path.dirname(os.path.abspath(__file__))
    full_path = os.path.join(here, "BENCH_FULL.json")

    def _lane_drift(
        cur: dict, prev_q: dict
    ) -> tuple[list[str], float | None]:
        moves = {
            n: t / prev_q[n]
            for n, t in cur.items()
            if prev_q.get(n) and prev_q[n] > 0
        }
        if not moves:
            return [], None
        med = sorted(moves.values())[len(moves) // 2]
        flagged = [
            n
            for n, m in moves.items()
            if cur[n] >= 1.0 and m >= 2.0 and m >= 2.0 * med
        ]
        return flagged, round(med, 3)

    drift: list[str] = []
    drift_lane_median: dict[str, float | None] = {}
    try:
        with open(full_path) as fh:
            prev = json.load(fh)
        prev_ext = {
            n: v.get("spark") for n, v in prev.get("extended", {}).items()
        }
        prev_ext.update(prev.get("queries", {}))
        if prev.get("sf") == sf:
            flagged, med = _lane_drift({**timings, **ext_timings}, prev_ext)
            drift.extend(flagged)
            drift_lane_median["0.1-main"] = med
    except (OSError, ValueError):
        pass
    ratio = {
        name: (round(timings[name] / duck[name], 2) if duck[name] else None)
        for name in names
    }
    # "comparable" excludes two classes, both still reported per-query
    # under "ratio"/"duckdb":
    # - heavy oracles (>=5s, or interrupted — interrupted ones carry a
    #   None timing but ARE listed here, plus under timed_out_oracles):
    #   ground truth computed by a different brute-force algorithm
    #   (minhash's exact-Jaccard all-pairs: 93s in DuckDB vs 2s Spark
    #   at sf0.1; times out entirely at sf>=0.3). Including them would
    #   flatter the total.
    # - contract oracles: the oracle only re-states a self-check bound
    #   (constant-ish SELECT), not equivalent work — its sub-ms time
    #   makes the ratio meaningless in the other direction.
    contract = {"similarity_ivf_topk", "similarity_pq_rerank"}
    heavy = [
        n
        for n in names
        if (duck[n] and duck[n] >= 5.0)
        or (n in timed_out and registry.ORACLES.get(n) is not None)
    ]
    comparable = [
        n for n in names if duck[n] and n not in heavy and n not in contract
    ]
    rtc = (
        round(
            sum(timings[n] for n in comparable)
            / sum(duck[n] for n in comparable),
            2,
        )
        if comparable
        else None
    )
    rtc_resident = (
        round(
            sum(res_timings[n] for n in comparable)
            / sum(duck[n] for n in comparable),
            2,
        )
        if comparable
        else None
    )

    # Scale curve (round-6, judge item: make the "floor amortizes at
    # scale" claim a driver-visible artifact): the comparable headline
    # subset re-run COLD at the other scale factors, with DuckDB
    # timed on the same files. sf0.01 ships with the driver; sf0.3 /
    # sf1 are deterministic local fixtures (tools/gen_scale.py,
    # .scaledata/) mirroring the fixture shape. Heavy/contract-oracle
    # queries are excluded up front (same exclusions as the main
    # rtc; the minhash ground-truth oracle is O(docs^2) and DNFs at
    # sf>=0.3). Skipped gracefully when a fixture dir is absent.
    scale_curve: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_SCALE_CURVE", "1") == "1":
        here = os.path.dirname(os.path.abspath(__file__))
        curve_dirs = [
            ("0.01", "/root/testdata/sf0.01"),
            ("0.3", os.path.join(here, ".scaledata/sf0.3")),
            ("1", os.path.join(here, ".scaledata/sf1")),
        ]
        curve_names = comparable
        for label, cdir in curve_dirs:
            if not os.path.isdir(cdir) or not curve_names:
                continue
            for n in curve_names:
                run_query(spark, n, cdir)  # warm pass, untimed
            c_samples: dict[str, list[float]] = {n: [] for n in curve_names}
            for _pass in range(2):
                for n in curve_names:
                    c_samples[n].append(
                        round(run_query(spark, n, cdir), 3)
                    )
            c_timings = {n: min(s) for n, s in c_samples.items()}
            c_duck, c_to = time_oracles(curve_names, cdir, cpus)
            c_comp = [
                n for n in curve_names if c_duck[n] and c_duck[n] < 5.0
            ]
            # Scale-lane drift alarm (round-10, r9 verdict #2: the
            # sf1 q5 regression went unflagged because the >=2x rule
            # watched only the sf0.1 tiers — the scale lanes are
            # where a plan regression at scale shows FIRST). Same
            # rule as the main tier, lane-median-normalized (r11).
            c_drift: list[str] = []
            c_med: float | None = None
            try:
                prev_lane = prev.get("scale_curve", {}).get(label, {})
                prev_q = prev_lane.get("queries", {})
                if prev.get("sf") == sf:
                    c_drift, c_med = _lane_drift(c_timings, prev_q)
                    drift.extend(f"sf{label}:{n}" for n in c_drift)
            except (NameError, AttributeError):
                pass
            drift_lane_median[label] = c_med
            scale_curve[label] = {
                "drift_over_2x": sorted(c_drift),
                "lane_median_move": c_med,
                "spark_total": round(sum(c_timings[n] for n in c_comp), 3),
                "duckdb_total": round(sum(c_duck[n] for n in c_comp), 3),
                "ratio": (
                    round(
                        sum(c_timings[n] for n in c_comp)
                        / sum(c_duck[n] for n in c_comp),
                        2,
                    )
                    if c_comp
                    else None
                ),
                "n_queries": len(c_comp),
                "queries": c_timings,
                "duckdb": {n: c_duck[n] for n in curve_names},
                "timed_out_oracles": c_to,
            }
        if comparable:
            scale_curve["0.1"] = {
                "spark_total": round(sum(timings[n] for n in comparable), 3),
                "duckdb_total": round(sum(duck[n] for n in comparable), 3),
                "ratio": rtc,
                "n_queries": len(comparable),
            }

    # Bucketed-storage tier (round-8, capacity-model item 2): tpch_q3
    # re-timed with lineitem/orders stored bucketed+sorted on orderkey
    # (enable_bucketed_facts) — the documented 100 TB default layout
    # where the fact-fact shuffle is paid once at write time. The
    # bucket WRITE is untimed (reported separately); the frozen cold
    # "value"/"queries" above never see bucketed scans. NAMESPACED:
    # these numbers live only under "bucketed_q3".
    bucketed_q3: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_BUCKETED", "1") == "1":
        from etl_data_ingestion_spark.catalog import (
            disable_bucketed_facts,
            enable_bucketed_facts,
        )

        here = os.path.dirname(os.path.abspath(__file__))
        bkt_dirs = [(str(sf), sf_dir)]
        sf1_dir = os.path.join(here, ".scaledata/sf1")
        if os.path.isdir(sf1_dir) and os.path.abspath(sf_dir) != os.path.abspath(sf1_dir):
            bkt_dirs.append(("1", sf1_dir))
        qname = "tpch_q3_shipping_priority"
        for label, bdir in bkt_dirs:
            try:
                t0 = time.perf_counter()
                enable_bucketed_facts(spark, bdir, 32)
                write_sec = round(time.perf_counter() - t0, 3)
                run_query(spark, qname, bdir)  # warm, untimed
                b_samples = [
                    round(run_query(spark, qname, bdir), 3)
                    for _ in range(3)
                ]
                disable_bucketed_facts(spark)
                run_query(spark, qname, bdir)  # warm stock path, untimed
                s_samples = [
                    round(run_query(spark, qname, bdir), 3)
                    for _ in range(3)
                ]
                bucketed_q3[label] = {
                    "stock": min(s_samples),
                    "bucketed": min(b_samples),
                    "n_buckets": 32,
                    "write_sec_untimed": write_sec,
                }
            finally:
                disable_bucketed_facts(spark)

    summary = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "samples": samples,
            "spread": spread,
            "duckdb": {n: duck[n] for n in names},
            "ratio": ratio,
            "heavy_oracles": heavy,
            "timed_out_oracles": timed_out,
            "contract_oracles": sorted(contract & set(names)),
            "extended": {
                n: {
                    "spark": ext_timings[n],
                    "duckdb": duck[n],
                    "ratio": (
                        round(ext_timings[n] / duck[n], 2) if duck[n] else None
                    ),
                }
                for n in ext_names
            },
            "ratio_total_comparable": rtc,
            "extended_total": ext_total,
            "extended_duckdb_total": ext_duck_total,
            "extended_worst_ratio": ext_worst_ratio,
            "extended_worst_abs": ext_worst_abs,
            "drift_over_2x": sorted(drift),
            "drift_lane_median_move": drift_lane_median,
            "value_resident": total_resident,
            "queries_resident": res_timings,
            "ratio_total_comparable_resident": rtc_resident,
            "scale_curve": scale_curve,
            "bucketed_q3": bucketed_q3,
            "sf": sf,
        }
    )
    # Persist the FULL artifact (committed per round as the
    # round-over-round drift baseline and the judge's extended-tier
    # record — stdout tail capture only keeps the short line below).
    try:
        with open(full_path, "w") as fh:
            fh.write(summary + "\n")
    except OSError:
        pass
    # The full summary line is ~2600+ chars; the driver's tail capture
    # keeps only the final 2000, so printing it (even twice — round 4)
    # always clips. The LAST line is therefore a short (<200 char)
    # summary that survives any tail capture; the full artifact
    # precedes it for humans/judges reading the whole log.
    # Round-15 (r14 verdict item 2, additions only): the driver keys
    # its per-query round-over-round comparison on THIS line's
    # "queries" map — the full line above always clips in tail
    # capture, so PERF_r14.per_query came out empty. The 16-entry
    # headline map adds ~550 chars; the line stays under the ~2000
    # char tail window.
    short = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "ratio_total_comparable": rtc,
            "value_resident": total_resident,
            "ratio_resident": rtc_resident,
            "scale_curve": {
                k: v.get("ratio") for k, v in sorted(scale_curve.items())
            },
            "n_queries": len(names),
            "ext_total": ext_total,
            "ext_duckdb_total": ext_duck_total,
            "ext_n": len(ext_names),
            "ext_worst_ratio": ext_worst_ratio,
            "ext_worst_abs": ext_worst_abs,
            "drift_over_2x": sorted(drift),
            "sf": sf,
        }
    )
    sys.stdout.write("\n" + summary + "\n" + short + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
