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
# 50/50; r8 50/50; r9 50/50 (13 never-checked + 7 r8-changed + 10
# r9-changed + 20 oldest r2).
# ROUND-10 RECUT (exactly the r9 verdict's prescription #1):
#   slots 1-23   the 23 queries that have NEVER had a driver verdict
#                (the round-9 wave-18..23 additions). Four of them —
#                timeseries_pacf_durbin, timeseries_variance_ratio,
#                pandas_map_in_arrow_tokens, ml_simplified_silhouette
#                — also carry round-10 advisor fixes (promote-before-
#                multiply widening, ASCII-trim parity, order-free
#                centroids), so their first-ever verdicts cover the
#                POST-change code;
#   slots 24-46  23 of the 25 remaining r2-era verdicts;
#   slots 47-50  the FOUR round-10 plan rewrites outside the never-
#                checked set (changed code must not coast on its old
#                verdicts — the same displacement rule round 9
#                applied, stated plainly): graph_kcore_peel (action
#                fusion + AQE gate), ml_item_item_cf (self-join ->
#                per-basket pair expansion), dedup_repeated_lines_
#                corpus (fused doc aggregation), pipeline_naive_
#                bayes_spam (persist + fused scalar collect). These
#                pre-empt the last two r2 slots and the planned
#                oldest-r3 slot; deviation from the r9 verdict's
#                arithmetic (r2 cohort ends at 2, not 0): the 2
#                leftover r2 entries (subquery_in_high_qty,
#                subquery_not_exists_customers) LEAD the round-11
#                queue below.
# After this window: zero of the queries that existed at round-10
# START remain never-checked, and the r2 cohort is 2. Round 10 ALSO
# added 20 new queries (waves 24-27) — new evidence debt, ledgered
# in COVERAGE.md.
# ROUND-11 RECUT (executed): 7 changed-code slots + 2 r2 (cohort
#   -> 0) + 18 never-checked (cohort -> 0) + 23 oldest r3 — all
#   50/50 green (CORRECTNESS_r11).
# ROUND-12 RECUT (exactly the r11 verdict's prescription #1, with
# the judge's ordering — changed code, then the 39 never-checked
# wave-28..37 additions, then oldest r3 to fill 50):
#   slots 1-4    the round-12 rewrites of queries that already
#                carry verdicts (changed code must not coast —
#                the displacement rule every round since r9):
#                graph_assortativity (degree-moment algebraic
#                collapse -14..33% A/B'd, + scale_shuffle gate),
#                graph_community_modularity (contingency-table
#                fusion -3%), graph_kcore_peel and ml_item_item_cf
#                (gate scale_shuffle=True — a priori static
#                shuffle-partition sizing from the fact footprint;
#                kcore 7.9 -> 4.4s, item_cf 1.46 -> 1.28s
#                interleaved at sf0.1, self-retiring at sf1).
#                graph_pagerank_bipartite and graph_rich_club_
#                coefficient were ALSO rewritten but their
#                rewrites measured SLOWER in interleaved A/Bs
#                (single-checkpoint fusion +20%; basket pair
#                build +74% at sf1) and were REVERTED to the r11
#                code — docstring-only diffs keep their verdicts;
#   slots 5-43   the 39 wave-28..37 queries, in wave order —
#                the cohort that has NEVER had a driver verdict
#                burns to zero. TWO of them are also round-12
#                changed code, so their first-ever verdicts cover
#                the post-change form: ml_loo_1nn_embedding_
#                accuracy (lazy executor-side corpus load + 1e-9
#                similarity snap, advisor item),
#                pipeline_dedup_threshold_curve (single-use
#                persist dropped; gate variant rejected as a
#                wash);
#   slots 44-50  the 7 oldest r3-era refreshes from the standing
#                queue.
# After this window: never-checked = 0 again; 13 r3-era remain
# (trailing queue below) and lead round 13 together with the 56
# plan-only fan-out flips + 2 AQE-gate changes from round 11
# (queued per the r11 verdict's #5 — plan-only, value-safe by
# construction and sweep-verified, but changed plans should get
# driver re-verdicts once the never-checked cohort is burned).
CHECK_ORDER: list[str] = [
    # slots 1-4: round-12 changed code with existing verdicts
    "graph_assortativity",
    "graph_community_modularity",
    "graph_kcore_peel",
    "ml_item_item_cf",
    # slots 5-9: wave 28
    "quality_t_closeness",
    "pipeline_train_test_split_hash",
    "timeseries_ewma_crossover",
    "text_mattr_lexical_diversity",
    "ml_roc_curve_points",
    # slots 10-19: waves 29-30
    "agg_friedman_test",
    "agg_cronbach_alpha",
    "ml_decision_stump_gini",
    "timeseries_permutation_entropy",
    "graph_rich_club_coefficient",
    "agg_gumbel_block_maxima",
    "agg_cochran_q_test",
    "ml_fisher_lda_closed_form",
    "timeseries_sample_entropy",
    "quality_functional_dependencies",
    # slots 20-24: wave 31
    "timeseries_engle_granger_coint",
    "ml_jackknife_ratio_variance",
    "agg_capture_recapture_chapman",
    "ml_poisson_deviance",
    "text_burrows_delta",
    # slots 25-28: wave 32
    "timeseries_kpss_stationarity",
    "ml_loo_1nn_embedding_accuracy",
    "ml_empirical_bayes_shrinkage",
    "ml_conformal_interval_coverage",
    # slots 29-32: wave 33
    "ml_logrank_test",
    "agg_energy_distance_weekend",
    "agg_circular_hour_stats",
    "events_post_stratified_lift",
    # slots 33-36: wave 34
    "ml_xi_correlation",
    "agg_tail_dependence_extremes",
    "agg_partial_correlation",
    "ml_sprt_sequential_test",
    # slots 37-39: wave 35
    "events_cuped_adjusted_lift",
    "agg_lmoments_daily",
    "pipeline_dedup_threshold_curve",
    # slots 40-41: wave 36
    "agg_ledoit_wolf_shrinkage",
    "ml_power_analysis_two_prop",
    # slots 42-43: wave 37
    "timeseries_turning_points_test",
    "timeseries_peak_prominence",
    # slots 44-50: the 7 oldest r3-era refreshes
    "stream_stateful_sessions",
    "text_c4_line_filter",
    "text_gopher_quality_rules",
    "text_pii_scrub",
    "text_repetition_stats",
    "timeseries_gap_fill_hourly",
    "timeseries_zscore_outliers",
    # ---- end of the 50-slot window ----
    # trailing = the round-13 standing queue, oldest-first: the
    # 13 remaining r3-era verdicts, then the r4 cohort in
    # registration order. ALSO queued for r13 (do not coast):
    # driver re-verdicts for the 56 round-11 fan-out flips and
    # the 2 AQE-gate eager-materialization changes — plan-only,
    # locally parity-verified, zero driver rows on the new plans.
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
        stats_tests,
        graph2,
    )
