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
# ROUND-11 RECUT (executed; see window comments inside the list):
#   7 changed-code slots + 2 r2 (cohort -> 0) + 18 never-checked
#   (cohort -> 0) + 23 oldest r3. After this window nothing r2-era
#   remains and no query has never been checked; the remaining r3
#   cohort leads round 12.
CHECK_ORDER: list[str] = [
    # slots 1-7: round-11 changed code first (the displacement
    # rule every round since r9). Slot 1 is the one VALUE-
    # affecting change (bounce-rate (ts,event_id) tie-break,
    # advisor medium); 2-5 are the round-11 plan rewrites
    # (item_cf AQE-gate+persist-count, kcore action fusion,
    # repeated-lines broadcast boilerplate, naive-bayes one-
    # scan pivot-argmax); 6-7 carry the decimal(38,0) cross-
    # moment widening. bounce_rate and ridge are ALSO two of
    # the 20 never-checked wave-24..27 queries, so their
    # first-ever verdicts cover the post-change code.
    "events_bounce_rate_by_entry",
    "ml_item_item_cf",
    "graph_kcore_peel",
    "dedup_repeated_lines_corpus",
    "pipeline_naive_bayes_spam",
    "ml_ols_normal_equations",
    "ml_ridge_normal_equations",
    # slots 8-9: the r2-era cohort burns to ZERO
    "subquery_in_high_qty",
    "subquery_not_exists_customers",
    # slots 10-27: the remaining 18 never-checked wave-24..27
    # queries (never-checked cohort burns to zero again)
    "agg_levene_variance_homogeneity",
    "agg_jarque_bera_normality",
    "agg_cramers_v",
    "graph_ktruss_edge_support",
    "events_exp_gap_fit",
    "text_word_burstiness",
    "timeseries_spectral_entropy",
    "window_hampel_outliers",
    "agg_mann_kendall_trend",
    "agg_wilcoxon_signed_rank",
    "agg_robust_moments_octiles",
    "text_yule_k",
    "pipeline_neyman_allocation",
    "quality_l_diversity",
    "events_decayed_engagement",
    "agg_grubbs_outlier",
    "timeseries_var_expected_shortfall",
    "agg_hodges_lehmann_shift",
    # slots 28-50: the 23 oldest r3-era verdicts from the
    # standing queue
    "agg_heavy_hitters_countmin",
    "agg_hll_partitioned_union",
    "dedup_incremental_new_docs",
    "dedup_semantic_clusters",
    "embedding_l2_quantize",
    "multimodal_binary_metadata",
    "multimodal_byte_entropy",
    "pipeline_chunk_documents",
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
    # ---- end of the 50-slot window ----
    # trailing = the round-12 standing queue, oldest-first:
    # the 20 remaining r3-era verdicts, then the r4 cohort
    # in registration order. NOTE the deviation from the r10
    # verdict's arithmetic (hoped <=15 r3 left; actual 20):
    # 7 slots went to round-11 changed code. The 56 audit
    # fan-out flips are plan-only (values identical by
    # construction), verified by the full sf0.01 parity sweep
    # + vanilla-session driver-contract runs this round; they
    # do NOT consume slots.
    # Round-11 continuation ALSO added waves 28-37 (+39 new
    # queries, 388 -> 427); they enter the never-checked cohort
    # behind this queue in registration order — the r12 recut
    # should burn the 20 r3 first, then as many of the 39 new
    # as fit, with the remainder leading r13.
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
        stats_tests,
        graph2,
    )
