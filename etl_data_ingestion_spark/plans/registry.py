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
# Round 1 checked registration slots 1-50 (48 green). Round 2's window
# covered ingest/dedup/similarity/text/scalars/subqueries/pandas/
# mailbox/stream-analogues → 49/50 green (scalar_math_funcs hash-failed
# on an oracle dtype since fixed). Round 3's window below: the one
# retest, the 27 queries that have never received a driver verdict,
# the three newly derived TPC-H queries (q4/q12/q21), then the oldest
# round-1 greens (refactored since their verdict — 90 terminal
# orderBys removed) to fill the 50. Names not listed follow in
# registration order after the listed ones.
CHECK_ORDER: list[str] = [
    # slot 1: round-2 red row, oracle dtype repaired (CEIL/FLOOR→BIGINT)
    "scalar_math_funcs",
    # slots 2-28: never driver-verified (round-2 additions)
    "dedup_simhash_banded",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_potential_promotion",
    "pipeline_decontaminate_benchmark",
    "pipeline_stratified_sample",
    "text_pii_scrub",
    "udtf_sentence_split",
    "warehouse_upsert_latest",
    "agg_heavy_hitters_countmin",
    "window_percentile_bucket_scalable",
    "profile_table_stats",
    "timeseries_gap_fill_hourly",
    "stream_sliding_hourly_30m",
    "stream_session_window_30m",
    "stream_interval_join",
    "stream_stateful_sessions",
    "scan_csv_roundtrip",
    "scan_json_roundtrip",
    "scan_text_lines",
    "scan_binary_files",
    "scan_parquet_schema_evolution",
    "multimodal_binary_metadata",
    "multimodal_image_decode_stub",
    "multimodal_frame_sample_stub",
    "multimodal_resize_featurize_stub",
    # slots 29-33: new this round — lineitem date/shipmode derivation
    # (q4/q12/q21) + q11/q17, completing all 22 TPC-H shapes
    "tpch_q4_order_priority",
    "tpch_q12_shipmode_priority",
    "tpch_q21_waiting_supplier",
    "tpch_q11_important_stock",
    "tpch_q17_small_qty_revenue",
    # slots 34-43: new this round — curation + format + multimodal +
    # streaming audit + incremental dedup + multiset set ops
    "text_gopher_quality_rules",
    "text_repetition_stats",
    "scan_orc_roundtrip",
    "dedup_semantic_clusters",
    "pipeline_domain_mixture_weights",
    "multimodal_byte_entropy",
    "stream_late_data_accounting",
    "dedup_incremental_new_docs",
    "setop_intersect_all",
    "setop_except_all",
    # slots 44-48: round-3 late additions — corpus shaping (C4 line
    # filter, duplicated spans, chunking), int8 embedding quantize,
    # z-score outliers — first-time verdicts outrank re-verification
    "text_c4_line_filter",
    "dedup_duplicated_spans",
    "pipeline_chunk_documents",
    "embedding_l2_quantize",
    "timeseries_zscore_outliers",
    "agg_hll_partitioned_union",
    # slot 50: oldest round-1 green, re-verified post-refactor
    # (q3/q5/q6/q10/q14/q18 move to the round-4 re-verification window)
    "tpch_q1_pricing_summary",
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
        streaming_queries,
        multimodal,
        subqueries,
        pandas_surface,
        sources_scan,
    )
