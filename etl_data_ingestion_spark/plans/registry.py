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
# queries() dict, so ordering IS the verification schedule. Round 1
# checked registration slots 1-50 (tpch/join/agg/window/setop +
# scalar_string_funcs → 48 green). CHECK_ORDER puts everything that
# has never received a driver verdict (plus the two repaired ERR
# aggregates) in the front window; round-1 greens park at the tail.
# Names not listed follow in registration order after the listed ones,
# so newly added queries land right behind the current window and
# head the NEXT round's window automatically.
CHECK_ORDER: list[str] = [
    # §2.2 ingest T1-T14 proof + end-to-end curation
    "ingest_trim_empty_null",
    "ingest_comma_int_roundtrip",
    "ingest_strict_date_parse",
    "ingest_validity_accounting",
    "ingest_ctb_end_to_end",
    "pipeline_training_data_curation",
    # dedup family
    "dedup_exact_documents",
    "dedup_exact_keep_first",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_cluster_components",
    # similarity search
    "similarity_topk_bruteforce",
    "similarity_topk_lsh",
    "similarity_ivf_topk",
    # text analysis
    "text_token_stats",
    "text_quality_score",
    "text_lang_id_heuristic",
    "text_bpe_token_estimate",
    "text_rolling_fingerprint",
    "text_lang_bigram_score",
    "text_normalize_pipeline",
    # scalar function surface (scalar_string_funcs already green r1)
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_conditional_funcs",
    "scalar_json_extract",
    "scalar_array_funcs",
    "scalar_map_funcs",
    "scalar_from_json_struct",
    "scalar_posexplode_embedding",
    "scalar_try_funcs",
    # subqueries
    "subquery_scalar_above_avg",
    "subquery_in_high_qty",
    "subquery_exists_returned",
    "subquery_not_exists_customers",
    "subquery_correlated_avg_qty",
    # pandas UDF surface
    "pandas_scalar_net_value",
    "pandas_grouped_weighted_avg",
    "pandas_map_batches_tokens",
    # round-1 ERR rows, repaired this round
    "agg_approx_distinct",
    "agg_approx_percentile",
    # sort / top-k
    "topk_orders_by_price",
    "sort_global_nation",
    # mailbox extract path + partition pruning receipt
    "mailbox_extract_pipeline",
    "mailbox_datasource_scan",
    "scan_partitioned_pruning",
    # streaming batch-analogues (2 of 6; rest head round 3)
    "stream_tumbling_hourly",
    "stream_dedup_first_event",
    # ---- round-3 window starts here (slot 51+) ----
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
        streaming_queries,
        multimodal,
        subqueries,
        pandas_surface,
        sources_scan,
    )
