"""Scalar-function operators (SURVEY.md §2.5): string / date / math /
conditional / JSON / array expressions — all JVM-side built-ins inside
whole-stage codegen; nothing here leaves the JVM.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.plans.registry import register

STRING_ORACLE = """
SELECT p_partkey,
       UPPER(p_name)                                   AS name_upper,
       SUBSTRING(p_type, 1, 6)                         AS type_prefix,
       CAST(REGEXP_EXTRACT(p_brand, '[0-9]+') AS BIGINT) AS brand_num,
       LENGTH(p_name)                                  AS name_len,
       CONCAT(p_brand, ':', p_type)                    AS brand_type,
       REPLACE(p_name, ' ', '_')                       AS name_snake
FROM part
ORDER BY p_partkey
"""


@register("scalar_string_funcs", oracle=STRING_ORACLE)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.regexp_extract("p_brand", "[0-9]+", 0).cast("long").alias("brand_num"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
    )


DATE_ORACLE = """
SELECT o_orderkey,
       YEAR(o_orderdate)                                   AS order_year,
       MONTH(o_orderdate)                                  AS order_month,
       QUARTER(o_orderdate)                                AS order_quarter,
       STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
       DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       STRFTIME(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d')    AS month_end,
       DAYOFWEEK(o_orderdate) + 1                          AS dow -- duckdb 0=Sun, spark 1=Sun
FROM orders
ORDER BY o_orderkey
"""


@register("scalar_date_funcs", oracle=DATE_ORACLE)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.dayofweek("o_orderdate").alias("dow"),
    )


MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS net,
       CAST(CEIL(l_quantity) AS BIGINT)             AS qty_ceil,
       CAST(FLOOR(l_quantity / 10) AS BIGINT)       AS qty_decile,
       ABS(l_discount - 0.05)                       AS disc_dev,
       ROUND(SQRT(l_extendedprice), 4)              AS price_sqrt,
       ROUND(LN(l_extendedprice + 1), 4)            AS price_ln,
       MOD(l_orderkey, 7)                           AS key_mod7
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


@register("scalar_math_funcs", oracle=MATH_ORACLE)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # Money math in exact decimal space: double ROUND at 2dp straddles
        # .005 representation boundaries differently across engines.
        F.round(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")),
            2,
        )
        .cast("double")
        .alias("net"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


COND_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END                    AS bal_tier,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
       GREATEST(c_acctbal, 0.0)                AS bal_floor,
       LEAST(c_nationkey, 10)                  AS nk_cap
FROM customer
ORDER BY c_custkey
"""


@register("scalar_conditional_funcs", oracle=COND_ORACLE)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
        F.least(F.col("c_nationkey"), F.lit(10)).alias("nk_cap"),
    )


JSON_ORACLE = """
SELECT event_id,
       CAST(props->>'$.k' AS BIGINT) AS k_value
FROM events
ORDER BY event_id
"""


@register("scalar_json_extract", oracle=JSON_ORACLE)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction on a string column (events.props) —
    get_json_object is codegen'd; for repeated multi-field access
    prefer from_json once into a struct."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


ARRAY_ORACLE = """
-- `+ 0.0` after every ROUND: IEEE addition maps -0.0 to +0.0 and is
-- the identity elsewhere. ROUND of a tiny negative (e.g. -4e-6 at
-- scale 4) yields -0.0 in DuckDB but +0.0 in Spark — caught by the
-- round-7 sf0.1 strict-repr sweep as a value-hash diff.
SELECT vec_id,
       LEN(embedding)                                       AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0.0         AS first_component,
       ROUND(CAST(list_sum(embedding) AS DOUBLE), 3) + 0.0  AS component_sum,
       ROUND(CAST(list_max(embedding) AS DOUBLE), 4) + 0.0  AS component_max
FROM embeddings
ORDER BY vec_id
"""


@register("scalar_array_funcs", oracle=ARRAY_ORACLE)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops on embedding vectors — F.aggregate folds JVM-side over
    the array; no Python, no explode."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        # + 0.0 normalizes IEEE negative zero (see oracle comment)
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + 0.0).alias(
            "first_component"
        ),
        (F.round(comp_sum, 3) + 0.0).alias("component_sum"),
        (F.round(F.array_max("embedding").cast("double"), 4) + 0.0).alias(
            "component_max"
        ),
    )


MAP_ORACLE = """
SELECT c_custkey,
       c_acctbal                                   AS bal_value,
       2                                           AS n_entries,
       'bal,nk'                                    AS key_csv,
       c_acctbal + CAST(c_nationkey AS DOUBLE)     AS value_sum
FROM customer
ORDER BY c_custkey
"""


@register("scalar_map_funcs", oracle=MAP_ORACLE)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: create_map → element_at / size / map_keys /
    aggregate-over-map_values, all JVM expressions. The oracle states
    the algebraically-known result (DuckDB MAP internals differ), so
    the check proves Spark's map ops compute the right values."""
    cust = load_table(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("bal"), F.col("c_acctbal"),
        F.lit("nk"), F.col("c_nationkey").cast("double"),
    )
    return cust.select(
        "c_custkey",
        F.element_at(m, "bal").alias("bal_value"),
        F.size(m).alias("n_entries"),
        F.concat_ws(",", F.map_keys(m)).alias("key_csv"),
        F.aggregate(
            F.map_values(m), F.lit(0.0), lambda acc, x: acc + x
        ).alias("value_sum"),
    )


FROM_JSON_ORACLE = """
SELECT event_id,
       CAST(props->>'$.k' AS BIGINT)            AS k_value,
       CAST(props->>'$.k' AS BIGINT) % 10 = 0   AS k_round
FROM events
WHERE CAST(props->>'$.k' AS BIGINT) IS NOT NULL
ORDER BY event_id
"""


@register("scalar_from_json_struct", oracle=FROM_JSON_ORACLE)
def scalar_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct — parse once, access many: the
    right pattern when several fields are needed (vs per-path
    get_json_object re-parsing)."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_id", F.from_json("props", "k long").alias("p")
    )
    return (
        parsed.filter(F.col("p.k").isNotNull())
        .select(
            "event_id",
            F.col("p.k").alias("k_value"),
            (F.col("p.k") % 10 == 0).alias("k_round"),
        )
    )


POSEXPLODE_ORACLE = """
SELECT vec_id, CAST(i - 1 AS INT) AS pos,
       ROUND(CAST(embedding[i] AS DOUBLE), 4) AS component
FROM (
  SELECT vec_id, embedding,
         UNNEST(generate_series(1, len(embedding))) AS i
  FROM embeddings
  WHERE vec_id < 20
)
ORDER BY vec_id, pos
"""


@register("scalar_posexplode_embedding", oracle=POSEXPLODE_ORACLE)
def scalar_posexplode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → (position, element) rows — the Generate
    operator. Row count multiplies by array length, so at scale
    explode AFTER filtering (the vec_id<20 predicate is pushed below
    the Generate into the scan)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "component"))
        .select(
            "vec_id", "pos", F.round(F.col("component").cast("double"), 4).alias("component")
        )
    )


TRY_ORACLE = """
SELECT c_custkey,
       TRY_CAST(SUBSTRING(c_name, 10) AS BIGINT)  AS name_num,
       TRY_CAST(c_mktsegment AS BIGINT)           AS seg_num,
       CASE WHEN c_nationkey = 0 THEN NULL
            ELSE FLOOR(c_acctbal / c_nationkey * 10000) / 10000 END AS bal_per_nation
FROM customer
ORDER BY c_custkey
"""


@register("scalar_try_funcs", oracle=TRY_ORACLE)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fail-closed expression surface: try_cast / try_divide return
    NULL instead of raising — the row-level ingestion stance (reference
    main.py:393-399: bad value → NULL + quarantine, never a crashed
    job) available as ad-hoc expressions. At 100 TB a single malformed
    value must never kill a 6-hour job; try_* + a validity filter is
    the pattern."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.substring("c_name", 10, 100).try_cast("bigint").alias("name_num"),
        F.col("c_mktsegment").try_cast("bigint").alias("seg_num"),
        # floor-truncate, not round: ROUND on a double quotient at a
        # .00005 boundary differs across engines; floor of the same
        # bits never does
        (
            F.floor(F.try_divide(F.col("c_acctbal"), F.col("c_nationkey")) * 10000)
            / 10000
        ).alias("bal_per_nation"),
    )


PROFILE_ORACLE = """
-- Column-profile parity: one row per profiled column with null count,
-- exact distinct count, and min/max rendered as strings. The UNPIVOT
-- shape (per-column aggregate -> long format) is what a profiling UI
-- consumes; every cell is engine-exact.
SELECT 'o_custkey' AS column_name,
       COUNT(*) - COUNT(o_custkey)     AS n_nulls,
       COUNT(DISTINCT o_custkey)       AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       CAST(ROUND(MIN(o_totalprice), 2) AS VARCHAR),
       CAST(ROUND(MAX(o_totalprice), 2) AS VARCHAR)
FROM orders
ORDER BY column_name
"""


@register("profile_table_stats", oracle=PROFILE_ORACLE)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the data-quality pass a pipeline runs on every
    new source): per-column null count, exact distinct count, min/max
    — computed in ONE scan (all per-column aggregates in a single
    groupBy-less agg; Catalyst fuses them into one HashAggregate),
    then unpivoted to the long (column_name, stats) layout.

    At 100 TB swap count_distinct for approx_count_distinct per the
    agg_approx_distinct pattern; the single-scan structure is the
    point — profiling must not cost one job per column."""
    orders = load_table(spark, sf_dir, "orders")

    def _num(col):  # numeric min/max rendered like the oracle's ROUND
        return (
            F.round(F.min(col), 2).cast("string"),
            F.round(F.max(col), 2).cast("string"),
        )

    def _str(col):
        return F.min(col).cast("string"), F.max(col).cast("string")

    cols = {
        "o_custkey": _str("o_custkey"),
        "o_orderstatus": _str("o_orderstatus"),
        "o_orderpriority": _str("o_orderpriority"),
        "o_totalprice": _num("o_totalprice"),
    }
    aggs = []
    for c, (mn, mx) in cols.items():
        aggs += [
            # coalesce: sum over a 0-row table is NULL where the
            # oracle's count is 0 (empty-corpus sweep, round 14)
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            ).alias(f"{c}__nulls"),
            F.count_distinct(c).alias(f"{c}__distinct"),
            mn.alias(f"{c}__min"),
            mx.alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        )
    )


VARIANT_ORACLE = """
-- Variant-typed semi-structured access (Spark 4 VariantType via
-- parse_json/variant_get): same answers as string-JSON extraction,
-- which is what DuckDB computes. The variant encoding is the part
-- that matters at scale — parsed once at ingest into a binary
-- columnar form, each field access is a cheap typed probe instead of
-- re-parsing the JSON string per expression (scalar_json_extract's
-- get_json_object re-parses per call).
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
         AS sum_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
         AS max_k
FROM events
WHERE CAST(json_extract(props, '$.k') AS INTEGER) >= 50
GROUP BY event_type
ORDER BY event_type
"""


@register("scalar_variant_json", oracle=VARIANT_ORACLE)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through VariantType: parse_json ONCE into
    the binary variant encoding, then typed variant_get probes for
    filter and aggregates — the Spark-4-native replacement for
    repeated get_json_object string re-parsing (scalar_json_extract
    keeps the classic form for comparison). At 100 TB the variant
    column is written at ingest (shredded, columnar) and every
    downstream field access skips JSON parsing entirely."""
    events = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


URL_FUNCS_ORACLE = """
-- URL parsing family over synthesized crawl URLs (the dedup/curation
-- key-extraction step for web corpora): host, path, one query param,
-- and the registered-domain heuristic. Spark uses parse_url (JVM,
-- codegen); DuckDB mirrors with regexes — same answers.
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.crawl.example.com/docs/' ||
         CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&page=' ||
         CAST(doc_id % 7 AS VARCHAR) AS url
  FROM documents WHERE doc_id < 300
)
SELECT doc_id,
       regexp_extract(url, '^https://([^/]+)/', 1) AS host,
       regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
       regexp_extract(regexp_extract(url, '^https://([^/]+)/', 1),
                      '([^.]+[.][^.]+)$', 1) AS registered_domain
FROM u
ORDER BY doc_id
"""


@register("scalar_url_funcs", oracle=URL_FUNCS_ORACLE)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL structure extraction via parse_url (HOST/PATH/QUERY with a
    key) plus a registered-domain suffix heuristic — the
    canonicalization primitives behind URL-keyed dedup and per-domain
    curation stats for web crawls. URLs are synthesized
    deterministically from the fixture (no URLs in the corpus), so
    the oracle can mirror byte-for-byte with regexes. All codegen'd
    expressions, map-only plan."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".crawl.example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        F.lit("&page="), (F.col("doc_id") % 7).cast("string"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    return docs.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.regexp_extract(host, r"([^.]+[.][^.]+)$", 1).alias(
            "registered_domain"
        ),
    )


COLLATION_ORACLE = """
-- Spark-4 collation surface (UTF8_LCASE): case-insensitive equality,
-- grouping, and sorting under a declared collation rather than
-- lower() rewrites. The oracle states the lower() equivalent, which
-- is exactly the semantics the collation must deliver on this ASCII
-- fixture — making the collation path value-checked against the
-- classical rewrite.
WITH seg AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
              WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment)
              ELSE c_mktsegment END AS seg_mixed
  FROM customer
)
SELECT lower(seg_mixed)             AS segment_ci,
       CAST(COUNT(*) AS BIGINT)     AS n_customers,
       CAST(COUNT(DISTINCT seg_mixed) AS BIGINT) AS n_case_variants
FROM seg
GROUP BY lower(seg_mixed)
ORDER BY segment_ci
"""


@register("scalar_collation_group", oracle=COLLATION_ORACLE)
def scalar_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collated grouping (Spark 4 collation support): a mixed-case
    segment column grouped under UTF8_LCASE collation — the engine
    treats case variants as equal WITHOUT a lower() rewrite, so
    downstream code keeps the original strings while comparisons,
    DISTINCT, and GROUP BY follow the collation. The output key is
    normalized (lower) only for cross-engine display; the grouping
    itself runs on the collated column. n_case_variants counts the
    distinct raw spellings collapsed into each collated group."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    seg_mixed = (
        F.when(k % 3 == 0, F.upper("c_mktsegment"))
        .when(k % 3 == 1, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment"))
    )
    seg = cust.select(
        F.expr(
            "CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment) "
            "WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment) "
            "ELSE c_mktsegment END COLLATE UTF8_LCASE"
        ).alias("seg_ci"),
        seg_mixed.alias("seg_raw"),
    )
    return (
        seg.groupBy("seg_ci")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.count_distinct("seg_raw").alias("n_case_variants"),
        )
        .select(
            # normalize the collated key for engine-portable display;
            # cast back to a binary-collation string for the sort
            F.lower(F.col("seg_ci").cast("string")).alias("segment_ci"),
            "n_customers",
            F.col("n_case_variants").cast("long").alias("n_case_variants"),
        )
    )


BITWISE_ORACLE = """
-- Bitwise scalar surface: AND/OR/XOR masks, shifts, and popcount
-- over order keys — the primitives bitmap indexes, bloom filters,
-- and hash-partitioner diagnostics are built from. Pure integer
-- math: bit-identical across engines by construction.
SELECT o_orderkey,
       o_orderkey & 255                          AS low_byte,
       o_orderkey | 4096                         AS with_flag,
       xor(o_orderkey, o_custkey)                AS key_xor,
       (o_orderkey & 15) << 2                    AS shifted_left,
       o_orderkey >> 3                           AS shifted_right,
       bit_count(o_orderkey)                     AS popcount,
       CAST(o_orderkey & (o_orderkey - 1) AS BIGINT) AS clear_lowest
FROM orders
WHERE o_orderkey <= 2048
ORDER BY o_orderkey
"""


@register("scalar_bitwise_funcs", oracle=BITWISE_ORACLE)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression surface (masks, shifts, xor, popcount) —
    exact integer ops that stay inside whole-stage codegen; the
    o_orderkey <= 2048 predicate pushes to the parquet scan."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2048)
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(255).alias("low_byte"),
        k.bitwiseOR(4096).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k.bitwiseAND(15), 2).cast("long").alias("shifted_left"),
        F.shiftright(k, 3).cast("long").alias("shifted_right"),
        F.bit_count(k).cast("long").alias("popcount"),
        k.bitwiseAND(k - 1).alias("clear_lowest"),
    ).orderBy("o_orderkey")


# ------------------- wave 23: higher-order function showcase

HOF_ORACLE = """
-- Higher-order array-function surface: transform / filter / exists /
-- forall / zip_with / aggregate over the embedding vector, each with
-- its DuckDB list_* twin — the API-parity query proving the lambda
-- surface matches (Spark HOFs run interpreted; everything here is a
-- single pass over a 64-element array per row, map-side). Floats are
-- per-row fixed chains under ROUND — no cross-row accumulation.
SELECT vec_id,
       len(list_filter(embedding, x -> x > 0.0)) AS n_positive,
       CASE WHEN list_bool_or(list_transform(embedding, x -> x > 0.25))
            THEN 1 ELSE 0 END AS any_above_quarter,
       CASE WHEN list_bool_and(list_transform(embedding, x -> abs(x) < 1.0))
            THEN 1 ELSE 0 END AS all_below_one,
       -- abs() INSIDE the transform: list_reduce seeds with the
       -- FIRST ELEMENT (unlike Spark's explicit 0.0 init), so any
       -- per-element map must happen before the fold
       ROUND(list_reduce(
               list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
               (acc, x) -> acc + x), 6) AS l1_norm,
       ROUND(list_reduce(
               list_transform(
                 list_zip(embedding, list_reverse(embedding)),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
               (acc, x) -> acc + x), 6) AS dot_with_reverse
FROM embeddings
ORDER BY vec_id
LIMIT 100
"""


@register("scalar_higher_order_funcs", oracle=HOF_ORACLE)
def scalar_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOF surface parity: filter/exists/forall/transform/zip_with/
    aggregate against DuckDB's list_* family (see oracle). All work
    is per-row over the 64-dim vector — map-side, no shuffle, one
    scan."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("e")
    )
    ed = F.transform(F.col("e"), lambda x: x.cast("double"))
    l1 = F.aggregate(ed, F.lit(0.0), lambda acc, x: acc + F.abs(x))
    dotrev = F.aggregate(
        F.zip_with(ed, F.reverse(ed), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        emb.select(
            "vec_id",
            F.size(F.filter(F.col("e"), lambda x: x > 0.0)).alias(
                "n_positive"
            ),
            F.exists(F.col("e"), lambda x: x > 0.25)
            .cast("int")
            .alias("any_above_quarter"),
            F.forall(F.col("e"), lambda x: F.abs(x) < 1.0)
            .cast("int")
            .alias("all_below_one"),
            F.round(l1, 6).alias("l1_norm"),
            F.round(dotrev, 6).alias("dot_with_reverse"),
        )
        .orderBy("vec_id")
        .limit(100)
    )
