"""TPC-H q4/q12/q21 over DERIVED lineitem date/shipmode columns.

The driver fixtures ship no l_commitdate / l_receiptdate / l_shipmode,
which blocked these three shapes through round 2 (VERDICT r02 "What's
missing" #3). Same unblock as tpch_partsupp.py: derive the missing
columns deterministically from columns the fixtures DO pin, with the
identical arithmetic in the DuckDB oracle CTE, so both engines see the
same extended lineitem and the oracle checks the full query shape
(EXISTS decorrelation, two-sided date predicates, the q21
EXISTS/NOT-EXISTS double correlation) with zero fixture luck.

Derivation contract (mirrored in every oracle's CTE):
    l_commitdate  = date(l_shipdate) + ((l_orderkey*3 + l_linenumber*7) % 61 - 30)   # ship-30 .. ship+30
    l_receiptdate = date(l_shipdate) + ((l_orderkey*5 + l_linenumber*11) % 30 + 1)   # ship+1 .. ship+30
    l_shipmode    = 7-value code from (l_orderkey*13 + l_linenumber*17) % 7

Reference parity: the reference (main.py) delegates all analytics to
BigQuery; these queries are part of the §2.5 in-housed analytics layer.

Scale note: the derivation is three codegen'd projections on the
lineitem scan — no shuffle, no UDF. The q21 double-correlation is
decorrelated into ONE grouped aggregate over lineitem (distinct
suppliers + distinct late suppliers per order) joined back on
l_orderkey — two shuffles total at any scale, vs the naive
self-join-twice plan's three.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.plans.registry import register

SHIP_MODES = ("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")

LINEITEM_EXT_CTE = """
lineitem_ext AS (
  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_returnflag, l_linestatus,
         CAST(l_shipdate AS DATE) AS l_shipdate,
         CAST(l_shipdate AS DATE)
           + CAST((l_orderkey*3 + l_linenumber*7) % 61 - 30 AS INTEGER)
           AS l_commitdate,
         CAST(l_shipdate AS DATE)
           + CAST((l_orderkey*5 + l_linenumber*11) % 30 + 1 AS INTEGER)
           AS l_receiptdate,
         CASE (l_orderkey*13 + l_linenumber*17) % 7
           WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL'
           WHEN 3 THEN 'SHIP' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL'
           ELSE 'FOB' END AS l_shipmode
  FROM lineitem
)
"""


def _mode_expr(idx: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(m) for m in SHIP_MODES]), (idx + 1).cast("int")
    )


def derived_lineitem_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem + derived commit/receipt dates and shipmode (see module
    docstring for the contract). Pure projections — stays inside
    whole-stage codegen on top of the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    ship = F.col("l_shipdate").cast("date")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    return (
        li.withColumn("l_shipdate", ship)
        .withColumn(
            "l_commitdate",
            F.date_add(F.col("l_shipdate"), ((ok * 3 + ln * 7) % 61 - 30).cast("int")),
        )
        .withColumn(
            "l_receiptdate",
            F.date_add(F.col("l_shipdate"), ((ok * 5 + ln * 11) % 30 + 1).cast("int")),
        )
        .withColumn("l_shipmode", _mode_expr((ok * 13 + ln * 17) % 7))
    )


Q4_ORACLE = f"""
WITH {LINEITEM_EXT_CTE.strip()}
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem_ext
              WHERE l_orderkey = o_orderkey
                AND l_commitdate < l_receiptdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("tpch_q4_order_priority", oracle=Q4_ORACLE)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS over late
    lineitems = left-semi join on l_orderkey. The quarter filter prunes
    orders before the shuffle; the semi join keeps only the 8-byte key
    from the probe side."""
    li = derived_lineitem_ext(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    late_keys = li.filter(F.col("l_commitdate") < F.col("l_receiptdate")).select(
        "l_orderkey"
    )
    quarter = orders.filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-10-01").cast("date"))
    )
    return (
        quarter.join(late_keys, quarter.o_orderkey == late_keys.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q12_ORACLE = f"""
WITH {LINEITEM_EXT_CTE.strip()}
SELECT l_shipmode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem_ext ON o_orderkey = l_orderkey
WHERE l_shipmode IN ('MAIL', 'SHIP')
  AND l_commitdate < l_receiptdate
  AND l_shipdate < l_commitdate
  AND l_receiptdate >= DATE '1996-01-01'
  AND l_receiptdate < DATE '1997-01-01'
GROUP BY l_shipmode
ORDER BY l_shipmode
"""


@register("tpch_q12_shipmode_priority", oracle=Q12_ORACLE)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes vs priority): all four lineitem
    predicates evaluate on the scan (derived columns are projections,
    so the filter sits directly above the parquet read); the surviving
    sliver joins orders, then a two-arm conditional count."""
    li = derived_lineitem_ext(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    lanes = li.filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_receiptdate") < F.lit("1997-01-01").cast("date"))
    ).select("l_orderkey", "l_shipmode")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lanes.join(orders, lanes.l_orderkey == orders.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q21_ORACLE = f"""
WITH {LINEITEM_EXT_CTE.strip()}
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem_ext l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_receiptdate > l1.l_commitdate
  AND EXISTS (SELECT 1 FROM lineitem_ext l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem_ext l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_receiptdate > l3.l_commitdate)
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_3'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register("tpch_q21_waiting_supplier", oracle=Q21_ORACLE)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS/NOT-EXISTS pair decorrelates into ONE grouped aggregate per
    order — n_supp = distinct suppliers, n_late_supp = distinct
    suppliers with a late line. A late l1 row qualifies iff the order
    has another supplier (n_supp >= 2) and l1's supplier is the only
    late one (n_late_supp = 1). One lineitem re-aggregation + one join
    back on l_orderkey instead of two self-joins."""
    li = derived_lineitem_ext(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    late = F.col("l_receiptdate") > F.col("l_commitdate")
    order_stats = li.groupBy(F.col("l_orderkey").alias("os_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    l1 = li.filter(late).select("l_orderkey", "l_suppkey")
    target_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        l1.join(
            order_stats,
            (l1.l_orderkey == order_stats.os_orderkey)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1),
        )
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            l1.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(target_supp), l1.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
