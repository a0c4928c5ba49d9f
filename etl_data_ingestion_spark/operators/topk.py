"""Sort / limit / top-k operators (SURVEY.md §2.5).

orderBy().limit(k) compiles to TakeOrderedAndProject: each partition
keeps its local top-k heap and only k rows per partition reach the
driver-side merge — a 100 TB sort never happens.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.plans.registry import register

TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
"""


@register("topk_orders_by_price", oracle=TOPK_ORACLE)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice")
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


SORTED_ORACLE = """
SELECT n_name, n_nationkey
FROM nation
ORDER BY n_name DESC
"""


@register("sort_global_nation", oracle=SORTED_ORACLE)
def sort_global_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full global sort — fine for dimension tables; for facts, Spark
    range-partitions (sampling pass) so output stays distributed."""
    return (
        load_table(spark, sf_dir, "nation")
        .select("n_name", "n_nationkey")
        .orderBy(F.desc("n_name"))
    )
