"""Set operators (SURVEY.md §2.5): union / intersect / except with
both ALL and DISTINCT semantics."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.plans.registry import register


def _splits(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    big = cust.filter(F.col("c_acctbal") >= 5000).select("c_custkey", "c_mktsegment")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_mktsegment"
    )
    return big, building


UNION_ORACLE = """
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal >= 5000
UNION ALL
SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey, c_mktsegment
"""


@register("setop_union_all", oracle=UNION_ORACLE)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL is a zero-shuffle concatenation of partitions —
    unionByName avoids silent positional-column bugs."""
    big, building = _splits(spark, sf_dir)
    return big.unionByName(building)


INTERSECT_ORACLE = """
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal >= 5000
INTERSECT
SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey
"""


@register("setop_intersect", oracle=INTERSECT_ORACLE)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    big, building = _splits(spark, sf_dir)
    return big.intersect(building)


EXCEPT_ORACLE = """
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal >= 5000
EXCEPT
SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey
"""


@register("setop_except", oracle=EXCEPT_ORACLE)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    big, building = _splits(spark, sf_dir)
    return big.exceptAll(building).distinct()


UNION_DISTINCT_ORACLE = """
SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal >= 5000
UNION
SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey
"""


@register("setop_union_distinct", oracle=UNION_DISTINCT_ORACLE)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT = union + dedup shuffle; prefer UNION ALL when
    inputs are disjoint by construction."""
    big, building = _splits(spark, sf_dir)
    return big.unionByName(building).distinct()
