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


# Multiset (bag) inputs WITH duplicates — the customer splits above
# are key-unique, so ALL vs DISTINCT semantics would be
# indistinguishable on them. Supplier keys repeat freely in lineitem.
INTERSECT_ALL_ORACLE = """
WITH isect AS (
  SELECT l_suppkey FROM lineitem WHERE l_quantity < 10
  INTERSECT ALL
  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT l_suppkey, COUNT(*) AS multiplicity
FROM isect GROUP BY l_suppkey
"""


@register("setop_intersect_all", oracle=INTERSECT_ALL_ORACLE)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: each key survives
    min(count_left, count_right) times — the version that preserves
    multiplicity for reconciliation/audit queries). Spark plans
    intersectAll as one aggregate per side + a join on the full row —
    no row explosion, multiplicities meet at the shuffle. Output is
    the surviving multiplicity histogram per key."""
    li = load_table(spark, sf_dir, "lineitem")
    low = li.filter(F.col("l_quantity") < 10).select("l_suppkey")
    ret = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return (
        low.intersectAll(ret)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )


EXCEPT_ALL_ORACLE = """
WITH diff AS (
  -- right side is a strict subset of the left so the multiset
  -- subtraction leaves positive remainders (count_l - count_r) —
  -- an unrelated right side drowned every key to zero rows
  SELECT l_suppkey FROM lineitem WHERE l_quantity < 10
  EXCEPT ALL
  SELECT l_suppkey FROM lineitem WHERE l_quantity < 10 AND l_returnflag = 'R'
)
SELECT l_suppkey, COUNT(*) AS multiplicity
FROM diff GROUP BY l_suppkey
"""


@register("setop_except_all", oracle=EXCEPT_ALL_ORACLE)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics: each key survives
    max(0, count_left - count_right) times — multiset subtraction,
    the reconciliation primitive for 'what arrived that wasn't
    acknowledged'). Same plan shape as intersectAll: per-side
    aggregates meet at one shuffle, never row-by-row."""
    li = load_table(spark, sf_dir, "lineitem")
    low = li.filter(F.col("l_quantity") < 10).select("l_suppkey")
    ret = li.filter(
        (F.col("l_quantity") < 10) & (F.col("l_returnflag") == "R")
    ).select("l_suppkey")
    return (
        low.exceptAll(ret)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )
