"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``etl_data_ingestion_spark.plans.registry``: every
implemented operator from SURVEY.md §2 registers a builder
``(spark, sf_dir) -> DataFrame`` and, where ANSI-SQL-expressible, a
DuckDB oracle SQL string. See the registry module for parity rules.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from etl_data_ingestion_spark.plans import registry
from etl_data_ingestion_spark.session import tune_session

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    tune_session(spark)
    return registry.QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    # Dict order = driver verification order (the CORRECTNESS run
    # checks a fixed-size front window): never-verified queries first,
    # round-1 greens at the tail. See registry.CHECK_ORDER.
    return {name: wrap(registry.QUERIES[name]) for name in registry.check_ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; non-SQL-expressible ops are omitted
    (driver records a rows-only check for those)."""
    return {
        name: registry.ORACLES[name]
        for name in registry.check_ordered_names()
        if name in registry.ORACLES
    }
