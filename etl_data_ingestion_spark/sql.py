"""ANSI-SQL entry point: the interface reference users actually have.

The reference delegates all analytics to BigQuery SQL after load
(README.md:3); a user switching to this engine keeps writing SQL —
``register_tables`` exposes the catalog as temp views and ``run_sql``
executes any ANSI query through Catalyst (same optimizer, same plans
as the DataFrame API — spark.sql and DataFrame ops compile to the
same logical plan language).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_data_ingestion_spark.catalog import TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Expose every catalog table as a temp view named after itself.
    Views are lazy — no data is read until a query runs, and pushdown
    still reaches the parquet scans through the view."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run one ANSI SQL query against the catalog at sf_dir."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
