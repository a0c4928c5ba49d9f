"""Table catalog over a scale-factor directory of parquet files.

The driver fixtures live at /root/testdata/sf{0.001,0.01,0.1}/ with one
parquet file per table (TESTDATA.md). At 100 TB each "file" would be a
partitioned parquet/iceberg dataset; nothing here assumes single-file
inputs — ``spark.read.parquet`` takes directories just as happily.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Projection/predicate pushdown is Catalyst's job —
    callers express filters/selects declaratively and the parquet reader
    receives them (verify via .explain: PushedFilters / ReadSchema).

    events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as long (legacy nanosAsLong) and convert to
    a microsecond timestamp — the same ns→us truncation DuckDB applies,
    so oracle comparisons agree.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        import pyspark.sql.functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


class Catalog:
    """Lazy per-session table accessor: ``cat.lineitem`` -> DataFrame."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return load_table(self._spark, self._sf_dir, name)

    def register_temp_views(self) -> None:
        """Register every table as a temp view for the SQL API surface."""
        for name in TABLES:
            load_table(self._spark, self._sf_dir, name).createOrReplaceTempView(name)
