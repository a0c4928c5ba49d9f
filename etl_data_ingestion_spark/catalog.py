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

    events.ts normalizes to TimestampType (LTZ) whatever the fixture
    writer produced: older fixtures carry parquet TIMESTAMP(NANOS)
    (unreadable by the vectorized reader — read as long via legacy
    nanosAsLong, truncate ns→us exactly like DuckDB does), newer ones
    read natively as TIMESTAMP_NTZ. The session timezone is pinned UTC
    (session.py) so NTZ→LTZ is an identity on the values, and
    ``withWatermark`` — which rejects NTZ event time — works on the
    same column the batch oracles check. The cast is only
    value-preserving under UTC, so a non-UTC session fails loudly here
    rather than silently shifting every timestamp off the oracle.

    Pushdown exception: because ``ts`` is a derived column (withColumn
    cast), filters on it are evaluated post-scan, NOT pushed to the
    parquet reader — unlike every other table/column, where
    declarative filters reach the scan (PushedFilters in .explain).
    At scale, ts-range queries should rely on directory-level time
    partitioning (see operators/sources_scan.py's partitioned layout
    writer) for pruning instead of row-group predicate pushdown.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        import pyspark.sql.functions as F

        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise RuntimeError(
                f"events.ts normalization requires spark.sql.session.timeZone"
                f"=UTC (got {tz!r}); run session.tune_session(spark) first — "
                "a non-UTC session would shift ts values away from the oracle"
            )
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
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
