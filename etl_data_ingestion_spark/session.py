"""SparkSession factory.

Defaults are chosen for correctness-parity with the DuckDB oracle and
for scale-readiness:

- UTC session timezone: Spark TIMESTAMP is session-TZ-adjusted while
  parquet NTZ / DuckDB timestamps are naive; pinning UTC makes the two
  agree byte-for-byte.
- AQE on (coalesce partitions, skew-join handling): at 100 TB the
  static shuffle-partition number is always wrong for some stage; AQE
  re-plans from runtime statistics.
- `timeParserPolicy=CORRECTED`: strict `yyyy-MM-dd` parsing, matching
  the reference's strptime('%Y-%m-%d') (reference main.py:400-410).
- ANSI off: the ingestion path relies on cast-failure -> NULL plus
  explicit validity flags (SURVEY.md §7.4); we never want a mid-job
  exception from a malformed source value at scale.
- Arrow on: every pandas_udf / applyInPandas transfer is vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl_data_ingestion_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst / advisoryPartitionSizeInBytes stay at
        # defaults: a round-3 interleaved A/B (8 queries x 4 rounds at
        # sf0.1) measured parallelismFirst=false + 32m advisory ~10%
        # SLOWER across the board — at this scale 32 short tasks beat
        # fewer bigger ones; at cluster scale AQE's data-sized
        # coalescing matters and the defaults already provide it.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer in fewer, larger batches: pandas-UDF stages
        # (minhash signatures, IVF assignment) pay per-batch Python
        # dispatch; 64k rows/batch measured marginally faster than the
        # 10k default at bounded memory (widest UDF row: 32-int sig).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Scan-parallelism floor for opt-in CPU-heavy operators
        # (catalog.py::_with_scan_parallelism, load_table(...,
        # parallel=True)): the fixture parquet is small enough that
        # Spark plans 1-2 scan tasks, serializing interpreted-HOF
        # work (measured: 8-gram build at sf1 146s on 1 task vs 12s
        # on 32). A BLANKET floor was A/B'd and rejected (the extra
        # Exchange defeats map-side combine: q1 0.49→0.93s at
        # sf0.1); only flagged call sites repartition. Vanilla
        # driver sessions lack this conf entirely → stock plans.
        .config("spark.etl.scan.minPartitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on Spark's Python workers.

    An external driver (the verify harness, a notebook, spark-submit)
    may import us from a path its executors' Python workers don't
    share. addPyFile-ing a zip of the package ships it through Spark's
    own file distribution, which works identically on a real cluster.
    Idempotent per session.
    """
    import shutil
    import tempfile

    if getattr(spark, "_etl_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staging = tempfile.mkdtemp(prefix="etl_pkg_")
    zip_base = os.path.join(staging, "etl_data_ingestion_spark")
    archive = shutil.make_archive(
        zip_base, "zip", root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir),
    )
    spark.sparkContext.addPyFile(archive)
    spark._etl_pkg_shipped = True


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an externally-created session.

    The driver hands us its own SparkSession; these confs are the
    runtime-settable subset of ``get_spark``'s defaults that correctness
    depends on (timezone for oracle parity, non-ANSI casts for the
    coercion path, strict date parsing).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.timeParserPolicy", "CORRECTED")
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.maxRecordsPerBatch", "65536"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on some builds; defaults still correct
    ship_package(spark)
    return spark
