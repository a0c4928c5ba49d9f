"""UDF/UDAF surface: Arrow-batched pandas UDFs (SURVEY.md §2.5).

The hot path stays JVM-side everywhere else in this engine; these
queries exist to exercise the python-interop surface itself — scalar
``pandas_udf`` (vectorized, Arrow batch transfer), grouped
``applyInPandas`` (UDAF), and ``mapInPandas`` (batch iterator) — each
with a DuckDB oracle proving the Arrow round-trip is lossless.

Determinism notes: money truncation uses FLOOR(x·100)/100 — floor on
bit-identical doubles is engine-stable, unlike ROUND at a decimal
boundary. Group aggregates are reduced in pandas with float64 sums on
few groups; results rounded at 2dp on both sides.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.plans.registry import register

PANDAS_SCALAR_ORACLE = """
SELECT l_orderkey, l_linenumber,
       FLOOR(l_extendedprice * (1 - l_discount) * 100) / 100 AS net_trunc
FROM lineitem
WHERE l_orderkey < 1000
ORDER BY l_orderkey, l_linenumber
"""


@register("pandas_scalar_net_value", oracle=PANDAS_SCALAR_ORACLE)
def pandas_scalar_net_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: vectorized net-value computation over Arrow
    batches. IEEE doubles are bit-identical to the JVM/DuckDB result,
    so the oracle checks the Arrow transfer end-to-end."""
    import numpy as np

    @pandas_udf("double")
    def net_trunc(price: pd.Series, discount: pd.Series) -> pd.Series:
        return np.floor(price * (1 - discount) * 100) / 100

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_trunc("l_extendedprice", "l_discount").alias("net_trunc"),
    )


GROUPED_UDAF_ORACLE = """
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 2)
         AS qty_weighted_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("pandas_grouped_weighted_avg", oracle=GROUPED_UDAF_ORACLE)
def pandas_grouped_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped UDAF via applyInPandas: quantity-weighted average price
    per return flag. The groupBy shuffles once on the key; each group
    reduces inside a single Arrow batch. (For a skewed key at 100 TB,
    pre-aggregate the two sums JVM-side instead — this query is the
    interop check, not the recommended plan.)"""

    def weighted(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf["l_quantity"].sum()
        v = (pdf["l_extendedprice"] * pdf["l_quantity"]).sum()
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "qty_weighted_price": [round(v / w, 2)],
            }
        )

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_extendedprice", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(weighted, "l_returnflag string, qty_weighted_price double")
    )


MAP_BATCH_ORACLE = """
SELECT doc_id,
       CAST(LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(LENGTH(text) AS BIGINT) AS n_chars
FROM documents
WHERE TRIM(text) <> ''
ORDER BY doc_id
"""


@register("pandas_map_batches_tokens", oracle=MAP_BATCH_ORACLE)
def pandas_map_batches_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas batch iterator: per-document token/char counts
    computed in pandas string ops. Python str.split() ≡ regex \\s+ on
    trimmed non-empty text, so the SQL oracle reproduces it exactly.
    Batch shape (iterator of DataFrames) is the same plumbing the
    multimodal decode operators use."""

    def stats(batches):
        for pdf in batches:
            t = pdf["text"].str.strip()
            mask = t != ""
            pdf = pdf[mask]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": t[mask].str.split().str.len().astype("int64"),
                    "n_chars": pdf["text"].str.len().astype("int64"),
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(
        stats, "doc_id long, n_tokens long, n_chars long"
    )
