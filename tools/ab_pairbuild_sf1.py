"""Adjudicate basket-pair vs self-join edge builds at sf0.1 AND sf1.

Both forms produce the identical DISTINCT (s1<s2) supplier
co-purchase pair set; the question is purely physical: at toy scale
AQE broadcast-converts the self-join (no fact Exchange), while the
basket groupBy always pays one fact Exchange — but a broadcast of the
fact side is impossible at cluster scale, where the self-join costs
TWO fact Exchanges vs the basket's one. In-session interleaved
min-of-N of a count() over each pair build.

Usage: python tools/ab_pairbuild_sf1.py [rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.session import get_spark


def selfjoin_pairs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem", parallel=False).select(
        "l_orderkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("s1"), F.col("b.l_suppkey").alias("s2"))
        .distinct()
    )


def basket_pairs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem", parallel=False).select(
        "l_orderkey", "l_suppkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("supps")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("supps"),
            lambda x, i: F.transform(
                F.slice(F.col("supps"), i + F.lit(2), F.size(F.col("supps"))),
                lambda y: F.struct(x.alias("s1"), y.alias("s2")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
        .distinct()
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark()
    spark.range(4).write.mode("overwrite").format("noop").save()
    for sf_dir in ("/root/testdata/sf0.1", "/root/repo/.scaledata/sf1"):
        res = {"selfjoin": [], "basket": []}
        for i in range(rounds):
            for tag, fn in (("selfjoin", selfjoin_pairs), ("basket", basket_pairs)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                res[tag].append(time.perf_counter() - t0)
        print(
            f"{sf_dir}: selfjoin_min={min(res['selfjoin']):.2f} "
            f"basket_min={min(res['basket']):.2f} "
            f"selfjoin={[round(x, 2) for x in res['selfjoin']]} "
            f"basket={[round(x, 2) for x in res['basket']]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
