"""item_cf pair-Exchange narrowing probe (r12 verdict item 2): the
floor table pins 1.79s of item_cf's 2.01s as compute-over-floor in
the 3M-row (pa, pb) pair Exchange. This A/B packs each pair into ONE
long BEFORE the shuffle — shiftleft(pa,32)|pb — so the exchange
carries a single 8-byte key instead of a two-long row, the partial
hash-agg hashes one column, and the explode emits primitive longs
instead of structs. Unpack is two bit ops after the c_ab>=2 filter
(row count there is tiny). Bound: partkey < 2^31 (sf1 max 199,999;
the struct form is the documented fallback past that).

In-session interleaved min-of-N, stock vs packed, bench protocol.
Usage: python tools/ab_itemcf_pack.py [rounds]   (AB_SF env for dir)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from etl_data_ingestion_spark.catalog import load_table, small_fact_aqe_gate
from etl_data_ingestion_spark.plans import registry
from etl_data_ingestion_spark.session import get_spark

SF = os.environ.get("AB_SF", "/root/testdata/sf0.1")


def item_cf_packed(spark, sf_dir):
    """ml_item_item_cf with the pair key packed into one long before
    the Exchange (everything else byte-identical to the stock plan)."""
    with small_fact_aqe_gate(spark, sf_dir, "lineitem", scale_shuffle=True):
        li = load_table(spark, sf_dir, "lineitem")
        baskets = (
            li.groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
            .persist()
        )
        item = (
            baskets.select(F.explode("parts").alias("l_partkey"))
            .groupBy("l_partkey")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        pair_arr = F.flatten(
            F.transform(
                F.col("parts"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("parts"),
                        i + F.lit(2),
                        F.size(F.col("parts")),
                    ),
                    lambda y: F.shiftleft(x, 32) + y,
                ),
            )
        )
        pair = (
            baskets.select(F.explode(pair_arr).alias("pk"))
            .groupBy("pk")
            .agg(F.count(F.lit(1)).alias("c_ab"))
            .filter(F.col("c_ab") >= 2)
            .select(
                F.shiftright(F.col("pk"), 32).alias("pa"),
                F.col("pk").bitwiseAND(F.lit(4294967295)).alias("pb"),
                "c_ab",
            )
        )
        scored = (
            pair.join(
                item.select(
                    F.col("l_partkey").alias("pa"), F.col("c").alias("ca")
                ),
                "pa",
            )
            .join(
                item.select(
                    F.col("l_partkey").alias("pb"), F.col("c").alias("cb")
                ),
                "pb",
            )
            .select(
                F.col("pa").alias("part_a"),
                F.col("pb").alias("part_b"),
                F.col("c_ab").cast("long").alias("co_orders"),
                F.col("ca").cast("long").alias("n_a"),
                F.col("cb").cast("long").alias("n_b"),
                (
                    F.floor(
                        F.col("c_ab")
                        / F.sqrt(F.col("ca") * 1.0 * F.col("cb"))
                        * 1000000
                        + F.lit(0.5)
                    )
                    / 1000000
                ).alias("cosine"),
            )
        )
        top = scored.orderBy(
            F.col("cosine").desc(), "part_a", "part_b"
        ).limit(20).persist()
        top.count()
        baskets.unpersist()
    return top


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    registry.load_all()
    spark = get_spark()
    spark.range(4).write.mode("overwrite").format("noop").save()
    arms = {
        "stock": registry.QUERIES["ml_item_item_cf"],
        "packed": item_cf_packed,
    }
    # value check first: identical 20 rows
    rows = {
        tag: [tuple(r) for r in fn(spark, SF).collect()]
        for tag, fn in arms.items()
    }
    print("values identical:", rows["stock"] == rows["packed"])
    res = {t: [] for t in arms}
    for _ in range(rounds):
        for tag, fn in arms.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF).write.mode("overwrite").format("noop").save()
            res[tag].append(time.perf_counter() - t0)
    for tag in arms:
        print(
            f"{tag}: min={min(res[tag]):.2f} "
            f"all={[round(x, 2) for x in res[tag]]}"
        )


if __name__ == "__main__":
    main()
