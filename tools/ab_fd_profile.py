"""quality_functional_dependencies fusion probe (r13 verdict item
2: 1.62s / 21.3x, the worst extended ratio with no committed floor
row). Stock plan: 4 FDs = 4 scans + 4 independent count-distinct
aggregation pipelines (each with its own pair of exchanges).

Fused variant: ONE lineitem scan projected to the 4 needed columns,
repartitioned by l_orderkey and persisted — HashPartitioning
(l_orderkey) satisfies ClusteredDistribution for BOTH lineitem FDs'
aggregation keys ({l_orderkey} and {l_orderkey, l_linenumber}) and
for the (LHS, RHS)-keyed first level of the count-distinct rewrite,
so both FD pipelines run exchange-free over the cache. Orders gets
ONE projected persist (its two FDs key on disjoint columns —
o_orderkey vs o_custkey — so their exchanges are irreducible; the
scan is not).

A second arm (fused_nocache) drops the persist to isolate how much
is scan-dedup vs exchange-dedup.

In-session interleaved min-of-N, value check first. Usage:
python tools/ab_fd_profile.py [rounds]   (AB_SF overrides sf dir)

ADJUDICATED (r14): the collect_set form is the registry plan
("stock" below now IS it). Measured and kept/rejected:
- cset (KEPT): sf1 3.29 -> 1.94s min-of-4, every sample winning;
  sf0.1 wash (1.43 vs 1.53) -> KEEP(sf1).
- repartition-by-l_orderkey fusion (REJECTED): serializes the four
  pipelines behind one exchange; sf1 2.85 vs 2.31, sf0.1 1.20 vs
  1.01.
- scan fan-out alone (REJECTED): sf0.1 2.17 vs 1.43.
- cset + fan-out (REJECTED in a 6-round interleaved follow-up):
  sf0.1 1.92 vs 1.74, sf1 2.44 vs 2.12 — the plain columnar scans
  are not the HOF class fan-out helps.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.plans import registry
from etl_data_ingestion_spark.session import get_spark

SF = os.environ.get("AB_SF", "/root/testdata/sf0.1")


def _profile(df, name, lhs, rhs):
    v = F.col("v")
    return (
        df.groupBy(*lhs)
        .agg(F.count_distinct(F.col(rhs)).alias("v"))
        .agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(v > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violations"),
            F.max(v).cast("long").alias("max_rhs_variants"),
        )
        .select(
            "fd", "n_groups", "n_violations", "max_rhs_variants",
            F.when(F.col("n_violations") == 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("holds"),
        )
    )


def fd_fused(spark, sf_dir, cache=True):
    od = load_table(spark, sf_dir, "orders", parallel=False).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem", parallel=False)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .repartition(F.col("l_orderkey"))
    )
    if cache:
        od = od.persist()
        li = li.persist()
    out = (
        _profile(od, "o_orderkey->o_custkey", ["o_orderkey"], "o_custkey")
        .unionByName(
            _profile(
                li, "l_orderkey->l_suppkey", ["l_orderkey"], "l_suppkey"
            )
        )
        .unionByName(
            _profile(
                od,
                "o_custkey->o_orderpriority",
                ["o_custkey"],
                "o_orderpriority",
            )
        )
        .unionByName(
            _profile(
                li,
                "l_orderkey,l_linenumber->l_partkey",
                ["l_orderkey", "l_linenumber"],
                "l_partkey",
            )
        )
    )
    return out.orderBy("fd")


def _profile_cs(df, name, lhs, rhs):
    """Single-exchange form: size(collect_set(rhs)) per LHS group —
    one LHS-keyed exchange carrying (LHS, partial set) instead of
    count_distinct's two-level rewrite. Per-group sets are the FD's
    distinct RHS variants (small when the FD nearly holds)."""
    v = F.col("v")
    return (
        df.groupBy(*lhs)
        .agg(F.size(F.collect_set(F.col(rhs))).alias("v"))
        .agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(v > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violations"),
            F.max(v).cast("long").alias("max_rhs_variants"),
        )
        .select(
            "fd", "n_groups", "n_violations", "max_rhs_variants",
            F.when(F.col("n_violations") == 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("holds"),
        )
    )


def fd_variant(spark, sf_dir, parallel=False, prof=_profile):
    od = load_table(spark, sf_dir, "orders", parallel=parallel)
    li = load_table(spark, sf_dir, "lineitem", parallel=parallel)
    out = (
        prof(od, "o_orderkey->o_custkey", ["o_orderkey"], "o_custkey")
        .unionByName(
            prof(li, "l_orderkey->l_suppkey", ["l_orderkey"], "l_suppkey")
        )
        .unionByName(
            prof(
                od,
                "o_custkey->o_orderpriority",
                ["o_custkey"],
                "o_orderpriority",
            )
        )
        .unionByName(
            prof(
                li,
                "l_orderkey,l_linenumber->l_partkey",
                ["l_orderkey", "l_linenumber"],
                "l_partkey",
            )
        )
    )
    return out.orderBy("fd")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    registry.load_all()
    spark = get_spark()
    spark.range(4).write.mode("overwrite").format("noop").save()
    arms = {
        "stock": registry.QUERIES["quality_functional_dependencies"],
        "fused": fd_fused,
        "fanout": lambda s, d: fd_variant(s, d, parallel=True),
        "cset": lambda s, d: fd_variant(s, d, prof=_profile_cs),
        "cset_fan": lambda s, d: fd_variant(
            s, d, parallel=True, prof=_profile_cs
        ),
    }
    rows = {}
    for tag, fn in arms.items():
        rows[tag] = sorted(tuple(r) for r in fn(spark, SF).collect())
        spark.catalog.clearCache()
    base = rows["stock"]
    print("values identical:", all(v == base for v in rows.values()))
    if rows["stock"] != rows["fused"]:
        print("stock:", rows["stock"])
        print("fused:", rows["fused"])
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
