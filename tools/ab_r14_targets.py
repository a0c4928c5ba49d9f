"""Round-14 optimization A/Bs: four independent probes, one harness.

Each probe times COLD query wall (builder + noop action, the bench
cold semantics: clearCache before every sample), samples interleaved
across arms so a host-contention burst poisons at most one sample per
arm per pass, and checks VALUES IDENTICAL (sorted collected rows)
before any timing. Usage:

    python tools/ab_r14_targets.py <probe> [rounds]   (AB_SF=dir)

ADJUDICATED (round 14, this host window, min-of-5 sf0.1 / min-of-4
sf1, values identical in every probe):
  curve  stock 2.52/2.52 -> fused 2.03/2.22 (sf0.1/sf1) — KEPT.
  ks     stock 0.97/1.18 -> fused 0.74/1.04, clean sweep both
         scales — KEPT.
  cc     stock 3.16/2.89 -> ccv2 2.39/2.12 -> ccv2_gate 2.48/1.94 —
         ccv2 KEPT, gate KEPT on the KEEP(sf1) rule (every gated
         sample beat every stock sample at sf1).
  tri    stock 4.49/5.36; gate 4.03/7.80 — the gate is +46% at sf1
         (the wedge family's downstream self-joins need AQE's
         runtime broadcast conversion at data scale): gate REJECTED
         for the wedge family, which bounds the r10/r11 gate device
         to eager multi-action composites. onex 4.51/4.82 — wash at
         sf0.1, -10% at sf1: KEPT on KEEP(sf1). gate_onex 4.23/7.79
         — rejected with the gate.

Probes:
  tri    graph_triangle_count: stock vs AQE-gated builder (the
         kcore/item_cf small_fact_aqe_gate, never isolated on the
         wedge family) vs single-exchange edge build (repartition(c)
         feeds distinct+window+self-join exchange-free; guide §2.4
         "two operations keyed the same way share one exchange") vs
         both.
  cc     dedup_end_to_end_canonical: stock vs fused CC loop (per
         round: localCheckpoint FIRST with a per-row chg flag, then
         the convergence check reads the MATERIALIZED rows — the
         stock loop runs the round's join twice: once for the
         changed-count action, once for the checkpoint) vs fused+AQE
         gate (guide §2.4/§1: fewer per-round stage-materialization
         job submissions).
  curve  pipeline_dedup_threshold_curve: stock (two aggregations +
         crossJoin over a persisted scored relation) vs single
         groupBy(doc_b) pre-aggregation feeding ONE global
         aggregation (scored becomes single-consumer: persist, the
         second aggregation pass, and the crossJoin all disappear).
  ks     quality_ks_drift_test: stock (the `tot` branch RE-SCANS
         events and re-runs the perval aggregation, then broadcast-
         joins totals back) vs window-fused (na/nb as whole-partition
         window sums over the same Exchange the CDF window already
         pays; one events scan instead of two — guide §2.4).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_data_ingestion_spark.catalog import load_table, small_fact_aqe_gate
from etl_data_ingestion_spark.plans import registry
from etl_data_ingestion_spark.session import get_spark

SF = os.environ.get("AB_SF", "/root/testdata/sf0.1")


# ------------------------------------------------------------------ tri

def edges_onex(spark: SparkSession, sf_dir: str):
    """Single-exchange edge build: repartition(c) up front;
    HashPartitioning(c) satisfies ClusteredDistribution for the
    (c,s) distinct AND the window AND both self-join sides, so the
    distinct exchange and the window exchange disappear."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_suppkey") < 1000)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .repartition(F.col("c"))
        .dropDuplicates(["c", "s"])
    )
    wcap = Window.partitionBy("c").orderBy("s")
    cs = (
        cs0.withColumn("rn", F.row_number().over(wcap))
        .filter(F.col("rn") <= 20)
        .select("c", "s")
    )
    a, b = cs.alias("a"), cs.alias("b")
    allpairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    cut = allpairs.agg(
        F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY shared)").alias("thr")
    )
    pairs = (
        allpairs.crossJoin(F.broadcast(cut))
        .filter(F.col("shared") >= F.col("thr"))
        .select("u", "v")
        .localCheckpoint()
    )
    return pairs


def triangle_from_pairs(pairs: DataFrame) -> DataFrame:
    deg = (
        pairs.unionByName(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .groupBy(F.col("u").alias("n"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = pairs.join(
        F.broadcast(deg.select(F.col("n").alias("u"), F.col("d").alias("du"))), "u"
    ).join(F.broadcast(deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))), "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).localCheckpoint()
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    tri = e1.join(e2, F.col("e2.a") == F.col("e1.b")).join(
        e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b"))
    )
    counts = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(pairs.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(counts)
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
        )
    )


def tri_onex(spark, sf_dir):
    return triangle_from_pairs(edges_onex(spark, sf_dir))


def _run_gated(spark, sf_dir, fn, table="lineitem"):
    with small_fact_aqe_gate(spark, sf_dir, table, scale_shuffle=True):
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()


def probe_tri(spark, rounds):
    stock = registry.QUERIES["graph_triangle_count"]
    arms = {
        "stock": lambda: stock(spark, SF).write.mode("overwrite").format("noop").save(),
        "gate": lambda: _run_gated(spark, SF, stock),
        "onex": lambda: tri_onex(spark, SF).write.mode("overwrite").format("noop").save(),
        "gate_onex": lambda: _run_gated(spark, SF, tri_onex),
    }
    vals = {
        "stock": sorted(tuple(r) for r in stock(spark, SF).collect()),
        "onex": sorted(tuple(r) for r in tri_onex(spark, SF).collect()),
    }
    print("values identical:", vals["stock"] == vals["onex"], vals["stock"])
    return arms


# ------------------------------------------------------------------- cc

def connected_components_v2(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_rounds: int = 50
) -> DataFrame:
    """Stock loop with the per-round double-compute removed: the
    round's join materializes ONCE via localCheckpoint (carrying a
    per-row chg flag), and the convergence check is a trivial
    filter+limit over the materialized rows instead of a second full
    execution of the round's join DAG."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_rounds):
        neighbor_min = (
            und.join(labels, und.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        nxt = labels.join(
            neighbor_min, labels.node == neighbor_min.a, "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
            (
                F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label")
            ).alias("chg"),
        )
        chk = nxt.localCheckpoint()
        labels = chk.select("node", "label")
        if chk.filter("chg").limit(1).count() == 0:
            converged = True
            break
    und.unpersist()
    if not converged:
        raise RuntimeError("connected_components_v2: no fixpoint")
    return labels


def end_to_end_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_ingestion_spark.functions.text import tokens, word_ngrams_from

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    seeded = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = (
        docs.select("doc_id", "text")
        .unionByName(
            seeded.select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" appended tail marker words")).alias(
                    "text"
                ),
            )
        )
        .unionByName(
            seeded.select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" appended tail marker words plus")
                ).alias("text"),
            )
        )
    )
    grams_all = (
        corpus.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", F.explode(word_ngrams_from("toks", 3)).alias("gram"))
        .distinct()
    )
    rare = (
        grams_all.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 50)
        .select("gram")
    )
    grams = grams_all.join(rare, "gram").localCheckpoint()
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.alias("ga")
    b = grams.alias("gb")
    common = (
        a.join(
            b,
            (F.col("ga.gram") == F.col("gb.gram"))
            & (F.col("ga.doc_id") < F.col("gb.doc_id")),
        )
        .groupBy(F.col("ga.doc_id").alias("doc_a"), F.col("gb.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")) >= 0.5)
        .select("doc_a", "doc_b")
    )
    comp = connected_components_v2(pairs)
    return (
        corpus.select("doc_id")
        .join(comp, corpus.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("canonical"),
        )
        .withColumn("kept", F.col("doc_id") == F.col("canonical"))
        .orderBy("doc_id")
    )


def probe_cc(spark, rounds):
    stock = registry.QUERIES["dedup_end_to_end_canonical"]
    arms = {
        "stock": lambda: stock(spark, SF).write.mode("overwrite").format("noop").save(),
        "ccv2": lambda: end_to_end_v2(spark, SF)
        .write.mode("overwrite")
        .format("noop")
        .save(),
        "ccv2_gate": lambda: _run_gated(spark, SF, end_to_end_v2, table="documents"),
    }
    vals = {
        "stock": sorted(tuple(r) for r in stock(spark, SF).collect()),
        "ccv2": sorted(tuple(r) for r in end_to_end_v2(spark, SF).collect()),
    }
    print("values identical:", vals["stock"] == vals["ccv2"], len(vals["stock"]))
    return arms


# ---------------------------------------------------------------- curve

def threshold_curve_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", parallel=False)
    base = docs.filter(F.col("doc_id") < 150).select("doc_id", "text")
    near = docs.filter((F.col("doc_id") < 150) & (F.col("doc_id") % 10 == 0)).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended tail marker words")).alias("text"),
    )
    corpus = base.unionByName(near).persist()
    toks = corpus.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= 3)
    grams_all = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 3),
                    lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, 3)),
                )
            )
        ).alias("gram"),
    ).distinct()
    keep = (
        grams_all.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 50)
        .select("gram")
    )
    grams = grams_all.join(F.broadcast(keep), "gram").persist()
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    b = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    pairs = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    thresholds = [0.3, 0.5, 0.7, 0.8, 0.9]
    scored = (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_b",
            (F.col("c") * 1.0 / (F.col("na") + F.col("nb") - F.col("c"))).alias("j"),
        )
    )
    lens = corpus.select(
        F.col("doc_id").alias("doc_b"), F.length("text").alias("nch")
    )
    # ONE doc_b-keyed pre-aggregation carries BOTH the per-threshold
    # pair counts (sum of per-doc counts == global count, exactly) and
    # the per-doc max j; scored becomes single-consumer (no persist),
    # the second global pass and the crossJoin disappear.
    per_b = (
        scored.groupBy("doc_b")
        .agg(
            *[
                F.sum(F.when(F.col("j") >= t, 1).otherwise(0)).alias(f"c{i}")
                for i, t in enumerate(thresholds)
            ],
            F.max("j").alias("jmax"),
        )
        .join(F.broadcast(lens), "doc_b")
    )
    agg = per_b.agg(
        *(
            [
                F.coalesce(F.sum(F.col(f"c{i}")), F.lit(0))
                .cast("long")
                .alias(f"np{i}")
                for i in range(len(thresholds))
            ]
            + [
                F.coalesce(
                    F.sum(F.when(F.col("jmax") >= t, 1).otherwise(0)), F.lit(0)
                )
                .cast("long")
                .alias(f"nr{i}")
                for i, t in enumerate(thresholds)
            ]
            + [
                F.coalesce(
                    F.sum(F.when(F.col("jmax") >= t, F.col("nch")).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"cs{i}")
                for i, t in enumerate(thresholds)
            ]
        )
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.col(f"np{i}").alias("n_pairs"),
                F.col(f"nr{i}").alias("n_docs_removed"),
                F.col(f"cs{i}").alias("chars_saved"),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.threshold", "r.n_pairs", "r.n_docs_removed", "r.chars_saved")
        .orderBy("threshold")
    )


def probe_curve(spark, rounds):
    stock = registry.QUERIES["pipeline_dedup_threshold_curve"]
    arms = {
        "stock": lambda: stock(spark, SF).write.mode("overwrite").format("noop").save(),
        "fused": lambda: threshold_curve_fused(spark, SF)
        .write.mode("overwrite")
        .format("noop")
        .save(),
    }
    vals = {
        "stock": sorted(tuple(r) for r in stock(spark, SF).collect()),
        "fused": sorted(tuple(r) for r in threshold_curve_fused(spark, SF).collect()),
    }
    print("values identical:", vals["stock"] == vals["fused"], vals["stock"])
    return arms


# ------------------------------------------------------------------- ks

def ks_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "value",
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1)
        .otherwise(0)
        .alias("in_a"),
    )
    perval = base.groupBy("event_type", "value").agg(
        F.sum("in_a").alias("ca"), F.sum(1 - F.col("in_a")).alias("cb")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = perval.select(
        "event_type",
        (F.sum("ca").over(wcum) * 1.0 / F.sum("ca").over(wall)).alias("fa"),
        (F.sum("cb").over(wcum) * 1.0 / F.sum("cb").over(wall)).alias("fb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    d = F.max(F.abs(F.col("fa") - F.col("fb")))
    crit = 1.358 * F.sqrt(
        (F.max("na") + F.max("nb")) * 1.0 / (F.max("na") * F.max("nb"))
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("na").cast("long").alias("n_early"),
            F.max("nb").cast("long").alias("n_late"),
            F.round(d, 6).alias("ks_d"),
            F.round(crit, 6).alias("crit_95"),
            (d > crit).alias("reject_95"),
        )
        .orderBy("event_type")
    )


def probe_ks(spark, rounds):
    stock = registry.QUERIES["quality_ks_drift_test"]
    arms = {
        "stock": lambda: stock(spark, SF).write.mode("overwrite").format("noop").save(),
        "fused": lambda: ks_fused(spark, SF)
        .write.mode("overwrite")
        .format("noop")
        .save(),
    }
    vals = {
        "stock": sorted(tuple(r) for r in stock(spark, SF).collect()),
        "fused": sorted(tuple(r) for r in ks_fused(spark, SF).collect()),
    }
    print("values identical:", vals["stock"] == vals["fused"])
    if vals["stock"] != vals["fused"]:
        print("stock:", vals["stock"][:3])
        print("fused:", vals["fused"][:3])
    return arms


PROBES = {"tri": probe_tri, "cc": probe_cc, "curve": probe_curve, "ks": probe_ks}


def main() -> None:
    probe = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    registry.load_all()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(4).write.mode("overwrite").format("noop").save()
    arms = PROBES[probe](spark, rounds)
    spark.catalog.clearCache()
    # one untimed warm pass per arm (codegen/broadcast-thread setup)
    for fn in arms.values():
        spark.catalog.clearCache()
        fn()
    res = {t: [] for t in arms}
    for _ in range(rounds):
        for tag, fn in arms.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            res[tag].append(time.perf_counter() - t0)
    for tag in arms:
        print(
            f"{tag}: min={min(res[tag]):.3f} all={[round(x, 3) for x in res[tag]]}"
        )


if __name__ == "__main__":
    main()
