"""dedup_repeated_lines_corpus rewrite probe (r12 verdict item 3):
the stock plan persists the corpus-sized posexplode and re-aggregates
ALL exploded lines back to docs (collect_list of structs +
array_sort) — the doc-side Exchange carries every line in the corpus.
The variant drops by VALUE instead of by position: the boiler set
(lines in >= 3 docs) joins the exploded relation INNER, so only the
boiler HITS shuffle to the per-doc drop-set aggregation; reassembly
is then a map-side F.filter over the doc's own line array (order
preserved for free — no struct sort), with n_lines/n_kept/cleaned all
computed from arrays. Per-doc drop sets are small (boilerplate lines
per doc), so the doc join's build side is doc-count rows of short
arrays — AQE broadcasts it at fixture scale.

In-session interleaved min-of-N, stock vs fused, bench protocol;
value check first. Usage: python tools/ab_repeated_lines.py [rounds]
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


def repeated_lines_fused(spark, sf_dir, parallel=False):
    docs = load_table(spark, sf_dir, "documents", parallel=parallel)
    ts = F.split(F.trim(F.col("text")), r"\s+")
    n_lines = F.ceil(F.size(ts) / F.lit(3.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(F.slice(ts, i * 3 + 1, 3), " "),
    )
    # one row per doc — same bytes as the text; the interpreted
    # line-building HOF runs once here, both consumers derive
    docs_lines = docs.select("doc_id", lines.alias("lines")).persist()
    ex = docs_lines.select("doc_id", F.explode("lines").alias("line"))
    boiler = (
        ex.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 3)
        .select("line")
    )
    drops = (
        ex.join(F.broadcast(boiler), "line")
        .groupBy("doc_id")
        .agg(F.collect_set("line").alias("drops"))
    )
    d = F.coalesce(F.col("drops"), F.array().cast("array<string>"))
    surv = F.filter(
        F.col("lines"), lambda x: ~F.array_contains(d, x)
    )
    out = (
        docs_lines.join(drops, "doc_id", "left")
        .select(
            "doc_id",
            F.size("lines").cast("long").alias("n_lines"),
            F.size(surv).cast("long").alias("n_kept"),
            F.length(F.array_join(surv, " "))
            .cast("long")
            .alias("cleaned_len"),
        )
    )
    return out


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    registry.load_all()
    spark = get_spark()
    spark.range(4).write.mode("overwrite").format("noop").save()
    def stock_fanout(spark, sf_dir):
        """Stock plan but with the per-row line-building HOF fanned
        out (parallel=True — the r11 KEEP family: interpreted
        regex/HOF over documents)."""
        import etl_data_ingestion_spark.operators.corpus as corpus_mod
        from etl_data_ingestion_spark import catalog

        orig = catalog.load_table

        def patched(spark_, sf_, name, parallel=False):
            return orig(spark_, sf_, name, parallel=True)

        corpus_mod.load_table = patched
        try:
            return registry.QUERIES["dedup_repeated_lines_corpus"](
                spark, sf_dir
            )
        finally:
            corpus_mod.load_table = orig

    arms = {
        "stock": registry.QUERIES["dedup_repeated_lines_corpus"],
        "stock_fan": stock_fanout,
        "fused": repeated_lines_fused,
        "fused_fan": lambda s, d: repeated_lines_fused(s, d, parallel=True),
    }
    rows = {
        tag: sorted(tuple(r) for r in fn(spark, SF).collect())
        for tag, fn in arms.items()
    }
    print("values identical:", rows["stock"] == rows["fused"])
    if rows["stock"] != rows["fused"]:
        diff = [
            (a, b)
            for a, b in zip(rows["stock"], rows["fused"])
            if a != b
        ][:5]
        print("first diffs:", diff)
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
