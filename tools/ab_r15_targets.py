"""Round-15 optimization A/Bs — same protocol as tools/ab_r14_targets.py:
cold per sample (clearCache), noop sink, samples interleaved across
arms, values checked identical (sorted collected rows) before timing.

Usage:
    python tools/ab_r15_targets.py <probe> [rounds]   (AB_SF=dir)

Probes:
  corr   agg_corr_matrix_daily: stock (10-row createDataFrame literal
         crossJoined against the 1-row moments aggregate, coalesce-
         CASE value picking) vs explode of 10 per-pair structs
         computed DIRECTLY on the moments row (guide §5 driver
         boundary: no py4j literal relation, no crossJoin, no
         branch-picking — the pair expansion is pure codegen).
  vocab  text_source_vocab_jaccard: stock (distinct (source,tok) grid
         + token self-join + separate sizes aggregation = 3 corpus-
         sized exchanges and a join) vs per-token collect_set(source)
         (ONE corpus-sized exchange: the groupBy(tok) partial
         collect_set dedups map-side; sizes and the pairwise
         intersection both derive from the |vocab|-sized token-set
         relation — guide §2.3/§2.4).
  tri    graph_triangle_count: stock edge build (repartition(c) +
         dropDuplicates + row_number cap window + per-customer
         self-join) vs collect_set edge build (groupBy(c) +
         slice(sort_array(collect_set(s)),1,20) + in-row pair
         explode: the dedup, the cap, AND the self-join collapse
         into one aggregation over one Exchange — guide §2.4; pair
         generation becomes codegen'd array expansion instead of a
         join).
  lda    ml_fisher_lda_closed_form: stock (lineitem count-by-orderkey
         aggregation + orders join: two corpus-sized exchanges) vs
         union-aggregation (orders and lineitem union into ONE
         groupBy(orderkey): max(y)/max(f1) carry the order attrs,
         conditional count carries the line count — one exchange,
         no join — guide §2.4 "join as aggregation").
  pq     similarity_pq_rerank: stock encode UDF (per-subspace
         broadcasted (n,K,SUB) difference tensor + per-query python
         loop) vs vectorized encode (one einsum batched matmul for
         all M subspaces + table gather — guide §4.2) plus the
         sample/query collects fused into one job.
  elast  ml_price_elasticity_by_brand: stock vs li-side pre-projected
         narrow scan probe (measurement aid; see plan read).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.plans import registry
from etl_data_ingestion_spark.session import get_spark

SF = os.environ.get("AB_SF", "/root/testdata/sf0.1")


# ----------------------------------------------------------------- corr

def corr_matrix_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", parallel=False)
    kinds = ["view", "click", "purchase", "signup", "error"]
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        *[
            F.sum(F.when(F.col("event_type") == k, 1).otherwise(0)).alias(
                f"m{i+1}"
            )
            for i, k in enumerate(kinds)
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(5):
        aggs.append(F.sum(f"m{i+1}").alias(f"s{i+1}"))
        aggs.append(F.sum(F.col(f"m{i+1}") * F.col(f"m{i+1}")).alias(f"q{i+1}"))
    for i in range(5):
        for j in range(i + 1, 5):
            aggs.append(
                F.sum(F.col(f"m{i+1}") * F.col(f"m{j+1}")).alias(f"p{i+1}{j+1}")
            )
    mom = daily.agg(*aggs)
    n = F.col("n")

    def corr(i: int, j: int):
        sa, sb = F.col(f"s{i}"), F.col(f"s{j}")
        qa, qb = F.col(f"q{i}"), F.col(f"q{j}")
        pab = F.col(f"p{i}{j}")
        return (
            F.floor(
                (n * pab - sa * sb)
                / F.sqrt((n * qa - sa * sa) * 1.0 * (n * qb - sb * sb))
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        )

    rows = F.array(
        *[
            F.struct(
                F.lit(kinds[i - 1]).alias("metric_a"),
                F.lit(kinds[j - 1]).alias("metric_b"),
                corr(i, j).alias("corr"),
            )
            for i in range(1, 6)
            for j in range(i + 1, 6)
        ]
    )
    return (
        mom.select(F.explode(rows).alias("r"))
        .select("r.metric_a", "r.metric_b", "r.corr")
        .orderBy("metric_a", "metric_b")
    )


def probe_corr(spark, rounds):
    return _mk_arms(spark, "agg_corr_matrix_daily", corr_matrix_explode)


# ---------------------------------------------------------------- vocab

def vocab_jaccard_cset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_ingestion_spark.functions.numeric import snap

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    tsets = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .select(F.lower("tok").alias("tok"), "source")
        .groupBy("tok")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        # |vocab|-sized; two consumers (sizes + pair expansion) — the
        # checkpoint stops the second full scan+explode+aggregation
        .localCheckpoint()
    )
    sizes = (
        tsets.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pair_expr = (
        "flatten(transform(srcs, (x, i) -> "
        "transform(slice(srcs, i + 2, size(srcs)), "
        "y -> struct(x as src_a, y as src_b))))"
    )
    inter = (
        tsets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    uni = F.col("na") + F.col("nb") - F.col("n_inter")
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_inter").cast("long"),
            uni.cast("long").alias("n_union"),
            snap(F.col("n_inter") * 1.0 / uni, 4).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


def probe_vocab(spark, rounds):
    return _mk_arms(spark, "text_source_vocab_jaccard", vocab_jaccard_cset)


# ------------------------------------------------------------------ tri

PAIR_EXPR = (
    "flatten(transform(ss, (x, i) -> "
    "transform(slice(ss, i + 2, size(ss)), y -> struct(x as u, y as v))))"
)


def triangle_cset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs_sets = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_suppkey") < 1000)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .groupBy("c")
        .agg(F.slice(F.sort_array(F.collect_set("s")), 1, 20).alias("ss"))
    )
    allpairs = (
        cs_sets.select(F.explode(F.expr(PAIR_EXPR)).alias("p"))
        .select("p.u", "p.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    cut = allpairs.agg(
        F.expr(
            "percentile_disc(0.90) WITHIN GROUP (ORDER BY shared)"
        ).alias("thr")
    )
    pairs = (
        allpairs.crossJoin(F.broadcast(cut))
        .filter(F.col("shared") >= F.col("thr"))
        .select("u", "v")
        .localCheckpoint()
    )
    # tail below is byte-for-byte the stock graph_triangle_count tail
    und = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy(F.col("u").alias("n")).agg(
        F.count(F.lit(1)).alias("d")
    )
    e = (
        pairs.join(
            F.broadcast(deg.select(F.col("n").alias("u"), F.col("d").alias("du"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))),
            "v",
        )
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).localCheckpoint()
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    e3 = oriented.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
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


def probe_tri(spark, rounds):
    return _mk_arms(spark, "graph_triangle_count", triangle_cset)


# ------------------------------------------------------------------ lda

def lda_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_ingestion_spark.functions.numeric import snap

    od = load_table(spark, sf_dir, "orders", parallel=False)
    li = load_table(spark, sf_dir, "lineitem", parallel=False)
    ou = od.select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("f1"),
        F.lit(0).alias("one"),
    )
    lu = li.select(
        F.col("l_orderkey").alias("k"),
        F.lit(None).cast("int").alias("y"),
        F.lit(None).cast("long").alias("f1"),
        F.lit(1).alias("one"),
    )
    per = (
        ou.unionByName(lu)
        .groupBy("k")
        .agg(
            F.max("y").alias("y"),
            F.max("f1").alias("f1"),
            F.sum("one").alias("cnt"),
        )
        # inner-join semantics: keep keys present on BOTH sides
        .filter(F.col("y").isNotNull() & (F.col("cnt") > 0))
    )
    feat = per.select("y", "f1", F.col("cnt").alias("f2"))
    wide = lambda c: F.col(c).cast("decimal(38,0)")
    m = feat.groupBy("y").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("f1").cast("long").alias("s1"),
        F.sum("f2").cast("long").alias("s2"),
        F.sum(wide("f1") * F.col("f1")).alias("q11"),
        F.sum(wide("f2") * F.col("f2")).alias("q22"),
        F.sum(wide("f1") * F.col("f2")).alias("q12"),
    )
    n_, y = F.col("n"), F.col("y")
    pooled = m.agg(
        F.sum("n").alias("n"),
        F.max(F.when(y == 0, n_)).alias("n0"),
        F.max(F.when(y == 1, n_)).alias("n1"),
        F.sum(F.col("q11") * 1.0 - (F.col("s1") * 1.0 / n_) * F.col("s1")).alias("sw11"),
        F.sum(F.col("q22") * 1.0 - (F.col("s2") * 1.0 / n_) * F.col("s2")).alias("sw22"),
        F.sum(F.col("q12") * 1.0 - (F.col("s1") * 1.0 / n_) * F.col("s2")).alias("sw12"),
        (
            F.max(F.when(y == 1, F.col("s1") * 1.0 / n_))
            - F.max(F.when(y == 0, F.col("s1") * 1.0 / n_))
        ).alias("d1"),
        (
            F.max(F.when(y == 1, F.col("s2") * 1.0 / n_))
            - F.max(F.when(y == 0, F.col("s2") * 1.0 / n_))
        ).alias("d2"),
    )
    n, d1, d2 = F.col("n"), F.col("d1"), F.col("d2")
    c11, c22, c12 = (
        F.col("sw11") / (n - 2),
        F.col("sw22") / (n - 2),
        F.col("sw12") / (n - 2),
    )
    det = c11 * c22 - c12 * c12
    w1 = (c22 * d1 - c12 * d2) / det
    w2 = (c11 * d2 - c12 * d1) / det
    norm = F.sqrt(w1 * w1 + w2 * w2)
    return pooled.select(
        F.col("n0").cast("long").alias("n_class0"),
        F.col("n1").cast("long").alias("n_class1"),
        snap(w1 / norm, 6).alias("unit_w1"),
        snap(w2 / norm, 6).alias("unit_w2"),
        snap(d1 * w1 + d2 * w2, 6).alias("mahalanobis_sq"),
    )


def probe_lda(spark, rounds):
    return _mk_arms(spark, "ml_fisher_lda_closed_form", lda_union)


# ------------------------------------------------------------------- pq

def pq_rerank_vec(
    spark: SparkSession, sf_dir: str, parallel: bool = False
) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from etl_data_ingestion_spark.functions.vectors import cosine_similarity
    from etl_data_ingestion_spark.operators.similarity import (
        _ann_selfcheck,
        _exact_topk,
    )

    M, K, SUB, SHORTLIST = 8, 256, 8, 400
    emb = load_table(
        spark, sf_dir, "embeddings", parallel=parallel
    ).select("vec_id", "embedding")
    corpus_n = emb.count()
    # ONE collect serves both the codebook sample and the query rows
    both = (
        emb.filter(F.col("vec_id") < 3)
        .select(F.lit(1).alias("is_q"), "vec_id", "embedding")
        .unionByName(
            emb.sample(fraction=0.25, seed=42)
            .limit(2500)
            .select(F.lit(0).alias("is_q"), "vec_id", "embedding")
        )
        .collect()
    )
    qrows = sorted(
        (r for r in both if r["is_q"] == 1), key=lambda r: r["vec_id"]
    )
    sample = np.array(
        [r["embedding"] for r in both if r["is_q"] == 0], dtype=np.float64
    )
    if sample.size == 0:
        raise ValueError(
            "PQ codebook training requires a non-empty corpus sample; "
            "got 0 embedding rows"
        )
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    books = []
    for m in range(M):
        X = sample[:, m * SUB : (m + 1) * SUB]
        C = X[:K].copy()
        k_actual = len(C)
        for _ in range(8):
            d2 = (
                (X ** 2).sum(1)[:, None]
                - 2.0 * (X @ C.T)
                + (C ** 2).sum(1)[None, :]
            )
            lab = d2.argmin(axis=1)
            sums = np.zeros((k_actual, SUB))
            np.add.at(sums, lab, X)
            cnts = np.bincount(lab, minlength=k_actual)[:, None]
            nz = cnts[:, 0] > 0
            C[nz] = sums[nz] / cnts[nz]
        books.append(C)
    books = np.stack(books)

    qids = [int(r["vec_id"]) for r in qrows]
    Q = np.stack([np.array(r["embedding"], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    n_q = len(qrows)
    tables = np.einsum("qmd,mkd->qmk", Qn.reshape(n_q, M, SUB), books)
    b2 = (books ** 2).sum(axis=2)  # (M, K)
    m_idx = np.arange(M)

    def _encode_adc(embs):
        X = np.stack(embs.to_numpy()).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        Xs = Xn.reshape(len(X), M, SUB)
        dots = np.einsum("nms,mks->nmk", Xs, books)
        d2 = (Xs ** 2).sum(axis=2)[:, :, None] - 2.0 * dots + b2[None, :, :]
        codes = d2.argmin(axis=2)  # (n, M)
        S = np.empty((len(X), n_q))
        for q in range(n_q):
            S[:, q] = tables[q][m_idx[None, :], codes].sum(axis=1)
        return pd.Series(list(S))

    adc = pandas_udf(_encode_adc, "array<double>")
    qid_map = F.array(*[F.lit(q) for q in qids])
    approx = (
        emb.select("vec_id", adc("embedding").alias("s"))
        .select("vec_id", F.posexplode("s").alias("qi", "adc"))
        .select(
            F.element_at(qid_map, F.col("qi") + 1).cast("long").alias("q_id"),
            "vec_id",
            "adc",
        )
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    short = (
        approx.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= SHORTLIST)
        .select("q_id", "vec_id")
    )
    qdf = spark.createDataFrame(
        [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in qrows
        ],
        "q_id long, q_emb array<float>",
    )
    rerank = short.join(emb, "vec_id").join(F.broadcast(qdf), "q_id").select(
        "q_id", "vec_id", cosine_similarity("q_emb", "embedding").alias("cs")
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("cs"), F.asc("vec_id"))
    ann = (
        rerank.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= 10)
        .select("q_id", "vec_id")
    )
    return _ann_selfcheck(
        ann, _exact_topk(emb, corpus_count=corpus_n), floor=0.6
    )


def pq_rerank_topk(
    spark: SparkSession, sf_dir: str, parallel: bool = False
) -> DataFrame:
    """Vectorized encode + LOCAL top-k inside a mapInPandas pass: the
    stock shape posexplodes |corpus| x n_q ADC rows into a window
    partitioned by q_id — 3 partitions, so 3 single-threaded 600k-row
    sorts at sf1 (§2.5 skew: the partition count IS the query count).
    Here each scan task emits only its own top-SHORTLIST rows per
    query (same (adc DESC, vec_id ASC) total order, so local-then-
    global top-k is exact), and the global window sorts ~1200 rows
    per task instead of everything (§2.3: shuffle decisions, not
    payloads)."""
    import numpy as np
    import pandas as pd

    from etl_data_ingestion_spark.functions.vectors import cosine_similarity
    from etl_data_ingestion_spark.operators.similarity import (
        _ann_selfcheck,
        _exact_topk,
    )

    M, K, SUB, SHORTLIST = 8, 256, 8, 400
    emb = load_table(
        spark, sf_dir, "embeddings", parallel=parallel
    ).select("vec_id", "embedding")
    corpus_n = emb.count()
    sample = np.array(
        [
            r["embedding"]
            for r in emb.sample(fraction=0.25, seed=42).limit(2500).collect()
        ],
        dtype=np.float64,
    )
    if sample.size == 0:
        raise ValueError(
            "PQ codebook training requires a non-empty corpus sample; "
            "got 0 embedding rows"
        )
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    books = []
    for m in range(M):
        X = sample[:, m * SUB : (m + 1) * SUB]
        C = X[:K].copy()
        k_actual = len(C)
        for _ in range(8):
            d2 = (
                (X ** 2).sum(1)[:, None]
                - 2.0 * (X @ C.T)
                + (C ** 2).sum(1)[None, :]
            )
            lab = d2.argmin(axis=1)
            sums = np.zeros((k_actual, SUB))
            np.add.at(sums, lab, X)
            cnts = np.bincount(lab, minlength=k_actual)[:, None]
            nz = cnts[:, 0] > 0
            C[nz] = sums[nz] / cnts[nz]
        books.append(C)
    books = np.stack(books)

    qrows = sorted(
        emb.filter(F.col("vec_id") < 3).collect(), key=lambda r: r["vec_id"]
    )
    qids = [int(r["vec_id"]) for r in qrows]
    Q = np.stack([np.array(r["embedding"], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    n_q = len(qrows)
    tables = np.einsum("qmd,mkd->qmk", Qn.reshape(n_q, M, SUB), books)
    b2 = (books ** 2).sum(axis=2)
    m_idx = np.arange(M)
    qids_arr = np.array(qids, dtype=np.int64)

    def _encode_topk(batches):
        # per-task buffers of per-batch local winners; final yield is
        # the task's exact top-SHORTLIST per query under the global
        # (adc DESC, vec_id ASC) order
        bufs: list[pd.DataFrame] = []
        for b in batches:
            X = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            vid = b["vec_id"].to_numpy().astype(np.int64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            Xs = Xn.reshape(len(X), M, SUB)
            dots = np.einsum("nms,mks->nmk", Xs, books)
            d2 = (Xs ** 2).sum(axis=2)[:, :, None] - 2.0 * dots + b2[None, :, :]
            codes = d2.argmin(axis=2)
            for q in range(n_q):
                s = tables[q][m_idx[None, :], codes].sum(axis=1)
                keep = vid != qids_arr[q]
                vq, sq = vid[keep], s[keep]
                if len(vq) > SHORTLIST:
                    idx = np.lexsort((vq, -sq))[:SHORTLIST]
                    vq, sq = vq[idx], sq[idx]
                bufs.append(
                    pd.DataFrame(
                        {"q_id": qids_arr[q], "vec_id": vq, "adc": sq}
                    )
                )
        if bufs:
            allb = pd.concat(bufs, ignore_index=True)
            allb = (
                allb.sort_values(
                    ["q_id", "adc", "vec_id"],
                    ascending=[True, False, True],
                )
                .groupby("q_id", sort=False)
                .head(SHORTLIST)
            )
            yield allb

    approx = emb.mapInPandas(
        _encode_topk, "q_id long, vec_id long, adc double"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    short = (
        approx.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= SHORTLIST)
        .select("q_id", "vec_id")
    )
    qdf = spark.createDataFrame(
        [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in qrows
        ],
        "q_id long, q_emb array<float>",
    )
    rerank = short.join(emb, "vec_id").join(F.broadcast(qdf), "q_id").select(
        "q_id", "vec_id", cosine_similarity("q_emb", "embedding").alias("cs")
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("cs"), F.asc("vec_id"))
    ann = (
        rerank.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= 10)
        .select("q_id", "vec_id")
    )
    return _ann_selfcheck(
        ann, _exact_topk(emb, corpus_count=corpus_n), floor=0.6
    )


def probe_pq(spark, rounds):
    return _mk_arms(spark, "similarity_pq_rerank", pq_rerank_vec)


def probe_pq3(spark, rounds):
    return _mk_arms(spark, "similarity_pq_rerank", pq_rerank_topk)


def probe_pq4(spark, rounds):
    return _mk_arms(
        spark,
        "similarity_pq_rerank",
        lambda s, d: pq_rerank_topk(s, d, parallel=True),
    )


def probe_pq2(spark, rounds):
    # vectorized encode + parallel scan (the r5 opt-in device: per-row
    # Python CPU dwarfs a row's shuffle cost — the sf1 encode pass
    # otherwise runs 2 tasks on a single-row-group fixture file)
    return _mk_arms(
        spark,
        "similarity_pq_rerank",
        lambda s, d: pq_rerank_vec(s, d, parallel=True),
    )


# ---------------------------------------------------------------- curve

def curve_cset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """threshold_curve with the per-gram collect_set device: ONE
    corpus-sized Exchange (gram, map-side partial collect_set) where
    stock pays the (doc_id,gram) distinct exchange [redundant — the
    per-doc grams are already array_distinct'd], the keep aggregation
    + broadcast, and the two self-join-side exchanges. The df<=50
    filter becomes size(set)<=50; pair counts explode from the sorted
    per-gram doc list (a<b order preserved)."""
    docs = load_table(spark, sf_dir, "documents", parallel=False)
    base = docs.filter(F.col("doc_id") < 150).select("doc_id", "text")
    near = (
        docs.filter((F.col("doc_id") < 150) & (F.col("doc_id") % 10 == 0))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" appended tail marker words")
            ).alias("text"),
        )
    )
    corpus = base.unionByName(near).persist()
    toks = corpus.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= 3)
    g0 = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 3),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("toks"), i + 1, 3)
                    ),
                )
            )
        ).alias("gram"),
    )
    gsets = (
        g0.groupBy("gram")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .filter(F.size("ds") <= 50)
        .localCheckpoint()
    )
    sizes = (
        gsets.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pe = (
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), "
        "y -> struct(x as doc_a, y as doc_b))))"
    )
    pairs = (
        gsets.select(F.explode(F.expr(pe)).alias("p"))
        .select("p.doc_a", "p.doc_b")
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
            (
                F.col("c") * 1.0 / (F.col("na") + F.col("nb") - F.col("c"))
            ).alias("j"),
        )
    )
    lens = corpus.select(
        F.col("doc_id").alias("doc_b"), F.length("text").alias("nch")
    )
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
                    F.sum(F.when(F.col("jmax") >= t, 1).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"nr{i}")
                for i, t in enumerate(thresholds)
            ]
            + [
                F.coalesce(
                    F.sum(
                        F.when(F.col("jmax") >= t, F.col("nch")).otherwise(
                            0
                        )
                    ),
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
        .select(
            "r.threshold",
            "r.n_pairs",
            "r.n_docs_removed",
            "r.chars_saved",
        )
        .orderBy("threshold")
    )


def probe_curve(spark, rounds):
    return _mk_arms(spark, "pipeline_dedup_threshold_curve", curve_cset)


# ---------------------------------------------------------------- elast

def probe_elast(spark, rounds):
    # measurement-only probe: stock vs stock (isolates host noise)
    return _mk_arms(spark, "ml_price_elasticity_by_brand", None)


def _gated(qname):
    # the item_cf/kcore device: run the whole (small-result) query
    # under the AQE gate and materialize INSIDE it (persist+count),
    # so the per-stage AQE materialization jobs disappear on small
    # facts and the gate self-retires at data scale
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from etl_data_ingestion_spark.catalog import small_fact_aqe_gate

        with small_fact_aqe_gate(spark, sf_dir, "lineitem",
                                 scale_shuffle=True):
            df = registry.QUERIES[qname](spark, sf_dir).persist()
            df.count()
        return df

    return fn


def probe_ldagate(spark, rounds):
    return _mk_arms(
        spark, "ml_fisher_lda_closed_form", _gated("ml_fisher_lda_closed_form")
    )


def probe_elastgate(spark, rounds):
    return _mk_arms(
        spark,
        "ml_price_elasticity_by_brand",
        _gated("ml_price_elasticity_by_brand"),
    )


# ---------------------------------------------------------------- utils

def _mk_arms(spark, qname, cand_fn):
    stock = registry.QUERIES[qname]
    arms = {
        "stock": lambda: stock(spark, SF)
        .write.mode("overwrite")
        .format("noop")
        .save()
    }
    if cand_fn is not None:
        arms["cand"] = (
            lambda: cand_fn(spark, SF)
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        vs = sorted(tuple(r) for r in stock(spark, SF).collect())
        vc = sorted(tuple(r) for r in cand_fn(spark, SF).collect())
        print("values identical:", vs == vc)
        if vs != vc:
            print("stock:", vs[:4])
            print("cand :", vc[:4])
            raise SystemExit("VALUES DIFFER — refusing to time")
    return arms


PROBES = {
    "corr": probe_corr,
    "vocab": probe_vocab,
    "tri": probe_tri,
    "lda": probe_lda,
    "curve": probe_curve,
    "pq": probe_pq,
    "pq2": probe_pq2,
    "pq3": probe_pq3,
    "pq4": probe_pq4,
    "elast": probe_elast,
    "ldagate": probe_ldagate,
    "elastgate": probe_elastgate,
}


def main() -> None:
    probe = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    registry.load_all()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(4).write.mode("overwrite").format("noop").save()
    arms = PROBES[probe](spark, rounds)
    spark.catalog.clearCache()
    for fn in arms.values():  # untimed warm pass per arm
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
