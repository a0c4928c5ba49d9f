"""Wave-8 tests: pure-Python third opinions for the Pareto frontier,
lagged cross-correlation, PCA power iteration, item-item CF, and
TF-IDF cosine pair operators (the DuckDB oracle is the second opinion;
these recompute the same exact-integer contracts in plain Python)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etl_data_ingestion_spark.plans import registry

registry.load_all()


def test_pareto_frontier_matches_bruteforce(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("o_custkey", "o_totalprice")
        .collect()
    )
    spend: dict = defaultdict(lambda: [0, 0])
    for r in rows:
        s = spend[r.o_custkey]
        s[0] += math.floor(r.o_totalprice * 100 + 0.5)
        s[1] += 1
    pts = [(k, c, n) for k, (c, n) in spend.items()]
    # dominance: maximize cents, MINIMIZE n_orders (high-value,
    # low-touch), mirroring the operator's opposed-dimension pair
    expect = sorted(
        (
            (k, c, n)
            for k, c, n in pts
            if not any(
                c2 >= c and n2 <= n and (c2 > c or n2 < n)
                for _, c2, n2 in pts
            )
        ),
        key=lambda t: (-t[1], t[0]),
    )
    got = [
        (r.o_custkey, r.cents, r.n_orders)
        for r in registry.QUERIES["agg_pareto_frontier"](spark, sf_dir).collect()
    ]
    assert len(got) >= 2, "degenerate frontier — fixture too small"
    assert got == expect


def test_cross_correlation_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("date_format(to_date(ts), 'yyyy-MM-dd') AS d", "event_type")
        .collect()
    )
    import datetime

    v: Counter = Counter()
    p: Counter = Counter()
    for r in rows:
        if r.event_type == "view":
            v[r.d] += 1
        elif r.event_type == "purchase":
            p[r.d] += 1
    days = sorted(set(r.d for r in rows))
    expect = []
    for lag in range(8):
        pairs = []
        for d in days:
            d2 = (
                datetime.date.fromisoformat(d) + datetime.timedelta(days=lag)
            ).isoformat()
            if d2 in set(days):
                pairs.append((v[d], p[d2]))
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        ccf = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)
        )
        expect.append((lag, n, math.floor(ccf * 1e6 + 0.5) / 1e6))
    got = [
        (r.lag, r.n_pairs, r.ccf)
        for r in registry.QUERIES["timeseries_cross_correlation"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expect


def test_pca_power_iteration_matches_python(spark, sf_dir):
    vecs = [
        [float(c) for c in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ]
    d = 64

    def iterate(scalars):
        u = [0] * d
        for x, s in scalars:
            for j in range(d):
                u[j] += math.floor(x[j] * s * 1e6 + 0.5)
        return [c / 1e6 for c in u]

    u1 = iterate((x, _fold_plain(x) / 8.0) for x in vecs)
    # NOTE: renorm folds must mirror the engines' left-to-right order
    n1 = math.sqrt(_fold_sq(u1))
    v1 = [c / n1 for c in u1]
    u2 = iterate((x, _fold_dot(x, v1)) for x in vecs)
    n2 = math.sqrt(_fold_sq(u2))
    expect = [
        (j, math.floor(u2[j] / n2 * 1e6 + 0.5) / 1e6, math.floor(n2 * 1e3 + 0.5) / 1e3)
        for j in range(d)
    ]
    got = [
        (r.component, r.loading, r.eigenvalue_est)
        for r in registry.QUERIES["embedding_pca_power_iteration"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expect
    # and the loadings are a unit vector (engine-side sanity)
    assert abs(sum(l * l for _, l, _ in got) - 1.0) < 1e-4


def _fold_plain(arr):
    acc = 0.0
    for c in arr:
        acc = acc + c
    return acc


def _fold_sq(arr):
    acc = 0.0
    for c in arr:
        acc = acc + c * c
    return acc


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def test_item_item_cf_matches_bruteforce(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict = defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.l_partkey)
    item: Counter = Counter()
    pair: Counter = Counter()
    for parts in baskets.values():
        for pk in parts:
            item[pk] += 1
        sp = sorted(parts)
        for i in range(len(sp)):
            for j in range(i + 1, len(sp)):
                pair[(sp[i], sp[j])] += 1
    scored = [
        (
            a,
            b,
            c,
            item[a],
            item[b],
            math.floor(c / math.sqrt(item[a] * 1.0 * item[b]) * 1e6 + 0.5) / 1e6,
        )
        for (a, b), c in pair.items()
        if c >= 2
    ]
    scored.sort(key=lambda t: (-t[5], t[0], t[1]))
    got = [
        (r.part_a, r.part_b, r.co_orders, r.n_a, r.n_b, r.cosine)
        for r in registry.QUERIES["ml_item_item_cf"](spark, sf_dir).collect()
    ]
    assert got == scored[:20]


def test_tfidf_cosine_pairs_matches_python(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n_docs = len(rows)
    tf: dict = defaultdict(Counter)
    for r in rows:
        t = r.text.strip()
        if not t:
            continue
        for term in t.split():
            tf[r.doc_id][term] += 1
    df: Counter = Counter()
    for terms in tf.values():
        for term in terms:
            df[term] += 1
    w: dict = defaultdict(dict)
    for doc, terms in tf.items():
        for term, c in terms.items():
            if 2 <= df[term] <= 50:
                w[doc][term] = c * math.floor(
                    math.log(n_docs * 1.0 / df[term]) * 1e4 + 0.5
                )
    n2 = {doc: sum(x * x for x in ws.values()) for doc, ws in w.items()}
    docs = sorted(w)
    scored = []
    for i, da in enumerate(docs):
        for db in docs[i + 1 :]:
            shared = set(w[da]) & set(w[db])
            if not shared:
                continue
            dot = sum(w[da][t] * w[db][t] for t in shared)
            cos = dot / (math.sqrt(n2[da]) * math.sqrt(n2[db]))
            scored.append(
                (da, db, len(shared), math.floor(cos * 1e6 + 0.5) / 1e6)
            )
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    got = [
        (r.doc_a, r.doc_b, r.shared_terms, r.cosine)
        for r in registry.QUERIES["text_tfidf_cosine_pairs"](
            spark, sf_dir
        ).collect()
    ]
    assert len(got) == 20, "fixture yields fewer than 20 scored pairs"
    assert got == scored[:20]
