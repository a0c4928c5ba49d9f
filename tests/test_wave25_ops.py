"""Wave-25 tests: Python mirrors / invariants for Mann-Kendall,
Wilcoxon signed-rank, robust octile moments, Yule's K, the ridge
path, and Neyman allocation."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etl_data_ingestion_spark.plans import registry

registry.load_all()


def _daily_cents(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("CAST(ts AS DATE) AS d", "value")
        .groupBy("d")
        .agg({"value": "sum"})
        .withColumnRenamed("sum(value)", "v")
        .selectExpr("d", "CAST(FLOOR(v * 100 + 0.5) AS LONG) AS y")
        .collect()
    )
    return [y for _, y in sorted((r.d, r.y) for r in rows)]


def test_mann_kendall_matches_python(spark, sf_dir):
    ys = _daily_cents(spark, sf_dir)
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    tt = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(ys).values() if t > 1
    )
    var = (n * (n - 1) * (2 * n + 5) - tt) / 18.0
    z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0.0
    row = registry.QUERIES["agg_mann_kendall_trend"](spark, sf_dir).collect()[0]
    assert (row.n_days, row.s_stat) == (n, s)
    assert abs(row.z_score - z) < 2e-6


def test_wilcoxon_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "date_trunc('week', ts) AS w",
            "CASE WHEN dayofweek(ts) IN (1, 7) THEN 0.0 ELSE value END AS wdv",
            "CASE WHEN dayofweek(ts) IN (1, 7) THEN value ELSE 0.0 END AS wev",
        )
        .groupBy("w")
        .agg({"wdv": "sum", "wev": "sum"})
        .collect()
    )
    ds = []
    for r in rows:
        wd = math.floor(r["sum(wdv)"] * 100 + 0.5)
        we = math.floor(r["sum(wev)"] * 100 + 0.5)
        if wd != we:
            ds.append(wd - we)
    n = len(ds)
    # tie-averaged ranks on |d| (2x scale)
    byv = Counter(abs(d) for d in ds)
    ar2 = {}
    cum = 0
    for v in sorted(byv):
        t = byv[v]
        ar2[v] = 2 * cum + t + 1
        cum += t
    w2 = sum(ar2[abs(d)] for d in ds if d > 0)
    tie = sum(t**3 - t for t in byv.values())
    z = (w2 - n * (n + 1) / 2) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 6 - tie / 12.0
    )
    row = registry.QUERIES["agg_wilcoxon_signed_rank"](
        spark, sf_dir
    ).collect()[0]
    assert (row.n_pairs, row.w_plus) == (n, w2 / 2.0)
    assert abs(row.z_score - z) < 2e-6


def test_robust_moments_matches_python(spark, sf_dir):
    xs = sorted(
        math.floor(r.c_acctbal * 100 + 0.5)
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_acctbal")
        .collect()
    )
    n = len(xs)

    def qdisc(p):
        # discrete quantile: smallest x with cum fraction >= p
        return xs[max(0, math.ceil(p * n) - 1)]

    e = {i: qdisc(i / 8.0) for i in range(1, 8)}
    row = registry.QUERIES["agg_robust_moments_octiles"](
        spark, sf_dir
    ).collect()[0]
    assert row.n_customers == n
    assert row.median_cents == e[4]
    assert row.iqr_cents == e[6] - e[2]
    bow = (e[6] + e[2] - 2.0 * e[4]) / (e[6] - e[2])
    moors = ((e[7] - e[5]) + (e[3] - e[1])) / (e[6] - e[2])
    assert abs(row.bowley_skew - bow) < 2e-6
    assert abs(row.moors_kurtosis - moors) < 2e-6


def test_yule_k_matches_python(spark, sf_dir):
    import re

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    agg = defaultdict(Counter)
    for r in rows:
        t = r.text.strip()
        if t:
            agg[r.source].update(re.split(r"\s+", t))
    got = {
        r.source: (r.n_tokens, r.n_types, r.yule_k)
        for r in registry.QUERIES["text_yule_k"](spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for src, cnt in agg.items():
        n = sum(cnt.values())
        q = sum(c * c for c in cnt.values())
        k = 10000.0 * (q - n) / (n * n)
        assert got[src][0] == n and got[src][1] == len(cnt)
        assert abs(got[src][2] - k) < 2e-4, src


def test_ridge_lambda_zero_is_ols(spark, sf_dir):
    ols = registry.QUERIES["ml_ols_normal_equations"](spark, sf_dir).collect()[
        0
    ]
    path = {
        r.lambda_per_obs: r
        for r in registry.QUERIES["ml_ridge_normal_equations"](
            spark, sf_dir
        ).collect()
    }
    r0 = path[0.0]
    assert (r0.beta_lines, r0.beta_qty, r0.intercept_cents) == (
        ols.beta_lines,
        ols.beta_qty,
        ols.intercept_cents,
    )
    # shrinkage: |beta| non-increasing along the path
    b = [path[lam] for lam in sorted(path)]
    for a, c in zip(b, b[1:]):
        assert abs(c.beta_lines) <= abs(a.beta_lines) + 1e-9
        assert abs(c.beta_qty) <= abs(a.beta_qty) + 1e-9


def test_neyman_allocation_invariants(spark, sf_dir):
    got = registry.QUERIES["pipeline_neyman_allocation"](
        spark, sf_dir
    ).collect()
    assert sum(r.sample_quota for r in got) == 10000
    assert all(r.sample_quota >= 0 for r in got)
    # Neyman weights: quota ordering follows N_h * S_h ordering
    import statistics

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "n_chars")
        .collect()
    )
    by_s = defaultdict(list)
    for r in rows:
        by_s[r.source].append(r.n_chars)
    w = {
        s: len(v) * statistics.pstdev(v) for s, v in by_s.items()
    }
    quotas = {r.source: r.sample_quota for r in got}
    order_w = sorted(w, key=lambda s: -w[s])
    order_q = sorted(quotas, key=lambda s: -quotas[s])
    # allow ties/rounding to swap near-equal neighbors: compare
    # weight-share vs quota-share within 1 quota unit
    tw = sum(w.values())
    for s in w:
        assert abs(quotas[s] - 10000 * w[s] / tw) <= 1.0, s
    assert order_w[0] == order_q[0]
