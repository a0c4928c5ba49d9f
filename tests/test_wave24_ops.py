"""Wave-24 tests: Python mirrors / invariants for Levene, Jarque-Bera,
Cramer's V, k-truss edge support, exponential gap fit, word
burstiness, spectral entropy, and the Hampel filter."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etl_data_ingestion_spark.plans import registry

registry.load_all()


def test_jarque_bera_matches_python(spark, sf_dir):
    xs = [
        math.floor(r.c_acctbal * 100 + 0.5)
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_acctbal")
        .collect()
    ]
    n = len(xs)
    mu = sum(xs) / n
    r2 = sum(x * x for x in xs) / n
    r3 = sum(x**3 for x in xs) / n
    r4 = sum(x**4 for x in xs) / n
    m2 = r2 - mu * mu
    m3 = r3 - 3 * mu * r2 + 2 * mu**3
    m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu**4
    skew = m3 / (math.sqrt(m2) ** 3)
    exk = m4 / (m2 * m2) - 3.0
    row = registry.QUERIES["agg_jarque_bera_normality"](
        spark, sf_dir
    ).collect()[0]
    assert row.n_customers == n
    assert abs(row.skewness - skew) < 2e-6
    assert abs(row.excess_kurtosis - exk) < 2e-6
    jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    assert abs(row.jarque_bera - jb) < 2e-4


def test_levene_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_mktsegment", "c_acctbal")
        .collect()
    )
    by_g = defaultdict(list)
    for r in rows:
        by_g[r.c_mktsegment].append(math.floor(r.c_acctbal * 100 + 0.5))
    # float Levene W (mean-centered) as an independent implementation
    zbars, sss, nis = {}, {}, {}
    for g, xs in by_g.items():
        m = sum(xs) / len(xs)
        z = [abs(x - m) for x in xs]
        zm = sum(z) / len(z)
        zbars[g], nis[g] = zm, len(xs)
        sss[g] = sum((v - zm) ** 2 for v in z)
    n = sum(nis.values())
    k = len(nis)
    zbar = sum(zbars[g] * nis[g] for g in nis) / n
    num = sum(nis[g] * (zbars[g] - zbar) ** 2 for g in nis)
    den = sum(sss.values())
    w = (n - k) / (k - 1) * num / den
    row = registry.QUERIES["agg_levene_variance_homogeneity"](
        spark, sf_dir
    ).collect()[0]
    assert (row.n_customers, row.n_groups) == (n, k)
    # the operator snaps per-group terms; allow grid-scale slack
    assert abs(row.w_stat - w) < 1e-3


def test_cramers_v_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderstatus", "o_orderpriority")
        .collect()
    )
    obs = Counter((r.o_orderstatus, r.o_orderpriority) for r in rows)
    avals = sorted({a for a, _ in obs})
    bvals = sorted({b for _, b in obs})
    n = len(rows)
    rt = Counter(a for a, _ in obs.elements())
    ct = Counter(b for _, b in obs.elements())
    chi2 = 0.0
    for a in avals:
        for b in bvals:
            e = rt[a] * ct[b] / n
            chi2 += (obs.get((a, b), 0) - e) ** 2 / e
    v = math.sqrt(chi2 / (n * (min(len(avals), len(bvals)) - 1)))
    row = registry.QUERIES["agg_cramers_v"](spark, sf_dir).collect()[0]
    assert (row.n_orders, row.n_status, row.n_priority) == (
        n,
        len(avals),
        len(bvals),
    )
    assert abs(row.chi2_stat - chi2) < 1e-3
    assert abs(row.cramers_v - v) < 1e-5


def test_ktruss_invariants(spark, sf_dir):
    hist = registry.QUERIES["graph_ktruss_edge_support"](
        spark, sf_dir
    ).collect()
    tri = registry.QUERIES["graph_triangle_count"](spark, sf_dir).collect()[0]
    # every triangle contributes exactly 3 edge-support increments
    assert sum(r.support * r.n_edges for r in hist) == 3 * tri.n_triangles
    # the loosest truss (min support bucket's cumulative) holds ALL edges
    assert max(r.n_edges_in_truss for r in hist) == tri.n_edges
    # cumulative column is the descending-support running sum
    by_support = sorted(hist, key=lambda r: -r.support)
    run = 0
    for r in by_support:
        run += r.n_edges
        assert r.n_edges_in_truss == run


def test_exp_gap_fit_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "CAST(CAST(ts AS TIMESTAMP) AS LONG) AS t",
            "event_type",
        )
        .filter("event_type = 'purchase'")
        .collect()
    )
    by_u = defaultdict(list)
    for r in rows:
        by_u[r.user_id].append(r.t)
    gaps = []
    for ts in by_u.values():
        ts.sort()
        gaps += [b - a for a, b in zip(ts, ts[1:])]
    n, s = len(gaps), sum(gaps)
    lam = n / s
    gaps.sort()
    dplus = max(
        (i + 1) / n - (1 - math.exp(-lam * g)) for i, g in enumerate(gaps)
    )
    dminus = max(
        (1 - math.exp(-lam * g)) - i / n for i, g in enumerate(gaps)
    )
    row = registry.QUERIES["events_exp_gap_fit"](spark, sf_dir).collect()[0]
    assert row.n_gaps == n
    assert abs(row.lambda_per_hour - n * 3600.0 / s) < 2e-6
    assert abs(row.ks_stat - max(dplus, dminus)) < 2e-6


def test_burstiness_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    d = len(rows)
    per_word = defaultdict(lambda: [0, 0, 0])  # s, q, df
    import re

    for r in rows:
        t = r.text.strip()
        if not t:
            continue
        for w, c in Counter(re.split(r"\s+", t)).items():
            e = per_word[w]
            e[0] += c
            e[1] += c * c
            e[2] += 1
    top = sorted(per_word.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    got = registry.QUERIES["text_word_burstiness"](spark, sf_dir).collect()
    assert [(r.word, r.total_count, r.doc_freq) for r in got] == [
        (w, s, df) for w, (s, q, df) in top
    ]
    for r, (w, (s, q, df)) in zip(got, top):
        mean = s / d
        vmr = (q / d - mean * mean) / mean
        assert abs(r.burstiness - vmr) < 2e-6, w


def test_hampel_matches_python(spark, sf_dir):
    daily = sorted(
        (r.d, r.rev)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "CAST(ts AS DATE) AS d",
            "value",
        )
        .groupBy("d")
        .agg({"value": "sum"})
        .withColumnRenamed("sum(value)", "v")
        .selectExpr("d", "CAST(FLOOR(v * 100 + 0.5) AS LONG) AS rev")
        .collect()
    )
    revs = [v for _, v in daily]
    got = {
        r.day: (r.med2, r.mad4, r.is_outlier)
        for r in registry.QUERIES["window_hampel_outliers"](
            spark, sf_dir
        ).collect()
    }

    def med2_of(win):
        w = sorted(win)
        nw = len(w)
        return (
            2 * w[(nw - 1) // 2] if nw % 2 == 1 else w[nw // 2 - 1] + w[nw // 2]
        )

    for i, (d, rev) in enumerate(daily):
        win = revs[max(0, i - 3) : i + 4]
        m2 = med2_of(win)
        devs = sorted(abs(2 * v - m2) for v in win)
        nw = len(devs)
        mad4 = (
            2 * devs[(nw - 1) // 2]
            if nw % 2 == 1
            else devs[nw // 2 - 1] + devs[nw // 2]
        )
        out = 1 if 20000 * abs(2 * rev - m2) > 44478 * mad4 else 0
        assert got[str(d)] == (m2, mad4, out), d


def test_spectral_entropy_bounds(spark, sf_dir):
    row = registry.QUERIES["timeseries_spectral_entropy"](
        spark, sf_dir
    ).collect()[0]
    assert row.n_periods == 29
    assert 0.0 <= row.spectral_entropy <= 1.0
    assert row.total_power6 > 0
