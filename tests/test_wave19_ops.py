"""Wave-19 tests: Python mirrors for MRR@10 / recall@10, the
normal-equations OLS (vs numpy lstsq), and the cross-source OOV
rate."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etl_data_ingestion_spark.plans import registry

registry.load_all()


def _ranked_days(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "cast(to_date(ts) as string) AS day",
            "event_type",
            "value",
            "event_id",
        )
        .collect()
    )
    per_day: dict = defaultdict(list)
    for r in rows:
        per_day[r.day].append((-r.value, r.event_id, r.event_type))
    for d in per_day:
        per_day[d].sort()
    return per_day


def test_mrr_at_10_matches_python(spark, sf_dir):
    per_day = _ranked_days(spark, sf_dir)
    got = {
        r.day: (r.first_pos_top10, r.reciprocal_rank)
        for r in registry.QUERIES["ml_mrr_at_10"](spark, sf_dir).collect()
    }
    assert set(got) == set(per_day)
    for d, evs in per_day.items():
        first = 0
        for pos, (_, _, et) in enumerate(evs[:10], 1):
            if et == "purchase":
                first = pos
                break
        rr = round(1.0 / first, 6) if first else 0.0
        assert got[d] == (first, rr), d


def test_recall_at_10_matches_python(spark, sf_dir):
    per_day = _ranked_days(spark, sf_dir)
    got = {
        r.day: (r.n_relevant, r.hits_top10, r.recall_at_10)
        for r in registry.QUERIES["ml_recall_at_10"](spark, sf_dir).collect()
    }
    for d, evs in per_day.items():
        n_rel = sum(1 for _, _, et in evs if et == "purchase")
        hits = sum(1 for _, _, et in evs[:10] if et == "purchase")
        if n_rel == 0:
            assert d not in got
            continue
        assert got[d] == (n_rel, hits, round(hits * 1.0 / n_rel, 6)), d


def test_ols_matches_numpy(spark, sf_dir):
    import numpy as np

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("l_orderkey", "l_quantity")
        .collect()
    )
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("o_orderkey", "o_totalprice")
        .collect()
    )
    per: dict = defaultdict(lambda: [0, 0])
    for r in li:
        per[r.l_orderkey][0] += 1
        per[r.l_orderkey][1] += int(r.l_quantity)
    X, Y = [], []
    for r in o:
        if r.o_orderkey in per:
            x1, x2 = per[r.o_orderkey]
            X.append([1.0, x1, x2])
            Y.append(math.floor(r.o_totalprice * 100 + 0.5))
    beta, *_ = np.linalg.lstsq(
        np.array(X), np.array(Y, dtype=float), rcond=None
    )
    [row] = registry.QUERIES["ml_ols_normal_equations"](
        spark, sf_dir
    ).collect()
    assert row.n_orders == len(Y)
    # numpy solves by SVD, ours by exact normal equations — agree to
    # well inside the snap scale on this well-conditioned design
    assert abs(row.beta_lines - beta[1]) < 1e-3
    assert abs(row.beta_qty - beta[2]) < 1e-3
    assert abs(row.intercept_cents - beta[0]) < 1.0
    assert 0.0 <= row.r_squared <= 1.0


def test_oov_rate_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("source", "text")
        .collect()
    )
    occ: Counter = Counter()
    for r in rows:
        t = r.text.strip() if r.text else ""
        if not t:
            continue
        for tok in t.split():
            occ[(r.source, tok.lower())] += 1
    spread: Counter = Counter()
    for (s, tok), _ in occ.items():
        spread[tok] += 1
    per_src: dict = defaultdict(lambda: [0, 0, 0])
    for (s, tok), c in occ.items():
        per_src[s][0] += c
        if spread[tok] == 1:
            per_src[s][1] += c
            per_src[s][2] += 1
    got = {
        r.source: (r.n_tokens, r.oov_mass, r.oov_types, r.oov_rate)
        for r in registry.QUERIES["text_oov_rate_cross_source"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(per_src)
    for s, (n, mass, types) in per_src.items():
        rate = math.floor(mass * 1.0 / n * 1e6 + 0.5) / 1e6
        assert got[s] == (n, mass, types, rate), s
