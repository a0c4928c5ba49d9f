"""Wave-17 tests: Python mirrors for the Lorenz decile curve and the
gaps-and-islands date ranges."""

from __future__ import annotations

import datetime
import math
from collections import Counter, defaultdict

from etl_data_ingestion_spark.plans import registry

registry.load_all()


def test_lorenz_deciles_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("o_custkey", "o_totalprice")
        .collect()
    )
    spend: Counter = Counter()
    for r in rows:
        spend[r.o_custkey] += math.floor(r.o_totalprice * 100 + 0.5)
    ordered = sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ordered)
    # NTILE semantics: first (n % 10) tiles get ceil(n/10) rows
    base, extra = divmod(n, 10)
    per: dict = defaultdict(lambda: [0, 0])
    i = 0
    for t in range(1, 11):
        size = base + (1 if t <= extra else 0)
        for _ in range(size):
            per[t][0] += 1
            per[t][1] += ordered[i][1]
            i += 1
    total = sum(v[1] for v in per.values())
    cum = 0
    expect = []
    for t in range(1, 11):
        cum += per[t][1]
        expect.append(
            (t, per[t][0], per[t][1], math.floor(cum / total * 1e6 + 0.5) / 1e6)
        )
    got = [
        (r.decile, r.n_customers, r.decile_cents, r.cum_share)
        for r in registry.QUERIES["agg_lorenz_curve_deciles"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expect
    # curve is convex-ish and ends at exactly 1
    assert got[-1][3] == 1.0
    assert got[0][3] < 0.1


def test_gaps_islands_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id", "cast(to_date(ts) as string) AS d")
        .distinct()
        .collect()
    )
    by_user: dict = defaultdict(set)
    for r in rows:
        by_user[r.user_id].add(datetime.date.fromisoformat(r.d))
    islands = []
    for u, days in by_user.items():
        ds = sorted(days)
        start = prev = ds[0]
        for d in ds[1:]:
            if (d - prev).days == 1:
                prev = d
                continue
            islands.append((u, start.isoformat(), prev.isoformat(),
                            (prev - start).days + 1))
            start = prev = d
        islands.append((u, start.isoformat(), prev.isoformat(),
                        (prev - start).days + 1))
    islands.sort(key=lambda t: (-t[3], t[0], t[1]))
    got = [
        (r.user_id, r.island_start, r.island_end, r.n_days)
        for r in registry.QUERIES["window_gaps_islands_dates"](
            spark, sf_dir
        ).collect()
    ]
    assert got == islands[:15]
    assert got[0][3] >= 2, "fixture must contain a multi-day island"
