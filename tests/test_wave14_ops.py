"""Wave-14 tests: a TRUE sequential pool-adjacent-violators
implementation as the third opinion for the closed-form isotonic
fit, plus Python mirrors for the Hill tail index and the fixed-
period periodogram."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etl_data_ingestion_spark.plans import registry

registry.load_all()


def test_isotonic_matches_sequential_pav(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("value", "event_type")
        .collect()
    )
    bins: dict = defaultdict(lambda: [0, 0])
    for r in rows:
        ph = 1.0 / (1.0 + math.exp(-(r.value - 250.0) / 50.0))
        b = min(int(ph * 20), 19)
        bins[b][0] += 1
        bins[b][1] += 1 if r.event_type == "purchase" else 0
    order = sorted(bins)
    # the actual sequential PAV: merge adjacent violating pools
    pools = [[bins[b][0], bins[b][1], [b]] for b in order]
    i = 0
    while i < len(pools) - 1:
        n1, s1, _ = pools[i]
        n2, s2, _ = pools[i + 1]
        if s1 * n2 > s2 * n1:  # rate decreases: merge (exact rational cmp)
            pools[i] = [n1 + n2, s1 + s2, pools[i][2] + pools[i + 1][2]]
            del pools[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    iso = {}
    for n, s, members in pools:
        for b in members:
            iso[b] = s / n
    got = {
        r.bin: (r.n_events, r.raw_rate, r.isotonic_rate)
        for r in registry.QUERIES["ml_isotonic_calibration_bins"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(order)
    for b in order:
        n, s = bins[b]
        assert got[b][0] == n
        assert got[b][1] == math.floor(s / n * 1e6 + 0.5) / 1e6
        assert got[b][2] == math.floor(iso[b] * 1e6 + 0.5) / 1e6
    # the fit must be monotone nondecreasing over bins
    fit = [got[b][2] for b in sorted(got)]
    assert fit == sorted(fit)


def test_hill_tail_index_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("o_custkey", "o_totalprice")
        .collect()
    )
    spend: Counter = Counter()
    for r in rows:
        spend[r.o_custkey] += math.floor(r.o_totalprice * 100 + 0.5)
    top = sorted(spend.values(), reverse=True)[:200]
    xk, k = min(top), len(top)
    terms = [
        math.floor(math.log(c * 1.0 / xk) * 1e9 + 0.5)
        for c in top
        if c > xk
    ]
    alpha = len(terms) * 1.0 / (sum(terms) / 1e9)
    [row] = registry.QUERIES["agg_hill_tail_index"](spark, sf_dir).collect()
    assert (row.k, row.kth_value_cents, row.n_tail_terms) == (
        k, xk, len(terms),
    )
    assert row.hill_alpha == math.floor(alpha * 1e6 + 0.5) / 1e6
    assert row.hill_alpha > 0


def test_periodogram_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("cast(to_date(ts) as string) AS d", "event_type")
        .collect()
    )
    daily: Counter = Counter()
    days = set()
    for r in rows:
        days.add(r.d)
        if r.event_type == "purchase":
            daily[r.d] += 1
    import datetime

    ds = sorted(days)
    lo = datetime.date.fromisoformat(ds[0])
    expect = []
    for p in (7, 14, 30):
        a = b = 0
        for d in ds:
            t = (datetime.date.fromisoformat(d) - lo).days
            x = daily[d]
            ang = 2 * 3.141592653589793 * t / p
            a += math.floor(x * math.cos(ang) * 1e6 + 0.5)
            b += math.floor(x * math.sin(ang) * 1e6 + 0.5)
        power = ((a / 1e6) ** 2 + (b / 1e6) ** 2) / len(ds)
        expect.append((p, len(ds), math.floor(power * 1e4 + 0.5) / 1e4))
    got = [
        (r.period_days, r.n_days, r.power_per_day)
        for r in registry.QUERIES["timeseries_periodogram_fixed"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expect
