"""Wave-12 tests: Python third opinions for the weekday ANOVA and
the cogrouped ledger-vs-detail reconciliation."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etl_data_ingestion_spark.plans import registry

registry.load_all()


def test_anova_weekday_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "cast(to_date(ts) as string) AS d",
            "dayofweek(to_date(ts)) AS wd",
            "event_type",
        )
        .collect()
    )
    daily: Counter = Counter()
    wd_of: dict = {}
    for r in rows:
        wd_of[r.d] = r.wd
        if r.event_type == "purchase":
            daily[r.d] += 1
    groups: dict = defaultdict(list)
    for d, wd in wd_of.items():
        groups[wd].append(daily[d])
    k = len(groups)
    n = sum(len(g) for g in groups.values())
    s = sum(sum(g) for g in groups.values())
    q = sum(x * x for g in groups.values() for x in g)
    e_int = sum(
        math.floor(sum(g) * sum(g) * 10000 * 1.0 / len(g) + 0.5)
        for g in groups.values()
    )
    e = e_int / 10000.0
    ssb = e - s * 1.0 * s / n
    ssw = q - e
    f = (ssb / (k - 1)) / (ssw / (n - k))
    [row] = registry.QUERIES["events_anova_weekday"](spark, sf_dir).collect()
    assert (row.n_groups, row.n_days) == (k, n)
    assert row.ss_between == math.floor(ssb * 1e4 + 0.5) / 1e4
    assert row.ss_within == math.floor(ssw * 1e4 + 0.5) / 1e4
    assert row.f_stat == math.floor(f * 1e6 + 0.5) / 1e6
    assert row.f_stat >= 0


def test_cogroup_reconcile_matches_python(spark, sf_dir):
    orders = [
        r
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
        if r.o_orderkey < 4000
    ]
    lines = [
        r
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
        if r.l_orderkey < 4000
    ]
    net: Counter = Counter()
    nlines: Counter = Counter()
    for r in lines:
        net[r.l_orderkey] += math.floor(
            r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5
        )
        nlines[r.l_orderkey] += 1
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])
    for o in orders:
        a = agg[o.o_orderpriority]
        a[0] += 1
        a[1] += 1 if nlines[o.o_orderkey] == 0 else 0
        a[2] += nlines[o.o_orderkey]
        a[3] += abs(
            math.floor(o.o_totalprice * 100 + 0.5) - net[o.o_orderkey]
        )
    expect = sorted((p, *v) for p, v in agg.items())
    got = [
        (
            r.o_orderpriority,
            r.n_orders,
            r.orders_without_lines,
            r.n_lines,
            r.abs_delta_cents,
        )
        for r in registry.QUERIES["pandas_cogroup_reconcile"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expect
    # TPC-H totalprice includes tax+charge → deltas structurally > 0
    assert sum(t[4] for t in got) > 0
