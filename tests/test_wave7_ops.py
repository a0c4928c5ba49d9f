"""Wave-7 test: pure-Python third opinion for the per-key rolling
z-score anomaly operator."""

from __future__ import annotations

import math

from etl_data_ingestion_spark.plans import registry

registry.load_all()


def test_rolling_zscore_by_key_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "l_suppkey",
            "date_format(date_trunc('week', l_shipdate), 'yyyy-MM-dd') AS wk",
            "l_extendedprice", "l_discount",
        )
        .collect()
    )
    weekly: dict = {}
    for r in rows:
        key = (r.l_suppkey, r.wk)
        weekly[key] = weekly.get(key, 0) + math.floor(
            r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5
        )
    by_supp: dict = {}
    for (s, wk), cents in weekly.items():
        by_supp.setdefault(s, []).append((wk, cents))
    expect = []
    for s, series in by_supp.items():
        series.sort()
        for i in range(7, len(series)):
            win = [c for _, c in series[i - 7 : i + 1]]
            mean = sum(win) / 8
            var = sum(c * c for c in win) / 8 - mean * mean
            if var <= 0:
                continue
            z = (series[i][1] - mean) / math.sqrt(var)
            if abs(z) > 2:
                expect.append(
                    (s, series[i][0], series[i][1],
                     math.floor(z * 1e4 + 0.5) / 1e4)
                )
    expect.sort()
    got = [
        (r.l_suppkey, r.week_start, r.week_cents, r.z_score)
        for r in registry.QUERIES["timeseries_rolling_zscore_by_key"](
            spark, sf_dir
        ).collect()
    ]
    assert len(got) > 0, "fixture produced no anomalies — widen the flag"
    assert got == expect
