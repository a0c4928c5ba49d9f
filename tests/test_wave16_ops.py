"""Wave-16 test: Python mirror for the exact-integer rescaled-range
Hurst estimator."""

from __future__ import annotations

import math
from collections import Counter

from etl_data_ingestion_spark.plans import registry

registry.load_all()


def test_hurst_rs_matches_python(spark, sf_dir):
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
    xs = [daily[d] for d in sorted(days)]
    pts = []
    for m in (8, 16, 32):
        rs_micros = []
        for b in range(len(xs) // m):
            blk = xs[b * m : (b + 1) * m]
            s = sum(blk)
            q = sum(v * v for v in blk)
            if m * q - s * s <= 0:
                continue
            pref = 0
            mzs = []
            for k, v in enumerate(blk):
                pref += v
                mzs.append(m * pref - (k + 1) * s)
            rs = (max(mzs) - min(mzs)) / math.sqrt(m * q - s * s)
            rs_micros.append(math.floor(rs * 1e6 + 0.5))
        if not rs_micros:
            # sizes with no complete block produce no row (mirrors
            # the operator at the sf0.001 ~30-day domain)
            continue
        mean_micro = math.floor(sum(rs_micros) / len(rs_micros) + 0.5)
        pts.append((m, len(rs_micros), mean_micro))
    u = [math.floor(math.log(m) * 1e6 + 0.5) for m, _, _ in pts]
    v = [math.floor(math.log(mm / 1e6) * 1e6 + 0.5) for _, _, mm in pts]
    n = len(pts)
    h = (n * sum(a * b for a, b in zip(u, v)) - sum(u) * sum(v)) * 1.0 / (
        n * sum(a * a for a in u) - sum(u) * sum(u)
    )
    expect = [
        (m, nb, mm / 1e6, math.floor(h * 1e4 + 0.5) / 1e4)
        for m, nb, mm in pts
    ]
    got = [
        (r.block_size, r.n_blocks, r.mean_rs, r.hurst_h)
        for r in registry.QUERIES["timeseries_hurst_rs"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expect
    # R/S grows with block size, and H stays in a sane band
    assert got[0][2] < got[-1][2]
    assert 0.0 < got[0][3] < 1.2
