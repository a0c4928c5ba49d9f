"""Wave-10 tests: pure-Python third opinions for community
modularity, the feature-hash collision audit, and the count-min
width-calibration sweep."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etl_data_ingestion_spark.plans import registry

registry.load_all()


def test_modularity_matches_python(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("l_orderkey", "l_suppkey")
        .collect()
    )
    nation = {
        r.s_suppkey: r.s_nationkey
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()
    }
    by_order: dict = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_suppkey)
    edges = set()
    for supps in by_order.values():
        ss = sorted(supps)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                edges.add((ss[i], ss[j]))
    m = len(edges)
    intra = sum(1 for a, b in edges if nation[a] == nation[b])
    dc: Counter = Counter()
    for a, b in edges:
        dc[nation[a]] += 1
        dc[nation[b]] += 1
    q = (4.0 * m * intra - sum(v * v for v in dc.values())) / (4.0 * m * m)
    [row] = registry.QUERIES["graph_community_modularity"](
        spark, sf_dir
    ).collect()
    assert (row.n_edges, row.intra_edges, row.n_communities) == (
        m, intra, len(dc),
    )
    assert row.modularity == math.floor(q * 1e6 + 0.5) / 1e6
    # nations are assigned independently of wiring → Q near 0
    # (small-sample noise at sf0.001 reaches ~0.1; 0.3 is the
    # anything-is-really-clustered line)
    assert abs(row.modularity) < 0.3


def _poly_hash(term: str) -> int:
    acc = 0
    for ch in term:
        acc = (acc * 31 + ord(ch)) % 2147483647
    return acc % 512


def test_feature_hash_collisions_matches_python(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    vocab = set()
    for r in rows:
        vocab.update(r.text.strip().split())
    loads: Counter = Counter(_poly_hash(t) for t in vocab)
    n, used = len(vocab), len(loads)
    [row] = registry.QUERIES["ml_feature_hash_collisions"](
        spark, sf_dir
    ).collect()
    assert (row.n_terms, row.buckets_used, row.max_load) == (
        n, used, max(loads.values()),
    )
    assert row.collision_rate == math.floor((n - used) / n * 1e6 + 0.5) / 1e6
    expected = 512.0 * (1.0 - (511.0 / 512.0) ** n)
    assert row.expected_buckets_used == math.floor(expected * 1e4 + 0.5) / 1e4


def test_countmin_width_sweep_matches_python(spark, sf_dir):
    keys = [
        r.l_suppkey
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_suppkey")
        .collect()
    ]
    kc = Counter(keys)
    LCG = [(1103515245, 12345), (69069, 1), (1664525, 1013904223)]
    WIDTHS = [256, 1024, 4096]
    sketch: dict = defaultdict(int)
    for key, c in kc.items():
        for r, (a, b) in enumerate(LCG):
            h = (key * a + b) % 2147483648
            for w in WIDTHS:
                sketch[(w, r, h % w)] += c
    top = sorted(kc.items(), key=lambda t: (-t[1], t[0]))[:10]
    expect = []
    for w in WIDTHS:
        overs = []
        for key, true_cnt in top:
            est = min(
                sketch[(w, r, ((key * a + b) % 2147483648) % w)]
                for r, (a, b) in enumerate(LCG)
            )
            overs.append((est - true_cnt) * 1.0 / true_cnt)
        expect.append(
            (
                w,
                math.floor(sum(overs) / len(overs) * 1e6 + 0.5) / 1e6,
                math.floor(max(overs) * 1e6 + 0.5) / 1e6,
            )
        )
    got = [
        (r.width, r.avg_over_frac, r.max_over_frac)
        for r in registry.QUERIES["agg_countmin_width_sweep"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expect
    # wider sketches can only reduce (or hold) the overestimate
    assert got[0][1] >= got[1][1] >= got[2][1]
