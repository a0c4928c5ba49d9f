"""Wave-23 tests: Python mirrors for the simplified silhouette, the
HOF showcase, and the mapInArrow token counter."""

from __future__ import annotations

import math
from collections import defaultdict

from etl_data_ingestion_spark.plans import registry

registry.load_all()


def test_simplified_silhouette_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .selectExpr("vec_id", "label", "embedding")
        .collect()
    )
    vecs = [(r.vec_id, r.label, [float(x) for x in r.embedding]) for r in rows]
    by_label: dict = defaultdict(list)
    for _, lab, v in vecs:
        by_label[lab].append(v)
    cent = {
        lab: [
            round(sum(v[i] for v in vs) / len(vs), 5)
            for i in range(64)
        ]
        for lab, vs in by_label.items()
    }
    s9: dict = defaultdict(list)
    for _, lab, v in vecs:
        d2 = {
            cl: round(sum((a - b) * (a - b) for a, b in zip(v, c)), 8)
            for cl, c in cent.items()
        }
        a = math.sqrt(d2[lab])
        b = math.sqrt(min(d for cl, d in d2.items() if cl != lab))
        s9[lab].append(
            math.floor((b - a) / max(a, b) * 1e9 + 0.5)
        )
    got = {
        r.label: (r.n_points, r.mean_silhouette)
        for r in registry.QUERIES["ml_simplified_silhouette"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(s9)
    for lab, ss in s9.items():
        mean = math.floor(sum(ss) / len(ss) / 1e9 * 1e6 + 0.5) / 1e6
        assert got[lab][0] == len(ss)
        # centroid float-sum order can wiggle the 1e-5 snap on a few
        # dims; allow one snap step on the final 1e-6 mean
        assert abs(got[lab][1] - mean) <= 2e-6, lab
    # silhouettes are bounded; the synthetic labels are NOT geometric
    # clusters, so negative means are expected — the operator's job is
    # to REPORT that honestly (it is the 'should I trust these labels
    # as clusters' diagnostic)
    assert all(-1.0 <= v[1] <= 1.0 for v in got.values())


def test_hof_showcase_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .selectExpr("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(100)
        .collect()
    )
    got = {
        r.vec_id: r
        for r in registry.QUERIES["scalar_higher_order_funcs"](
            spark, sf_dir
        ).collect()
    }
    assert len(got) == min(100, len(rows))
    for r in rows[:100]:
        v = [float(x) for x in r.embedding]
        g = got[r.vec_id]
        assert g.n_positive == sum(1 for x in v if x > 0.0)
        assert g.any_above_quarter == (1 if any(x > 0.25 for x in v) else 0)
        assert g.all_below_one == (1 if all(abs(x) < 1.0 for x in v) else 0)
        assert abs(g.l1_norm - round(sum(abs(x) for x in v), 6)) <= 1e-6
        dot = sum(a * b for a, b in zip(v, v[::-1]))
        assert abs(g.dot_with_reverse - round(dot, 6)) <= 1e-6


def test_map_in_arrow_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("doc_id", "text")
        .collect()
    )
    got = {
        r.doc_id: (r.n_bytes, r.n_tokens)
        for r in registry.QUERIES["pandas_map_in_arrow_tokens"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == {r.doc_id for r in rows}
    for r in rows:
        nb = len(r.text.encode("utf-8"))
        t = r.text.strip()
        nt = len(t.split()) if t else 0
        assert got[r.doc_id] == (nb, nt), r.doc_id
