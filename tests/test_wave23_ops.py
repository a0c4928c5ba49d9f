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
    # mirror the round-10 order-free centroid: each component snaps
    # to a 1e-9 integer grid, sums are exact ints, divide chain is
    # the fixed-order s9/1e9/n
    cent = {
        lab: [
            round(
                sum(math.floor(v[i] * 1e9 + 0.5) for v in vs)
                / 1e9
                / len(vs),
                5,
            )
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
        # centroids are now exact fixed-point integer sums (order-
        # free), so the mirror matches EXACTLY — no snap-step wiggle
        assert got[lab][1] == mean, lab
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
        nb, nt = _oracle_token_counts(r.text)
        assert got[r.doc_id] == (nb, nt), r.doc_id


def _oracle_token_counts(text):
    """Python mirror of the ORACLE semantics (ASCII-space TRIM, then
    Unicode \\s+ split where a leading separator yields an empty
    first element) — NOT Python .strip()/.split(), which would mask
    an edge-tab/newline divergence between the Arrow kernel and the
    SQL oracle."""
    import re

    nb = len(text.encode("utf-8"))
    t = text.strip(" ")
    nt = 0 if t == "" else len(re.split(r"\s+", t))
    return nb, nt


def test_map_in_arrow_edge_whitespace(spark):
    """Edge tabs/newlines: the Arrow trim must be ASCII-space-only to
    match SQL TRIM; utf8_trim_whitespace would silently drop the
    empty edge tokens the oracle counts."""
    from etl_data_ingestion_spark.operators.pandas_surface import (
        arrow_token_count_batches,
    )

    docs = [
        (1, "\tleading tab"),
        (2, "trailing newline\n"),
        (3, "  spaces only  "),
        (4, "\t\t"),
        (5, ""),
        (6, " mixed\tinner  runs \n tail "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bytes, r.n_tokens)
        for r in df.mapInArrow(
            arrow_token_count_batches,
            "doc_id long, n_bytes long, n_tokens long",
        ).collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == _oracle_token_counts(text), (doc_id, text)
