"""Deterministic scale-factor data generator for scale-curve runs.

The driver ships fixtures at sf0.001/0.01/0.1 (TESTDATA.md, read-only).
The 100 TB design story predicts the Spark/DuckDB wall-clock ratio
collapses as data grows (Spark's per-query floor is fixed while work
scales), so round 4 adds LOCAL sf0.3 / sf1 datasets to measure that
curve. This generator mirrors the fixture shape — same tables, schema,
key ranges, value distributions, category sets, and cross-sf row-count
scaling observed in the shipped parquet (stats sampled from
/root/testdata/sf0.1; seed fixed) — so every registered query and its
DuckDB oracle run unchanged on the generated dirs.

Not byte-identical to the driver's generator (that source isn't
shipped); identical in shape, which is what a Spark-vs-DuckDB ratio
needs: both engines read the SAME generated files.

Usage: python tools/gen_scale.py SF OUT_DIR   e.g. 0.3 .scaledata/sf0.3
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["O", "F"]
PTYPES = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"]
ADJS = ["cold", "hot", "blue", "red", "small", "old", "new", "large"]
NOUNS = ["plate", "gear", "rod", "ring", "anvil", "bolt", "widget"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
LANGS = (["en"] * 8 + ["de"] * 3 + ["fr"] * 3 + ["es"] * 3 + ["zh"] * 3)
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

DAY_US = 86_400_000_000


def _days(lo: str, hi: str) -> tuple[int, int]:
    lo_d, hi_d = np.datetime64(lo), np.datetime64(hi)
    return 0, int((hi_d - lo_d) / np.timedelta64(1, "D"))


def _ts_col(base: str, day_offsets: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base).astype("datetime64[us]").astype(np.int64)
    return pa.array(base_us + day_offsets * DAY_US, type=pa.timestamp("us"))


def write(out_dir: str, name: str, table: pa.Table) -> None:
    # Sized row groups (~64 per table, floor 1000 rows): Spark's file
    # splitting is row-group-bound, so a single-row-group file caps
    # EVERY scan at one task no matter the core count — measured 183s
    # for dedup_duplicated_spans at sf1 on a 2-row-group file vs ~15s
    # with parallel scans. DuckDB parallelizes across row groups the
    # same way, so both engines read the identical, honestly-laid-out
    # data. Production parquet (128MB row groups over TB-scale
    # tables) has thousands of row groups per node; the fixture
    # layout should not accidentally serialize the engines.
    rg = max(1000, table.num_rows // 64)
    pq.write_table(
        table, os.path.join(out_dir, f"{name}.parquet"), row_group_size=rg
    )
    print(f"  {name}: {table.num_rows} rows (row_group={rg})", flush=True)


def generate(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    names = np.array([f"{a} {n}" for a in ADJS for n in NOUNS])
    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(names[rng.integers(0, len(names), n_part)]),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
    }))

    olo, ohi = _days("1995-01-01", "2001-08-01")
    odays = rng.integers(olo, ohi + 1, n_ord)
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_col("1995-01-01", odays),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    # lineitem: 1-7 lines per order (avg 4 -> |lineitem| ~ 4x|orders|)
    lines_per = rng.integers(1, 8, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord), lines_per)
    n_li = len(l_orderkey)
    linenumber = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    slo, shi = _days("1995-01-02", "2001-11-04")
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(RETURNFLAGS)[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(
            np.array(LINESTATUSES)[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": _ts_col("1995-01-02", rng.integers(slo, shi + 1, n_li)),
    }))

    # events: 30 days of Jan 2024, us-precision timestamps,
    # exponential value (mean 50), tiny JSON props
    base_us = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span_us = 30 * DAY_US
    ts = base_us + rng.integers(0, span_us, n_evt)
    ts.sort()
    write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, max(n_cust, 1), n_evt), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]
        ),
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]),
    }))

    # documents: 8-100 words from the fixture vocabulary
    vocab = np.array(VOCAB)
    n_words = rng.integers(8, 101, n_doc)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), k)]) for k in n_words
    ]
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)]),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-normalized 64-dim gaussians (element std ~1/8,
    # matching the fixture)
    X = rng.standard_normal((n_emb, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array([row.tolist() for row in X], pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    print(f"generating sf={sf} -> {out}", flush=True)
    generate(sf, out)
