"""Vectorized MinHash signatures (Arrow-batched numpy UDF).

Why a pandas UDF when the rest of the engine is JVM-only: Spark's
higher-order array functions (transform / array_min / aggregate) are
interpreted expression trees outside whole-stage codegen, so a
32-permutation minhash costs ~33M lambda interpretations per 5k docs
(~4s at sf0.1). The numpy formulation — one rolling-hash pass per
document, then 32 modulo-free multiply-shift permutations reduced
with ``np.minimum.reduceat`` over the concatenated batch — is ~2×
faster end-to-end and scales with Arrow batch size, not row count.
Map-side only: no shuffle, deterministic (seeded coefficients),
duplicate shingles need no dedup because min() is idempotent.

Hash family: k-char rolling polynomial (base FNV-prime, wrap mod
2^64) then sig_i = min over shingles of (A_i·h + B_i mod 2^64) with
odd A_i — the multiply-shift universal family; the top 63 bits are
kept so values fit Spark's signed long.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

_BASE = np.uint64(1099511628211)  # FNV-64 prime


def _coefficients(n_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rnd = random.Random(seed)
    a = np.array([rnd.randrange(1, 1 << 63) | 1 for _ in range(n_hashes)], dtype=np.uint64)
    b = np.array([rnd.randrange(0, 1 << 63) for _ in range(n_hashes)], dtype=np.uint64)
    return a, b


def make_minhash_fn(n_hashes: int = 32, k: int = 5, seed: int = 42):
    """Pure pandas Series → Series signature function (unit-testable
    without a SparkContext); NULL for texts shorter than k after trim."""
    A, B = _coefficients(n_hashes, seed)
    pw = np.array([_BASE ** np.uint64(k - 1 - j) for j in range(k)], dtype=np.uint64)

    def text_minhash(texts: pd.Series) -> pd.Series:
        hs_list, offsets, keep = [], [], []
        pos = 0
        for t in texts:
            s = (t or "").strip()
            arr = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            n = arr.size
            if n < k:
                keep.append(False)
                continue
            keep.append(True)
            h = np.zeros(n - k + 1, dtype=np.uint64)
            for j in range(k):
                h += arr[j : n - k + 1 + j] * pw[j]
            hs_list.append(h)
            offsets.append(pos)
            pos += h.size
        out: list = [None] * len(texts)
        if hs_list:
            H = np.concatenate(hs_list)
            offs = np.array(offsets, dtype=np.int64)
            sigs = np.empty((len(hs_list), n_hashes), dtype=np.uint64)
            for i in range(n_hashes):
                sigs[:, i] = np.minimum.reduceat(A[i] * H + B[i], offs)
            signed = (sigs >> np.uint64(1)).astype(np.int64)
            j = 0
            for idx, ok in enumerate(keep):
                if ok:
                    out[idx] = signed[j]
                    j += 1
        return pd.Series(out)

    return text_minhash


def minhash_signature_udf(n_hashes: int = 32, k: int = 5, seed: int = 42):
    """Arrow-batched pandas_udf over make_minhash_fn (needs an active
    SparkContext): text column → array<long> signature."""
    return pandas_udf(make_minhash_fn(n_hashes, k, seed), "array<long>")
