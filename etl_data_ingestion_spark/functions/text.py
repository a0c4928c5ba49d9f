"""Text expressions for the analysis/dedup operators — JVM built-ins
only (split / transform / aggregate / regexp), designed so the exact
same computation is expressible in ANSI SQL for the DuckDB oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# "BPE-ish" pre-tokenizer: word pieces or single non-space symbols —
# the standard approximation for token-count estimation without a real
# BPE vocab (which would be a lookup table join, not a regex).
BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: str | Column) -> Column:
    """Whitespace tokens of trimmed text ('' → empty array)."""
    t = F.trim(_c(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def word_ngrams_from(tok_col: str | Column, n: int = 3) -> Column:
    """Distinct word n-grams from an ALREADY-MATERIALIZED token-array
    column (the unit for Jaccard dedup).

    HOT-PATH CONTRACT: ``tok_col`` must be a real column produced by a
    prior ``.select(tokens(text).alias(...))`` projection, NOT an inline
    ``tokens(text)`` expression. HOFs run interpreted (no codegen, no
    common-subexpression elimination), so an inline expression would be
    re-evaluated by the ``element_at`` inside the lambda for EVERY gram
    of every document — O(tokens²) regex splits per row. Measured at
    sf0.1 (round-9 A/B, bench protocol): trigram explosion 8.1s → 0.6s,
    contamination curve 16.5s → 1.3s just from materializing first.
    Because the token column is referenced ≥3 times here (two size()
    calls plus the lambda), Catalyst's CollapseProject keeps the
    producing projection separate — the split runs exactly once per row.

    Guarded: sequence(1, 0) in Spark is a DESCENDING sequence, so the
    index list must be empty-when-short, not clamped-to-zero.
    """
    toks = _c(tok_col)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)])
    )
    return F.array_distinct(grams)


def word_ngrams(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-grams straight from a TEXT column.

    SLOW PATH — tokenizes inline, so the split expression re-runs per
    gram (see word_ngrams_from). Kept for tests and tiny inputs only;
    every operator hot path must materialize ``tokens(text)`` into a
    column and call ``word_ngrams_from`` instead.
    """
    return word_ngrams_from(tokens(col), n)


def char_shingles_from(trimmed_col: str | Column, k: int = 5) -> Column:
    """Distinct k-char shingles from an ALREADY-MATERIALIZED trimmed-text
    column (MinHash input); same empty-when-short guard — and the same
    hot-path contract — as word_ngrams_from: pass a real column, not an
    inline trim(text) expression, or the substring in the lambda
    re-evaluates it per shingle."""
    t = _c(trimmed_col)
    idx = F.when(
        F.length(t) >= k, F.sequence(F.lit(1), F.length(t) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, k)))


def char_shingles(col: str | Column, k: int = 5) -> Column:
    """Distinct k-char shingles straight from a text column — SLOW PATH
    (inline trim re-evaluated per shingle); see char_shingles_from."""
    return char_shingles_from(F.trim(_c(col)), k)


def rolling_fingerprint(col: str | Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash of
    token lengths+initials folded mod 1e9+7 — cheap, deterministic, and
    expressible as list_reduce in the oracle."""
    toks = tokens(col)
    contrib = F.transform(
        toks, lambda t: (F.length(t) * 131 + F.coalesce(F.ascii(t), F.lit(0))).cast("long")
    )
    return F.aggregate(
        contrib,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % 1000000007,
    )
