"""Deduplication operators for training-data pipelines (BASELINE.json
north star): exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
cosine.

The fixture corpus has no natural duplicates, so the oracle-checked
queries CONSTRUCT duplicates deterministically (a derived copy /
perturbation, identical SQL on both engines) — the comparison then
exercises the dedup logic itself, not fixture luck.

Scale design notes:
- exact dedup: one hash-shuffle on the content key; dedupe on a digest
  (sha256) rather than raw text so 100 TB of text shuffles 32-byte
  keys, not documents.
- n-gram Jaccard: inverted-index self-join (explode n-grams → join on
  gram → count共). Quadratic only within a gram's posting list; the
  frequent-gram cap below is what keeps the join from exploding on
  boilerplate grams.
- MinHash LSH / SimHash: signature-based candidate generation —
  shuffle cost is |docs|×|bands|, independent of pair count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.functions.minhash import minhash_signature_udf
from etl_data_ingestion_spark.functions.text import tokens, word_ngrams_from
from etl_data_ingestion_spark.functions.vectors import cosine_similarity
from etl_data_ingestion_spark.plans.registry import register

# ---------------------------------------------------------------- exact

EXACT_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
)
SELECT text_group_size, COUNT(*) AS n_groups
FROM (
  SELECT COUNT(*) AS text_group_size FROM corpus GROUP BY text
)
GROUP BY text_group_size
ORDER BY text_group_size
"""


@register("dedup_exact_documents", oracle=EXACT_ORACLE)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup accounting: group-size histogram after injecting a
    copy of every 10th doc. At scale group on sha2(text) instead of the
    text itself — same result, 32-byte shuffle keys."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return (
        corpus.groupBy(F.sha2(F.col("text"), 256).alias("h"))
        .agg(F.count(F.lit(1)).alias("text_group_size"))
        .groupBy("text_group_size")
        .agg(F.count(F.lit(1)).alias("n_groups"))
    )


KEEP_FIRST_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
)
SELECT MIN(doc_id) AS kept_doc_id, COUNT(*) AS copies
FROM corpus
GROUP BY text
HAVING COUNT(*) > 1
ORDER BY kept_doc_id
"""


@register("dedup_exact_keep_first", oracle=KEEP_FIRST_ORACLE)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection: keep the smallest doc_id per
    duplicate group (deterministic, unlike dropDuplicates)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return (
        corpus.groupBy("text")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count(F.lit(1)).alias("copies"),
        )
        .filter(F.col("copies") > 1)
        .select("kept_doc_id", "copies")
    )


# ------------------------------------------------------- n-gram Jaccard

NGRAM_JACCARD_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 1000000,
         text || ' appended tail marker words'
  FROM documents WHERE doc_id < 150 AND doc_id % 10 = 0
), tokenized AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM corpus
), grams_all AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_distinct(list_transform(
           range(1, len(toks) - 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')
         ))) AS gram
  FROM tokenized
  WHERE len(toks) >= 3
), grams AS (
  -- frequent-gram cap: drop boilerplate grams whose posting list
  -- exceeds 50 docs (they explode the self-join quadratically)
  SELECT doc_id, gram FROM grams_all
  WHERE gram IN (SELECT gram FROM grams_all GROUP BY gram HAVING COUNT(*) <= 50)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(c * 1.0 / (sa.n + sb.n - c), 3) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
ORDER BY doc_a, doc_b
"""


@register("dedup_ngram_jaccard", oracle=NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    Perturbed copies (appended tail) of every 10th doc land near their
    originals at jaccard≈0.9; unrelated docs stay ≪0.5. At 100 TB this
    exact method is the verification tier behind MinHash candidates —
    run it only on candidate pairs, never all-pairs (here the corpus is
    capped for the oracle's sake).
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" appended tail marker words")).alias(
                "text"
            ),
        )
    )
    # tokens materialized into a column BEFORE the n-gram HOF (round-9
    # perf fix: inline tokenize re-ran the regex split per gram —
    # O(tokens²); see functions.text.word_ngrams_from). No size()>0
    # filter: explode already drops empty arrays, and the filter was a
    # pushdown trap that re-evaluated the HOF a second time.
    grams_all = (
        corpus.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", F.explode(word_ngrams_from("toks", 3)).alias("gram"))
        .distinct()
    )
    # frequent-gram cap (posting list ≤ 50 docs): boilerplate grams
    # make the inverted-index self-join quadratic; dropping them biases
    # jaccard DOWN slightly for docs made of boilerplate — the standard
    # trade, mirrored exactly in the oracle.
    rare = (
        grams_all.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 50)
        .select("gram")
    )
    grams = grams_all.join(rare, "gram")
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.alias("a")
    b = grams.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 3).alias("jaccard"))
    )


# ----------------------------------------------------------- MinHash LSH


MINHASH_LSH_ORACLE = """
-- Ground truth the LSH output must recover: ALL pairs with exact
-- 5-char-shingle Jaccard >= 0.6 (the corpus is cleanly separated:
-- every true pair sits at J >= 0.8, nothing lives in [0.5, 0.8), so
-- the banded-LSH candidate set + signature-agreement filter lands on
-- exactly this set — recall verified locally per seed; the minhash
-- seed is fixed, so the comparison is deterministic).
-- Inverted-index formulation (explode shingles, equi-join on the
-- shingle, count co-occurrences): EXACT — identical pair set to the
-- all-pairs list_intersect form, ~40x faster (no quadratic
-- nested-loop over list columns).
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' tiny edit' FROM documents WHERE doc_id % 10 = 0
), grams AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_transform(range(1, length(trim(text)) - 3),
                               i -> substr(trim(text), i, 5))) AS g
  FROM corpus WHERE length(trim(text)) >= 5
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.6
ORDER BY doc_a, doc_b
"""


@register("dedup_minhash_lsh", oracle=MINHASH_LSH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup candidates: vectorized text→
    signature pandas UDF → 8 bands × 4 rows → band-bucket self-join →
    signature-agreement Jaccard estimate.

    Banding (AND within a band, OR across bands) is what makes this
    work at 100 TB: candidate probability is 1-(1-s^r)^b, so unrelated
    docs (s≈0.05 → s^4≈6e-6) essentially never collide while true
    near-dups (s≥0.8) are caught with p≈0.99. (ml.MinHashLSH's
    approxSimilarityJoin uses r=1 OR-amplification, which floods the
    join with low-similarity candidates and recomputes exact distance
    on full sparse vectors per pair — quadratic in practice.)

    The signature stage is an Arrow-batched numpy UDF rather than JVM
    array expressions — measured 2× faster here: Spark higher-order
    functions (transform/array_min) are interpreted, not codegen'd,
    while the UDF is one rolling-hash pass + 32 modulo-free
    multiply-shift permutations folded with minimum.reduceat across
    the whole batch. Map-side only, no shuffle.

    Shuffle shape — ONE Exchange of |docs|×b band rows total, and no
    self-join at all: each (band, bh) bucket is collected into one
    sorted array (groupBy + collect_list), capped at 2..100 items
    (the ≤100 boilerplate-bucket guard is the standard web-dedup
    move), and pairs are expanded IN-BUCKET with nested array
    transforms — at most C(100,2) pairs per bucket, bounded memory
    regardless of corpus size.

    100 TB byte-math caveat (honest trade, round 7): this shape
    carries the FULL signature in every band row, so the Exchange
    ships sig_bytes×b per doc (32×4B×8 = 1 KB/doc ≈ 10 TB at 10^10
    docs). The alternative — exchange only (band, bh, doc_id)
    [~200 GB], bucket to id-pairs, then TWO hash joins back against
    the |docs|-row signature table to fetch sig_a/sig_b (~2×2.5 TB)
    — is ~4× cheaper in shuffle bytes at the cost of two extra
    stages and materializing the signature table. Below ~10^9 docs
    the single-Exchange shape wins on stage count and simplicity
    (and is what we bench); above it, switch to the pair-join shape
    — the cutover is sig_bytes×b vs 2×sig_bytes + join overhead,
    a config decision, not a redesign. Round-3 bisect note: the previous
    window-count + persist + self-join shape and this one measure
    within noise of each other at sf0.1 (1.4-1.7s interleaved
    min-of-3; the 6.4s in BENCH_r02 was host contention under
    min-of-2 sampling), but this shape drops the persist/count
    barrier and the cache lifecycle, and plans a single Exchange.
    """
    n_hashes, bands = 32, 8
    rows = n_hashes // bands
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tiny edit")).alias("text"),
        )
    )
    sigs = corpus.select(
        "doc_id", minhash_signature_udf(n_hashes=n_hashes, k=5)("text").alias("sig")
    ).filter(F.col("sig").isNotNull())
    band_keys = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.hash(
                    *[F.element_at(F.col("sig"), j * rows + r + 1) for r in range(rows)],
                    F.lit(j),
                ).alias("bh"),
            )
            for j in range(bands)
        ]
    )
    exploded = sigs.select(
        "doc_id", "sig", F.explode(band_keys).alias("b")
    ).select("doc_id", "sig", "b.band", "b.bh")
    buckets = (
        exploded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sig"))).alias("items"))
        .filter((F.size("items") >= 2) & (F.size("items") <= 100))
    )
    # all i<j pairs within the bucket: sort_array ordered items by
    # doc_id (first struct field), so position order IS id order
    pair_expr = F.flatten(
        F.transform(
            "items",
            lambda a, i: F.transform(
                F.slice("items", i + 2, F.size("items")),
                lambda b: F.struct(
                    a.doc_id.alias("doc_a"),
                    a.sig.alias("sig_a"),
                    b.doc_id.alias("doc_b"),
                    b.sig.alias("sig_b"),
                ),
            ),
        )
    )
    pairs = buckets.select(F.explode(pair_expr).alias("p")).select(
        "p.doc_a", "p.sig_a", "p.doc_b", "p.sig_b"
    )
    est = (
        F.aggregate(
            F.zip_with(
                "sig_a", "sig_b", lambda a, b: (a == b).cast("int")
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(n_hashes)
    )
    # Hashed contract is the PAIR SET (the estimate itself is
    # hash-family-specific and not oracle-reproducible); est_jaccard
    # stays internal as the candidate filter. dedup_minhash_verified
    # exposes the exact score per surviving pair.
    return (
        pairs.select("doc_a", "doc_b", F.round(est, 3).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.6)
        .select("doc_a", "doc_b")
        .distinct()
    )


# --------------------------------------------------------------- SimHash


SIMHASH_ORACLE = """
-- Exact-bucket SimHash recall contract: identical texts ALWAYS share
-- a fingerprint (simhash is a pure function of the token multiset),
-- so every planted exact copy must land in its original's bucket —
-- pinned engine-independently without reproducing xxhash64. Bucket
-- PRECISION is deliberately not part of the contract: simhash
-- approximates cosine similarity in token-frequency space, and this
-- synthetic corpus draws every doc from the same ~20-word vocabulary,
-- so unrelated docs legitimately share fingerprints (their token
-- profiles really are near-parallel). On production text, 64-bit
-- fingerprints (used since round 8) make unrelated collisions
-- ~2^-64 on realistic vocabularies; the banded variant
-- (dedup_simhash_banded) carries the near-dup recall contract.
SELECT COUNT(*) AS planted_total, COUNT(*) AS planted_found
FROM documents WHERE doc_id % 10 = 0
"""


@register("dedup_simhash", oracle=SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints, entirely in JVM expressions:
    explode tokens → xxhash64 → per-bit majority vote → recombine.
    Exact-bucket variant (full-fingerprint equality = hamming 0);
    dedup_simhash_banded adds the multi-probe band tier for small
    nonzero hamming. Output is the planted-copy recall summary (see
    SIMHASH_ORACLE for why precision is not oracle-checkable on this
    corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    fps = _simhash_fingerprints(corpus)
    fa = fps.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"))
    fb = fps.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"))
    return (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 1000000).alias("doc_b"),
        )
        .join(fa, "doc_a")
        .join(fb, "doc_b")
        .agg(
            F.count(F.lit(1)).alias("planted_total"),
            # coalesce: sum over the 0-row pair relation is NULL where
            # the oracle's COUNT is 0 (empty-corpus sweep, round 14)
            F.coalesce(
                F.sum(
                    F.when(F.col("fp_a") == F.col("fp_b"), 1).otherwise(0)
                ),
                F.lit(0),
            ).alias("planted_found"),
        )
    )


def _simhash_fingerprints(corpus: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, simhash): 64-bit SimHash, all JVM
    expressions — explode tokens → xxhash64 → per-bit ±1 votes →
    majority recombine.

    Widened 32→64 bits in round 8 (Manku et al., WWW'07 operating
    point — the production fingerprint width): with 32 bits a
    1-token edit's flipped near-tie bits were a large enough
    FRACTION of the fingerprint that planted pairs landed beyond
    any usable verifier threshold (hamming 5-8 of 32; the round-7
    sf0.3 sweep measured the 97% recall floor breaking at 96.5%).
    At 64 bits the flipped-bit fraction concentrates (measured
    planted-pair distribution at sf0.3: 98.67% within hamming 9 of
    64, vs 96.5% within 4 of 32), restoring the 97% contract with
    headroom. Bit i recombines via shiftleft+XOR, not SUM of
    literals: 1<<63 exceeds the long range as a Python literal but
    is the correct sign-bit pattern via shiftleft.

    Construction note (r14): the 64 per-bit vote aggregates and the
    64-term recombine chain are built as F.expr STRINGS — one py4j
    parse call per column instead of ~6 Column-API round trips per
    bit (the bh_fdr construction lesson, PLANS.md). The analyzed
    plan is semantically identical to the Column-API form (device
    test compares results; the build profile carries the before/
    after numbers)."""
    toks = corpus.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.expr(
                f"sum(case when (shiftright(h, {i}) & 1) = 1"
                f" then 1 else -1 end) as b{i}"
            )
            for i in range(64)
        ]
    )
    fingerprint = " ^ ".join(
        f"shiftleft(case when b{i} > 0 then cast(1 as bigint)"
        f" else cast(0 as bigint) end, {i})"
        for i in range(64)
    )
    return votes.select(
        "doc_id", F.expr(f"({fingerprint}) as simhash")
    )


# 64-bit band layout for the banded multi-probe tier: 10 bands
# (6×6-bit + 4×7-bit = 64) ⇒ pigeonhole guarantees any pair at
# hamming <= 9 shares at least one unbroken band. (offset, width):
_SIMHASH_BANDS = [(0, 6), (6, 6), (12, 6), (18, 6), (24, 6), (30, 6),
                  (36, 7), (43, 7), (50, 7), (57, 7)]
_SIMHASH_VERIFY_T = 9  # verifier hamming threshold (<= bands-1)


SIMHASH_BANDED_ORACLE = """
-- Recall contract for the banded multi-probe tier: every planted
-- single-token perturbation must be recovered as a (d, d+1M)
-- candidate pair at hamming <= 9 of the 64-bit fingerprint. A
-- 1-token edit shifts each bit's vote by at most 1, so only
-- near-tie bits flip; 10 bands (6x6-bit + 4x7-bit) guarantee a
-- surviving band through hamming 9 (pigeonhole), so banding never
-- loses a pair the verifier would accept.
-- Round-8 contract restoration: round 7 had softened the floor
-- 97% -> 95% after the sf0.3 sweep measured 96.5% recall on the
-- then-32-bit fingerprint (1-token edits landing at hamming 5-8 of
-- 32, past any usable verifier). The production fix the round-7
-- docstring cited (Manku et al., WWW'07: widen the fingerprint,
-- re-band) is now in: at 64 bits the flipped-bit FRACTION
-- concentrates, and the measured planted-pair distribution is
-- sf0.01: 100% within hamming 9; sf0.1: 99.4%; sf0.3: 98.67% —
-- the 97% floor holds everywhere with headroom, and banding
-- remains provably lossless through the verifier threshold.
SELECT COUNT(*) AS planted_total, TRUE AS recall_floor_ok
FROM documents WHERE doc_id % 10 = 0
"""


@register("dedup_simhash_banded", oracle=SIMHASH_BANDED_ORACLE)
def dedup_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded multi-probe SimHash: 64-bit fingerprint split into 10
    bands (6×6-bit + 4×7-bit); docs sharing ANY band value become
    candidates (pigeonhole: hamming <= 9 cannot break all 10 bands,
    so every pair the verifier would accept is guaranteed to
    surface), then candidates are verified at hamming <= 9 via xor
    bit-count. This is the generalization of dedup_simhash's
    exact-bucket variant — it surfaces near-identical docs the
    full-fingerprint match misses.

    Width and band sizing are the two scale dials. Width (round 8):
    64-bit fingerprints per Manku et al. (WWW'07) — at 32 bits a
    1-token edit's flipped near-tie bits were a large enough
    fraction of the fingerprint to escape any usable verifier
    threshold (the round-7 recall regression); at 64 bits the
    fraction concentrates and the 97% planted-pair floor holds with
    headroom (measured: 100%/99.4%/98.67% within hamming 9 at
    sf0.01/0.1/0.3). Bands: exactly t+1 bands give the hamming-t
    guarantee, and every extra band bit HALVES random bucket
    collisions — 10 bands over 64 bits pay ~n²·(6/64 + 4/128)
    random pairs, ~1.6× the round-5 5×6-bit layout, for the
    restored contract. Production tuning keeps band_bits ~ log2(n)
    (Manku's 4×16-bit tables at t<=3 for web-scale n). Output is
    the planted-perturbation recall summary (fingerprints
    themselves are xxhash64-specific)."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzqxv")).alias("text"),
        )
    )
    fps = _simhash_fingerprints(corpus)
    bands = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright("simhash", off)
                        .bitwiseAND((1 << width) - 1)
                        .alias("bv"),
                    )
                    for j, (off, width) in enumerate(_SIMHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.bv")
    left = bands.select(
        "band", "bv", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a")
    )
    right = bands.select("band", "bv", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"))
    pairs = (
        left.join(right, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
            <= _SIMHASH_VERIFY_T
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1000000).alias("doc_b"),
    )
    return planted.join(
        pairs.withColumn("hit", F.lit(1)), ["doc_a", "doc_b"], "left"
    ).agg(
        F.count(F.lit(1)).alias("planted_total"),
        # 0.97 floor restored in round 8 (see SIMHASH_BANDED_ORACLE)
        (F.count("hit") >= F.ceil(F.count(F.lit(1)) * 0.97)).alias(
            "recall_floor_ok"
        ),
    )


# ----------------------------------------------------- embedding cosine

EMB_COSINE_ORACLE = """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
  UNION ALL
  SELECT vec_id + 1000000,
         -- duckdb lambda index is 1-based; (i-1) aligns with spark's 0-based
         list_transform(embedding,
                        (x, i) -> CAST(x AS DOUBLE) * (1.0 + 0.05 * (2.0 * ((i - 1) % 2) - 1.0)))
  FROM embeddings WHERE vec_id < 200 AND vec_id % 10 = 0
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.embedding, b.embedding), 3) AS cos_sim
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.98
ORDER BY vec_a, vec_b
"""


@register("dedup_embedding_cosine", oracle=EMB_COSINE_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: cosine ≥ 0.98 pairs. Perturbed copies
    (alternating ±5% stretch) of every 10th vector sit at ≈0.9987;
    random pairs top out ≈0.46. Brute-force here (corpus capped);
    similarity.py's LSH/IVF paths are the 100 TB candidate generators.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    perturbed = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            * (1.0 + 0.05 * (2.0 * (i % 2).cast("double") - 1.0)),
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).unionByName(perturbed)
    a = corpus.alias("a")
    b = corpus.alias("b")
    cos = cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 3).alias("cos_sim"),
            cos.alias("_raw"),
        )
        .filter(F.col("_raw") >= 0.98)
        .drop("_raw")
    )


# ----------------------------------------------- duplicate clustering


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_rounds: int = 50
) -> DataFrame:
    """Distributed connected components by min-label propagation:
    every node repeatedly adopts the minimum label among itself and
    its neighbors, UNTIL FIXPOINT (convergence-checked each round, not
    a fixed iteration cap — a chain graph of diameter d needs d
    rounds; a cap silently under-merges longer chains).

    Each round is one shuffle-join (edges ⋈ labels) + one aggregate;
    localCheckpoint truncates the otherwise exponentially deepening
    lineage (the classic iterative-Spark failure mode). max_rounds
    bounds a pathological diameter; for chain-heavy graphs at 100 TB
    use connected_components_star below — O(log d) rounds of the same
    shuffle primitive, equivalence-tested against this loop.

    Round-14 (optimization guide §1/§2.4, interleaved A/B −24% sf0.1
    / −27% sf1 on dedup_end_to_end_canonical): the per-round changed
    check used to run the round's full join DAG a SECOND time
    (new_labels was not yet checkpointed when the changed-count
    action executed, and the subsequent localCheckpoint re-executed
    the same join) and paid a join against the old labels on top.
    Now each round materializes ONCE — localCheckpoint FIRST, with a
    per-row `chg` flag computed inside the round's own select (the
    new label differs from the old iff the neighbor min is strictly
    smaller, since labels only decrease) — and the convergence check
    is a trivial filter+limit over the already-materialized rows.

    Returns (node, label) with label = min node id of the component.
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_rounds):
        neighbor_min = (
            und.join(labels, und.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        chk = labels.join(
            neighbor_min, labels.node == neighbor_min.a, "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
            (
                F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label")
            ).alias("chg"),
        ).localCheckpoint()
        labels = chk.select("node", "label")
        if chk.filter("chg").limit(1).count() == 0:
            converged = True
            break
    und.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components: no fixpoint after max_rounds={max_rounds} "
            "(graph diameter exceeds the cap); labels would be silently "
            "under-merged. Raise max_rounds or use connected_components_star."
        )
    return labels


def connected_components_star(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_rounds: int = 25
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    edge rewriting (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — converges in O(log d) rounds
    where plain min-label propagation needs O(d), which is the
    difference that matters on chain-heavy graphs at 100 TB.

    Each round:
      large-star: every node u links its LARGER neighbors to
                  m(u) = min(N(u) ∪ {u});
      small-star: every node u links its smaller-or-equal neighbors
                  (and itself) to m(u).
    Both are one groupBy(min) + one join per half-round — the same
    shuffle primitive as label propagation, just with edge rewriting
    that contracts star centers exponentially faster. Fixpoint check:
    a cheap (count, sum-of-hash) signature as the screen, CONFIRMED by
    an exact set compare (exceptAll, short-circuited at one row) so a
    signature collision can't end iteration early with wrong
    components. Raises if max_rounds is exhausted without a fixpoint
    instead of returning silently-incomplete labels. Returns
    (node, label) with label = the component's minimum node id."""

    def half_round(e: DataFrame, large: bool) -> DataFrame:
        # neighbors of u (undirected view)
        nbrs = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m = nbrs.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least(F.col("u"), F.col("mn")).alias("m")
        )
        joined = nbrs.join(m, "u")
        if large:
            kept = joined.filter(F.col("v") > F.col("u"))
        else:
            kept = joined.filter(F.col("v") <= F.col("u"))
        out = kept.select(F.col("v").alias("a"), F.col("m").alias("b"))
        if not large:
            out = out.unionByName(m.select(F.col("u").alias("a"), F.col("m").alias("b")))
        return out.filter(F.col("a") != F.col("b")).distinct()

    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig, prev_e, converged = None, None, False
    for _ in range(max_rounds):
        e = half_round(e, large=True).localCheckpoint()
        e = half_round(e, large=False).localCheckpoint()
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("a", "b").cast("long")).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            # signature match is necessary, not sufficient: confirm the
            # edge SETS are equal (both sides are distinct(), and equal
            # counts + one-sided emptiness ⇒ set equality)
            if e.exceptAll(prev_e).limit(1).count() == 0:
                converged = True
                break
        prev_sig, prev_e = sig, e
    if not converged:
        raise RuntimeError(
            f"connected_components_star: no fixpoint after max_rounds="
            f"{max_rounds}; labels would be silently incomplete. "
            "Raise max_rounds (rounds needed grow as O(log diameter))."
        )
    # at fixpoint every edge is (node -> its component min); add roots
    roots = e.select(F.col("b").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    return e.select(F.col("a").alias("node"), F.col("b").alias("label")).unionByName(
        roots
    ).distinct()


CLUSTER_ORACLE = """
-- Same deterministic chain graph, components via recursive CTE:
-- every 10th doc spawns a duplication chain d — d+1M — d+2M [— d+3M]
-- of length 2 + (d % 30)/10, so cluster sizes 2, 3 and 4 all occur
-- and transitive closure is genuinely required (chain ends share no
-- direct edge). label(n) = min reachable node = chain head.
WITH RECURSIVE base AS (
  SELECT doc_id AS d, 2 + (doc_id % 30) // 10 AS chain_len
  FROM documents WHERE doc_id % 10 = 0
), edges AS (
  SELECT d + i * 1000000 AS a, d + (i + 1) * 1000000 AS b
  FROM base, UNNEST(range(0, chain_len - 1)) AS t(i)
), und AS (
  SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges
), reach AS (
  SELECT a AS node, a AS r FROM und
  UNION
  SELECT reach.node, und.b AS r FROM reach JOIN und ON reach.r = und.a
), labeled AS (
  SELECT node, MIN(r) AS label FROM reach GROUP BY node
)
SELECT label AS cluster_rep, COUNT(*) AS cluster_size
FROM labeled
GROUP BY label
HAVING COUNT(*) > 1
ORDER BY cluster_rep
"""


@register("dedup_cluster_components", oracle=CLUSTER_ORACLE)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a duplicate-pair graph → one cluster
    id (the minimum doc_id) per duplicate group, so a curation pass
    keeps exactly one representative per CLUSTER, not per pair —
    pairwise dedup alone under-deletes transitive groups (a~b, b~c).

    The pair graph here is CONSTRUCTED deterministically (duplication
    chains of length 2-4 keyed off doc_id) so the oracle can recompute
    the exact components with a recursive CTE; chains specifically
    exercise transitivity — their endpoints share no direct edge, so a
    pairwise join can't reproduce the clusters. In production the edge
    feed is dedup_minhash_verified's confirmed pairs (an LSH-derived
    edge set is hash-family-specific, which is why correctness is
    pinned on a constructed graph instead)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    base = docs.select(
        F.col("doc_id").alias("d"),
        (F.lit(2) + (F.col("doc_id") % 30) / F.lit(10)).cast("int").alias("chain_len"),
    )
    edges = base.select(
        F.explode(F.sequence(F.lit(0), F.col("chain_len") - 2)).alias("i"), "d"
    ).select(
        (F.col("d") + F.col("i") * 1000000).alias("doc_a"),
        (F.col("d") + (F.col("i") + 1) * 1000000).alias("doc_b"),
    )
    labels = connected_components(edges)
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .filter(F.col("cluster_size") > 1)
        .select(F.col("label").alias("cluster_rep"), "cluster_size")
    )


MINHASH_VERIFIED_ORACLE = """
-- Exact-verification ground truth: every pair at exact 5-shingle
-- Jaccard >= 0.7 with its score. The Spark side reaches this set
-- through LSH candidates + exact verification on candidates only;
-- a candidate-tier recall miss or a wrong exact-Jaccard expression
-- both surface as a diff here. (Inverted-index formulation — see
-- MINHASH_LSH_ORACLE.)
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' tiny edit' FROM documents WHERE doc_id % 10 = 0
), grams AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_transform(range(1, length(trim(text)) - 3),
                               i -> substr(trim(text), i, 5))) AS g
  FROM corpus WHERE length(trim(text)) >= 5
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(c * 1.0 / (sa.n + sb.n - c), 3) AS exact_jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.7
ORDER BY doc_a, doc_b
"""


@register("dedup_minhash_verified", oracle=MINHASH_VERIFIED_ORACLE)
def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full two-tier near-dup scheme: banded-minhash CANDIDATES →
    exact shingle-set Jaccard VERIFICATION, computed only on candidate
    pairs. This is the production pattern at 100 TB — the estimate
    (signature agreement) admits candidates cheaply; the exact measure
    (array_intersect/union on the pair's shingle sets) confirms them,
    touching |candidates| documents instead of |docs|²."""
    from etl_data_ingestion_spark.functions.text import char_shingles_from

    cand = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tiny edit")).alias("text"),
        )
    )
    # trimmed text materialized before the shingle HOF (round-9 perf
    # fix — inline trim re-evaluated per shingle; char_shingles_from)
    sh = corpus.select("doc_id", F.trim("text").alias("t")).select(
        "doc_id", char_shingles_from("t", 5).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    exact = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(exact >= 0.7)  # raw-value filter, mirroring the oracle's WHERE
        .select(
            "doc_a",
            "doc_b",
            F.round(exact, 3).alias("exact_jaccard"),
        )
    )


SEMANTIC_ORACLE = """
-- SemDeDup-style contract (Abbas et al. 2023: k-means cluster, prune
-- near-duplicate pairs INSIDE clusters only): every planted perturbed
-- copy (cos ~0.999 to its source) must be caught — source and copy
-- land in the same cluster because the perturbation is tiny relative
-- to inter-centroid distance — and the keep-minimum rule must retain
-- exactly one of each pair. Floor at 97% rather than pinned 100%:
-- a copy CAN straddle a cluster boundary on adversarial data (the
-- known SemDeDup recall trade vs brute force), though none do here
-- at any fixture sf. planted_total is computed from the table, so
-- the contract is scale-aware.
SELECT COUNT(*) AS planted_total,
       TRUE AS recall_floor_ok,
       TRUE AS keep_one_per_pair
FROM embeddings WHERE vec_id % 10 = 0
"""


@register("dedup_semantic_clusters", oracle=SEMANTIC_ORACLE)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup-shaped: deterministic k-means quantizer
    (driver-side Lloyd on a bounded sample — the similarity_ivf_topk
    pattern) assigns every vector to a cluster map-side; candidate
    pairs are generated ONLY within clusters (self-join on cluster_id),
    scored by exact cosine, and pairs >= 0.97 drop the larger vec_id.

    This is the scalable middle tier between dedup_embedding_cosine
    (brute force, quadratic) and pure LSH: clustering bounds the
    quadratic to sum(|cluster|^2) ~= n^2/k, and k grows with the
    corpus (k ~= n / target_cluster_size) so per-cluster work is
    constant at any scale. The shuffle is one Exchange on cluster_id.
    Output is the planted-recall contract (SEMANTIC_ORACLE); cluster
    assignments themselves are quantizer-specific."""
    import numpy as np

    k_centroids, n_iter, cos_floor = 8, 10, 0.97
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    perturbed = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            * (1.0 + 0.02 * (2.0 * (i % 2).cast("double") - 1.0)),
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    ).unionByName(perturbed)

    sample = np.array(
        [r["embedding"] for r in emb.limit(2500).collect()], dtype=np.float64
    )
    if sample.size == 0:
        # empty corpus (empty-corpus sweep, round 14): there is
        # nothing to cluster and the pandas_udf below never receives
        # a row, but the driver-side Lloyd loop would crash on the
        # 0-row sample. A well-formed dummy quantizer keeps the plan
        # identical and the planted-recall contract degenerates to
        # the oracle's (0, TRUE, TRUE) row.
        sample = np.zeros((1, 1), dtype=np.float64)
    cents = sample[:k_centroids].copy()
    for _ in range(n_iter):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)
        for c in range(k_centroids):
            pts = sample[lab == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cents64 = cents.copy()

    def _nearest(embs):
        if len(embs) == 0:
            # Arrow can hand a 0-row batch; np.stack raises on it
            return pd.Series([], dtype="int32")
        X = np.stack(embs.to_numpy())
        d2 = (
            (X ** 2).sum(axis=1, keepdims=True)
            - 2.0 * (X @ cents64.T)
            + (cents64 ** 2).sum(axis=1)[None, :]
        )
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    nearest_centroid = pandas_udf(_nearest, "int")
    assigned = corpus.select(
        "vec_id", "embedding", nearest_centroid("embedding").alias("cluster_id")
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    cos = cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    dup_pairs = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= cos_floor)
        .select(F.col("a.vec_id").alias("keep"), F.col("b.vec_id").alias("drop"))
    )
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("keep"),
        (F.col("vec_id") + 1000000).alias("drop"),
    )
    hits = planted.join(dup_pairs, ["keep", "drop"], "left_semi")
    dropped = dup_pairs.select("drop").distinct()
    # keep-one check: no planted SOURCE may be dropped (sources only
    # pair with their own copy at 0.97 in this corpus, and keep=min)
    sources_dropped = planted.select(F.col("keep").alias("drop")).join(
        dropped, "drop", "left_semi"
    )
    return (
        planted.agg(F.count(F.lit(1)).alias("planted_total"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("found")))
        .crossJoin(sources_dropped.agg(F.count(F.lit(1)).alias("src_dropped")))
        .select(
            "planted_total",
            (F.col("found") >= F.ceil(F.col("planted_total") * 0.97)).alias(
                "recall_floor_ok"
            ),
            (F.col("src_dropped") == 0).alias("keep_one_per_pair"),
        )
    )


INCREMENTAL_ORACLE = """
-- Incremental-ingestion dedup: the production mode. A NEW BATCH is
-- deduped against the EXISTING corpus index (content digests), never
-- all-pairs over the union — the index never reshuffles per batch.
-- New batch = every 7th doc plus planted exact copies of every 10th
-- index doc (doc_id + 2000000), so the collision path is exercised
-- deterministically: the planted copies MUST flag, the rest must
-- not (fixture texts are unique).
WITH idx AS (
  SELECT DISTINCT sha256(text) AS h FROM documents WHERE doc_id % 7 <> 0
), new_batch AS (
  SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000, sha256(text) FROM documents
  WHERE doc_id % 10 = 0 AND doc_id % 7 <> 0
)
SELECT n.doc_id, (i.h IS NOT NULL) AS dup_of_index
FROM new_batch n LEFT JOIN idx i ON n.h = i.h
"""


@register("dedup_incremental_new_docs", oracle=INCREMENTAL_ORACLE)
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against an existing index: each new document
    carries a verdict — already in the corpus (by content digest) or
    genuinely new. The join is new-batch ⋈ digest-index on the 32-byte
    sha256 key: per ingestion batch the small (new) side shuffles or
    broadcasts while the big index stays put — at 100 TB the index is
    a bucketed digest table and this is a bucket-local lookup, NOT a
    re-dedup of the union (which would reshuffle the whole corpus
    every batch). The near-dup tier composes the same way: new-batch
    minhash band keys probe the index's band buckets
    (dedup_minhash_lsh's bucket layout) — same join shape, fuzzier
    key."""
    docs = load_table(spark, sf_dir, "documents")
    digest = lambda c: F.sha2(F.encode(c, "utf-8"), 256)
    idx = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .select(digest(F.col("text")).alias("h"))
        .distinct()
        .withColumn("in_index", F.lit(True))
    )
    new_batch = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", "text")
        .unionByName(
            docs.filter(
                (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 7 != 0)
            ).select((F.col("doc_id") + 2000000).alias("doc_id"), "text")
        )
        .select("doc_id", digest(F.col("text")).alias("h"))
    )
    return new_batch.join(idx, "h", "left").select(
        "doc_id", F.coalesce("in_index", F.lit(False)).alias("dup_of_index")
    )


BLOOM_INCREMENTAL_ORACLE = """
-- Bloom-prefiltered incremental dedup: same contract as
-- dedup_incremental_new_docs (the bloom tier changes the COST, not
-- the answer — no false negatives, and every false positive is
-- killed by the exact verification join). Same corpus construction:
-- index = docs with doc_id % 7 <> 0; new batch = every 7th doc plus
-- planted copies of every 10th index doc.
WITH idx AS (
  SELECT DISTINCT sha256(text) AS h FROM documents WHERE doc_id % 7 <> 0
), new_batch AS (
  SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000, sha256(text) FROM documents
  WHERE doc_id % 10 = 0 AND doc_id % 7 <> 0
)
SELECT n.doc_id, (i.h IS NOT NULL) AS dup_of_index
FROM new_batch n LEFT JOIN idx i ON n.h = i.h
"""


@register("dedup_bloom_incremental", oracle=BLOOM_INCREMENTAL_ORACLE)
def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup where the corpus index is consulted through a
    BLOOM BITMAP first: at 100 TB the digest index is billions of rows,
    and joining every ingestion batch against it — even digest-only —
    costs an index-sized shuffle or a huge storage-side lookup. The
    bloom tier folds the index into a fixed-size bitmap ONCE (here
    65,536 bits as a 1024-row (bucket, bits) aggregate — the same
    distributive BIT_OR build as join_bloom_pruned, no driver
    collect; in production, rebuilt only on compaction and small
    enough to broadcast or pin in memory), so the per-batch path is:

      1. map-side bloom probe of the new batch (two hashes + AND
         against a broadcast bitmap) — most genuinely-new docs exit
         here having touched NOTHING index-sized;
      2. exact verification join against the index for the bloom
         HITS only (planted dups + ~1% false positives), a
         candidate-sized semi join instead of a batch-sized one.

    No false negatives (a digest in the index always hits its bits),
    and false positives only send a few extra digests to
    verification — so the output is EXACTLY the plain incremental
    answer, which is what the oracle checks.
    """
    docs = load_table(spark, sf_dir, "documents")
    idx = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .select(F.sha2(F.col("text"), 256).alias("h"))
        .distinct()
    )
    new_batch = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", F.sha2(F.col("text"), 256).alias("h"))
        .unionByName(
            docs.filter((F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 7 != 0))
            .select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.sha2(F.col("text"), 256).alias("h"),
            )
        )
    )
    n_buckets = 1024
    bucket = lambda c: F.pmod(F.xxhash64(c), F.lit(n_buckets))
    bit_mask = lambda c: F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64({c}, 1), 64) AS INT))"
    )
    bitmap = idx.groupBy(bucket("h").alias("bucket")).agg(
        F.bit_or(bit_mask("h")).alias("bits")
    )
    probed = (
        new_batch.withColumn("bucket", bucket("h"))
        .join(F.broadcast(bitmap), "bucket", "left")
        .withColumn(
            "bloom_hit",
            F.col("bits").isNotNull()
            & (F.col("bits").bitwiseAND(bit_mask("h")) != 0),
        )
    )
    # bloom misses are definitively new; hits verify against the index
    misses = probed.filter(~F.col("bloom_hit")).select(
        "doc_id", F.lit(False).alias("dup_of_index")
    )
    hits = (
        probed.filter(F.col("bloom_hit"))
        .join(idx.withColumn("in_idx", F.lit(True)), "h", "left")
        .select(
            "doc_id", F.coalesce("in_idx", F.lit(False)).alias("dup_of_index")
        )
    )
    return misses.unionByName(hits)


LEVENSHTEIN_BANDED_ORACLE = """
-- Edit-distance near-dup pairs under prefix blocking: candidate
-- pairs share a 24-char text prefix (the blocking key bounds the
-- quadratic levenshtein work to in-bucket pairs), then the exact
-- edit distance <= 10 filter keeps true near-dups. Planted copies:
-- every 10th doc gets a 6-edit copy (kept) and every 15th a
-- 40-edit copy (same prefix, rejected by distance — proving the
-- filter discriminates, not just the blocking).
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 1000000, text || ' qq zz'
  FROM documents WHERE doc_id < 300 AND doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000,
         text || ' padpadpad padpadpad padpadpad padpadpad'
  FROM documents WHERE doc_id < 300 AND doc_id % 15 = 0
), keyed AS (
  SELECT doc_id, text, substr(text, 1, 24) AS block_key FROM corpus
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
FROM keyed a JOIN keyed b
  ON a.block_key = b.block_key AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= 10
ORDER BY a_id, b_id
"""


@register("dedup_levenshtein_banded", oracle=LEVENSHTEIN_BANDED_ORACLE)
def dedup_levenshtein_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance near-dup detection under blocking — the
    verification tier for fuzzy dedup when token-set measures
    (Jaccard) are too coarse (transpositions, small in-place edits).
    Levenshtein is O(len²) PER PAIR, so the operator's scale story
    is entirely about never going all-pairs: a cheap blocking key (a
    shared text prefix here; a MinHash band or SimHash prefix at
    100 TB — same join shape) buckets the corpus, the self-join runs
    inside buckets only, and the exact distance prunes to true
    near-dups. Both the JVM levenshtein and the join are
    codegen'd; planted 6-edit copies pass the <=10 gate, planted
    40-edit copies with the SAME blocking prefix are rejected —
    the distance filter is doing real work, not echoing the
    blocking."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 300
    ).select("doc_id", "text")
    corpus = (
        docs.unionByName(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq zz")).alias("text"),
            )
        ).unionByName(
            docs.filter(F.col("doc_id") % 15 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(
                    F.col("text"),
                    F.lit(" padpadpad padpadpad padpadpad padpadpad"),
                ).alias("text"),
            )
        )
    )
    keyed = corpus.select(
        "doc_id", "text", F.substring("text", 1, 24).alias("block_key")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.levenshtein(F.col("a.text"), F.col("b.text")).cast(
                "long"
            ).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 10)
        .orderBy("a_id", "b_id")
    )


END_TO_END_ORACLE = """
-- End-to-end dedup composite: near-dup pair detection (exact 3-gram
-- Jaccard >= 0.5 under the same frequent-gram cap as
-- dedup_ngram_jaccard) -> connected components over the pair graph
-- -> keep the minimum doc_id per cluster. TWO planted copies of
-- every 10th doc make clusters of size 3, so the closure must be
-- TRANSITIVE, not just pairwise. The oracle runs the closure as a
-- recursive CTE; component id = min reachable node.
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 1000000, text || ' appended tail marker words'
  FROM documents WHERE doc_id < 150 AND doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000, text || ' appended tail marker words plus'
  FROM documents WHERE doc_id < 150 AND doc_id % 10 = 0
), tokenized AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM corpus
), grams_all AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_distinct(list_transform(
           range(1, len(toks) - 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')
         ))) AS gram
  FROM tokenized
  WHERE len(toks) >= 3
), grams AS (
  SELECT doc_id, gram FROM grams_all
  WHERE gram IN (SELECT gram FROM grams_all GROUP BY gram HAVING COUNT(*) <= 50)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
), sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach(src, dst) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
)
SELECT src AS doc_id,
       MIN(dst) AS canonical,
       src = MIN(dst) AS kept
FROM reach
GROUP BY src
ORDER BY doc_id
"""


@register("dedup_end_to_end_canonical", oracle=END_TO_END_ORACLE)
def dedup_end_to_end_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full fuzzy-dedup pipeline in one plan — the composite a
    production corpus actually runs: candidate/verified near-dup
    pairs (exact 3-gram Jaccard, same capped inverted-index shape as
    dedup_ngram_jaccard), transitive duplicate clusters (the
    convergence-checked min-label connected_components loop), and
    canonical selection (keep min doc_id per cluster; singletons
    keep themselves). Two planted copies per seeded doc force
    3-clusters, so a merely pairwise "dedup" would disagree with
    the oracle's recursive closure — transitivity is load-bearing.

    Scale shape is the sum of its parts, each already audited: one
    gram-keyed Exchange for pairs (posting-list cap bounds the
    quadratic), O(rounds) edge-sized joins for components
    (localCheckpoint per round), and the final keep is a map-side
    comparison — the corpus text itself is scanned once and never
    shuffled.

    Round-14: the gram build + CC loop run inside
    catalog.small_fact_aqe_gate (the kcore/item_cf device) — every
    per-round action on this fixed tiny composite paid AQE's
    per-stage materialization job submissions; with the fused CC
    check (see connected_components) the interleaved A/B reads
    stock 3.16 → 2.39 (fused) → gate+fused 2.48 at sf0.1 and
    2.89 → 2.12 → 1.94 at sf1 (min-of-5/4; gate kept on the
    KEEP(sf1) rule). The gate self-retires once the documents
    footprint passes the threshold, so cluster scale keeps AQE."""
    from etl_data_ingestion_spark.catalog import small_fact_aqe_gate

    with small_fact_aqe_gate(spark, sf_dir, "documents", scale_shuffle=True):
        comp, corpus = _end_to_end_components(spark, sf_dir)
    return (
        corpus.select("doc_id")
        .join(comp, corpus.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("canonical"),
        )
        .withColumn("kept", F.col("doc_id") == F.col("canonical"))
        .orderBy("doc_id")
    )


def _end_to_end_components(spark: SparkSession, sf_dir: str):
    """The gram build + verified-pair + CC portion of
    dedup_end_to_end_canonical; every action it triggers (grams
    localCheckpoint, the CC loop's per-round checkpoints) runs under
    the caller's AQE gate. Returns (components, corpus)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    seeded = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = (
        docs.select("doc_id", "text")
        .unionByName(
            seeded.select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" appended tail marker words")
                ).alias("text"),
            )
        )
        .unionByName(
            seeded.select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(
                    F.col("text"),
                    F.lit(" appended tail marker words plus"),
                ).alias("text"),
            )
        )
    )
    # tokens materialized into a column BEFORE the n-gram HOF (round-9
    # perf fix: inline tokenize re-ran the regex split per gram —
    # O(tokens²); see functions.text.word_ngrams_from). No size()>0
    # filter: explode already drops empty arrays, and the filter was a
    # pushdown trap that re-evaluated the HOF a second time.
    grams_all = (
        corpus.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", F.explode(word_ngrams_from("toks", 3)).alias("gram"))
        .distinct()
    )
    rare = (
        grams_all.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 50)
        .select("gram")
    )
    # grams feeds THREE consumers (sizes + both sides of the pair
    # self-join): checkpoint the small post-cap relation once instead
    # of re-running scan->gram->distinct->df-filter per consumer.
    grams = grams_all.join(rare, "gram").localCheckpoint()
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.alias("ga")
    b = grams.alias("gb")
    common = (
        a.join(
            b,
            (F.col("ga.gram") == F.col("gb.gram"))
            & (F.col("ga.doc_id") < F.col("gb.doc_id")),
        )
        .groupBy(
            F.col("ga.doc_id").alias("doc_a"),
            F.col("gb.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(
            F.col("c") / (F.col("na") + F.col("nb") - F.col("c")) >= 0.5
        )
        .select("doc_a", "doc_b")
    )
    # (node, label), label = min id; corpus returned for the caller's
    # (ungated, |corpus|-sized) canonical-selection join
    return connected_components(pairs), corpus


CONTAINMENT_ORACLE = """
-- Asymmetric containment near-dup (quote/subset detection): Jaccard
-- misses a small doc wholly quoted inside a big one (|A∩B|/|A∪B| is
-- small), containment |A∩B|/|A| catches it. Planted quotes: docs
-- doc_id%10==0 get a copy (id+3000000) carrying their full 3-gram set
-- plus extra tail text. Same capped inverted-index shape as
-- dedup_ngram_jaccard; pairs reported where containment of the
-- SMALLER gram-set side >= 0.8 while Jaccard < 0.5 — the pairs the
-- symmetric metric would drop.
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  -- quote carrier: original text + two transforms that each add
  -- ~|A| DISTINCT grams (upper-case copy, word-reversed copy), so
  -- containment(small side)=~1 while jaccard=~1/3 < 0.5
  SELECT doc_id + 3000000,
         text || ' ' || upper(text) || ' ' ||
         array_to_string(list_reverse(
           regexp_split_to_array(trim(text), '\\s+')), ' ')
  FROM documents WHERE doc_id < 300 AND doc_id % 10 = 0
), toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM corpus
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ts, i, i + 2), ' ') AS g
  FROM toks, UNNEST(range(1, len(ts) - 1)) u(i)
  WHERE len(ts) >= 3
), df AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= 50
), kept AS (
  SELECT gr.doc_id, gr.g FROM grams gr JOIN df USING (g)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(c * 1.0 / LEAST(sa.n, sb.n), 4)            AS containment,
       ROUND(c * 1.0 / (sa.n + sb.n - c), 4)            AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c * 1.0 / LEAST(sa.n, sb.n) >= 0.8
  AND c * 1.0 / (sa.n + sb.n - c) < 0.5
ORDER BY doc_a, doc_b
"""


@register("dedup_containment_quotes", oracle=CONTAINMENT_ORACLE)
def dedup_containment_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-based near-dup detection for quote/subset pairs —
    the asymmetric metric tier alongside Jaccard (dedup_ngram_jaccard)
    and MinHash: containment(|A∩B| / min(|A|,|B|)) >= 0.8 with
    Jaccard < 0.5 selects exactly the pairs where one document embeds
    another but symmetric similarity fails. Planted quote-carrier
    docs prove the discrimination.

    Scale shape: identical to the audited inverted-index family — one
    gram-keyed Exchange with a posting-list cap bounding the pair
    quadratic, pair aggregation on (doc_a, doc_b), size table joins
    broadcastable. At 100 TB the production variant keys the shuffle
    on xxhash64(gram) exactly as dedup_duplicated_spans documents."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    quoted = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(
            F.col("text"),
            F.lit(" "),
            F.upper(F.col("text")),
            F.lit(" "),
            F.array_join(
                F.reverse(F.split(F.trim(F.col("text")), r"\s+")), " "
            ),
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(quoted)
    # materialize-then-gram; no size filter (explode drops empties) —
    # see the round-9 note on the first grams_all above
    grams_all = (
        corpus.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", F.explode(word_ngrams_from("toks", 3)).alias("g"))
        .distinct()
    )
    rare = (
        grams_all.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 50)
        .select("g")
    )
    kept = grams_all.join(rare, "g").localCheckpoint()
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = kept.alias("ka")
    b = kept.alias("kb")
    common = (
        a.join(
            b,
            (F.col("ka.g") == F.col("kb.g"))
            & (F.col("ka.doc_id") < F.col("kb.doc_id")),
        )
        .groupBy(
            F.col("ka.doc_id").alias("doc_a"),
            F.col("kb.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    j = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("c") / F.least("na", "nb")).alias("cont_raw"),
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias(
                "jac_raw"
            ),
        )
        .filter((F.col("cont_raw") >= 0.8) & (F.col("jac_raw") < 0.5))
    )
    return j.select(
        "doc_a",
        "doc_b",
        F.round("cont_raw", 4).alias("containment"),
        F.round("jac_raw", 4).alias("jaccard"),
    )


# ----------------------------- wave 21: dedup savings by source

SAVINGS_ORACLE = """
-- Per-source dedup savings forecast: with keep-first exact dedup
-- over the augmented corpus (the standard every-10th-doc copy
-- plant), how many documents and how many CHARACTERS does each
-- source shed? The number a storage/compute planner reads before
-- green-lighting the dedup pass at 100 TB. Keep-first winner =
-- MIN(doc_id) per text (total order), chars = LENGTH(text); all
-- exact integers, one division under the snap.
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, source, text FROM documents
  WHERE doc_id % 10 = 0
), keyed AS (
  SELECT source, doc_id, LENGTH(text) AS ch,
         MIN(doc_id) OVER (PARTITION BY text) AS keeper
  FROM corpus
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removable,
       CAST(SUM(ch) AS BIGINT) AS chars_total,
       CAST(SUM(CASE WHEN doc_id <> keeper THEN ch ELSE 0 END) AS BIGINT)
         AS chars_removable,
       FLOOR(SUM(CASE WHEN doc_id <> keeper THEN ch ELSE 0 END) * 1.0
             / SUM(ch) * 1000000 + 0.5) / 1000000 AS savings_rate
FROM keyed
GROUP BY source
ORDER BY source
"""


@register("dedup_savings_by_source", oracle=SAVINGS_ORACLE)
def dedup_savings_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-dedup savings report (see oracle).

    Scale shape: ONE Exchange keyed on the text digest (the window's
    partition key — production ships sha2(text), 32-byte keys, and
    here the window partitions by the text value itself for oracle
    parity); per-source totals are a second, |sources|-sized
    aggregation. No joins, no candidate pairs — this is the
    accounting layer over the same plan dedup_exact_keep_first
    runs."""
    docs = load_table(spark, sf_dir, "documents", parallel=False)
    corpus = docs.select("doc_id", "source", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "source", "text"
        )
    )
    wt = Window.partitionBy("text")
    keyed = corpus.select(
        "source",
        "doc_id",
        F.length("text").alias("ch"),
        F.min("doc_id").over(wt).alias("keeper"),
    )
    dup = F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)
    dup_ch = F.when(F.col("doc_id") != F.col("keeper"), F.col("ch")).otherwise(0)
    return (
        keyed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(dup).cast("long").alias("n_removable"),
            F.sum("ch").cast("long").alias("chars_total"),
            F.sum(dup_ch).cast("long").alias("chars_removable"),
            (
                F.floor(
                    F.sum(dup_ch) * 1.0 / F.sum("ch") * 1000000 + F.lit(0.5)
                )
                / 1000000
            ).alias("savings_rate"),
        )
        .orderBy("source")
    )


THRESHOLD_CURVE_ORACLE = """
-- Near-dup threshold operating curve: the SAME capped 3-gram
-- Jaccard pair computation as dedup_ngram_jaccard, swept across
-- candidate thresholds 0.3/0.5/0.7/0.8/0.9 in ONE pass — for each
-- threshold, how many pairs fire, how many docs would be removed
-- under the keep-smallest-id policy, and how many characters that
-- saves. This is the knob-tuning readout every dedup deployment
-- produces before fixing a threshold: pairs/docs/bytes vs t, not a
-- yes/no at one t. The pair set is computed ONCE; the sweep joins
-- the 5-row threshold table against the pair list (never rescans
-- the corpus).
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 1000000,
         text || ' appended tail marker words'
  FROM documents WHERE doc_id < 150 AND doc_id % 10 = 0
), tokenized AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM corpus
), grams_all AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_distinct(list_transform(
           range(1, len(toks) - 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')
         ))) AS gram
  FROM tokenized
  WHERE len(toks) >= 3
), grams AS (
  SELECT doc_id, gram FROM grams_all
  WHERE gram IN (SELECT gram FROM grams_all GROUP BY gram HAVING COUNT(*) <= 50)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), scored AS (
  SELECT doc_a, doc_b, c * 1.0 / (sa.n + sb.n - c) AS j
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
), lens AS (
  SELECT doc_id, LENGTH(text) AS nch FROM corpus
), ts AS (
  SELECT UNNEST([0.3, 0.5, 0.7, 0.8, 0.9]) AS t
), fired AS (
  SELECT ts.t, s.doc_a, s.doc_b FROM ts JOIN scored s ON s.j >= ts.t
), removed AS (
  SELECT DISTINCT t, doc_b FROM fired
)
SELECT CAST(ts.t AS DOUBLE) AS threshold,
       CAST(COALESCE(p.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_docs_removed,
       CAST(COALESCE(r.chars_saved, 0) AS BIGINT) AS chars_saved
FROM ts
LEFT JOIN (SELECT t, COUNT(*) AS n_pairs FROM fired GROUP BY t) p
  ON p.t = ts.t
LEFT JOIN (SELECT removed.t, COUNT(*) AS n_removed,
                  SUM(lens.nch) AS chars_saved
           FROM removed JOIN lens ON lens.doc_id = removed.doc_b
           GROUP BY removed.t) r
  ON r.t = ts.t
ORDER BY threshold
"""


@register("pipeline_dedup_threshold_curve", oracle=THRESHOLD_CURVE_ORACLE)
def pipeline_dedup_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup threshold operating curve over the capped 3-gram
    Jaccard pair set (see oracle; same synthetic near-dup corpus and
    posting-list cap as dedup_ngram_jaccard, cited there).

    Scale shape: the pair set is computed ONCE with the same
    bounded device (posting-list cap kills the quadratic boilerplate
    blowup); the 5-threshold sweep joins a literal table against the
    |pairs| relation and the removed-doc rollup — no corpus rescans.
    At 100 TB the curve costs the same as one thresholded dedup run
    plus domain-sized joins.

    Round-12: the single-use `scored` persist is dropped; an AQE
    gate + eager-materialization variant was built and
    interleave-A/B'd at sf0.1 — a wash (4.00 vs 4.01 min-of-4), so
    the gate was NOT kept (plan complexity must buy a measured
    win). The remaining gap to the oracle is decomposed in
    PLANS.md: a ~15-stage chain of tiny broadcast joins pays the
    per-job/per-stage floor, not data costs.

    Round-13 (kept, -8% sf0.1 / -16% sf1, values identical): the
    5-threshold sweep no longer joins a literal threshold table
    against the pair relation — the whole tail collapses into TWO
    conditional aggregations over a persisted `scored` (the
    ml_roc_curve_points device): n_pairs(t) as five conditional
    sums in one pass, and removed-docs/chars via per-doc max-j then
    five conditional (count, sum) pairs; the five output rows
    materialize from one literal struct array. Kills the fired
    persist, the ts join, and two left-joins — the job chain the
    r12 floor table blamed.

    Round-14 (kept, -19% sf0.1 / -12% sf1 interleaved, every fused
    sample beating every stock sample; values identical): the two
    conditional aggregations fuse into ONE — a doc_b-keyed
    pre-aggregation carries BOTH the per-threshold pair counts (sum
    of per-doc conditional counts == the global conditional count,
    exactly, over integers) and the per-doc max j, so `scored`
    becomes single-consumer and its persist, the second global
    aggregation pass, and the agg1×agg2 crossJoin all disappear
    (guide §2.4: two aggregations keyed the same way share one
    exchange). The 15 coalesce-to-zero wrappers survive on the one
    global aggregation (empty-relation parity with the oracle).

    Round-15 (kept, −51% sf0.1 / −59% sf1 interleaved, clean sweeps,
    values identical): the gram relation switches to the per-gram
    collect_set device — one corpus Exchange instead of the
    redundant (doc_id, gram) distinct + keep-broadcast + two
    self-join exchanges; see the inline comment at the g0/gsets
    block."""
    docs = load_table(spark, sf_dir, "documents", parallel=False)
    base = docs.filter(F.col("doc_id") < 150).select("doc_id", "text")
    near = (
        docs.filter((F.col("doc_id") < 150) & (F.col("doc_id") % 10 == 0))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" appended tail marker words")
            ).alias("text"),
        )
    )
    corpus = base.unionByName(near).persist()
    toks = corpus.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= 3)
    # Round-15 (guide §2.4/§2.3; kept: −51% sf0.1 / −59% sf1
    # interleaved, clean sweeps, values identical at both scales +
    # 5-scale parity): the per-gram collect_set device (same shape
    # as text_source_vocab_jaccard / the wedge edge build). ONE
    # corpus-sized Exchange (gram, map-side partial collect_set)
    # replaces the old (doc_id, gram) distinct exchange — redundant
    # anyway: per-doc grams are already array_distinct'd and corpus
    # doc_ids are unique — plus the keep aggregation + its broadcast
    # build and both self-join side exchanges. df<=50 becomes
    # size(ds)<=50 (ds is the full per-gram doc set, bounded by the
    # 165-doc composite; the filter itself is what bounds the pair
    # explode at C(50,2) per gram); pair counts explode from the
    # sorted doc list, preserving the doc_a < doc_b order.
    g0 = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 3),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("toks"), i + 1, 3)
                    ),
                )
            )
        ).alias("gram"),
    )
    gsets = (
        g0.groupBy("gram")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .filter(F.size("ds") <= 50)
        # |grams|-sized; two consumers (sizes + pair expansion)
        .localCheckpoint()
    )
    sizes = (
        gsets.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _pair_expr = (
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), "
        "y -> struct(x as doc_a, y as doc_b))))"
    )
    pairs = (
        gsets.select(F.explode(F.expr(_pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    thresholds = [0.3, 0.5, 0.7, 0.8, 0.9]
    # single consumer since the round-14 fusion below — no persist
    scored = (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_b",
            (
                F.col("c") * 1.0 / (F.col("na") + F.col("nb") - F.col("c"))
            ).alias("j"),
        )
    )
    lens = corpus.select(
        F.col("doc_id").alias("doc_b"), F.length("text").alias("nch")
    )
    # ONE doc_b-keyed pre-aggregation carries both the per-threshold
    # pair counts and the per-doc max j (round-14 fusion).
    # INVARIANT (r14 advisor): every scored doc_b is a corpus doc_id
    # by construction (pairs derive from corpus grams), so the inner
    # lens join below cannot drop rows and the np{i} sums equal the
    # old direct global conditional counts exactly. A future upstream
    # corpus filter that breaks doc_b ⊆ corpus would silently shrink
    # n_pairs here — keep the join inner only while that holds.
    per_b = (
        scored.groupBy("doc_b")
        .agg(
            *[
                F.sum(F.when(F.col("j") >= t, 1).otherwise(0)).alias(f"c{i}")
                for i, t in enumerate(thresholds)
            ],
            F.max("j").alias("jmax"),
        )
        .join(F.broadcast(lens), "doc_b")
    )
    # coalesce(…, 0): a global agg over an EMPTY scored relation
    # yields one row of NULL sums; the oracle emits 0 there.
    agg = per_b.agg(
        *(
            [
                F.coalesce(F.sum(F.col(f"c{i}")), F.lit(0))
                .cast("long")
                .alias(f"np{i}")
                for i in range(len(thresholds))
            ]
            + [
                F.coalesce(
                    F.sum(F.when(F.col("jmax") >= t, 1).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"nr{i}")
                for i, t in enumerate(thresholds)
            ]
            + [
                F.coalesce(
                    F.sum(
                        F.when(F.col("jmax") >= t, F.col("nch")).otherwise(
                            0
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"cs{i}")
                for i, t in enumerate(thresholds)
            ]
        )
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.col(f"np{i}").alias("n_pairs"),
                F.col(f"nr{i}").alias("n_docs_removed"),
                F.col(f"cs{i}").alias("chars_saved"),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select(
            "r.threshold",
            "r.n_pairs",
            "r.n_docs_removed",
            "r.chars_saved",
        )
        .orderBy("threshold")
    )
