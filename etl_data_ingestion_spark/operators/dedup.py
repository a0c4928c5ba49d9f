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
from pyspark.sql import DataFrame, SparkSession

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.functions.minhash import minhash_signature_udf
from etl_data_ingestion_spark.functions.text import word_ngrams
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
        .orderBy("text_group_size")
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
        .orderBy("kept_doc_id")
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
    grams_all = (
        corpus.select("doc_id", word_ngrams("text", 3).alias("grams"))
        .filter(F.size("grams") > 0)
        .select("doc_id", F.explode("grams").alias("gram"))
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
        .orderBy("doc_a", "doc_b")
    )


# ----------------------------------------------------------- MinHash LSH


@register("dedup_minhash_lsh")  # rows-only: MinHash permutations are engine-specific
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
    the whole batch. Map-side only, no shuffle; shuffle cost is
    |docs|×b band keys + capped-bucket pairs (bucket cap ≤100 drops
    degenerate boilerplate buckets, the standard web-dedup guard).
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
    sigs = (
        corpus.select(
            "doc_id", minhash_signature_udf(n_hashes=n_hashes, k=5)("text").alias("sig")
        )
        .filter(F.col("sig").isNotNull())
        # Persist: the signature table feeds three plan branches (bucket
        # histogram + both join sides); without it the corpus scan +
        # signature UDF re-runs per branch. |docs|×32 longs — negligible
        # next to the corpus at any scale (at 100 TB: write to a table).
        .persist()
    )
    sigs.count()  # materialize once; three downstream branches race otherwise
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
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= 100))  # boilerplate cap
        .select("band", "bh")
    )
    pruned = exploded.join(buckets, ["band", "bh"])
    left = pruned.select(
        "band", "bh", F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")
    )
    right = pruned.select(
        "band", "bh", F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")
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
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(est, 3).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.6)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------- SimHash


@register("dedup_simhash")  # rows-only: murmur3 hash family is Spark-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints, entirely in JVM expressions:
    explode tokens → murmur3 hash → per-bit majority vote → recombine.
    Near-identical docs land at hamming distance ≤ 3; the grouped
    output pairs docs sharing a fingerprint (hamming 0 — the cheap
    exact-bucket variant; banded multi-probe generalizes it)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    toks = corpus.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).withColumn("h", F.hash("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(32)
        ]
    )
    fingerprint = sum(
        [
            F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(0)
            for i in range(32)
        ],
        start=F.lit(0).cast("long"),
    )
    fps = votes.select("doc_id", fingerprint.alias("simhash"))
    return (
        fps.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("bucket_size"), F.min("doc_id").alias("kept"))
        .filter(F.col("bucket_size") > 1)
        .orderBy("kept")
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
        .orderBy("vec_a", "vec_b")
    )


# ----------------------------------------------- duplicate clustering


@register("dedup_cluster_components")  # rows-only: iterative, not SQL-expressible
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph → one cluster
    id (the minimum doc_id) per duplicate group, so a curation pass
    keeps exactly one representative per CLUSTER, not per pair —
    pairwise dedup alone under-deletes transitive groups (a~b, b~c).

    Iterative label propagation: each node adopts the min label among
    itself and its neighbors until fixpoint. Iteration count is
    O(diameter) — near-dup graphs are overwhelmingly tiny cliques, so
    3-4 rounds converge; each round is one shuffle-join of (edges ⋈
    labels). localCheckpoint per round truncates the recursive lineage
    (the classic iterative-Spark failure mode is an exponentially
    deepening plan). The standard large-graph alternative (GraphFrames
    CC / large-star small-star) is this same loop with smarter edge
    rewriting."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    labels = (
        edges.select(F.col("doc_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(4):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.node)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.doc_a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint()
        if changed == 0:
            break
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .filter(F.col("cluster_size") > 1)
        .select(F.col("label").alias("cluster_rep"), "cluster_size")
        .orderBy("cluster_rep")
    )


@register("dedup_minhash_verified")  # rows-only: candidate tier is engine-specific
def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full two-tier near-dup scheme: banded-minhash CANDIDATES →
    exact shingle-set Jaccard VERIFICATION, computed only on candidate
    pairs. This is the production pattern at 100 TB — the estimate
    (signature agreement) admits candidates cheaply; the exact measure
    (array_intersect/union on the pair's shingle sets) confirms them,
    touching |candidates| documents instead of |docs|².

    Output: confirmed pairs with both scores, so the estimator's
    calibration is visible (est from 32 hashes vs exact)."""
    from etl_data_ingestion_spark.functions.text import char_shingles

    cand = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b", "est_jaccard")
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tiny edit")).alias("text"),
        )
    )
    sh = corpus.select("doc_id", char_shingles("text", 5).alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    exact = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "est_jaccard",
            F.round(exact, 3).alias("exact_jaccard"),
        )
        .filter(F.col("exact_jaccard") >= 0.7)
        .orderBy("doc_a", "doc_b")
    )
