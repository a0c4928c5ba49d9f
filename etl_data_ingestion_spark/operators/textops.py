"""Text-analysis operators over the documents table (BASELINE.json
north star): token statistics, quality scoring, language-ID heuristic,
BPE-ish token estimation, rolling-hash fingerprinting.

Everything is JVM regexp/array expressions (codegen'd); the oracle
runs the identical computation in DuckDB SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.functions.text import (
    BPE_ISH_PATTERN,
    rolling_fingerprint,
    token_count,
    tokens,
)
from etl_data_ingestion_spark.plans.registry import register

TOKEN_STATS_ORACLE = """
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+'))        AS n_tokens,
       LENGTH(text)                                           AS n_chars_actual,
       ROUND(LENGTH(REPLACE(text, ' ', '')) * 1.0 /
             len(regexp_split_to_array(trim(text), '\\s+')), 3) AS avg_token_len
FROM documents
ORDER BY doc_id
"""


@register("text_token_stats", oracle=TOKEN_STATS_ORACLE)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = token_count("text")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            / n_tokens,
            3,
        ).alias("avg_token_len"),
    )


QUALITY_ORACLE = """
SELECT doc_id,
       ROUND(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             t -> t IN ('the','a','of','and','to','in'))) * 1.0
             / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS stopword_ratio,
       ROUND((LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^a-z ]', '', 'g'))) * 1.0
             / LENGTH(text), 4)                                   AS nonalpha_ratio,
       CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 20 AND 1000
            THEN 1 ELSE 0 END                                     AS length_ok
FROM documents
ORDER BY doc_id
"""


@register("text_quality_score", oracle=QUALITY_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals fed to a keep/drop policy: stopword ratio (a
    fluency proxy), non-alphabetic density, length band — the standard
    cheap filters run before expensive model-based scoring."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tokens = F.size(toks)
    stop = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to", "in"))
    )
    return docs.select(
        "doc_id",
        F.round(stop / n_tokens, 4).alias("stopword_ratio"),
        F.round(
            (F.length("text") - F.length(F.regexp_replace("text", "[^a-z ]", "")))
            / F.length("text"),
            4,
        ).alias("nonalpha_ratio"),
        F.when(n_tokens.between(20, 1000), 1).otherwise(0).alias("length_ok"),
    )


LANG_ID_ORACLE = """
SELECT doc_id, lang AS labeled_lang,
       CASE
         WHEN len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              t -> t IN ('the','of','and'))) >= 2 THEN 'en'
         WHEN len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              t -> t IN ('der','und','die'))) >= 2 THEN 'de'
         WHEN len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              t -> t IN ('el','de','la'))) >= 2 THEN 'es'
         ELSE 'unknown'
       END AS guessed_lang
FROM documents
ORDER BY doc_id
"""


@register("text_lang_id_heuristic", oracle=LANG_ID_ORACLE)
def text_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID — the n-gram-free heuristic tier; a
    real pipeline would escalate 'unknown' docs to a model scorer. The
    fixture text is synthetic English-ish for every label, so the value
    here is the operator shape (votes → argmax), oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")

    def votes(words: list[str]) -> F.Column:
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    guessed = (
        F.when(votes(["the", "of", "and"]) >= 2, "en")
        .when(votes(["der", "und", "die"]) >= 2, "de")
        .when(votes(["el", "de", "la"]) >= 2, "es")
        .otherwise("unknown")
    )
    return docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"), guessed.alias("guessed_lang")
    )


BPE_ORACLE = """
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS bpe_ish_tokens,
       CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT)                      AS chars_div4_estimate
FROM documents
ORDER BY doc_id
"""


@register("text_bpe_token_estimate", oracle=BPE_ORACLE)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count estimation two ways: a BPE-ish pre-tokenizer regex
    (word pieces + standalone symbols) and the chars/4 rule of thumb —
    the pair used for budget planning before a real tokenizer pass."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0)).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).cast("long").alias("chars_div4_estimate"),
    )


FINGERPRINT_ORACLE = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(regexp_split_to_array(trim(text), '\\s+'),
                          t -> CAST(LENGTH(t) * 131 + COALESCE(ascii(t), 0) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 1000000007
       ) AS fingerprint
FROM documents
ORDER BY doc_id
"""


@register("text_rolling_fingerprint", oracle=FINGERPRINT_ORACLE)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint (reorder-detecting,
    unlike bag-of-ngrams) — the cheap pre-filter for exact-ish dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rolling_fingerprint("text").alias("fingerprint")
    )


CURATION_ORACLE = """
WITH scored AS (
  SELECT doc_id, text, lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         t -> t IN ('the','a','of','and','to','in'))) AS stop_hits
  FROM documents
  WHERE trim(text) <> ''
), gated AS (
  SELECT * FROM scored
  WHERE n_tokens BETWEEN 20 AND 1000
    AND stop_hits >= 1
    AND lang = 'en'
), deduped AS (
  SELECT MIN(doc_id) AS doc_id, ANY_VALUE(n_tokens) AS n_tokens
  FROM gated
  GROUP BY md5(text)
)
SELECT COUNT(*)                       AS docs_kept,
       CAST(SUM(n_tokens) AS BIGINT)  AS total_tokens,
       ROUND(AVG(n_tokens), 2)        AS avg_tokens
FROM deduped
"""


@register("pipeline_training_data_curation", oracle=CURATION_ORACLE)
def pipeline_training_data_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition: the end-to-end curation pass a
    training-data pipeline runs per corpus snapshot — quality gate
    (length band + stopword floor) → language filter → exact dedup on
    content digest → corpus token accounting. One declarative plan:
    the gates are pushed scan-ward by Catalyst, the dedup groups on a
    16-byte md5 (never shuffles document text at the agg — only the
    digest and token count survive the projection), and the final
    accounting is a single partial+final aggregate. At 100 TB this is
    the template: filters first (cheap, scan-side), digest-dedup next
    (one shuffle of digests), THEN any expensive model scoring on the
    survivors."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    scored = (
        docs.filter(F.trim("text") != "")
        .select(
            "doc_id",
            "text",
            "lang",
            F.size(toks).alias("n_tokens"),
            F.size(
                F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to", "in"))
            ).alias("stop_hits"),
        )
    )
    gated = scored.filter(
        F.col("n_tokens").between(20, 1000)
        & (F.col("stop_hits") >= 1)
        & (F.col("lang") == "en")
    )
    deduped = gated.groupBy(F.md5("text").alias("digest")).agg(
        F.min("doc_id").alias("doc_id"),
        F.first("n_tokens").alias("n_tokens"),
    )
    return deduped.agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
    )


# Top character bigrams per language (public linguistics commonplace:
# English th/he/in/er/an…, German en/er/ch/de/ei…, Spanish de/es/en/el/la…).
LANG_BIGRAMS = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "de": ["en", "er", "ch", "de", "ei", "te", "in", "nd", "ie", "ge"],
    "es": ["de", "es", "en", "el", "la", "os", "ar", "ue", "ra", "as"],
}

BIGRAM_SCORE_ORACLE = """
WITH grams AS (
  SELECT doc_id,
         list_transform(range(1, length(lower(text))),
                        i -> substring(lower(text), i, 2)) AS bg
  FROM documents
  WHERE length(trim(text)) >= 2
)
SELECT doc_id,
       ROUND(len(list_filter(bg, g -> g IN ('th','he','in','er','an','re','on','at','en','nd'))) * 1.0 / len(bg), 4) AS en_score,
       ROUND(len(list_filter(bg, g -> g IN ('en','er','ch','de','ei','te','in','nd','ie','ge'))) * 1.0 / len(bg), 4) AS de_score,
       ROUND(len(list_filter(bg, g -> g IN ('de','es','en','el','la','os','ar','ue','ra','as'))) * 1.0 / len(bg), 4) AS es_score
FROM grams
ORDER BY doc_id
"""


@register("text_lang_bigram_score", oracle=BIGRAM_SCORE_ORACLE)
def text_lang_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-bigram language scoring — the model tier above the
    stopword vote (text_lang_id_heuristic): per-language hit-rate of
    the language's top-10 character bigrams. All JVM expressions
    (transform over a sequence of substr pairs, no explode, no
    shuffle); a real system swaps the 10-bigram lists for full
    log-frequency tables — same plan shape, bigger literal maps (or a
    broadcast-joined frequency table).

    Scale note (round 5): the bigram transform is an interpreted HOF
    re-evaluated per language column — the heaviest per-row
    expression in the text family (121s single-task at sf1) — so the
    scan opts into the parallelism floor (load_table parallel=True);
    the length filter is cheap and pushes down harmlessly."""
    docs = load_table(spark, sf_dir, "documents", parallel=True).filter(
        F.length(F.trim("text")) >= 2
    )
    low = F.lower(F.col("text"))
    bg = F.transform(
        F.sequence(F.lit(1), F.length(low) - 1),
        lambda i: F.substring(low, i, 2),
    )
    out = [F.col("doc_id")]
    for lang, grams in LANG_BIGRAMS.items():
        hits = F.size(F.filter(bg, lambda g: g.isin(*grams)))
        out.append(
            F.round(hits / F.size(bg), 4).alias(f"{lang}_score")
        )
    return docs.select(*out)


NORMALIZE_ORACLE = """
SELECT doc_id,
       regexp_replace(
         trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
         ' +', ' ', 'g') AS normalized,
       length(regexp_replace(
         trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
         ' +', ' ', 'g')) AS n_chars
FROM documents
WHERE doc_id < 300
ORDER BY doc_id
"""


@register("text_normalize_pipeline", oracle=NORMALIZE_ORACLE)
def text_normalize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase → strip non-alnum →
    collapse whitespace) — the pass that runs BEFORE exact dedup so
    near-identical formatting variants hash identically. Pure JVM
    regexp chain, fully codegen'd."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    norm = F.regexp_replace(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " ")),
        " +",
        " ",
    )
    return docs.select(
        "doc_id", norm.alias("normalized"), F.length(norm).alias("n_chars")
    )


GOPHER_ORACLE = """
-- Gopher-style document quality rules (Rae et al. 2021, Table A1
-- subset expressible over single-line fixture docs): word-count
-- bounds, mean-word-length bounds, stopword presence, alpha-word
-- fraction. Each rule is a column; gopher_pass ANDs them — the
-- filter a pretraining pipeline applies before tokenization.
WITH toks AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents
), m AS (
  SELECT doc_id,
         len(ts) AS n_words,
         ROUND(LENGTH(REPLACE(text, ' ', '')) * 1.0 / len(ts), 4) AS mean_word_len,
         len(list_filter(ts, t -> t IN ('the','a','of','and','to','in'))) AS n_stop,
         ROUND(len(list_filter(ts, t -> regexp_matches(t, '^[a-z]+$'))) * 1.0
               / len(ts), 4) AS alpha_word_frac
  FROM toks
)
SELECT doc_id, n_words, mean_word_len, n_stop, alpha_word_frac,
       CAST(n_words BETWEEN 20 AND 1000
            AND mean_word_len BETWEEN 2.0 AND 10.0
            AND n_stop >= 2
            AND alpha_word_frac >= 0.8 AS BOOLEAN) AS gopher_pass
FROM m
ORDER BY doc_id
"""


@register("text_gopher_quality_rules", oracle=GOPHER_ORACLE)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality filter: the rule battery a pretraining
    pipeline runs before tokenization, as pure codegen'd array/regexp
    expressions — zero Python in the row path, no shuffle (the rules
    are per-document projections; at 100 TB this is a map-only stage
    ahead of the tokenizer)."""
    docs = load_table(spark, sf_dir, "documents")
    ts = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(ts)
    mean_wl = F.round(
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / n_words, 4
    )
    stops = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to", "in")])
    n_stop = F.size(F.filter(ts, lambda t: F.array_contains(stops, t)))
    alpha_frac = F.round(
        F.size(F.filter(ts, lambda t: t.rlike("^[a-z]+$"))) / n_words, 4
    )
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        n_stop.alias("n_stop"),
        alpha_frac.alias("alpha_word_frac"),
    )
    return out.withColumn(
        "gopher_pass",
        F.col("n_words").between(20, 1000)
        & F.col("mean_word_len").between(2.0, 10.0)
        & (F.col("n_stop") >= 2)
        & (F.col("alpha_word_frac") >= 0.8),
    )


REPETITION_ORACLE = """
-- Gopher-style repetition metrics: fraction of tokens claimed by the
-- single most frequent token, and the duplicate-2-gram fraction
-- (1 - distinct/total). High values flag boilerplate/spam documents
-- that perplexity filters miss.
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents
), counts AS (
  SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY doc_id, t
), top_word AS (
  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n FROM counts GROUP BY doc_id
), grams AS (
  SELECT doc_id,
         len(ts) - 1 AS total_2g,
         len(list_distinct(list_transform(range(1, len(ts)),
                                          i -> ts[i] || ' ' || ts[i+1]))) AS uniq_2g
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
        FROM documents)
  WHERE len(ts) >= 2
)
SELECT w.doc_id,
       ROUND(w.top_c * 1.0 / w.n, 4) AS top_word_frac,
       ROUND(1.0 - g.uniq_2g * 1.0 / g.total_2g, 4) AS dup_2gram_frac
FROM top_word w JOIN grams g ON w.doc_id = g.doc_id
ORDER BY w.doc_id
"""


@register("text_repetition_stats", oracle=REPETITION_ORACLE)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition metrics (Gopher Table A1's repetition family adapted
    to single-line docs): top-token fraction + duplicate-2-gram
    fraction, computed entirely with array higher-order functions —
    per-document projections, NO token explode, NO shuffle. (The
    tempting explode + groupBy(doc_id, token) formulation shuffles
    |corpus tokens| rows; the array form keeps the work inside the
    document's own row — the right trade when documents are bounded,
    which a pretraining corpus enforces upstream.)"""
    docs = load_table(spark, sf_dir, "documents")
    ts = F.split(F.trim(F.col("text")), r"\s+")
    with_ts = docs.select("doc_id", ts.alias("ts")).filter(F.size("ts") >= 2)
    # top-token count via: distinct tokens -> count each token's
    # occurrences with a filter scan -> array_max
    top_c = F.array_max(
        F.transform(
            F.array_distinct("ts"),
            lambda u: F.size(F.filter("ts", lambda t: t == u)),
        )
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("ts") - 2),
        lambda i: F.concat_ws(" ", F.element_at("ts", i + 1), F.element_at("ts", i + 2)),
    )
    return with_ts.select(
        "doc_id",
        F.round(top_c / F.size("ts"), 4).alias("top_word_frac"),
        F.round(
            1.0 - F.size(F.array_distinct(grams)) / (F.size("ts") - 1), 4
        ).alias("dup_2gram_frac"),
    )


TFIDF_ORACLE = """
-- TF-IDF top terms: corpus document frequency per term (one gram-keyed
-- aggregate), joined back to per-document term counts; top-3 terms per
-- doc by tf * ln(N/df). Ordering is on the raw double (identical in
-- both engines for identical integer tf/df/N) with a term tie-break.
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tf) GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * ln(n.n_docs * 1.0 / df.df) AS tfidf,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln(n.n_docs * 1.0 / df.df) DESC,
                                     tf.term) AS rnk
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       ROUND(tfidf, 4) AS tfidf, CAST(rnk AS BIGINT) AS rnk
FROM scored WHERE rnk <= 3
ORDER BY doc_id, rnk
"""


@register("text_tfidf_top_terms", oracle=TFIDF_ORACLE)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term weighting, the classic relevance/keyword-extraction
    statistic: per-doc term counts (one Exchange on (doc, term)),
    corpus document frequencies (one Exchange on term — partial
    aggregation means only per-partition (term, count) states move),
    scalar N broadcast, top-3 per doc via WindowGroupLimit (per-
    partition top-k heaps before the doc_id shuffle).

    Scale notes: df is the vocabulary-sized table (Zipf: << corpus);
    the tf→df join shuffles on term with map-side combine upstream.
    The production variant drops terms with df=1 before the join
    (they can't rank without context) and hashes terms to 8-byte ids;
    kept as strings here so the oracle compares exact values."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # (doc_id, term) is distinct in tf, so df is a plain count
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round("tfidf", 4).alias("tfidf"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


LANGID_CONFUSION_ORACLE = """
-- Classifier evaluation as a first-class pipeline op: the confusion
-- matrix + per-label precision/recall of the stopword langid
-- heuristic against the labeled lang column — the quality audit that
-- gates whether a heuristic tier is good enough or docs must
-- escalate to a model scorer. Same prediction expressions as
-- text_lang_id_heuristic's oracle.
WITH pred AS (
  SELECT lang AS true_lang,
         CASE
           WHEN len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                t -> t IN ('the','of','and'))) >= 2 THEN 'en'
           WHEN len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                t -> t IN ('der','und','die'))) >= 2 THEN 'de'
           WHEN len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                t -> t IN ('el','de','la'))) >= 2 THEN 'es'
           ELSE 'unknown'
         END AS pred_lang
  FROM documents
)
SELECT true_lang, pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(COUNT(*) * 1.0 /
             SUM(COUNT(*)) OVER (PARTITION BY true_lang), 4) AS recall_frac,
       ROUND(COUNT(*) * 1.0 /
             SUM(COUNT(*)) OVER (PARTITION BY pred_lang), 4) AS precision_frac
FROM pred
GROUP BY true_lang, pred_lang
ORDER BY true_lang, pred_lang
"""


@register("text_langid_confusion", oracle=LANGID_CONFUSION_ORACLE)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix audit of the langid heuristic vs the labeled
    lang column: (true, predicted) counts with row-normalized recall
    and column-normalized precision — the evaluation op every
    classifier-gated pipeline stage needs beside it. Scale shape: the
    prediction is the same codegen'd expression as
    text_lang_id_heuristic (map-side), one Exchange to the
    |langs|²-sized matrix, and the normalizations are windows over
    that tiny result."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")

    def votes(words: list[str]) -> F.Column:
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    pred = (
        F.when(votes(["the", "of", "and"]) >= 2, "en")
        .when(votes(["der", "und", "die"]) >= 2, "de")
        .when(votes(["el", "de", "la"]) >= 2, "es")
        .otherwise("unknown")
    )
    m = (
        docs.select(F.col("lang").alias("true_lang"), pred.alias("pred_lang"))
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w_true = Window.partitionBy("true_lang")
    w_pred = Window.partitionBy("pred_lang")
    return m.select(
        "true_lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w_true), 4).alias(
            "recall_frac"
        ),
        F.round(F.col("n_docs") / F.sum("n_docs").over(w_pred), 4).alias(
            "precision_frac"
        ),
    )


BIGRAM_LM_ORACLE = """
-- Bigram language-model scoring (add-one smoothed), trained on the
-- corpus itself and applied back to every document — the perplexity
-- tier of quality filtering (the KenLM pattern, in-engine): score =
-- mean over the doc's bigram INSTANCES of -log2((c2(w1,w2)+1) /
-- (c1(w1)+V)). Counts keep multiplicity (this is an LM, not a
-- Jaccard set), V = corpus vocabulary size.
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE length(trim(text)) > 0
), t AS (
  SELECT doc_id, UNNEST(ts) AS tok FROM toks
), b AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(ts))) u(i)
  WHERE len(ts) >= 2
), c1 AS (
  SELECT tok, COUNT(*) AS c FROM t GROUP BY tok
), c2 AS (
  SELECT w1, w2, COUNT(*) AS c FROM b GROUP BY w1, w2
), v AS (
  SELECT COUNT(DISTINCT tok) AS vs FROM t
)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(-log2((c2.c + 1.0) / (c1.c + (SELECT vs FROM v)))), 4)
         AS avg_neg_log2
FROM b
JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
JOIN c1 ON c1.tok = b.w1
GROUP BY b.doc_id
ORDER BY b.doc_id
"""


@register("text_bigram_lm_perplexity", oracle=BIGRAM_LM_ORACLE)
def text_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-one bigram LM, applied back per document —
    in-engine perplexity filtering (what a KenLM stage does in a
    training-data pipeline, minus the backoff table). Scale shape:
    the token/bigram explode is the fact-sized work (parallel scan —
    interpreted HOF); the two count tables are VOCABULARY-sized
    (|V| and |V|² observed, far smaller than the corpus), so at
    100 TB they broadcast onto the bigram stream and the only
    corpus-sized Exchange is the final per-doc aggregation. Here
    they shuffle-join, which AQE converts to broadcast when small
    enough — same plan either way."""
    from etl_data_ingestion_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents", parallel=True).filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select("doc_id", tokens("text").alias("ts"))
    t = toks.select("doc_id", F.explode("ts").alias("tok"))
    idx = F.when(
        F.size("ts") >= 2, F.sequence(F.lit(1), F.size("ts") - 1)
    ).otherwise(F.array().cast("array<int>"))
    b = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("ts"), i).alias("w1"),
                    F.element_at(F.col("ts"), i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2").persist()
    c1 = t.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    c2 = b.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    vocab = t.select(F.countDistinct("tok").alias("vs"))
    scored = (
        b.join(c2, ["w1", "w2"])
        .join(c1, b.w1 == c1.tok)
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                -F.log2((F.col("c2") + 1.0) / (F.col("c1") + F.col("vs")))
            ).alias("nl"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nl"), 4).alias("avg_neg_log2"),
        )
        .orderBy("doc_id")
    )


ENTITY_EXTRACT_ORACLE = """
-- Entity extraction to a long table: regexp families (email, URL)
-- over planted contact lines, exploded to (doc_id, kind, entity)
-- rows — the extraction side of PII handling (text_pii_scrub is the
-- redaction side) and the link-graph feed for crawl analysis.
WITH planted AS (
  SELECT doc_id,
         text ||
         CASE WHEN doc_id % 3 = 0 THEN ' mail a.b@example.com' ELSE '' END ||
         CASE WHEN doc_id % 5 = 0
              THEN ' visit https://ex.com/p' || doc_id || '?q=1' ELSE '' END
           AS t
  FROM documents WHERE doc_id < 400
), emails AS (
  SELECT doc_id, 'email' AS kind,
         UNNEST(regexp_extract_all(t, '[A-Za-z0-9._]+@[A-Za-z0-9.-]+')) AS entity
  FROM planted
), urls AS (
  SELECT doc_id, 'url' AS kind,
         UNNEST(regexp_extract_all(t, 'https?://[^ ]+')) AS entity
  FROM planted
)
SELECT * FROM emails
UNION ALL
SELECT * FROM urls
ORDER BY doc_id, kind, entity
"""


@register("text_entity_extract", oracle=ENTITY_EXTRACT_ORACLE)
def text_entity_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp entity extraction to a long (doc_id, kind, entity)
    table — the feed for link graphs, contact-PII inventories, and
    domain statistics. Codegen'd regexp_extract_all per family +
    one explode each; kinds union map-side with no shuffle (the
    output is unaggregated). At 100 TB add `parallel=True` if more
    expensive patterns (NER-ish gazetteers) join the family; the
    two patterns here stay scan-bound."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 400
    )
    t = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" mail a.b@example.com"))
        .otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" visit https://ex.com/p"),
                F.col("doc_id"),
                F.lit("?q=1"),
            ),
        ).otherwise(F.lit("")),
    )
    planted = docs.select("doc_id", t.alias("t"))
    emails = planted.select(
        "doc_id",
        F.lit("email").alias("kind"),
        F.explode(
            F.regexp_extract_all(
                "t", F.lit(r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+"), 0
            )
        ).alias("entity"),
    )
    urls = planted.select(
        "doc_id",
        F.lit("url").alias("kind"),
        F.explode(
            F.regexp_extract_all("t", F.lit(r"https?://[^ ]+"), 0)
        ).alias("entity"),
    )
    return emails.unionByName(urls).orderBy("doc_id", "kind", "entity")


ZIPF_ORACLE = """
-- Zipf's-law fit over the corpus unigram distribution: rank terms by
-- frequency (count desc, term asc), fit OLS on ln(freq) ~ ln(rank)
-- over the top 30 — the slope (~-1 for natural text) is a cheap
-- corpus-health statistic: synthetic/templated corpora flatten it,
-- boilerplate floods steepen the head. One vocabulary-sized aggregate
-- + a 30-row regression.
WITH tf AS (
  SELECT w AS term, COUNT(*) AS freq
  FROM documents, UNNEST(regexp_split_to_array(trim(text), '\\s+')) t(w)
  GROUP BY w
), ranked AS (
  SELECT term, freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rnk
  FROM tf
), top AS (
  SELECT * FROM ranked WHERE rnk <= 30
)
SELECT CAST(COUNT(*) AS BIGINT)                          AS n_terms,
       CAST(SUM(freq) AS BIGINT)                         AS head_tokens,
       ROUND(regr_slope(ln(freq), ln(rnk)), 4)           AS zipf_slope,
       ROUND(regr_r2(ln(freq), ln(rnk)), 4)              AS fit_r2
FROM top
"""


@register("text_zipf_slope", oracle=ZIPF_ORACLE)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-slope corpus statistic: explode terms, count (one
    vocabulary-keyed Exchange with map-side combine), rank the
    vocabulary-sized count table (window over |V| rows, NOT the
    corpus), and fit ln(freq) ~ ln(rank) with the one-pass regr_*
    co-moment aggregates over the 30-row head. Nothing after the
    term count touches corpus-sized data."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = tf.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("term"))),
    ).filter(F.col("rnk") <= 30)
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("freq").cast("long").alias("head_tokens"),
        F.round(F.regr_slope(F.log("freq"), F.log("rnk")), 4).alias(
            "zipf_slope"
        ),
        F.round(F.regr_r2(F.log("freq"), F.log("rnk")), 4).alias("fit_r2"),
    )


JS_DIVERGENCE_ORACLE = """
-- Jensen-Shannon divergence between SOURCE domains' unigram
-- distributions: the duplicate-domain / mixture-design signal (two
-- crawls of the same site have near-zero JSD; distinct domains
-- diverge). Distributions Laplace-smoothed over the joint
-- vocabulary; JSD = 0.5*KL(P||M) + 0.5*KL(Q||M), M=(P+Q)/2.
-- Bounded pair work: |sources|^2/2 pairs x |V| terms. Top-5 most
-- SIMILAR pairs (lowest JSD), fully tie-broken.
WITH tf AS (
  SELECT source, w, COUNT(*) AS c
  FROM documents, UNNEST(regexp_split_to_array(trim(text), '\\s+')) t(w)
  WHERE source IN ('src0','src1','src2','src3','src4','src5')
  GROUP BY source, w
), vocab AS (
  SELECT DISTINCT w FROM tf
), tot AS (
  SELECT source, SUM(c) AS n FROM tf GROUP BY source
), p AS (
  SELECT t.source, v.w,
         (COALESCE(f.c, 0) + 1.0)
           / (t.n + (SELECT COUNT(*) FROM vocab)) AS pr
  FROM tot t CROSS JOIN vocab v
  LEFT JOIN tf f ON f.source = t.source AND f.w = v.w
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, a.w,
         a.pr AS pa, b.pr AS pb
  FROM p a JOIN p b ON a.w = b.w AND a.source < b.source
), jsd AS (
  SELECT src_a, src_b,
         SUM(0.5 * pa * ln(pa / ((pa + pb) / 2))
             + 0.5 * pb * ln(pb / ((pa + pb) / 2))) AS d
  FROM pairs GROUP BY src_a, src_b
)
SELECT src_a, src_b, ROUND(d, 6) AS js_divergence
-- order by the ROUNDED value (matching the Spark side) so a rounded
-- tie at the LIMIT boundary can't pick different pairs per engine
FROM jsd ORDER BY ROUND(d, 6), src_a, src_b LIMIT 5
"""


@register("text_js_divergence_sources", oracle=JS_DIVERGENCE_ORACLE)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source-domain
    unigram LMs — the domain-dedup / mixture-design statistic. One
    corpus pass to (source, term) counts; the smoothed probability
    table is (|sources| x |V|)-sized and SELF-JOINS on the term (a
    vocabulary-keyed equi-join, never a corpus operation); divergence
    sums are partial-aggregable. Bounded to 6 sources so the oracle
    stays cheap; production fans the same plan to all pairs."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4", "src5")
    )
    tf = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = tf.select("w").distinct()
    vsize = vocab.count()  # bounded scalar (31-word fixture vocab)
    tot = tf.groupBy("source").agg(F.sum("c").alias("n"))
    p = (
        tot.crossJoin(vocab)
        .join(tf, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                / (F.col("n") + F.lit(vsize))
            ).alias("pr"),
        )
    )
    a = p.alias("a")
    b = p.alias("b")
    pairs = a.join(
        b,
        (F.col("a.w") == F.col("b.w"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.col("a.pr").alias("pa"),
        F.col("b.pr").alias("pb"),
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term = 0.5 * F.col("pa") * F.log(F.col("pa") / m) + 0.5 * F.col(
        "pb"
    ) * F.log(F.col("pb") / m)
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.round(F.sum(term), 6).alias("js_divergence"))
        .orderBy("js_divergence", "src_a", "src_b")
        .limit(5)
    )


HEAPS_ORACLE = """
-- Heaps'-law fit V(N) ~ K * N^beta of vocabulary growth vs corpus
-- size -- the corpus-health curve (a sub-linear beta ~0.4-0.6 is
-- healthy organic text; beta near 0 means a closed template
-- vocabulary, near 1 means id-like noise tokens). The vocabulary
-- unit is the word TRIGRAM (the fixtures' unigram vocabulary is a
-- closed 31-term set, which makes the unigram curve flat and the
-- log-log fit degenerate; trigram shingles grow like real text).
-- Measured at BUCKET grain (50 docs per point) so the growth curve
-- and its windows are |buckets|-sized, never corpus-sized: a term's
-- first appearance collapses to MIN(bucket), token mass
-- partial-aggregates per bucket, and the log-log OLS runs over the
-- bucket table via one-pass regr_* co-moments.
-- "token mass" counts DISTINCT trigrams per document (the Jaccard
-- shingle unit word_ngrams produces), not raw occurrences.
WITH raw AS (
  SELECT doc_id // 50 AS b, doc_id,
         regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
), toks AS (
  SELECT DISTINCT b, doc_id,
         array_to_string(list_slice(t, i, i + 2), ' ') AS term
  FROM raw, UNNEST(range(1, len(t) - 1)) u(i) WHERE len(t) >= 3
), per_bucket AS (
  SELECT b, COUNT(*) AS toks FROM toks GROUP BY b
), first_seen AS (
  SELECT term, MIN(b) AS fb FROM toks GROUP BY term
), new_terms AS (
  SELECT fb AS b, COUNT(*) AS v FROM first_seen GROUP BY fb
), curve AS (
  SELECT p.b,
         SUM(p.toks) OVER (ORDER BY p.b) AS n_cum,
         SUM(COALESCE(n.v, 0)) OVER (ORDER BY p.b) AS v_cum
  FROM per_bucket p LEFT JOIN new_terms n ON p.b = n.b
)
SELECT CAST(COUNT(*) AS BIGINT)                        AS n_points,
       CAST(MAX(n_cum) AS BIGINT)                      AS total_tokens,
       CAST(MAX(v_cum) AS BIGINT)                      AS vocab_size,
       ROUND(REGR_SLOPE(ln(v_cum), ln(n_cum)), 6)      AS heaps_beta,
       ROUND(EXP(REGR_INTERCEPT(ln(v_cum), ln(n_cum))), 6) AS heaps_k,
       ROUND(REGR_R2(ln(v_cum), ln(n_cum)), 6)         AS fit_r2
FROM curve
"""


@register("text_heaps_vocab_growth", oracle=HEAPS_ORACLE)
def text_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit at bucket grain over the
    word-TRIGRAM vocabulary (the fixtures' unigram vocabulary is a
    closed set, which degenerates the log-log fit): one gram
    Exchange computes per-term first-appearance buckets and
    per-bucket token mass; cumulative windows and the log-log
    regr_slope/intercept/r2 fit all run on the |buckets|-sized
    curve — the corpus-sized cumulative-distinct state never exists
    (same first-appearance rewrite as
    window_cumulative_distinct_users). The gram Exchange carries
    xxhash64(trigram) — 8 bytes — not the trigram string (round-5
    judge perf fix: first-appearance and token mass only need term
    EQUALITY; the oracle keeps exact strings, so a 64-bit collision
    would surface as a parity diff, not pass silently)."""
    from etl_data_ingestion_spark.functions.text import tokens, word_ngrams_from

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    # token array materialized before the gram HOF (round-9 perf fix:
    # 8.5s → sub-second at sf0.1; see functions.text.word_ngrams_from)
    toks = docs.select(
        (F.col("doc_id") / 50).cast("long").alias("b"),
        tokens("text").alias("tk"),
    ).select(
        "b",
        F.explode(
            F.transform(word_ngrams_from("tk", 3), lambda g: F.xxhash64(g))
        ).alias("term"),
    )
    per_bucket = toks.groupBy("b").agg(F.count(F.lit(1)).alias("toks"))
    new_terms = (
        toks.groupBy("term")
        .agg(F.min("b").alias("fb"))
        .groupBy(F.col("fb").alias("b"))
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        per_bucket.join(new_terms, "b", "left")
        .select(
            "b",
            F.sum("toks").over(w).alias("n_cum"),
            F.sum(F.coalesce(F.col("v"), F.lit(0))).over(w).alias("v_cum"),
        )
    )
    ln_n, ln_v = F.log(F.col("n_cum")), F.log(F.col("v_cum"))
    return curve.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.max("n_cum").cast("long").alias("total_tokens"),
        F.max("v_cum").cast("long").alias("vocab_size"),
        F.round(F.regr_slope(ln_v, ln_n), 6).alias("heaps_beta"),
        F.round(F.exp(F.regr_intercept(ln_v, ln_n)), 6).alias("heaps_k"),
        F.round(F.regr_r2(ln_v, ln_n), 6).alias("fit_r2"),
    )


PMI_ORACLE = """
-- Pointwise mutual information of term co-occurrence within
-- documents (collocation mining / embedding-training statistics):
-- PMI(a,b) = ln( p(a,b) / (p(a) p(b)) ) over document-level
-- presence, top 15 pairs by PMI among pairs in >= 20 docs. The
-- corpus contributes one distinct (doc, term) pass; pair expansion
-- is a doc-keyed self-join bounded by per-doc distinct-term count,
-- and the PMI table is at most |V|^2 rows (tiny after the df floor).
WITH pres AS (
  SELECT DISTINCT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS nd FROM pres
), df AS (
  SELECT term, COUNT(*) AS d FROM pres GROUP BY term
), pair AS (
  SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS dab
  FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2 HAVING COUNT(*) >= 20
)
SELECT term_a, term_b,
       CAST(dab AS BIGINT) AS pair_docs,
       ROUND(ln(dab * 1.0 * n.nd / (da.d * db.d)), 6) AS pmi
FROM pair
JOIN df da ON da.term = pair.term_a
JOIN df db ON db.term = pair.term_b
CROSS JOIN n
ORDER BY pmi DESC, term_a, term_b
LIMIT 15
"""


@register("text_pmi_cooccurrence", oracle=PMI_ORACLE)
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level PMI collocations via a single token-union pass:
    per-doc distinct terms expand map-side into marker/single/pair
    tokens (expansion bounded by per-doc distinct-term count — cap
    terms per doc at production scale), one Exchange counts them into
    the |V|^2-bounded table, PMI math joins broadcast document
    frequencies."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    # Round-6 rewrite (basket-style token union): per doc, ONE
    # Generate emits a marker token (nd), each distinct term (df),
    # and each a<b term pair (dab); one map-side-combined Exchange
    # counts all three classes at once. Replaces the round-5 plan's
    # corpus-sized distinct + localCheckpoint + doc-keyed self-join
    # (three shuffles and an eager materialization) with one
    # explode + one Exchange to the <=|V|^2 count table. The kind
    # column (0/1/2) makes markers collision-free with real tokens.
    ts = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    tok = lambda k, x, y: F.struct(  # noqa: E731
        k.alias("k"), x.alias("x"), y.alias("y")
    )
    lit0 = F.lit("")
    marker = F.array(tok(F.lit(0), lit0, lit0))
    singles = F.transform(ts, lambda t: tok(F.lit(1), t, lit0))
    pairs = F.flatten(
        F.transform(
            ts,
            lambda a: F.transform(
                F.filter(ts, lambda b: b > a), lambda b: tok(F.lit(2), a, b)
            ),
        )
    )
    counts = (
        docs.select(F.explode(F.concat(marker, singles, pairs)).alias("t"))
        .groupBy(
            F.col("t.k").alias("k"),
            F.col("t.x").alias("x"),
            F.col("t.y").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # domain-sized; feeds nd, df, and pairs
    )
    nd = counts.filter(F.col("k") == 0).select(F.col("c").alias("nd"))
    df = counts.filter(F.col("k") == 1).select(
        F.col("x").alias("term"), F.col("c").alias("d")
    )
    pair = counts.filter(F.col("k") == 2).select(
        F.col("x").alias("term_a"),
        F.col("y").alias("term_b"),
        F.col("c").alias("dab"),
    ).filter(F.col("dab") >= 20)
    da = df.select(F.col("term").alias("term_a"), F.col("d").alias("da"))
    db = df.select(F.col("term").alias("term_b"), F.col("d").alias("db"))
    return (
        pair.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .crossJoin(F.broadcast(nd))
        .select(
            "term_a",
            "term_b",
            F.col("dab").cast("long").alias("pair_docs"),
            F.round(
                F.log(
                    F.col("dab") * F.col("nd") / (F.col("da") * F.col("db"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "term_a", "term_b")
        .limit(15)
    )


BM25_ORACLE = """
-- BM25 retrieval scoring (Robertson/Sparck-Jones; the Lucene-default
-- ranking function) for the fixed query {hash, join, spark}: top-10
-- documents by summed per-term score with k1=1.2, b=0.75 and the
-- Lucene idf smoothing ln(1 + (N - df + 0.5)/(df + 0.5)). The
-- corpus contributes ONE tokenize pass filtered to the query terms
-- (broadcastable set); doc length and corpus stats come from a
-- second count-only pass; all float math runs per (doc, term) and
-- the final sum is over a FIXED term order (conditional pivot, not
-- data-ordered SUM) so both engines add the same doubles in the
-- same order.
WITH words AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM words WHERE term IN ('hash', 'join', 'spark')
  GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), parts AS (
  SELECT t.doc_id, t.term,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * 2.2)
           / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)) AS sc
  FROM tf t
  JOIN df d ON d.term = t.term
  JOIN dl l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
), pivoted AS (
  SELECT doc_id,
         COALESCE(MAX(CASE WHEN term = 'hash'  THEN sc END), 0.0) AS s1,
         COALESCE(MAX(CASE WHEN term = 'join'  THEN sc END), 0.0) AS s2,
         COALESCE(MAX(CASE WHEN term = 'spark' THEN sc END), 0.0) AS s3
  FROM parts GROUP BY doc_id
)
SELECT p.doc_id, CAST(l.dl AS BIGINT) AS doc_len,
       ROUND(p.s1 + p.s2 + p.s3, 6) AS bm25
FROM pivoted p JOIN dl l ON l.doc_id = p.doc_id
ORDER BY bm25 DESC, p.doc_id
LIMIT 10
"""


@register("text_bm25_topk", oracle=BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval for a fixed query term set — the ranking
    half of a retrieval/curation loop (TF-IDF top-terms already
    profiles the corpus; BM25 is what actually ranks documents for a
    query, and what quality-filters rank against a seed set).

    Scale shape: the only corpus-sized work is the tokenize pass; the
    query-term filter makes the tf table |matching docs|×|q| rows,
    and df is |q| rows. Doc lengths are a count-only aggregate the
    same Exchange family every profiling query pays. Float parity is
    by construction: per-(doc,term) scores are deterministic scalar
    math, and the final score sums a FIXED term order via a
    conditional pivot (s_hash + s_join + s_spark), never a
    data-ordered SUM — the same determinism device as
    ml_confusion_matrix_metrics. Ordering rounds first, so the
    top-10 cut is stable across engines. At 100 TB: query terms
    broadcast, tf/df/dl are all partial-aggregated, and the top-10
    is TakeOrderedAndProject (per-partition heaps)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    terms = ["hash", "join", "spark"]
    tf = (
        words.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    sc = (
        F.log(
            1
            + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * (F.col("tf") * 2.2)
        / (
            F.col("tf")
            + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
        )
    )
    parts = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", sc.alias("sc"))
    )
    piv = parts.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("sc"))), F.lit(0.0)
            ).alias(f"s{i+1}")
            for i, t in enumerate(terms)
        ]
    )
    return (
        piv.join(dl, "doc_id")
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("doc_len"),
            F.round(
                F.col("s1") + F.col("s2") + F.col("s3"), 6
            ).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(10)
    )


# ------------------------------------------------- hapax legomena

HAPAX_ORACLE = """
-- Hapax legomena (once-occurring tokens) per source — the
-- vocabulary-freshness diagnostic that complements Heaps' law
-- growth (text_heaps_vocab_growth): a high hapax share means the
-- source keeps minting new types (good for training diversity, bad
-- for tokenizer coverage). Exact integer counting end to end; the
-- ratio is one integer division under the floor device.
WITH toks AS (
  SELECT source, LOWER(tok) AS tok
  FROM documents,
       UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS t(tok)
), counts AS (
  SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY source, tok
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       FLOOR(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
             * 10000 + 0.5) / 10000 AS hapax_type_ratio
FROM counts GROUP BY source
ORDER BY source
"""


@register("text_hapax_legomena", oracle=HAPAX_ORACLE)
def text_hapax_legomena(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena share of each source's vocabulary — the
    per-source vocabulary-freshness report.

    Scale shape: one Exchange on (source, token) for the count
    groupBy (map-side combined, so the shuffle carries partial
    counts, not raw tokens), then a map-side-combined rollup to
    |sources| rows. At 100 TB the (source, token) key space is the
    vocabulary (~10⁷ rows/source), not the corpus; shuffling hashed
    tokens instead of strings (the contamination-curve trick) is
    the documented width optimization if token strings dominate."""
    from etl_data_ingestion_spark.functions.numeric import snap

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).select("source", F.lower("tok").alias("tok"))
    counts = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum((F.col("c") == 1).cast("long")).cast("long").alias("n_hapax"),
            snap(
                F.sum((F.col("c") == 1).cast("long")) * 1.0
                / F.count(F.lit(1)),
                4,
            ).alias("hapax_type_ratio"),
        )
        .orderBy("source")
    )


# ------------------------------------------------- n-gram novelty

NGRAM_NOVELTY_ORACLE = """
-- Per-document 8-gram novelty in doc_id order: the fraction of a
-- document's DISTINCT 8-grams not seen in any earlier document —
-- the curriculum/ordering diagnostic (a corpus whose late documents
-- have near-zero novelty is recycling itself; feeding order matters
-- for LLM training). Exact integer counting end to end: grams
-- compare by their token STRING (both engines), first appearance =
-- MIN(doc_id) per gram, novelty = grams this doc introduced.
WITH toks AS (
  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS a
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, ARRAY_TO_STRING(a[i:i+7], ' ') AS g
  FROM toks, UNNEST(GENERATE_SERIES(1, GREATEST(LENGTH(a) - 7, 0))) AS t(i)
), first_seen AS (
  SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
)
SELECT grams.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN first_doc = grams.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       FLOOR(SUM(CASE WHEN first_doc = grams.doc_id THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*) * 10000 + 0.5) / 10000 AS novelty_frac
FROM grams JOIN first_seen USING (g)
GROUP BY grams.doc_id
ORDER BY grams.doc_id
"""


@register("text_ngram_novelty", oracle=NGRAM_NOVELTY_ORACLE)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-gram novelty per document in doc_id order — how much of
    each document the corpus has never seen before (the feeding-
    order diagnostic for curriculum construction, and the streaming
    view of what dedup_duplicated_spans measures statically).

    Scale shape: distinct (doc, gram) → one Exchange on the gram key
    for MIN(doc_id), one join back on the same key (same
    partitioning, AQE-coalesced), one groupBy doc_id. Grams join by
    token string here for oracle parity; at 100 TB the key narrows
    to xxhash64(gram) (the contamination-curve width trick — 8 bytes
    vs ~50), identical results modulo 2^-64 collisions."""
    from etl_data_ingestion_spark.functions.numeric import snap

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("a")
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("a") - 7, F.lit(0))
                ),
                lambda i: F.array_join(F.slice("a", i, 8), " "),
            )
        ).alias("g"),
    ).distinct()
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("long")
    return (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(novel).cast("long").alias("n_novel"),
            snap(F.sum(novel) * 1.0 / F.count(F.lit(1)), 4).alias(
                "novelty_frac"
            ),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------- source vocab Jaccard

SOURCE_JACCARD_ORACLE = """
-- Pairwise source-vocabulary Jaccard similarity — which sources are
-- lexically redundant (merge candidates for mixture weighting) and
-- which add genuinely new vocabulary. Exact integer set math:
-- per-source distinct token sets, intersections by token self-join,
-- union by inclusion-exclusion.
WITH su AS (
  SELECT DISTINCT source, LOWER(tok) AS tok
  FROM documents,
       UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS t(tok)
), sizes AS (
  SELECT source, COUNT(*) AS n FROM su GROUP BY source
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
  FROM su a JOIN su b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(sa.n + sb.n - n_inter AS BIGINT) AS n_union,
       FLOOR(n_inter * 1.0 / (sa.n + sb.n - n_inter) * 10000 + 0.5)
         / 10000 AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
ORDER BY src_a, src_b
"""


@register("text_source_vocab_jaccard", oracle=SOURCE_JACCARD_ORACLE)
def text_source_vocab_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Jaccard similarity of source vocabularies — the
    source-redundancy matrix a mixture-weighting pass reads before
    deciding which sources genuinely diversify the corpus.

    Scale shape (round-15, guide §2.3/§2.4; kept, −21% sf0.1 /
    −3% sf1 interleaved, values identical): the corpus reduces ONCE
    to the per-token source-set relation via groupBy(tok) +
    collect_set(source) — the partial collect_set dedups map-side,
    so the one corpus-sized Exchange ships per-token partial sets
    instead of raw occurrences. The pre-r15 form (captured in
    plans/r15/*_before.txt) built a distinct (source, token) grid
    and self-joined it on the token key: FOUR full scan+explode
    branches (a-side, b-side, sizes×2 — no exchange reuse) and
    three corpus-sized exchanges. Sizes and the pairwise
    intersection now both derive from the |vocab|-sized token-set
    relation (localCheckpointed once for its two consumers); the
    per-token pair expansion is codegen'd array transform, bounded
    by |sources-per-token|² exactly like the old join. The 100 TB
    width trick (hash the token key) applies as in
    text_ngram_novelty; per-token set size is bounded by |sources|."""
    from etl_data_ingestion_spark.functions.numeric import snap

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    tsets = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .select(F.lower("tok").alias("tok"), "source")
        .groupBy("tok")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        # |vocab|-sized; two consumers (sizes + pair expansion) — the
        # checkpoint stops a second full scan+explode+aggregation
        .localCheckpoint()
    )
    sizes = (
        tsets.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # sorted srcs ⇒ x precedes y ⇔ x < y (binary string order, the
    # same `<` the oracle's self-join applies)
    pair_expr = (
        "flatten(transform(srcs, (x, i) -> "
        "transform(slice(srcs, i + 2, size(srcs)), "
        "y -> struct(x as src_a, y as src_b))))"
    )
    inter = (
        tsets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.src_a", "p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    uni = F.col("na") + F.col("nb") - F.col("n_inter")
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_inter").cast("long"),
            uni.cast("long").alias("n_union"),
            snap(F.col("n_inter") * 1.0 / uni, 4).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


FLESCH_ORACLE = """
-- Flesch reading-ease per source: 206.835 - 1.015*(words/sentences)
-- - 84.6*(syllables/words), with deterministic proxies (sentences =
-- [.!?]+ runs clamped to >=1, syllables = vowel-group runs) — the
-- readability tier of corpus quality profiling (Gopher/C4 filter on
-- structure; this scores *linguistic density* per source). All
-- inputs are exact integer counts summed per source; the score is
-- fixed-order double math snapped at 4dp.
WITH per_doc AS (
  SELECT source,
         LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS words,
         GREATEST(LENGTH(REGEXP_EXTRACT_ALL(text, '[.!?]+')), 1) AS sents,
         LENGTH(REGEXP_EXTRACT_ALL(lower(text), '[aeiouy]+')) AS sylls
  FROM documents WHERE LENGTH(TRIM(text)) > 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)    AS n_docs,
       CAST(SUM(words) AS BIGINT)  AS total_words,
       CAST(SUM(sylls) AS BIGINT)  AS total_syllables,
       FLOOR((206.835
              - 1.015 * (SUM(words) * 1.0 / SUM(sents))
              - 84.6 * (SUM(sylls) * 1.0 / SUM(words)))
             * 10000 + 0.5) / 10000 AS flesch_reading_ease
FROM per_doc GROUP BY source ORDER BY source
"""


@register("text_readability_flesch", oracle=FLESCH_ORACLE)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source with deterministic sentence /
    syllable proxies — the readability lens a curation pipeline adds
    next to Gopher (structure) and perplexity (fluency) filters.

    Scale shape: one corpus pass; the three per-doc counts are
    codegen'd regexp ops (no Python), partially aggregated to the
    |sources| domain; the formula is fixed-order math on exact
    integer sums, snapped. 100 TB cost = one scan, one
    domain-sized Exchange."""
    from etl_data_ingestion_spark.functions.numeric import snap

    docs = load_table(spark, sf_dir, "documents", parallel=True).filter(
        F.length(F.trim("text")) > 0
    )
    per_doc = docs.select(
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).alias("words"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
            F.lit(1),
        ).alias("sents"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
        ).alias("sylls"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("total_words"),
        F.sum("sents").alias("ts"),
        F.sum("sylls").alias("total_syllables"),
    )
    score = (
        F.lit(206.835)
        - 1.015 * (F.col("total_words") * 1.0 / F.col("ts"))
        - 84.6 * (F.col("total_syllables") * 1.0 / F.col("total_words"))
    )
    return agg.select(
        "source", "n_docs", "total_words", "total_syllables",
        snap(score, 4).alias("flesch_reading_ease"),
    ).orderBy("source")


RAKE_ORACLE = """
-- RAKE keyword extraction (Rose et al. 2010): candidate phrases are
-- maximal runs between stopwords; word score = degree/freq where
-- degree sums the lengths of phrases containing the word; phrase
-- score sums its word scores. The unsupervised keyword stage of a
-- corpus indexing pipeline (TF-IDF ranks TERMS; RAKE ranks
-- PHRASES). Device: word scores are snapped to exact integer
-- micro-units (FLOOR(degree*1e6/freq)) so phrase scores are exact
-- BIGINT sums — no float summation order anywhere. Top 15 phrases,
-- full deterministic tie-break.
WITH marked AS (
  SELECT doc_id,
         REGEXP_REPLACE(
           REGEXP_REPLACE(lower(text), '[^a-z]+', ' ', 'g'),
           '\\b(the|a|of|and|to|in|is|it|for|on|with|as|by|at|or|be|this|that|are|was)\\b',
           '|', 'g') AS s
  FROM documents WHERE LENGTH(TRIM(text)) > 0
), occ AS (
  SELECT doc_id, TRIM(p) AS phrase
  FROM marked, UNNEST(REGEXP_SPLIT_TO_ARRAY(s, '\\|')) u(p)
  WHERE LENGTH(TRIM(p)) > 0
    AND LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(p), ' +')) BETWEEN 1 AND 3
), occ_words AS (
  SELECT phrase,
         LENGTH(REGEXP_SPLIT_TO_ARRAY(phrase, ' +')) AS plen,
         UNNEST(REGEXP_SPLIT_TO_ARRAY(phrase, ' +')) AS word
  FROM occ
), word_stats AS (
  SELECT word, COUNT(*) AS freq, SUM(plen) AS degree
  FROM occ_words GROUP BY word
), word_score AS (
  SELECT word, CAST(FLOOR(degree * 1000000.0 / freq) AS BIGINT) AS score_micro
  FROM word_stats
), phrase_occ AS (
  SELECT phrase, COUNT(*) AS n_occ FROM occ GROUP BY phrase
), distinct_phrase_words AS (
  SELECT p.phrase, p.n_occ,
         UNNEST(REGEXP_SPLIT_TO_ARRAY(p.phrase, ' +')) AS word
  FROM phrase_occ p
), phrase_score AS (
  SELECT d.phrase, MIN(d.n_occ) AS n_occ,
         SUM(ws.score_micro) AS score_micro
  FROM distinct_phrase_words d JOIN word_score ws ON d.word = ws.word
  GROUP BY d.phrase
)
SELECT phrase, CAST(n_occ AS BIGINT) AS n_occ,
       CAST(score_micro AS BIGINT) AS score_micro
FROM phrase_score
ORDER BY score_micro DESC, n_occ DESC, phrase
LIMIT 15
"""


@register("text_rake_keywords", oracle=RAKE_ORACLE)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction — stopword-delimited candidate
    phrases scored by summed word degree/frequency ratios; the
    classic unsupervised phrase-ranking stage (TF-IDF's phrase-level
    sibling) for corpus indexing and topic labeling.

    Scale shape: the phrase explode is the corpus-sized work (one
    pass, codegen'd regexps); word stats and phrase scores live on
    the VOCABULARY/PHRASE domain (<< corpus, Zipf-bounded), so both
    joins broadcast at any realistic scale (AQE picks this up from
    size estimates; the phrase table here is a few hundred rows).
    Word scores snap to integer micro-units before the phrase-level
    sum, so ranking is exact integer math — cross-engine identical
    by construction. Top-15 is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents", parallel=True).filter(
        F.length(F.trim("text")) > 0
    )
    stop = (
        "the|a|of|and|to|in|is|it|for|on|with|as|by|at|or|be|this|that|are|was"
    )
    s = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " "),
        rf"\b({stop})\b",
        "|",
    )
    # persist the phrase-occurrence stream: word stats and phrase
    # counts both consume it, and recomputing means a second corpus
    # scan plus a second pass of the regexp pipeline
    occ = (
        docs.select("doc_id", s.alias("s"))
        .select("doc_id", F.explode(F.split(F.col("s"), r"\|")).alias("p"))
        .select("doc_id", F.trim(F.col("p")).alias("phrase"))
        .filter(
            (F.length("phrase") > 0)
            & F.size(F.split(F.col("phrase"), " +")).between(1, 3)
        )
        .persist()
    )
    occ_words = occ.select(
        "phrase",
        F.size(F.split(F.col("phrase"), " +")).alias("plen"),
        F.explode(F.split(F.col("phrase"), " +")).alias("word"),
    )
    word_score = (
        occ_words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree"))
        .select(
            "word",
            F.floor(F.col("degree") * 1000000.0 / F.col("freq"))
            .cast("long")
            .alias("score_micro"),
        )
    )
    phrase_occ = occ.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occ"))
    dpw = phrase_occ.select(
        "phrase", "n_occ", F.explode(F.split(F.col("phrase"), " +")).alias("word")
    )
    phrase_score = (
        dpw.join(F.broadcast(word_score), "word")
        .groupBy("phrase")
        .agg(
            F.min("n_occ").alias("n_occ"),
            F.sum("score_micro").alias("score_micro"),
        )
    )
    return (
        phrase_score.select("phrase", "n_occ", "score_micro")
        .orderBy(F.desc("score_micro"), F.desc("n_occ"), "phrase")
        .limit(15)
    )


KNESER_NEY_ORACLE = """
-- Interpolated Kneser-Ney bigram LM (absolute discount D=0.75)
-- trained on the corpus and applied back per document — the
-- production smoothing family for count-based LM quality filtering
-- (add-one, text_bigram_lm_perplexity, over-penalizes unseen
-- continuations; KN backs off to CONTINUATION counts: "how many
-- contexts does w2 complete?"). P(w2|w1) = max(c12-D,0)/c1 +
-- (D*T1/c1) * (T2/B) with T1 = distinct followers of w1, T2 =
-- distinct predecessors of w2, B = distinct bigram types. Per-
-- instance -log2 P snaps to integer micro-units; the per-doc mean
-- is an exact BIGINT sum (no float summation order anywhere).
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE length(trim(text)) > 0
), b AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(ts))) u(i)
  WHERE len(ts) >= 2
), c2 AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM b GROUP BY w1, w2
), c1 AS (
  SELECT w1, SUM(c12) AS c1, COUNT(*) AS t1 FROM c2 GROUP BY w1
), cont AS (
  SELECT w2, COUNT(*) AS t2 FROM c2 GROUP BY w2
), bt AS (
  SELECT COUNT(*) AS bb FROM c2
), scored AS (
  SELECT b.doc_id,
         CAST(FLOOR(-log2(
             GREATEST(c2.c12 - 0.75, 0.0) / c1.c1
             + (0.75 * c1.t1 / c1.c1) * (cont.t2 * 1.0 / bt.bb)
           ) * 1000000 + 0.5) AS BIGINT) AS nl_micro
  FROM b
  JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
  JOIN c1 ON c1.w1 = b.w1
  JOIN cont ON cont.w2 = b.w2
  CROSS JOIN bt
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       FLOOR((SUM(nl_micro) * 1.0 / COUNT(*) / 1000000)
             * 1000000 + 0.5) / 1000000 AS avg_neg_log2_kn
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@register("text_kneser_ney_bigram", oracle=KNESER_NEY_ORACLE)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring per document — the
    production LM smoothing (Chen & Goodman 1999) next to the
    add-one baseline: discounted bigram mass backs off to
    continuation counts, so novel-but-plausible word pairs are not
    over-penalized the way add-one does.

    Scale shape: identical to text_bigram_lm_perplexity — the
    bigram explode is the corpus-sized pass; c2/c1/continuation
    tables are vocabulary-sized (Zipf-bounded, broadcast-eligible
    under AQE); the per-instance -log2 snaps to integer micro-units
    so per-doc means are exact BIGINT sums, order-independent."""
    from etl_data_ingestion_spark.functions.numeric import snap
    from etl_data_ingestion_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents", parallel=True).filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select("doc_id", tokens("text").alias("ts"))
    idx = F.when(
        F.size("ts") >= 2, F.sequence(F.lit(1), F.size("ts") - 1)
    ).otherwise(F.array().cast("array<int>"))
    b = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("ts"), i).alias("w1"),
                    F.element_at(F.col("ts"), i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2").persist()
    # persist the bigram-type table too: c1/cont/bt all derive from
    # it, and without the persist each branch re-aggregates the full
    # bigram stream (plan-audit finding: 5 fact scans -> 1)
    c2 = b.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).persist()
    c1 = c2.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("t1")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("t2"))
    bt = c2.agg(F.count(F.lit(1)).alias("bb"))
    p = (
        F.greatest(F.col("c12") - 0.75, F.lit(0.0)) / F.col("c1")
        + (0.75 * F.col("t1") / F.col("c1"))
        * (F.col("t2") * 1.0 / F.col("bb"))
    )
    scored = (
        b.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(bt))
        .select(
            "doc_id",
            F.floor(-F.log2(p) * 1000000 + F.lit(0.5)).cast("long").alias("nl_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            snap(
                F.sum("nl_micro") * 1.0 / F.count(F.lit(1)) / 1000000.0, 6
            ).alias("avg_neg_log2_kn"),
        )
        .orderBy("doc_id")
    )


TFIDF_COSINE_PAIRS_ORACLE = """
-- Document-pair cosine similarity over TF-IDF vectors via an
-- inverted-index self-join — the sparse-vector similarity primitive
-- (near-dup scoring with term weighting, unlike raw Jaccard).
-- Vocabulary pruning first: terms with df = 1 cannot co-occur and
-- terms with df > 50 are stop-like posting lists that blow up the
-- pair fan-out (the standard posting-cap); cosine is then EXACT on
-- the pruned space. Determinism: idf is snapped to an exact 1e-4
-- integer grid, so weights, dots and squared norms are all
-- order-free BIGINT sums; the only float math is the final
-- dot / (sqrt(n1) * sqrt(n2)) chain, identical in both engines.
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), w AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * CAST(FLOOR(ln(n.n_docs * 1.0 / df.df) * 10000 + 0.5)
                      AS BIGINT) AS w
  FROM tf JOIN df USING (term) CROSS JOIN n
  WHERE df.df BETWEEN 2 AND 50
), nrm AS (
  SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2 FROM w GROUP BY doc_id
), dot AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.w * b.w) AS BIGINT) AS dot, COUNT(*) AS shared_terms
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT dot.doc_a, dot.doc_b, CAST(dot.shared_terms AS BIGINT) AS shared_terms,
       FLOOR(dot.dot / (SQRT(na.n2) * SQRT(nb.n2)) * 1000000 + 0.5)
         / 1000000 AS cosine
FROM dot
JOIN nrm na ON na.doc_id = dot.doc_a
JOIN nrm nb ON nb.doc_id = dot.doc_b
ORDER BY cosine DESC, doc_a, doc_b
LIMIT 20
"""


@register("text_tfidf_cosine_pairs", oracle=TFIDF_COSINE_PAIRS_ORACLE)
def text_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 document pairs by TF-IDF cosine similarity via an
    inverted-index self-join — weighted sparse-vector near-dup
    scoring (Jaccard treats 'the' and a rare name alike; TF-IDF
    cosine doesn't).

    Plan: tokenize once; tf and df are the two standard term
    aggregations (map-side combine); vocabulary pruning (2 <= df <=
    50) removes both the can't-co-occur singletons and the stop-like
    posting lists whose pair fan-out is quadratic in df — at 100 TB
    the posting cap IS the scale control (fan-out bounded by
    cap^2 per term; heavy terms carry no similarity signal).
    Weights use an idf snapped to an exact 1e-4 grid so dot products
    and squared norms are order-free BIGINT sums (headroom: w <=
    ~3e7 at 1e10 docs -> pairwise products ~1e15, sums well inside
    int64); the pair join shuffles on term (co-partitioned), norms
    join back on doc_id, and only the final dot/(sqrt*sqrt) chain is
    float — fixed order, identical engines. Top-20 is TakeOrdered
    with a full (cosine, doc_a, doc_b) tiebreak."""
    from etl_data_ingestion_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.trim("text") != "").select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(df.filter(F.col("df").between(2, 50)), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.floor(
                    F.log(F.col("n_docs") * 1.0 / F.col("df")) * 10000
                    + F.lit(0.5)
                ).cast("long")
            ).alias("w"),
        )
    )
    nrm = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("n2")
    )
    a, b = w.alias("a"), w.alias("b")
    dot = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.sum(F.col("a.w") * F.col("b.w")).cast("long").alias("dot"),
            F.count(F.lit(1)).alias("shared_terms"),
        )
    )
    return (
        dot.join(nrm.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na")), "doc_a")
        .join(nrm.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("shared_terms").cast("long").alias("shared_terms"),
            (
                F.floor(
                    F.col("dot")
                    / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "doc_a", "doc_b")
        .limit(20)
    )


PHRASE_INDEX_ORACLE = """
-- Positional inverted index + phrase query: find the corpus's most
-- frequent adjacent bigram, then count its exact phrase occurrences
-- per document via a positional-postings adjacency join (term match
-- at pos and pos+1 in the same doc) — the IR primitive behind
-- quoted-phrase search and exact-sequence contamination checks.
-- Counts are exact integers; both rankings carry full tiebreaks, so
-- the result is deterministic. Positions are engine-internal (never
-- compared across engines), so 0- vs 1-based indexing is free.
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE trim(text) <> ''
), post AS (
  -- position axis derived from len(ts) per row (round-8 advisor fix:
  -- a fixed generate_series(1, 4096) literal silently truncated any
  -- document longer than 4096 tokens, diverging from the Spark
  -- posexplode over the full token array)
  SELECT doc_id, pos, ts[pos] AS term
  FROM (
    SELECT doc_id, ts, UNNEST(generate_series(1, len(ts))) AS pos
    FROM toks
  )
), big AS (
  SELECT a.term AS w1, b.term AS w2, COUNT(*) AS c
  FROM post a JOIN post b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2
  ORDER BY c DESC, w1, w2
  LIMIT 1
), hits AS (
  SELECT a.doc_id, COUNT(*) AS n_occ
  FROM post a
  JOIN post b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  CROSS JOIN big
  WHERE a.term = big.w1 AND b.term = big.w2
  GROUP BY 1
)
SELECT big.w1 AS phrase_w1, big.w2 AS phrase_w2,
       hits.doc_id, CAST(hits.n_occ AS BIGINT) AS n_occurrences
FROM hits CROSS JOIN big
ORDER BY n_occurrences DESC, doc_id
LIMIT 15
"""


@register("text_inverted_index_phrase", oracle=PHRASE_INDEX_ORACLE)
def text_inverted_index_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-phrase search over a positional inverted index: the
    corpus's top adjacent bigram (self-calibrating query — no magic
    literal that breaks at other scales), then per-doc exact phrase
    counts for it; top-15 docs.

    Plan: postings = one posexplode pass, partitioned by term — the
    inverted-index layout; the phrase query filters two term posting
    lists (the 1-row phrase broadcast onto the postings scan) and
    joins them on (doc_id, adjacent pos) — co-partitioned on doc_id,
    list-sized not corpus-sized, exactly how a distributed phrase
    query should run at 100 TB (per-term posting lists are the read
    unit; the adjacency join never touches documents without BOTH
    terms). The top-bigram stage derives from an array transform on
    the token arrays (no postings self-join needed engine-side).
    Integer counts + full tiebreaks = deterministic result."""
    from etl_data_ingestion_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    with_ts = docs.filter(F.trim("text") != "").select(
        "doc_id", tokens("text").alias("ts")
    )
    # sequence(1, 0) DESCENDS in Spark (see functions.text.word_ngrams)
    # — guard single-token docs to an empty index list, not a clamp
    idx = F.when(
        F.size("ts") >= 2, F.sequence(F.lit(1), F.size("ts") - 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = with_ts.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("ts", i).alias("w1"),
                    F.element_at("ts", i + 1).alias("w2"),
                ),
            )
        ).alias("g")
    )
    top = (
        grams.groupBy(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(1)
        .select("w1", "w2")
    )
    post = with_ts.select(
        "doc_id", F.posexplode("ts").alias("pos", "term")
    )
    a = post.crossJoin(F.broadcast(top)).filter(
        F.col("term") == F.col("w1")
    )
    b = post.select(
        F.col("doc_id").alias("b_doc"),
        F.col("pos").alias("b_pos"),
        F.col("term").alias("b_term"),
    )
    hits = (
        a.join(
            b,
            (F.col("doc_id") == F.col("b_doc"))
            & (F.col("b_pos") == F.col("pos") + 1),
        )
        .filter(F.col("b_term") == F.col("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        hits.select(
            F.col("w1").alias("phrase_w1"),
            F.col("w2").alias("phrase_w2"),
            "doc_id",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
        )
        .orderBy(F.col("n_occurrences").desc(), "doc_id")
        .limit(15)
    )


# ----------------------------- wave 19: cross-source OOV token mass

OOV_ORACLE = """
-- Cross-source out-of-vocabulary rate: for each source, the share
-- of its TOKEN MASS whose (lowercased) type appears in no other
-- source — the token-weighted complement of the set-based
-- text_source_vocab_jaccard, and the number that predicts tokenizer
-- fertility blow-ups when a new source joins a training mixture.
-- Exact integers end to end (occurrence counts, single-source
-- types); one division under the 1e-6 snap.
WITH tok AS (
  SELECT source, LOWER(tok) AS tok
  FROM documents,
       UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS t(tok)
  WHERE TRIM(text) <> ''
), occ AS (
  SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok
), spread AS (
  SELECT tok, COUNT(DISTINCT source) AS ns FROM occ GROUP BY tok
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN ns = 1 THEN c ELSE 0 END) AS BIGINT)
         AS oov_mass,
       CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS oov_types,
       FLOOR(SUM(CASE WHEN ns = 1 THEN c ELSE 0 END) * 1.0 / SUM(c)
             * 1000000 + 0.5) / 1000000 AS oov_rate
FROM occ JOIN spread USING (tok)
GROUP BY source
ORDER BY source
"""


@register("text_oov_rate_cross_source", oracle=OOV_ORACLE)
def text_oov_rate_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass OOV rate per source vs the union of all other
    sources (see oracle).

    Scale shape: one fact pass explodes tokens into per-(source,
    type) counts (map-side combined — the Exchange carries the
    vocab-sized (source, token) table, not token occurrences); the
    spread table is vocab-sized; the final join is vocab-keyed and
    AQE-coalesced. At 100 TB the (source × type) domain is the
    bounding set (~|sources| × |vocab|), never the corpus. The token
    string itself is the join key for oracle parity; the production
    variant ships xxhash64(token) — the established 8-byte-key
    narrowing."""
    from etl_data_ingestion_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents", parallel=True).filter(
        F.trim("text") != ""
    )
    tok = docs.select(
        "source",
        F.explode(tokens("text")).alias("tok"),
    ).select("source", F.lower("tok").alias("tok"))
    occ = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    spread = occ.groupBy("tok").agg(
        F.countDistinct("source").alias("ns")
    )
    oov = F.when(F.col("ns") == 1, F.col("c")).otherwise(0)
    return (
        occ.join(spread, "tok")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(oov).cast("long").alias("oov_mass"),
            F.sum(F.when(F.col("ns") == 1, 1).otherwise(0))
            .cast("long")
            .alias("oov_types"),
            (
                F.floor(
                    F.sum(oov) * 1.0 / F.sum("c") * 1000000 + F.lit(0.5)
                )
                / 1000000
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


# ------------------------------------ wave 24: word burstiness (VMR)

BURSTINESS_ORACLE = """
-- Word burstiness for the 20 most frequent corpus tokens: the
-- variance-to-mean ratio (VMR) of per-document counts, zeros
-- included — the Church/Gale dispersion diagnostic a plain
-- frequency list hides (VMR ~ 1 = Poisson-scattered function word;
-- VMR >> 1 = bursty content/boilerplate word that concentrates in
-- few documents — exactly the token class repetition filters key
-- on). EXACT device: with integer per-doc counts c and D total
-- docs, VMR = (q/D - (s/D)^2) / (s/D) from exact integer s = sum c,
-- q = sum c^2 (zero docs contribute zero to both, so only
-- containing docs are scanned); one fixed chain per word.
WITH t AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
), dw AS (
  SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY doc_id, w
), tot AS (
  SELECT COUNT(*) AS d FROM documents
), ws AS (
  SELECT w,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q,
         COUNT(*) AS df
  FROM dw GROUP BY w
)
SELECT w AS word,
       s AS total_count,
       CAST(df AS BIGINT) AS doc_freq,
       FLOOR((q * 1.0 / d - (s * 1.0 / d) * (s * 1.0 / d))
             / (s * 1.0 / d) * 1000000 + 0.5) / 1000000 AS burstiness
FROM ws, tot
ORDER BY total_count DESC, word
LIMIT 20
"""


@register("text_word_burstiness", oracle=BURSTINESS_ORACLE)
def text_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean ratio of per-document counts for the top-20
    corpus tokens (see oracle) — the burstiness/dispersion signal
    repetition and boilerplate filters act on.

    Scale shape: one corpus pass explodes tokens to (doc, word)
    counts (map-side combined); per-word sufficient statistics
    (sum c, sum c^2 WIDE, doc freq) reduce on the word domain; D is
    a 1-row broadcast; top-20 is TakeOrdered on (count desc, word).
    Zero-docs enter the math through D alone — no dense completion
    join ever happens."""
    docs = load_table(spark, sf_dir, "documents")
    dw = (
        docs.filter(F.trim(F.col("text")) != "")
        .select("doc_id", F.explode(tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d_row = docs.agg(F.count(F.lit(1)).alias("d"))
    ws = dw.groupBy("w").agg(
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("q"),
        F.count(F.lit(1)).alias("df"),
    )
    s, q, d = F.col("s"), F.col("q"), F.col("d")
    mean = s * 1.0 / d
    return (
        ws.crossJoin(F.broadcast(d_row))
        .select(
            F.col("w").alias("word"),
            s.alias("total_count"),
            F.col("df").cast("long").alias("doc_freq"),
            (
                F.floor(
                    (q * 1.0 / d - mean * mean) / mean * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("burstiness"),
        )
        .orderBy(F.desc("total_count"), "word")
        .limit(20)
    )


# ----------------------------------- wave 25: Yule's K diversity

YULE_K_ORACLE = """
-- Yule's K lexical-diversity characteristic per source: K =
-- 10^4 * (sum_w c_w^2 - N) / N^2 over the token frequency spectrum
-- — the length-INVARIANT repetitiveness constant (TTR and Heaps
-- curves move with corpus size; K doesn't, which is why stylometry
-- and corpus-QA use it to compare sources of different volume).
-- High K = few types dominate (template/boilerplate-heavy source).
-- EXACT: c_w counts are integers, sum c^2 is a WIDE integer sum,
-- K is one fixed chain per source.
WITH t AS (
  SELECT source, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
), wc AS (
  SELECT source, w, COUNT(*) AS c FROM t GROUP BY source, w
), agg AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n,
         SUM(CAST(c AS HUGEINT) * c) AS q,
         COUNT(*) AS v
  FROM wc GROUP BY source
)
SELECT source,
       n AS n_tokens,
       CAST(v AS BIGINT) AS n_types,
       FLOOR(10000.0 * (q - n) / (n * 1.0 * n) * 10000 + 0.5) / 10000
         AS yule_k
FROM agg ORDER BY source
"""


@register("text_yule_k", oracle=YULE_K_ORACLE)
def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K repetitiveness constant per source (see oracle) —
    the size-invariant diversity number next to Heaps/TTR/hapax.

    Scale shape: one corpus tokenization to (source, word) counts
    (map-side combined); per-source reduction of (N, sum c^2 WIDE,
    V); one fixed chain per source row."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.filter(F.trim(F.col("text")) != "")
        .select("source", F.explode(tokens("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = wc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("q"),
        F.count(F.lit(1)).alias("v"),
    )
    n, q, v = F.col("n"), F.col("q"), F.col("v")
    return agg.select(
        "source",
        n.alias("n_tokens"),
        v.cast("long").alias("n_types"),
        (
            F.floor(
                10000.0 * (q - n) / (n * 1.0 * n) * 10000 + F.lit(0.5)
            )
            / 10000
        ).alias("yule_k"),
    ).orderBy("source")


# --------------------------------- wave 28: MATTR lexical diversity

MATTR_ORACLE = """
-- Segmented type-token ratio (the fixed-window form of MATTR):
-- raw TTR shrinks with document length (Heaps' law), so corpus
-- quality work compares diversity on FIXED 50-token segments —
-- distinct types per full segment / 50, averaged per source. The
-- lexical-diversity gate beside Yule's K / burstiness: repetitive
-- machine-generated text scores low MATTR at any length. Exact
-- device: distinct-per-segment * 20000 is an exact integer
-- (d/50 * 1e6), so the per-source mean is one integer sum and one
-- snapped division; partial trailing segments are EXCLUDED in both
-- engines (they would inflate TTR).
WITH toks AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS ts
  FROM documents
), ex AS (
  SELECT doc_id, source, ts[i] AS w,
         CAST((i - 1) // 50 AS BIGINT) AS seg,
         CAST(len(ts) // 50 AS BIGINT) AS full_segs
  FROM toks, UNNEST(range(1, len(ts) + 1)) u(i)
), per_seg AS (
  SELECT source, doc_id, seg,
         CAST(COUNT(DISTINCT w) AS BIGINT) AS d
  FROM ex WHERE seg < full_segs
  GROUP BY source, doc_id, seg
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       FLOOR(SUM(d * 20000) * 1.0 / COUNT(*) / 1000000
             * 1000000 + 0.5) / 1000000 AS mean_mattr_micro
FROM per_seg GROUP BY source ORDER BY source
"""


@register("text_mattr_lexical_diversity", oracle=MATTR_ORACLE)
def text_mattr_lexical_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Segmented type-token ratio (MATTR, 50-token windows) per
    source (see oracle) — length-invariant lexical diversity, the
    repetition gate beside Yule's K.

    Scale shape: one posexplode over the token split (the fan-out-
    eligible per-row regex family — and the first aggregation keys
    on (source, doc, seg), so the exchange carries per-segment
    partial distinct sets, never raw token order); everything after
    the per-segment distinct is |segments|-domain integer math.
    mean_mattr_micro is the snapped micro-unit mean (d*20000 exact
    per segment)."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    ts = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != ""
    )
    ex = docs.select(
        "doc_id",
        "source",
        (F.floor(F.size(ts) / 50)).cast("long").alias("full_segs"),
        F.posexplode(ts).alias("pos", "w"),
    ).select(
        "doc_id",
        "source",
        "w",
        (F.col("pos") / 50).cast("long").alias("seg"),
        "full_segs",
    )
    per_seg = (
        ex.filter(F.col("seg") < F.col("full_segs"))
        .groupBy("source", "doc_id", "seg")
        .agg(F.count_distinct("w").cast("long").alias("d"))
    )
    return (
        per_seg.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            (
                F.floor(
                    F.sum(F.col("d") * 20000)
                    * 1.0
                    / F.count(F.lit(1))
                    / 1000000
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("mean_mattr_micro"),
        )
        .orderBy("source")
    )


# ----------------------- wave 31: Burrows' Delta (stylometric distance)

BURROWS_DELTA_ORACLE = """
-- Burrows' Delta between document sources over the 30 most frequent
-- words: the classic stylometric distance (authorship attribution /
-- 'which crawls share a template') — z-score each source's relative
-- frequency of every top word across sources, then Delta(s1,s2) =
-- mean |z1 - z2|. Reads STYLE (function-word mix) where the TF-IDF
-- and vocabulary-Jaccard operators read topic. EXACT device: the
-- source x top-word grid is completed DENSELY (a missing word is
-- 0-frequency evidence); relative frequencies snap to exact 1e-9
-- integers before the cross-source moments, and each |z1 - z2|
-- snaps to 1e-9 before the pair sum, so every aggregation is an
-- order-free BIGINT sum. Output: the 10 closest (most stylistically
-- similar) source pairs.
WITH toks AS (
  SELECT source, UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), top AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS c FROM toks GROUP BY w
    ORDER BY c DESC, w LIMIT 30
  )
), tot AS (
  SELECT source, COUNT(*) AS tot FROM toks GROUP BY source
), cnt AS (
  SELECT source, w, COUNT(*) AS c
  FROM toks WHERE w IN (SELECT w FROM top) GROUP BY source, w
), grid AS (
  SELECT s.source, t.w FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN top t
), f AS (
  SELECT g.source, g.w,
         CAST(FLOOR(COALESCE(c.c, 0) * 1.0 / tot.tot * 1000000000
                    + 0.5) AS BIGINT) AS f9
  FROM grid g
  LEFT JOIN cnt c ON c.source = g.source AND c.w = g.w
  JOIN tot ON tot.source = g.source
), stats AS (
  SELECT w, COUNT(*) AS ns,
         CAST(SUM(f9) AS BIGINT) AS s1,
         CAST(SUM(f9 * f9) AS BIGINT) AS s2
  FROM f GROUP BY w
), z AS (
  SELECT f.source, f.w,
         (f.f9 - s1 * 1.0 / ns)
           / SQRT(s2 * 1.0 / ns - (s1 * 1.0 / ns) * (s1 * 1.0 / ns))
           AS z
  FROM f JOIN stats ON stats.w = f.w
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(SUM(CAST(FLOOR(ABS(a.z - b.z) * 1000000000 + 0.5)
                       AS BIGINT)) AS BIGINT) AS d9,
         COUNT(*) AS nw
  FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b,
       FLOOR(d9 / nw / 1000000000.0 * 1000000 + 0.5) / 1000000
         AS burrows_delta
FROM pairs
ORDER BY burrows_delta, source_a, source_b LIMIT 10
"""


@register("text_burrows_delta", oracle=BURROWS_DELTA_ORACLE)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between sources (see
    oracle for the dense-grid + double-snap device).

    Scale shape: the token explode + two counting aggregations are
    the corpus-sized work (each map-side combined); the top-30 word
    list broadcasts; everything after runs on the |sources| x 30
    grid (dense by construction), the per-word moment table, and
    the |sources|^2/2 x 30 pair expansion — all domain-sized. At
    100 TB with millions of sources the pair stage switches to
    LSH-bucketed blocking on the z-vectors (the house similarity
    machinery); stated cutover, same statistic."""
    docs = load_table(spark, sf_dir, "documents", parallel=False)
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("w"),
    ).persist()
    top = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(30)
        .select("w")
    )
    tot = toks.groupBy("source").agg(F.count(F.lit(1)).alias("tot"))
    cnt = (
        toks.join(F.broadcast(top), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sources = docs.select("source").distinct()
    grid = sources.crossJoin(F.broadcast(top))
    f = (
        grid.join(cnt, ["source", "w"], "left")
        .join(tot, "source")
        .select(
            "source",
            "w",
            F.floor(
                F.coalesce(F.col("c"), F.lit(0))
                * 1.0
                / F.col("tot")
                * 1000000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("f9"),
        )
        .persist()
    )
    stats = f.groupBy("w").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum("f9").cast("long").alias("s1"),
        F.sum(F.col("f9") * F.col("f9")).cast("long").alias("s2"),
    )
    mu = F.col("s1") * 1.0 / F.col("ns")
    z = f.join(F.broadcast(stats), "w").select(
        "source",
        "w",
        (
            (F.col("f9") - mu)
            / F.sqrt(F.col("s2") * 1.0 / F.col("ns") - mu * mu)
        ).alias("z"),
    )
    a, b = z.alias("a"), z.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.sum(
                F.floor(
                    F.abs(F.col("a.z") - F.col("b.z")) * 1000000000
                    + F.lit(0.5)
                ).cast("long")
            )
            .cast("long")
            .alias("d9"),
            F.count(F.lit(1)).alias("nw"),
        )
    )
    delta = (
        F.floor(
            F.col("d9") / F.col("nw") / 1000000000.0 * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    return (
        pairs.select("source_a", "source_b", delta.alias("burrows_delta"))
        .orderBy("burrows_delta", "source_a", "source_b")
        .limit(10)
    )


GOOD_TURING_ORACLE = """
-- Good-Turing frequency-of-frequency estimates over the corpus
-- 3-GRAM distribution: N_r = number of 3-gram types seen exactly r
-- times, the Turing-smoothed count r* = (r+1) * N_{r+1} / N_r, and
-- the smoothed probability r*/N — the classical answer to 'how
-- much probability mass belongs to sequences we have (almost)
-- never seen', i.e. the unseen-mass estimate every LM smoothing
-- scheme (Katz, simple Good-Turing) starts from, and a direct
-- corpus-coverage health readout for training-data curation.
-- 3-grams (the dedup shingle unit), not unigrams: this fixture's
-- unigram vocabulary is 31 words with min count 26 — a degenerate
-- spectrum with NO rare classes — while its 3-gram spectrum is
-- Zipfian at every scale (N_1 = 9402/207 at sf0.001/0.1; measured
-- before choosing the unit). Rows r=1..8; r* is NULL where
-- N_{r+1}=0 (the SGT regression fallback region, out of scope —
-- stated). The r+1 lookup is an explicit self-join (LEAD would
-- silently read the wrong row across gaps in r).
WITH toks AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS a FROM documents
), tf AS (
  SELECT array_to_string(list_slice(a, i, i + 2), ' ') AS term,
         CAST(COUNT(*) AS BIGINT) AS freq
  FROM toks, UNNEST(range(1, len(a) - 1)) t(i)
  GROUP BY 1
), fof AS (
  SELECT freq AS r, CAST(COUNT(*) AS BIGINT) AS n_types
  FROM tf GROUP BY freq
), total AS (
  SELECT CAST(SUM(r * n_types) AS BIGINT) AS n_tokens FROM fof
)
SELECT f.r,
       f.n_types,
       CAST(f.r * f.n_types AS BIGINT) AS tokens_at_r,
       FLOOR((f.r + 1) * 1.0 * f2.n_types / f.n_types * 1000000 + 0.5)
         / 1000000 AS turing_rstar,
       FLOOR((f.r + 1) * 1.0 * f2.n_types / f.n_types
             / (SELECT n_tokens FROM total) * 1000000000 + 0.5)
         / 1000000000 AS smoothed_prob
FROM fof f LEFT JOIN fof f2 ON f2.r = f.r + 1
WHERE f.r <= 8
ORDER BY f.r
"""


@register("text_good_turing_estimates", oracle=GOOD_TURING_ORACLE)
def text_good_turing_estimates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Good-Turing smoothed count estimates from the corpus 3-gram
    frequency-of-frequency table (see oracle, incl. why 3-grams and
    not this fixture's degenerate unigrams).

    Scale shape: ONE 3-gram-keyed count (map-side combine over the
    HOF-expanded shingles — the dedup_ngram_jaccard gram build) is
    the only corpus-sized Exchange; the frequency-of-frequency
    rollup reduces |V| rows to the tiny r-domain, and the r+1
    lookup / total-token scalar are domain joins. At 100 TB nothing
    after the gram count grows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(F.trim(F.col("text")), r"\s+").alias("a")
    ).filter(F.size("a") >= 3)
    tf = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("a") - 3),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("a"), i + 1, 3)
                    ),
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    fof = (
        tf.groupBy(F.col("freq").alias("r"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_types"))
        .persist()
    )
    total = fof.agg(
        F.sum(F.col("r") * F.col("n_types")).cast("long").alias("n_tokens")
    )
    nxt = fof.select(
        (F.col("r") - 1).alias("r"), F.col("n_types").alias("n_next")
    )
    r, n_types, n_next = F.col("r"), F.col("n_types"), F.col("n_next")
    rstar = (r + 1) * 1.0 * n_next / n_types
    return (
        fof.filter(r <= 8)
        .join(F.broadcast(nxt), "r", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "r",
            "n_types",
            (r * n_types).cast("long").alias("tokens_at_r"),
            (F.floor(rstar * 1000000 + F.lit(0.5)) / 1000000).alias(
                "turing_rstar"
            ),
            (
                F.floor(
                    rstar / F.col("n_tokens") * 1000000000 + F.lit(0.5)
                )
                / 1000000000
            ).alias("smoothed_prob"),
        )
        .orderBy("r")
    )


# --------------------------- wave 41: Yule's K characteristic

YULE_K_ORACLE = """
-- Yule's characteristic K per source: the classic frequency-
-- spectrum second-moment measure of vocabulary REPETITIVENESS,
-- K = 1e4 * (S2 - S1) / S1^2 with S1 = total tokens and
-- S2 = sum of squared type frequencies. K is (asymptotically)
-- length-invariant — unlike raw TTR — and high K flags template/
-- boilerplate-heavy sources the way MATTR flags low diversity;
-- the two disagree exactly on sources with a few very hot types,
-- which is the signature worth alerting on in a training corpus.
-- EXACT device: S1/S2 are integer sums (HUGEINT before the square
-- — a type frequency squared passes 2^53 long before 100 TB);
-- one snapped division per source at the end.
WITH tok AS (
  SELECT source, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents WHERE trim(text) <> ''
), freq AS (
  SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       FLOOR(10000.0 * CAST(SUM(CAST(c AS HUGEINT) * c) - SUM(c) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * SUM(c)) * 1000000 + 0.5)
         / 1000000 AS yule_k
FROM freq GROUP BY source ORDER BY source
"""


@register("text_yule_k_characteristic", oracle=YULE_K_ORACLE)
def text_yule_k_characteristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K vocabulary-repetitiveness characteristic per source
    (see oracle for the statistic and why it complements MATTR).

    Scale shape: ONE (source, token)-keyed Exchange with map-side
    combine builds the frequency table (the same shuffle class as
    every corpus token aggregate here); the spectrum moments S1/S2
    then aggregate source-wise — a |sources|-domain relation. The
    square widens BEFORE multiplying (decimal(38,0) / HUGEINT — the
    wave-32 multiplicand-side rule): a hot type's frequency squared
    passes 2^53 long before 100 TB. One snapped division per source
    ends the chain; everything upstream is exact integers. NO scan
    fan-out: a single whitespace split is the CHEAP per-row class,
    and the r13 interleaved A/B read OFF 0.38 vs ON 0.72 at sf0.1,
    0.71 vs 0.73 at sf1 — the audit's flip rule (OFF wins-or-ties
    at both scales) says OFF."""
    docs = load_table(spark, sf_dir, "documents", parallel=False)
    freq = (
        docs.filter(F.trim("text") != "")
        .select("source", F.explode(tokens("text")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    c = F.col("c")
    s1 = F.sum(c).cast("long")
    s2 = F.sum(c.cast("decimal(38,0)") * c)
    return (
        freq.groupBy("source")
        .agg(
            s1.alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            (
                F.floor(
                    10000.0
                    * (s2 - F.sum(c)).cast("double")
                    / (F.sum(c).cast("double") * F.sum(c))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("yule_k"),
        )
        .orderBy("source")
    )


# ------------------- wave 43: corpus n-gram diversity (distinct-n)

NGRAM_DIVERSITY_ORACLE = """
-- Distinct-n diversity per source: unique n-grams / total n-grams
-- for n = 1, 2 — the corpus-level generation-diversity screen
-- (low distinct-2 = template/boilerplate-heavy source; the
-- distinct-n metric from the dialogue-generation literature applied
-- as a training-data quality gate). Complements MATTR (per-doc
-- windowed TTR) with a corpus-level reading that catches CROSS-doc
-- repetition MATTR cannot see.
WITH toks AS (
  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS tk
  FROM documents WHERE length(trim(text)) > 0
), uni AS (
  SELECT source, 1 AS n, UNNEST(tk) AS gram FROM toks
), bi AS (
  SELECT source, 2 AS n,
         UNNEST(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])) AS gram
  FROM toks WHERE len(tk) >= 2
), rel AS (
  SELECT * FROM uni UNION ALL SELECT * FROM bi
)
SELECT source, CAST(n AS BIGINT) AS ngram_n,
       CAST(COUNT(*) AS BIGINT) AS total_ngrams,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
       FLOOR(COUNT(DISTINCT gram) * 1.0 / COUNT(*) * 1000000 + 0.5)
         / 1000000 AS diversity
FROM rel GROUP BY source, n ORDER BY source, ngram_n
"""


@register("text_distinct_ngram_diversity", oracle=NGRAM_DIVERSITY_ORACLE)
def text_distinct_ngram_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct-1 / distinct-2 n-gram diversity per source (see
    oracle for the screen and what it adds over MATTR).

    Scale shape: ONE tokenize pass fans out to (source, n, gram)
    rows — a map-only explode, no corpus re-scan for the bigram tier
    (bigrams derive from the same token array) — then one
    count-distinct aggregation keyed on (source, n). The exchange
    carries (source, n, gram) distinct pairs, i.e. per-source
    VOCABULARY size, not corpus size — the same envelope as TF-IDF's
    document-frequency exchange. The bigram HOF guards size >= 2
    (Spark's sequence() would DESCEND on a negative stop and emit
    phantom grams)."""
    docs = load_table(spark, sf_dir, "documents", parallel=False)
    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        "source", F.split(F.trim("text"), r"\s+").alias("tk")
    )
    uni = toks.select(
        "source", F.lit(1).alias("n"), F.explode("tk").alias("gram")
    )
    bi = toks.filter(F.size("tk") >= 2).select(
        "source",
        F.lit(2).alias("n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 2),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("tk"), i + 1, 2)
                ),
            )
        ).alias("gram"),
    )
    rel = uni.unionByName(bi)
    return (
        rel.groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_ngrams"),
            F.count_distinct("gram").cast("long").alias("distinct_ngrams"),
        )
        .select(
            "source",
            F.col("n").cast("long").alias("ngram_n"),
            "total_ngrams",
            "distinct_ngrams",
            (
                F.floor(
                    F.col("distinct_ngrams")
                    * 1.0
                    / F.col("total_ngrams")
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("diversity"),
        )
        .orderBy("source", "ngram_n")
    )
