"""Text-analysis operators over the documents table (BASELINE.json
north star): token statistics, quality scoring, language-ID heuristic,
BPE-ish token estimation, rolling-hash fingerprinting.

Everything is JVM regexp/array expressions (codegen'd); the oracle
runs the identical computation in DuckDB SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

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
    broadcast-joined frequency table)."""
    docs = load_table(spark, sf_dir, "documents").filter(
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
