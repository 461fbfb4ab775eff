"""Corpus preparation operators: text normalization, vocabulary-coverage
filtering, and deterministic train/validation splitting.

Three steps every large-scale training-data pipeline runs between raw
ingestion and tokenization (the reference stops at warehouse loading —
these extend its query surface toward the corpus-prep workloads the
engine is aimed at, like the other ``extensions/`` modules):

- ``unicode_clean_docs``: boilerplate/markup strip + whitespace
  canonicalization. Pure map stage of JVM ``regexp_replace`` chains —
  whole-stage codegen, no shuffle, trivially linear at 100 TB. Patterns
  stay inside the regex subset Java and RE2 share (no backreferences,
  no lookaround), so the DuckDB oracle runs the identical expressions.
- ``vocab_coverage_docs``: per-document coverage against the corpus
  top-K vocabulary — the OOV-ratio gate used to drop OCR garbage and
  wrong-language fragments before tokenizer training. Reuses the shared
  term-frequency table (tfidf.term_frequencies — one corpus scan
  amortized across every corpus-frequency operator); the vocabulary is
  K rows, so the membership join broadcasts. Counts stay integer until
  one final division (the repo's cross-engine determinism rule).
- ``train_val_split``: hash-based assignment — split on a hex prefix of
  ``md5(doc_id)``. Deterministic, stateless, reshard-stable: a document
  keeps its split under any repartition, append, or re-run, which is
  the property that matters when the corpus is rebuilt incrementally.
  Lexicographic comparison of fixed-length lowercase hex equals numeric
  comparison, so both engines agree without hex->int conversion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.queries import load_table
from .text import words_col

# --- unicode / boilerplate cleanup ---------------------------------------

# Java-regex and RE2-compatible patterns (no backrefs / lookaround).
_TAG_RE = "<[^>]*>"          # markup fragments
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"  # control chars (keep \t\n\r)
_WS_RE = "\\s+"


def clean_text_col(text: Column) -> Column:
    cleaned = F.regexp_replace(text, _TAG_RE, " ")
    cleaned = F.regexp_replace(cleaned, _CTRL_RE, " ")
    cleaned = F.regexp_replace(cleaned, _WS_RE, " ")
    return F.trim(cleaned)


def unicode_clean_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cleaned = clean_text_col(F.col("text"))
    return docs.select(
        "doc_id",
        cleaned.alias("clean_text"),
        (F.length("text") - F.length(cleaned)).cast("bigint").alias("chars_removed"),
    )


UNICODE_CLEAN_DOCS_SQL = f"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(regexp_replace(
           text, '{_TAG_RE}', ' ', 'g'),
           '{_CTRL_RE}', ' ', 'g'),
           '{_WS_RE}', ' ', 'g')) AS clean_text,
       CAST(length(text) - length(trim(regexp_replace(regexp_replace(regexp_replace(
           text, '{_TAG_RE}', ' ', 'g'),
           '{_CTRL_RE}', ' ', 'g'),
           '{_WS_RE}', ' ', 'g'))) AS BIGINT) AS chars_removed
FROM documents
"""

# --- vocabulary coverage (OOV gate) --------------------------------------

VOCAB_K = 500  # top-K terms by document frequency form the vocabulary


def vocab_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: total tokens, tokens inside the corpus top-K
    vocabulary, and the OOV ratio. Vocabulary selection is total-ordered
    (df DESC, term ASC), so the K-th boundary is engine-independent."""
    from .tfidf import term_frequencies

    tf = term_frequencies(spark, sf_dir)
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    vocab = (
        df_tbl.orderBy(F.col("df").desc(), F.col("term"))
        .limit(VOCAB_K)
        .select("term")
    )
    per_doc = (
        tf.join(F.broadcast(vocab).withColumn("in_vocab", F.lit(1)), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab") == 1, F.col("tf")).otherwise(0))
            .alias("n_in_vocab"),
        )
    )
    return per_doc.select(
        "doc_id", "n_tokens", "n_in_vocab",
        (F.lit(1.0) - F.col("n_in_vocab").cast("double")
         / F.col("n_tokens").cast("double")).alias("oov_ratio"),
    )


VOCAB_COVERAGE_DOCS_SQL = f"""
WITH tokens AS (
  SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tokens WHERE term <> '' GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), vocab AS (
  SELECT term FROM df ORDER BY df DESC, term LIMIT {VOCAB_K}
), per_doc AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN v.term IS NOT NULL THEN tf.tf ELSE 0 END) AS BIGINT)
           AS n_in_vocab
  FROM tf LEFT JOIN vocab v ON tf.term = v.term
  GROUP BY tf.doc_id
)
SELECT doc_id, n_tokens, n_in_vocab,
       1.0 - CAST(n_in_vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_ratio
FROM per_doc
"""

# --- deterministic train/val split ---------------------------------------

# md5 hex prefix < '1a' -> validation: 26/256 ≈ 10.2% of documents.
VAL_HEX_BOUND = "1a"


def split_col(doc_id: Column) -> Column:
    prefix = F.substring(F.md5(doc_id.cast("string")), 1, 2)
    return F.when(prefix < F.lit(VAL_HEX_BOUND), F.lit("val")).otherwise(
        F.lit("train")
    )


def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split summary: per split, document count, char volume, and id
    range. The assignment itself (``split_col``) is the reusable
    primitive; the summary is what an operator gate would inspect."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", split_col(F.col("doc_id")))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


TRAIN_VAL_SPLIT_SQL = f"""
SELECT CASE WHEN substr(md5(CAST(doc_id AS STRING)), 1, 2) < '{VAL_HEX_BOUND}'
            THEN 'val' ELSE 'train' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
GROUP BY 1
"""


# --- URL / domain statistics ---------------------------------------------

# The synthetic corpus carries no URLs, so the operator runs over a
# deterministically URL-planted view (same technique as
# dedup_fuzzy._mutated_corpus's planted near-dups): every 7th document
# gets a link to one of 13 synthetic domains. Both engines build the
# identical view with pure string concat, so extraction is exercised on
# real rows instead of vacuously matching on empty output.
# Backslash-free patterns on purpose: the strings are embedded in BOTH
# engines' SQL literals, and Spark SQL processes backslash escapes in
# string literals while DuckDB does not — '\\s' would reach RE2 intact
# but reach Java as '\s'-stripped '[^s]'. A literal space class behaves
# identically everywhere (URLs here terminate at a space or
# end-of-string; unicode_clean_docs canonicalizes \t\n\r to spaces
# upstream for raw corpora).
_URL_RE = "https?://[^ ]+"
_DOMAIN_RE = "https?://([^/ ]+)"


def _linked_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" see https://site-"),
            (F.col("doc_id") % 13).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.select("doc_id", F.concat("text", planted).alias("text"))


def domain_link_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per linked domain: link count and distinct linking documents —
    the web-corpus provenance report behind domain allow/block lists and
    per-domain sampling quotas. Pure map (regex extract + explode) into
    one domain-keyed hash aggregate; at 100 TB the domain key space is
    tiny relative to the corpus, so partial aggregation collapses almost
    everything map-side."""
    corpus = _linked_corpus(spark, sf_dir)
    links = corpus.select(
        "doc_id",
        F.explode(F.expr(f"regexp_extract_all(text, '{_URL_RE}', 0)")).alias("url"),
    )
    return (
        links.select("doc_id", F.regexp_extract("url", _DOMAIN_RE, 1).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


DOMAIN_LINK_STATS_SQL = f"""
WITH corpus AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0
                      THEN ' see https://site-' || CAST(doc_id % 13 AS STRING)
                           || '.example/p/' || CAST(doc_id AS STRING)
                      ELSE '' END AS text
  FROM documents
), links AS (
  SELECT doc_id, UNNEST(regexp_extract_all(text, '{_URL_RE}')) AS url
  FROM corpus
)
SELECT regexp_extract(url, '{_DOMAIN_RE}', 1) AS domain,
       COUNT(*) AS n_links,
       COUNT(DISTINCT doc_id) AS n_docs
FROM links
GROUP BY 1
"""


# --- end-to-end curated corpus -------------------------------------------


def curated_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE composed query — the flagship
    "a reference user can run their workload end-to-end" demonstration:

      quality gate (text.quality_score >= curation.QUALITY_THRESHOLD)
      -> near-dup dedup (drop non-canonical members of
         components.dedup_clusters — the LSH->connected-components
         assignment, read from its materialized artifact)
      -> deterministic train/val assignment (split_col)
      -> per (split, lang) document and token accounting.

    Composition is where the Spark-first design pays off: every stage is
    a column program over the same scan, so Catalyst fuses the quality
    predicate, the dedup anti-join (broadcast — non-keepers ≪ corpus),
    and the split expression into one pass over documents, with the
    cluster assignment coming from the write-through parquet artifact
    rather than re-running pair detection."""
    from .components import dedup_clusters
    from .curation import QUALITY_THRESHOLD
    from .text import quality_score, token_count

    docs = load_table(spark, sf_dir, "documents")
    non_keepers = dedup_clusters(spark, sf_dir).filter(
        F.col("doc_id") != F.col("canonical_doc_id")
    ).select("doc_id")
    kept = (
        docs.filter(quality_score(F.col("text")) >= QUALITY_THRESHOLD)
        .join(F.broadcast(non_keepers), "doc_id", "left_anti")
    )
    return (
        kept.withColumn("split", split_col(F.col("doc_id")))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("text")).cast("long")).alias("total_tokens"),
        )
    )


def _curated_corpus_sql() -> str:
    from .components import _dedup_clusters_sql
    from .curation import QUALITY_THRESHOLD, _quality_sql_expr

    return f"""
WITH clusters AS ({_dedup_clusters_sql().strip()}),
non_keepers AS (
  SELECT doc_id FROM clusters WHERE doc_id <> canonical_doc_id
), kept AS (
  SELECT d.* FROM documents d
  WHERE {_quality_sql_expr()} >= {QUALITY_THRESHOLD}
    AND d.doc_id NOT IN (SELECT doc_id FROM non_keepers)
)
SELECT CASE WHEN substr(md5(CAST(doc_id AS STRING)), 1, 2) < '{VAL_HEX_BOUND}'
            THEN 'val' ELSE 'train' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT)
         AS total_tokens
FROM kept
GROUP BY 1, 2
"""


EXT_QUERIES = {
    "unicode_clean_docs": (unicode_clean_docs, UNICODE_CLEAN_DOCS_SQL),
    "vocab_coverage_docs": (vocab_coverage_docs, VOCAB_COVERAGE_DOCS_SQL),
    "train_val_split": (train_val_split, TRAIN_VAL_SPLIT_SQL),
    "domain_link_stats": (domain_link_stats, DOMAIN_LINK_STATS_SQL),
    "curated_corpus_summary": (curated_corpus_summary, _curated_corpus_sql()),
}
