"""Dataset-curation operators for training-data pipelines: deterministic
stratified sampling and per-group token-budget selection over the
documents table.

Both are pure column programs (no Python UDFs) and both are
deterministic — ordering keys are content hashes / unique ids, never
rand() — so the same corpus always yields the same sample, the oracle
hash-matches, and a re-run after failure selects identical rows (the
property that makes sampling safe inside an idempotent upsert pipeline,
SURVEY.md §2.8 ST3).

Scale notes (100 TB):
- ``stratified_lang_sample`` uses rank-by-hash ≤ quota per language.
  Spark 4's WindowGroupLimit rule rewrites rank-filter windows into
  per-partition partial top-k before the shuffle, so a dominant language
  (English is ~half of web corpora) never funnels its full document set
  through one reducer — only ~quota rows per map task survive.
- ``token_budget_sample`` (cumulative token sum ≤ budget per language)
  is inherently a prefix scan per group; the same WindowGroupLimit
  shape does not apply, but the hash-rank pre-filter bounds the rows
  entering the window at quota × partitions, which is what keeps the
  unavoidable per-group ordered pass small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.queries import load_table
from .text import token_count

SAMPLE_QUOTA = 40          # docs per language
TOKEN_BUDGET = 2_000       # whitespace tokens per language


def stratified_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sample: rank documents inside
    each language by md5(doc_id) (a uniform, content-independent shuffle
    order both engines compute identically) and keep the first
    SAMPLE_QUOTA."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= SAMPLE_QUOTA)
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, sample_rank
FROM (
  SELECT doc_id, lang,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS STRING)), doc_id
         ) AS BIGINT) AS sample_rank
  FROM documents
)
WHERE sample_rank <= {SAMPLE_QUOTA}
"""


def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget selection: walk documents in a
    deterministic preference order (longest first, doc_id tie-break) and
    keep each document whose running token total still fits
    TOKEN_BUDGET. The running total uses an explicit ROWS frame — with a
    unique ordering key RANGE and ROWS agree, but ROWS is the contract
    both engines implement identically."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


TOKEN_BUDGET_SQL = f"""
SELECT doc_id, lang, n_tokens, cum_tokens
FROM (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_tokens
  FROM (
    SELECT doc_id, lang, n_chars,
           CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
  )
)
WHERE cum_tokens <= {TOKEN_BUDGET}
"""


EXT_QUERIES = {
    "stratified_lang_sample": (stratified_lang_sample, STRATIFIED_SAMPLE_SQL),
    "token_budget_sample": (token_budget_sample, TOKEN_BUDGET_SQL),
}
