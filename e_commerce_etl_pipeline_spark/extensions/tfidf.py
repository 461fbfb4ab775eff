"""Corpus-frequency text weighting: document frequency, TF-IDF-style
term ranking per document.

The classic corpus-statistics operator a training-data pipeline needs
(keyword extraction, rare-term filtering, near-duplicate boilerplate
detection): term frequency per document × an inverse-document-frequency
weight, top-k terms per document.

Scale shape (100 TB):
- tokenize/explode is a pure map stage;
- TF is a (doc_id, term) hash aggregate — map-side partials collapse
  repeated words before the shuffle, so shuffle rows ≈ distinct terms
  per doc, not raw tokens;
- DF aggregates the TF table by term — vocabulary-bounded (≪ corpus);
- the DF table joins back on term (AQE broadcasts it when the
  vocabulary fits; shuffle-join co-locates otherwise);
- top-k per document is a rank-filter window partitioned by doc_id —
  Spark's WindowGroupLimit rewrites it into per-partition partial top-k
  before the shuffle, so only ~k rows per map task survive.
  Never O(corpus²); no driver collect.

Cross-engine determinism: the IDF weight is the RATIONAL form
(N + 1) / (df + 1) — one IEEE division of exactly-represented integers,
identical in every engine — instead of log((N+1)/(df+1)), whose last
ulp may differ between libm implementations (the same no-float-log rule
as extensions/similarity.py). The rational weight is strictly monotone
in the log form per term, and the weight itself is reported so callers
can log it corpus-side if they want the compressed scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import index_store
from ..plans.queries import load_table
from .text import words_col

TOP_TERMS = 3  # terms kept per document


def term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, term, tf) table — the shared intermediate of
    every corpus-frequency operator (its own DF aggregation branch would
    otherwise re-scan and re-explode the corpus — Spark recomputes
    diamond lineages — and rare_term_docs reads the same table): one
    materialization per corpus SNAPSHOT, fingerprint-keyed so a mutated
    documents table rebuilds (index_store.cached_df, r6)."""
    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        tokens = docs.select(
            "doc_id", F.explode(words_col(F.col("text"))).alias("term")
        ).filter(F.col("term") != "")
        return tokens.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).alias("tf")
        )

    return index_store.cached_df(
        spark, index_store.table_dir(sf_dir, "documents"),
        "term_frequencies", build,
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TOP_TERMS terms per document by tf × (N+1)/(df+1), with the
    full (tf, df, weight) evidence. Ties break on the term string, so
    the selection is total-ordered and engine-independent."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tf = term_frequencies(spark, sf_dir)
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus size as a 1-row broadcast (scalar-subquery shape — the same
    # pattern as retention_filter's computed cutoff): stays in-plan, no
    # driver action.
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    weighted = (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf_weight",
            (F.col("tf") * (F.col("n_docs") + F.lit(1))).cast("double")
            / (F.col("df") + F.lit(1)).cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_weight").desc(), F.col("term")
    )
    return (
        weighted.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= TOP_TERMS)
        .select("doc_id", "term", "tf", "df", "tfidf_weight", "term_rank")
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH tokens AS (
  SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tokens WHERE term <> '' GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), weighted AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / CAST(df.df + 1 AS DOUBLE)
           AS tfidf_weight
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf_weight,
       CAST(term_rank AS BIGINT) AS term_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf_weight DESC, term
  ) AS term_rank
  FROM weighted
)
WHERE term_rank <= {TOP_TERMS}
"""


RARE_DF_DENOM = 10  # a term is rare when df * RARE_DF_DENOM <= N


def rare_term_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents carrying corpus-rare vocabulary: per document, how many
    of its distinct terms are rare (df ≤ N/RARE_DF_DENOM — in the
    hapax-legomena limit df == 1, but the threshold is relative so the
    operator stays meaningful on any vocabulary shape) plus the distinct-
    term count. The standard outlier/noise signal (OCR garbage,
    boilerplate IDs, code dumps rank high). Same TF/DF tables as
    tfidf_top_terms; the rarity test is integer-only
    (df * DENOM <= N), so both engines agree exactly."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tf = term_frequencies(spark, sf_dir)
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(
                F.when(
                    F.col("df") * F.lit(RARE_DF_DENOM) <= F.col("n_docs"), 1
                ).otherwise(0)
            ).alias("n_rare"),
        )
    )
    return per_doc.filter(F.col("n_rare") > 0).select(
        "doc_id", "n_terms", "n_rare",
        (F.col("n_rare").cast("double") / F.col("n_terms").cast("double"))
        .alias("rare_ratio"),
    )


RARE_TERM_DOCS_SQL = f"""
WITH tokens AS (
  SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tokens WHERE term <> '' GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), per_doc AS (
  SELECT tf.doc_id, COUNT(*) AS n_terms,
         CAST(SUM(CASE WHEN df.df * {RARE_DF_DENOM} <= n.n_docs
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
  FROM tf JOIN df USING (term) CROSS JOIN n GROUP BY tf.doc_id
)
SELECT doc_id, n_terms, n_rare,
       CAST(n_rare AS DOUBLE) / CAST(n_terms AS DOUBLE) AS rare_ratio
FROM per_doc WHERE n_rare > 0
"""


EXT_QUERIES = {
    "tfidf_top_terms": (tfidf_top_terms, TFIDF_TOP_TERMS_SQL),
    "rare_term_docs": (rare_term_docs, RARE_TERM_DOCS_SQL),
}
