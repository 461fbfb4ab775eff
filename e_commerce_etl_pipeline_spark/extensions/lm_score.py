"""Corpus-LM rarity scoring: CCNet-style language-model quality
filtering, expressed log-free for cross-engine determinism.

The canonical web-corpus curation step (Wenzek et al. 2019, CCNet)
scores each document under a language model trained on trusted text
and filters the tail: boilerplate, lorem-ipsum, and OCR garbage sit
far from the training distribution. This module is the engine-native
realization: a unigram LM with add-one smoothing is TRAINED on the
corpus's own ``train`` split (the shared md5-hash split of
corpus_prep.split_col — no leakage of the scored val docs into the
model), then every document is scored by its mean smoothed inverse
word probability.

Why inverse probability instead of log-probability (perplexity): the
repo's no-float-log rule (see extensions/tfidf.py). ln() differs in
the last ulp across libm implementations, so a perplexity oracle can
never be exact across engines. The mean inverse probability
mean_w (N+V)/(c(w)+1) is strictly monotone in each word's surprisal
-log p(w), ranks rare-word documents identically for thresholding
purposes, and is computable EXACTLY: per-word weights are fixed-point
integers floor(1e12/(c+1)) summed as BIGINTs (no float-accumulation
order dependence — the same exact-scaled-sum device as the k-means
centroids), with one final IEEE division/multiplication whose operand
order the DuckDB oracle mirrors verbatim.

Scale shape (100 TB):
- token statistics come from the SHARED term-frequencies artifact
  (extensions/tfidf.term_frequencies — one explode+aggregate per
  corpus snapshot, fingerprint-keyed), so scoring works on
  (doc, term, tf) rows ≈ distinct terms per doc, not the raw token
  stream;
- the LM itself is vocabulary-bounded (counts aggregated from the TF
  table) — it broadcasts when it fits, shuffle-joins on term
  otherwise; either way the scoring pass is ONE join + ONE per-doc
  hash aggregate;
- the exact BIGINT fixed-point sums make the score reproducible under
  any partial-aggregation order — at 1000 executors the result is
  byte-identical to a single-threaded run, which is what lets the
  filter threshold be audited offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import index_store
from ..plans.queries import load_table
from .corpus_prep import VAL_HEX_BOUND, split_col
from .tfidf import term_frequencies

# fixed-point scale for the per-word inverse-probability weights:
# floor(IP_SCALE / (c+1)) is exact for any count, and a document's sum
# stays far below 2^63 (n_words * 1e12; the corpus generator's docs are
# hundreds of words).
IP_SCALE = 10**12


def lm_unigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, c): unigram occurrence counts over the TRAIN split only —
    the LM's training corpus. Derived from the shared TF artifact (one
    corpus scan per snapshot), fingerprint-keyed itself so a mutated
    documents table retrains."""

    def build() -> DataFrame:
        tf = term_frequencies(spark, sf_dir)
        return (
            tf.filter(split_col(F.col("doc_id")) == "train")
            .groupBy("term")
            .agg(F.sum("tf").alias("c"))
        )

    return index_store.cached_df(
        spark, index_store.table_dir(sf_dir, "documents"),
        "lm_unigram_counts", build,
    )


def lm_rarity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LM rarity verdict: (doc_id, lang, n_words, n_oov,
    oov_frac, rarity_fp, rarity_score).

    ``rarity_score`` ≈ mean_w (N+V)/(c(w)+1) — the mean smoothed
    inverse unigram probability under the train-split LM (N = train
    tokens, V = train vocabulary; add-one smoothing, so out-of-
    vocabulary words contribute the maximal weight N+V). A document of
    common words scores near V·(N+V)/N ≈ small; a document of tokens
    the LM never saw scores near N+V. ``rarity_fp`` is the exact
    fixed-point numerator (Σ tf·floor(1e12/(c+1))) for integer-exact
    downstream thresholding; ``n_oov``/``oov_frac`` expose the OOV mass
    separately (the CCNet tail-filter inputs). Documents with zero
    tokens have no distribution to score and don't appear."""
    tf = term_frequencies(spark, sf_dir)
    counts = lm_unigram_counts(spark, sf_dir)
    stats = counts.agg(
        F.sum("c").alias("n_tok"), F.count(F.lit(1)).alias("vocab")
    )
    weight = F.floor(
        F.lit(1.0e12) / (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
    )
    scored = (
        tf.join(counts, "term", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_words"),
            F.sum(
                F.when(F.col("c").isNull(), F.col("tf")).otherwise(F.lit(0))
            ).alias("n_oov"),
            F.sum(F.col("tf") * weight).alias("rarity_fp"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        scored.join(docs, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "lang", "n_words", "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_words").cast("double"))
            .alias("oov_frac"),
            "rarity_fp",
            (
                (F.col("rarity_fp").cast("double")
                 / F.col("n_words").cast("double"))
                * ((F.col("n_tok") + F.col("vocab")).cast("double")
                   / F.lit(1.0e12))
            ).alias("rarity_score"),
        )
    )


LM_RARITY_SQL = f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM (
    SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
  ) WHERE term <> '' GROUP BY doc_id, term
), counts AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM tf
  WHERE substr(md5(CAST(doc_id AS STRING)), 1, 2) >= '{VAL_HEX_BOUND}'
  GROUP BY term
), stats AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_tok, COUNT(*) AS vocab FROM counts
), scored AS (
  SELECT tf.doc_id,
         CAST(SUM(tf) AS BIGINT) AS n_words,
         CAST(SUM(CASE WHEN c.c IS NULL THEN tf ELSE 0 END) AS BIGINT) AS n_oov,
         CAST(SUM(tf * CAST(FLOOR(1e12 / CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS rarity_fp
  FROM tf LEFT JOIN counts c USING (term)
  GROUP BY tf.doc_id
)
SELECT s.doc_id, d.lang, s.n_words, s.n_oov,
       CAST(s.n_oov AS DOUBLE) / CAST(s.n_words AS DOUBLE) AS oov_frac,
       s.rarity_fp,
       (CAST(s.rarity_fp AS DOUBLE) / CAST(s.n_words AS DOUBLE))
         * (CAST(st.n_tok + st.vocab AS DOUBLE) / 1e12) AS rarity_score
FROM scored s JOIN documents d USING (doc_id) CROSS JOIN stats st
"""


EXT_QUERIES = {
    "lm_rarity_docs": (lm_rarity_docs, LM_RARITY_SQL),
}
