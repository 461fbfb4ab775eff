"""Model-based document quality scoring: the classifier-filter step of
the published LLM-pretraining recipes (GPT-3 / LLaMA / palm-style
"train a linear classifier on a trusted-vs-web split, score every
document, keep the high-scoring tail"), trained IN-ENGINE on the
corpus itself.

Training signal: the deterministic heuristic ``text.quality_score``
labels the clearly-good (≥ POS_T) and clearly-bad (< NEG_T) documents
of the TRAIN split (the shared md5 split of corpus_prep.split_col —
the scored val docs never leak into the model); the middle band stays
unlabeled. The model is a per-token smoothed class posterior
P(pos | w) = (c_pos(w)+1) / (c_pos(w)+c_neg(w)+2), and a document's
score is the mean posterior over its tokens — a bag-of-words linear
scorer exactly like the fastText-style filters in the published
recipes, with Laplace-smoothed frequency weights instead of learned
ones. Unseen tokens get the uninformative prior 1/2.

Cross-engine determinism (the repo's no-float-log rule, see
extensions/lm_score.py): no logs, no float accumulation. Per-token
weights are fixed-point BIGINTs floor(1e9 · (c_pos+1)/(c_pos+c_neg+2))
— one IEEE division + multiplication per DISTINCT vocabulary term,
mirrored verbatim by the DuckDB oracle — and a document's score is an
exact BIGINT sum Σ tf·w, so the result is byte-identical under any
partial-aggregation order. The keep/drop decision at posterior 1/2 is
the INTEGER comparison 2·score_fp > n_words·10^9 — no float threshold
at the decision boundary at all.

Scale shape (100 TB):
- token statistics come from the SHARED term-frequencies artifact
  (one corpus explode+aggregate per snapshot, fingerprint-keyed);
- the trained model is vocabulary-bounded — a (term, weight) table
  aggregated from the TF rows of the labeled train subset; it
  broadcasts when it fits (AQE picks the broadcast at runtime),
  shuffle-joins on term otherwise;
- scoring is ONE left join + ONE per-doc hash aggregate over
  (doc, term, tf) rows — never the raw token stream;
- the weights table is itself fingerprint-cached
  (index_store.cached_df), so repeat scoring runs retrain nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import index_store
from ..plans.queries import load_table
from .corpus_prep import VAL_HEX_BOUND, split_col
from .text import quality_score
from .tfidf import term_frequencies

# heuristic label band: clearly-good / clearly-bad train docs only
POS_T = 0.75
NEG_T = 0.55

# fixed-point scale for the per-token posterior weights; w_fp ∈
# [0, 1e9], so a document's Σ tf·w stays ≤ n_words·1e9 ≪ 2^63
W_SCALE = 10**9
# floor(1e9 · (0+1)/(0+2)): the exact out-of-vocabulary prior weight
OOV_W = W_SCALE // 2


def quality_classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, c_pos, c_neg, w_fp): the trained model — smoothed
    per-token class-posterior weights from the labeled train subset.
    Fingerprint-cached per corpus snapshot (a mutated documents table
    retrains, a repeat run loads the artifact)."""

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        labeled = (
            docs.select(
                "doc_id", quality_score(F.col("text")).alias("qs")
            )
            .filter(split_col(F.col("doc_id")) == "train")
            .select(
                "doc_id",
                F.when(F.col("qs") >= POS_T, F.lit(1))
                .when(F.col("qs") < NEG_T, F.lit(0))
                .cast("long")
                .alias("label"),
            )
            .filter(F.col("label").isNotNull())
        )
        tf = term_frequencies(spark, sf_dir)
        per_term = (
            tf.join(labeled, "doc_id")
            .groupBy("term")
            .agg(
                F.sum(F.col("tf") * F.col("label")).alias("c_pos"),
                F.sum(F.col("tf") * (F.lit(1) - F.col("label"))).alias(
                    "c_neg"
                ),
            )
        )
        return per_term.select(
            "term",
            "c_pos",
            "c_neg",
            F.floor(
                F.lit(1.0e9)
                * (
                    (F.col("c_pos") + 1).cast("double")
                    / (F.col("c_pos") + F.col("c_neg") + 2).cast("double")
                )
            ).alias("w_fp"),
        )

    return index_store.cached_df(
        spark, index_store.table_dir(sf_dir, "documents"),
        "quality_classifier_weights", build,
    )


def batch_term_frequencies(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) computed inline from a (doc_id, text, ...)
    DataFrame — the streaming-batch counterpart of the fingerprint-
    cached ``tfidf.term_frequencies`` corpus artifact (a micro-batch is
    ephemeral; caching it would only leak store generations)."""
    from .text import words_col

    toks = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def score_tf(tf: DataFrame, weights: DataFrame, docs: DataFrame) -> DataFrame:
    """The scoring kernel shared by the batch query and the streaming
    scorer: join (doc_id, term, tf) rows against the trained (term,
    w_fp) weights and aggregate per document. Output: (doc_id, lang,
    n_words, n_oov, score_fp, quality_ml, predicted_keep); ``n_oov``
    counts tokens outside the trained vocabulary (they score the exact
    1/2 prior) — the model-drift signal the streaming path alarms on."""
    scored = (
        tf.join(weights.select("term", "w_fp"), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_words"),
            F.sum(
                F.when(F.col("w_fp").isNull(), F.col("tf")).otherwise(F.lit(0))
            ).alias("n_oov"),
            F.sum(
                F.col("tf") * F.coalesce(F.col("w_fp"), F.lit(OOV_W))
            ).alias("score_fp"),
        )
    )
    return scored.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        "n_words",
        "n_oov",
        "score_fp",
        (
            (F.col("score_fp").cast("double") / F.col("n_words").cast("double"))
            / F.lit(1.0e9)
        ).alias("quality_ml"),
        (F.col("score_fp") * 2 > F.col("n_words") * F.lit(W_SCALE)).alias(
            "predicted_keep"
        ),
    )


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document model verdict: (doc_id, lang, n_words, score_fp,
    quality_ml, predicted_keep).

    ``score_fp`` = Σ_w tf·w_fp — the exact fixed-point numerator;
    ``quality_ml`` = mean per-token posterior in [0,1] (one final IEEE
    division pair, operand order mirrored by the oracle);
    ``predicted_keep`` = posterior-majority decision at 1/2, evaluated
    as the integer comparison 2·score_fp > n_words·W_SCALE. Documents
    with zero tokens have nothing to score and don't appear."""
    tf = term_frequencies(spark, sf_dir)
    weights = quality_classifier_weights(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return score_tf(tf, weights, docs).select(
        "doc_id", "lang", "n_words", "score_fp", "quality_ml",
        "predicted_keep",
    )


def _quality_classifier_sql() -> str:
    # the heuristic-label SQL mirror lives next to the other curation
    # oracles; import here to avoid a module cycle at import time
    from .curation import _quality_sql_expr

    return f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM (
    SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
    FROM documents
  ) WHERE term <> '' GROUP BY doc_id, term
), labeled AS (
  SELECT doc_id,
         CASE WHEN {_quality_sql_expr()} >= {POS_T} THEN 1
              WHEN {_quality_sql_expr()} < {NEG_T} THEN 0 END AS label
  FROM documents
  WHERE substr(md5(CAST(doc_id AS STRING)), 1, 2) >= '{VAL_HEX_BOUND}'
), train_labels AS (
  SELECT doc_id, label FROM labeled WHERE label IS NOT NULL
), per_term AS (
  SELECT term,
         CAST(SUM(tf * label) AS BIGINT) AS c_pos,
         CAST(SUM(tf * (1 - label)) AS BIGINT) AS c_neg
  FROM tf JOIN train_labels USING (doc_id) GROUP BY term
), weights AS (
  SELECT term,
         CAST(FLOOR(1e9 * (CAST(c_pos + 1 AS DOUBLE)
                           / CAST(c_pos + c_neg + 2 AS DOUBLE))) AS BIGINT) AS w_fp
  FROM per_term
), scored AS (
  SELECT tf.doc_id,
         CAST(SUM(tf) AS BIGINT) AS n_words,
         CAST(SUM(tf * COALESCE(w.w_fp, {OOV_W})) AS BIGINT) AS score_fp
  FROM tf LEFT JOIN weights w USING (term)
  GROUP BY tf.doc_id
)
SELECT s.doc_id, d.lang, s.n_words, s.score_fp,
       (CAST(s.score_fp AS DOUBLE) / CAST(s.n_words AS DOUBLE)) / 1e9 AS quality_ml,
       s.score_fp * 2 > s.n_words * {W_SCALE} AS predicted_keep
FROM scored s JOIN documents d USING (doc_id)
"""


def quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier's own quality gate (the ann_recall_eval pattern:
    every trained operator ships with an in-engine evaluation): score
    the HELD-OUT val-split documents that carry a heuristic label (the
    same POS_T/NEG_T band the training used — on docs the model never
    saw) and report the one-row confusion summary. All counts are exact
    integers; the two rates are single IEEE divisions — fully
    oracle-checkable. Val docs in the unlabeled middle band are not
    gradable and are excluded (n_unlabeled reports how many).

    Scale shape: reuses the scored table (one join + per-doc aggregate,
    see quality_classifier_scores) joined against the label map (pure
    map over documents), then ONE global 1-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    labels = (
        docs.select("doc_id", quality_score(F.col("text")).alias("qs"))
        .filter(split_col(F.col("doc_id")) == "val")
        .select(
            "doc_id",
            F.when(F.col("qs") >= POS_T, F.lit(1))
            .when(F.col("qs") < NEG_T, F.lit(0))
            .cast("long")
            .alias("label"),
        )
    )
    scored = quality_classifier_scores(spark, sf_dir).select(
        "doc_id", F.col("predicted_keep").cast("long").alias("pred")
    )
    j = labels.join(scored, "doc_id")
    lab = F.col("label")
    return j.agg(
        F.sum(F.when(lab.isNull(), 1).otherwise(0)).alias("n_unlabeled"),
        F.sum(F.when(lab.isNotNull(), 1).otherwise(0)).alias("n_eval"),
        F.sum(F.when((lab == 1) & (F.col("pred") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((lab == 0) & (F.col("pred") == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((lab == 0) & (F.col("pred") == 0), 1).otherwise(0)).alias("tn"),
        F.sum(F.when((lab == 1) & (F.col("pred") == 0), 1).otherwise(0)).alias("fn"),
    ).select(
        "n_unlabeled", "n_eval", "tp", "fp", "tn", "fn",
        ((F.col("tp") + F.col("tn")).cast("double")
         / F.col("n_eval").cast("double")).alias("accuracy"),
        (F.col("tp").cast("double")
         / (F.col("tp") + F.col("fn")).cast("double")).alias("pos_recall"),
    )


def _quality_eval_sql() -> str:
    from .curation import _quality_sql_expr

    scores_sql = _quality_classifier_sql()
    return f"""
WITH scored AS ({scores_sql}),
labels AS (
  SELECT doc_id,
         CASE WHEN {_quality_sql_expr()} >= {POS_T} THEN 1
              WHEN {_quality_sql_expr()} < {NEG_T} THEN 0 END AS label
  FROM documents
  WHERE substr(md5(CAST(doc_id AS STRING)), 1, 2) < '{VAL_HEX_BOUND}'
), j AS (
  SELECT l.label, CASE WHEN s.predicted_keep THEN 1 ELSE 0 END AS pred
  FROM labels l JOIN scored s USING (doc_id)
)
SELECT
  CAST(SUM(CASE WHEN label IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unlabeled,
  CAST(SUM(CASE WHEN label IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
  CAST(SUM(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
  CAST(SUM(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
  CAST(SUM(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
  CAST(SUM(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
  CAST(SUM(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END)
       + SUM(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(SUM(CASE WHEN label IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS accuracy,
  CAST(SUM(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(SUM(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END)
           + SUM(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS pos_recall
FROM j
"""


EXT_QUERIES = {
    "quality_classifier_scores": (
        quality_classifier_scores,
        _quality_classifier_sql(),
    ),
    "quality_classifier_eval": (
        quality_classifier_eval,
        _quality_eval_sql(),
    ),
}
