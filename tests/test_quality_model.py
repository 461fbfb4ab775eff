"""Corpus-trained quality classifier: exact fixed-point weights and
verdicts on a controlled corpus (train-only fitting, OOV prior,
integer decision boundary), plus range invariants on the driver
corpus."""

from __future__ import annotations

import hashlib

from e_commerce_etl_pipeline_spark.extensions.quality_model import (
    OOV_W,
    W_SCALE,
    quality_classifier_scores,
    quality_classifier_weights,
)


def _split(doc_id: int) -> str:
    return (
        "val"
        if hashlib.md5(str(doc_id).encode()).hexdigest()[:2] < "1a"
        else "train"
    )


def _ids(kind: str, k: int) -> list[int]:
    out = []
    for i in range(1000):
        if _split(i) == kind:
            out.append(i)
            if len(out) == k:
                return out
    raise AssertionError("split search exhausted")


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en") for i, t in rows], "doc_id long, text string, lang string"
    ).write.parquet(d + "/documents.parquet")
    return d


# heuristic-label anchors: POS is 50 stopwords (len 1.0 + stop 1.0 +
# punct 1.0 → qs = 1.0 ≥ 0.75); NEG is 3 punctuated non-stopwords
# (len .06 + stop 0 + punct .5 → qs ≈ .187 < 0.55)
POS_TEXT = " ".join(
    ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"] * 5
)
NEG_TEXT = "xxx. yyy. zzz."


def _corpus(spark, tmp_path, extra):
    t_pos, t_neg = _ids("train", 2)
    return _write_docs(
        spark, tmp_path, [(t_pos, POS_TEXT), (t_neg, NEG_TEXT)] + extra
    ), (t_pos, t_neg)


def test_weights_are_exact_smoothed_posteriors(spark, tmp_path):
    sf, _ = _corpus(spark, tmp_path, [])
    w = {r["term"]: r for r in quality_classifier_weights(spark, sf).collect()}
    # 'the' occurs 5x in the one positive doc: (5+1)/(5+0+2)
    assert (w["the"]["c_pos"], w["the"]["c_neg"]) == (5, 0)
    assert w["the"]["w_fp"] == int(1e9 * (6 / 7))
    # 'xxx.' occurs once in the one negative doc: (0+1)/(0+1+2)
    assert (w["xxx."]["c_pos"], w["xxx."]["c_neg"]) == (0, 1)
    assert w["xxx."]["w_fp"] == int(1e9 * (1 / 3))


def test_val_docs_never_train_the_model(spark, tmp_path):
    # the same clearly-positive text on a VAL id must not add counts
    (v,) = _ids("val", 1)
    sf, _ = _corpus(spark, tmp_path, [(v, POS_TEXT)])
    w = {r["term"]: r for r in quality_classifier_weights(spark, sf).collect()}
    assert (w["the"]["c_pos"], w["the"]["c_neg"]) == (5, 0)


def test_verdicts_pos_neg_and_oov(spark, tmp_path):
    v1, v2, v3 = _ids("val", 3)
    sf, (t_pos, t_neg) = _corpus(
        spark,
        tmp_path,
        [(v1, "the the the"), (v2, "xxx. xxx."), (v3, "qqqq qqqq")],
    )
    out = {r["doc_id"]: r for r in quality_classifier_scores(spark, sf).collect()}
    w_the = int(1e9 * (6 / 7))
    w_xxx = int(1e9 * (1 / 3))
    assert out[v1]["score_fp"] == 3 * w_the and out[v1]["predicted_keep"]
    assert out[v2]["score_fp"] == 2 * w_xxx and not out[v2]["predicted_keep"]
    # OOV words score the exact uninformative prior — and the strict
    # integer decision boundary 2·score > n·SCALE rejects exactly-1/2
    assert out[v3]["score_fp"] == 2 * OOV_W
    assert not out[v3]["predicted_keep"]
    assert out[v3]["quality_ml"] == (2 * OOV_W / 2) / 1e9 == 0.5
    # the training docs themselves classify as their own labels
    assert out[t_pos]["predicted_keep"] and not out[t_neg]["predicted_keep"]


def test_driver_corpus_invariants(spark, sf_dir):
    out = quality_classifier_scores(spark, sf_dir)
    rows = out.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs  # every doc is scored (corpus has no empties)
    for r in rows:
        assert 0.0 <= r["quality_ml"] <= 1.0
        assert 0 < r["score_fp"] <= r["n_words"] * W_SCALE
        assert r["predicted_keep"] == (
            2 * r["score_fp"] > r["n_words"] * W_SCALE
        )
    # the model separates in the right DIRECTION: mean model score of
    # the heuristically-good band exceeds the heuristically-bad band
    # (at tiny sf every verdict can land on one side of 1/2, so the
    # thresholded labels themselves are not a stable invariant)
    from pyspark.sql import functions as F

    from e_commerce_etl_pipeline_spark.extensions.quality_model import (
        NEG_T,
        POS_T,
    )
    from e_commerce_etl_pipeline_spark.extensions.text import quality_score

    docs_qs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", quality_score(F.col("text")).alias("qs"))
    )
    bands = (
        out.join(docs_qs, "doc_id")
        .select(
            F.avg(F.when(F.col("qs") >= POS_T, F.col("quality_ml"))).alias("pos"),
            F.avg(F.when(F.col("qs") < NEG_T, F.col("quality_ml"))).alias("neg"),
        )
        .collect()[0]
    )
    assert bands["pos"] is not None and bands["neg"] is not None
    assert bands["pos"] > bands["neg"]


def test_eval_confusion_counts_on_controlled_corpus(spark, tmp_path):
    """Exact confusion matrix on held-out val docs: one clearly-good,
    one clearly-bad, one middle-band (unlabeled, excluded from rates)."""
    from e_commerce_etl_pipeline_spark.extensions.quality_model import (
        quality_classifier_eval,
    )

    v1, v2, v3 = _ids("val", 3)
    # v1: POS label, model keeps (all high-weight stopwords) -> tp
    # v2: NEG label, model rejects (neg-trained tokens) -> tn
    # v3: middle band (qs between NEG_T and POS_T) -> unlabeled
    sf, _ = _corpus(spark, tmp_path, [
        (v1, POS_TEXT), (v2, NEG_TEXT), (v3, "the xxx"),
    ])
    (r,) = quality_classifier_eval(spark, sf).collect()
    assert (r["n_eval"], r["n_unlabeled"]) == (2, 1)
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (1, 0, 1, 0)
    assert r["accuracy"] == 1.0 and r["pos_recall"] == 1.0


def test_eval_driver_corpus_is_one_consistent_row(spark, sf_dir):
    from e_commerce_etl_pipeline_spark.extensions.quality_model import (
        quality_classifier_eval,
    )

    (r,) = quality_classifier_eval(spark, sf_dir).collect()
    assert r["n_eval"] == r["tp"] + r["fp"] + r["tn"] + r["fn"]
    assert r["n_eval"] > 0
    assert abs(r["accuracy"] - (r["tp"] + r["tn"]) / r["n_eval"]) == 0.0
