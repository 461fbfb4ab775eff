"""Corpus-LM rarity scoring: exact hand-computed verdicts on a
controlled corpus (train/val split respected, OOV mass maximal,
common-word docs scoring the distribution minimum) plus invariants on
the driver corpus."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.lm_score import (
    lm_rarity_docs,
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


def test_exact_scores_on_controlled_corpus(spark, tmp_path):
    t1, t2, t3 = _ids("train", 3)
    (v1,) = _ids("val", 1)
    # LM trains on 3 train docs x "the the the": c(the)=9, N=9, V=1.
    # smoothed inverse probability of "the" = (N+V)/(c+1) = 1.0; of an
    # OOV word = (N+V)/1 = 10.0.
    sf = _write_docs(spark, tmp_path, [
        (t1, "the the the"), (t2, "the the the"), (t3, "the the the"),
        (v1, "zzzq yyyq"),
    ])
    out = {r["doc_id"]: r for r in lm_rarity_docs(spark, sf).collect()}
    assert set(out) == {t1, t2, t3, v1}
    train_row = out[t1]
    assert train_row["n_words"] == 3 and train_row["n_oov"] == 0
    assert train_row["rarity_fp"] == 3 * 10**11  # floor(1e12/10) per token
    # ~1.0 = mean inverse probability of an all-common-word doc; compare
    # against the SAME IEEE expression shape the operator (and its
    # DuckDB oracle) evaluate, not a decimal idealization
    assert train_row["rarity_score"] == (3e11 / 3.0) * (10.0 / 1e12)
    val_row = out[v1]
    assert val_row["n_words"] == 2 and val_row["n_oov"] == 2
    assert val_row["oov_frac"] == 1.0
    assert val_row["rarity_fp"] == 2 * 10**12
    assert val_row["rarity_score"] == (2e12 / 2.0) * (10.0 / 1e12)  # ~N+V
    assert val_row["rarity_score"] > train_row["rarity_score"]


def test_val_docs_never_train_the_lm(spark, tmp_path):
    """A word appearing ONLY in val documents must stay OOV — the split
    guard against scoring docs under a model that saw them."""
    t1, t2, t3 = _ids("train", 3)
    v1, v2 = _ids("val", 2)
    sf = _write_docs(spark, tmp_path, [
        (t1, "alpha beta"), (t2, "alpha"), (t3, "beta alpha"),
        (v1, "leakword"), (v2, "leakword leakword"),
    ])
    out = {r["doc_id"]: r for r in lm_rarity_docs(spark, sf).collect()}
    assert out[v1]["n_oov"] == 1 and out[v2]["n_oov"] == 2


def test_corpus_invariants(spark, sf_dir):
    out = lm_rarity_docs(spark, sf_dir)
    n = out.count()
    assert n > 0
    assert out.filter(F.col("rarity_fp") < F.col("n_words")).count() == 0
    assert out.filter(
        (F.col("oov_frac") < 0) | (F.col("oov_frac") > 1)
    ).count() == 0
    assert out.filter(F.col("rarity_score") <= 0).count() == 0
    # one verdict per scoreable document
    assert out.select("doc_id").distinct().count() == n
