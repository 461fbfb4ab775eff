"""BPE pair statistics: hand-computed pair counts on a controlled
corpus plus invariants (total order, bounded output) on the driver
corpus."""

from __future__ import annotations

from e_commerce_etl_pipeline_spark.extensions.tokenizer import (
    TOP_PAIRS,
    bpe_pair_stats,
)


def _write_docs(spark, tmp_path, texts):
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    ).write.parquet(d + "/documents.parquet")
    return d


def test_hand_computed_pair_counts(spark, tmp_path):
    # "abab ab" -> word "abab": ab, ba, ab; word "ab": ab  => ab:3, ba:1
    # single-char word "x" contributes nothing
    sf = _write_docs(spark, tmp_path, ["abab ab", "x"])
    rows = {r["pair"]: r["n"] for r in bpe_pair_stats(spark, sf).collect()}
    assert rows == {"ab": 3, "ba": 1}


def test_case_fold_and_ordering(spark, tmp_path):
    # tokenization lowercases ("AB" == "ab"); equal counts order by pair
    sf = _write_docs(spark, tmp_path, ["AB cd"])
    rows = bpe_pair_stats(spark, sf).collect()
    assert [(r["pair"], r["n"]) for r in rows] == [("ab", 1), ("cd", 1)]


def test_driver_corpus_invariants(spark, sf_dir):
    rows = bpe_pair_stats(spark, sf_dir).collect()
    assert 0 < len(rows) <= TOP_PAIRS
    assert all(len(r["pair"]) == 2 for r in rows)
    # total order: counts non-increasing; ties ascending by pair
    for a, b in zip(rows, rows[1:]):
        assert a["n"] > b["n"] or (a["n"] == b["n"] and a["pair"] < b["pair"])
