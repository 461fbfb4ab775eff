"""Chunking + exact-span dedup-with-rewrite: hand-computed window
boundaries and keep-first outcomes on controlled corpora, plus
invariants on the driver corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.chunking import (
    CHUNK_W,
    SEG_W,
    STRIDE_W,
    chunk_documents,
    segment_dedup_docs,
)


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en") for i, t in rows], "doc_id long, text string, lang string"
    ).write.parquet(d + "/documents.parquet")
    return d


def _words(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_chunk_windows_cover_and_overlap(spark, tmp_path):
    # 80 tokens: chunks at starts 1, 25, 49 — full coverage, the last
    # window exactly reaches token 80 (49 + 32 - 1)
    sf = _write_docs(spark, tmp_path, [(1, _words(80))])
    rows = {r["chunk_idx"]: r for r in chunk_documents(spark, sf).collect()}
    assert sorted(rows) == [0, 1, 2]
    assert [rows[i]["chunk_start"] for i in (0, 1, 2)] == [1, 1 + STRIDE_W, 1 + 2 * STRIDE_W]
    assert all(rows[i]["n_tokens"] == CHUNK_W for i in (0, 1, 2))
    # consecutive chunks share CHUNK_W - STRIDE_W tokens
    tail = rows[0]["chunk_text"].split()[STRIDE_W:]
    head = rows[1]["chunk_text"].split()[: CHUNK_W - STRIDE_W]
    assert tail == head
    # full coverage in order
    merged = rows[0]["chunk_text"].split()
    for i in (1, 2):
        merged += rows[i]["chunk_text"].split()[CHUNK_W - STRIDE_W:]
    assert merged == _words(80).split()


def test_chunk_short_and_empty_docs(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(1, _words(5)), (2, "   "), (3, "")])
    rows = chunk_documents(spark, sf).collect()
    assert len(rows) == 1  # whitespace-only and empty docs drop out
    r = rows[0]
    assert (r["doc_id"], r["chunk_idx"], r["n_tokens"]) == (1, 0, 5)
    assert r["chunk_text"] == _words(5)


def test_chunk_hash_is_content_id(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(1, _words(20)), (2, _words(20))])
    hashes = (
        chunk_documents(spark, sf)
        .groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    )
    assert len(hashes) == 1 and hashes[0]["n"] == 2


def test_segment_dedup_drops_clone_and_rewrites_partial(spark, tmp_path):
    a = _words(2 * SEG_W, "a")  # doc 1: segments A0 A1
    shared = " ".join(a.split()[:SEG_W])  # A0
    unique = _words(SEG_W, "u")
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, a),  # keeper of A0 and A1
            (2, a),  # exact clone: loses everything, absent from output
            (3, shared + " " + unique),  # keeps only its unique segment
        ],
    )
    out = {r["doc_id"]: r for r in segment_dedup_docs(spark, sf).collect()}
    assert sorted(out) == [1, 3]
    assert out[1]["n_segments"] == 2 and out[1]["removed_segments"] == 0
    assert out[1]["deduped_text"] == a
    assert out[3]["n_segments"] == 2 and out[3]["kept_segments"] == 1
    assert out[3]["deduped_text"] == unique


def test_segment_dedup_within_doc_repeat(spark, tmp_path):
    seg = _words(SEG_W, "r")
    sf = _write_docs(spark, tmp_path, [(1, seg + " " + seg)])
    (r,) = segment_dedup_docs(spark, sf).collect()
    assert (r["n_segments"], r["kept_segments"], r["removed_segments"]) == (2, 1, 1)
    assert r["deduped_text"] == seg


def test_segment_dedup_driver_corpus_invariants(spark, sf_dir):
    segs = segment_dedup_docs(spark, sf_dir)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.trim(F.col("text")) != "")
    )
    agg = segs.agg(
        F.sum("kept_segments").alias("kept"),
        F.sum("n_segments").alias("total"),
        F.min("kept_segments").alias("min_kept"),
        F.min("removed_segments").alias("min_removed"),
    ).collect()[0]
    assert agg["min_kept"] >= 1 and agg["min_removed"] >= 0
    assert 0 < agg["kept"] <= agg["total"]
    assert segs.count() <= docs.count()
    # untouched docs reassemble to their normalized original text
    joined = segs.filter(F.col("removed_segments") == 0).join(
        docs.select(
            "doc_id",
            F.array_join(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"), " "
            ).alias("norm"),
        ),
        "doc_id",
    )
    mismatches = joined.filter(F.col("deduped_text") != F.col("norm")).count()
    assert mismatches == 0
