"""Streaming exact-span dedup (streaming.span_dedup_stream): later
batches lose spans earlier batches landed, the final landed corpus
carries each distinct segment exactly once, and replays converge."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.chunking import SEG_W
from e_commerce_etl_pipeline_spark.streaming.span_dedup import (
    read_deduped_docs,
    read_segment_store,
    span_dedup_stream,
)


def _words(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _stage_batches(spark, root, batches):
    source_dir = str(root / "source")
    os.makedirs(source_dir)
    for i, rows in enumerate(batches):
        stage = str(root / f"stage{i}")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.move(part, f"{source_dir}/batch_{i}.parquet")
    return source_dir


def _run(spark, source_dir, work_dir, ckpt):
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    q = span_dedup_stream(spark, stream, work_dir, checkpoint_dir=ckpt)
    q.awaitTermination(300)


def test_cross_batch_span_dedup(spark, tmp_path):
    a = _words(2 * SEG_W, "a")            # batch 0, doc 1: segments A0 A1
    shared = " ".join(a.split()[:SEG_W])  # A0
    unique = _words(SEG_W, "u")
    source_dir = _stage_batches(spark, tmp_path, [
        [(1, a, "en")],
        [(2, a, "en"),                      # exact clone of doc 1 — vanishes
         (3, shared + " " + unique, "en")],  # keeps only its unique segment
        [(4, unique, "en")],                # clone of doc 3's survivor — vanishes
    ])
    work_dir = str(tmp_path / "work")
    _run(spark, source_dir, work_dir, str(tmp_path / "ckpt"))

    out = {r["doc_id"]: r for r in read_deduped_docs(spark, work_dir).collect()}
    assert sorted(out) == [1, 3]
    assert out[1]["deduped_text"] == a and out[1]["removed_segments"] == 0
    assert out[3]["deduped_text"] == unique
    assert (out[3]["n_segments"], out[3]["kept_segments"]) == (2, 1)
    # batch provenance rides the partition column
    assert out[1]["batch"] == 0 and out[3]["batch"] == 1

    # the store carries each distinct segment hash exactly once
    store = read_segment_store(spark, work_dir)
    assert store.count() == store.select("seg_h").distinct().count() == 3

    # landed text re-segments to exactly the store (nothing lost/extra)
    landed_segs = (
        read_deduped_docs(spark, work_dir)
        .select(F.explode(F.split("deduped_text", " ")).alias("w"))
        .count()
    )
    assert landed_segs == 3 * SEG_W


def test_span_stream_replay_converges(spark, tmp_path):
    a = _words(SEG_W, "a")
    source_dir = _stage_batches(spark, tmp_path, [[(1, a, "en")]])
    work_dir = str(tmp_path / "work")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, source_dir, work_dir, ckpt)
    first = sorted(map(tuple, read_deduped_docs(spark, work_dir).collect()))

    # same checkpoint: no-op; wiped checkpoint: skip-if-complete guard
    _run(spark, source_dir, work_dir, ckpt)
    shutil.rmtree(ckpt)
    _run(spark, source_dir, work_dir, str(tmp_path / "ckpt2"))
    assert sorted(map(tuple, read_deduped_docs(spark, work_dir).collect())) == first
    assert read_segment_store(spark, work_dir).count() == 1


def test_matches_batch_operator_on_same_corpus(spark, tmp_path):
    """One stream batch over a whole corpus must land exactly what the
    batch operator (segment_dedup_docs) produces on it."""
    from e_commerce_etl_pipeline_spark.extensions.chunking import (
        segment_dedup_docs,
    )

    rows = [
        (1, _words(2 * SEG_W, "a"), "en"),
        (2, _words(2 * SEG_W, "a"), "en"),
        (3, _words(SEG_W, "b") + " " + " ".join(
            _words(2 * SEG_W, "a").split()[:SEG_W]), "en"),
    ]
    corpus_dir = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(corpus_dir + "/documents.parquet")
    source_dir = _stage_batches(spark, tmp_path, [rows])
    work_dir = str(tmp_path / "work")
    _run(spark, source_dir, work_dir, str(tmp_path / "ckpt"))

    streamed = sorted(
        map(tuple, read_deduped_docs(spark, work_dir).drop("batch").collect())
    )
    batch = sorted(map(tuple, segment_dedup_docs(spark, corpus_dir).collect()))
    assert streamed == batch
