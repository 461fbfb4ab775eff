"""Streaming BPE token accounting (streaming.bpe_token_stream): the
stored tokenizer state encodes file-source micro-batches exactly as
the batch kernel does, the char-token fallback fires on genuinely
unseen words (the one path the batch operator can't reach — it always
encodes its own training corpus), the drift audit flags a
fallback-heavy batch, and a checkpoint replay converges instead of
duplicating."""

from __future__ import annotations

import glob
import os
import shutil

from e_commerce_etl_pipeline_spark.extensions.tokenizer import (
    bpe_encode_stats,
)
from e_commerce_etl_pipeline_spark.streaming.token_accounting import (
    bpe_token_stream,
    read_stream_token_counts,
    read_token_stream_audit,
)

# training corpus: "abab" dominates, so early merges are (a,b) then
# (ab,ab) — words built from those symbols encode compactly
TRAIN_TEXTS = ["abab abab ab", "abab ab ab"]


def _write_corpus(spark, root):
    corpus_dir = str(root / "corpus")
    spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(TRAIN_TEXTS)],
        "doc_id long, text string, lang string",
    ).write.parquet(corpus_dir + "/documents.parquet")
    return corpus_dir


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


def _run(spark, source_dir, corpus_dir, work_dir, ckpt):
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    q = bpe_token_stream(
        spark, stream, corpus_dir, work_dir, checkpoint_dir=ckpt
    )
    q.awaitTermination(300)


def test_stream_matches_batch_kernel_fallback_and_drift(spark, tmp_path):
    corpus_dir = _write_corpus(spark, tmp_path)
    # batch 0: words the vocab knows ("abab": 1 token, "ab": 1 token);
    # batch 1: entirely unseen words -> char fallback + drift flag
    source_dir = _stage_batches(spark, tmp_path, [
        [(100, "abab ab", "en"), (101, "abab abab", "en")],
        [(200, "zzzz wwww", "en")],
    ])
    work_dir = str(tmp_path / "work")
    _run(spark, source_dir, corpus_dir, work_dir, str(tmp_path / "ckpt"))

    counts = {
        r["doc_id"]: r
        for r in read_stream_token_counts(spark, work_dir).collect()
    }
    assert sorted(counts) == [100, 101, 200]
    # vocab words encode through the trained state: after merges (a,b)
    # and (ab,ab), "abab" -> [abab] (1 token), "ab" -> [ab] (1 token)
    assert counts[100]["n_tokens_bpe"] == 2
    assert counts[100]["n_unseen_words"] == 0
    assert counts[101]["n_tokens_bpe"] == 2
    # unseen words fall back to character tokens: 4 + 4
    assert counts[200]["n_tokens_bpe"] == 8
    assert counts[200]["n_unseen_words"] == 2

    audit = {
        r["batch"]: r for r in read_token_stream_audit(spark, work_dir).collect()
    }
    assert not audit[0]["retrain_due"]
    assert audit[1]["retrain_due"] and audit[1]["unseen_word_frac"] == 1.0

    # single-batch parity with the batch operator on the TRAINING corpus
    batch = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in bpe_encode_stats(spark, corpus_dir).collect()
    }
    in_vocab_stream_dir = _stage_batches(
        spark, tmp_path / "again",
        [[(i, t, "en") for i, t in enumerate(TRAIN_TEXTS)]],
    )
    work2 = str(tmp_path / "work2")
    _run(spark, in_vocab_stream_dir, corpus_dir, work2,
         str(tmp_path / "ckpt2"))
    stream_counts = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in read_stream_token_counts(spark, work2).collect()
    }
    assert stream_counts == batch


def test_zero_word_batch_audited_not_fatal(spark, tmp_path):
    """A non-empty batch whose documents explode to ZERO words
    (whitespace-only / null texts) must write an explicit zero-token
    audit row instead of killing the stream on a NULL aggregate
    (ADVICE r8) — and the stream must keep processing later batches."""
    corpus_dir = _write_corpus(spark, tmp_path)
    source_dir = _stage_batches(spark, tmp_path, [
        [(300, "   ", "en"), (301, None, "en")],   # zero words
        [(400, "abab ab", "en")],                  # normal batch after it
    ])
    work_dir = str(tmp_path / "work")
    _run(spark, source_dir, corpus_dir, work_dir, str(tmp_path / "ckpt"))

    audit = {
        r["batch"]: r
        for r in read_token_stream_audit(spark, work_dir).collect()
    }
    assert sorted(audit) == [0, 1], "stream died on the zero-word batch"
    z = audit[0]
    assert z["tokens_bpe"] == 0 and z["tokens_char"] == 0
    assert z["unseen_word_frac"] == 0.0 and not z["retrain_due"]
    assert audit[1]["tokens_bpe"] == 2 and not audit[1]["retrain_due"]


def test_replay_converges(spark, tmp_path):
    corpus_dir = _write_corpus(spark, tmp_path)
    source_dir = _stage_batches(spark, tmp_path, [
        [(100, "abab ab", "en")],
    ])
    work_dir = str(tmp_path / "work")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, source_dir, corpus_dir, work_dir, ckpt)
    first = {
        (r["doc_id"], r["n_tokens_bpe"], r["batch"])
        for r in read_stream_token_counts(spark, work_dir).collect()
    }
    # simulate an at-least-once replay: wipe the checkpoint so the same
    # file re-delivers as batch 0 and rewrites its own directories
    shutil.rmtree(ckpt)
    _run(spark, source_dir, corpus_dir, work_dir, str(tmp_path / "ckpt_b"))
    again = {
        (r["doc_id"], r["n_tokens_bpe"], r["batch"])
        for r in read_stream_token_counts(spark, work_dir).collect()
    }
    assert again == first
    assert read_token_stream_audit(spark, work_dir).count() == 1
