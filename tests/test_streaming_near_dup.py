"""Streaming maintenance of the near-dup cluster index
(streaming.near_dup_index_stream): three file-source micro-batches grow
the assignment; the final state must cover the full grown corpus,
contain every co-clustered pair a from-scratch rebuild of that corpus
finds, and keep each streamed vector's planted twin co-clustered —
i.e. the chained incremental path inherits the single-shot path's
guarantees across micro-batch boundaries."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.similarity import (
    TWIN_OFFSET,
    lsh_bits,
    near_dup_clusters,
)
from e_commerce_etl_pipeline_spark.plans.queries import load_table
from e_commerce_etl_pipeline_spark.streaming.incremental import (
    near_dup_index_stream,
    read_assignment,
)


def _groups(df) -> dict[int, int]:
    return {r["vec_id"]: r["canonical_id"] for r in df.collect()}


def _co_pairs(assign: dict[int, int]) -> set[tuple[int, int]]:
    from collections import defaultdict

    by_label = defaultdict(list)
    for v, c in assign.items():
        by_label[c].append(v)
    pairs = set()
    for members in by_label.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                pairs.add((a, b))
    return pairs


@pytest.fixture(scope="module")
def stream_dirs(spark, sf_dir, tmp_path_factory):
    """work_dir seeded with 90% of the sf0.001 embeddings; the held-out
    10% lands as three single-file micro-batches in source_dir;
    grown_dir holds the full table (the rebuild reference)."""
    root = tmp_path_factory.mktemp("stream_nd")
    emb = load_table(spark, sf_dir, "embeddings")
    work_dir = str(root / "work")
    grown_dir = str(root / "grown")
    source_dir = str(root / "source")
    os.makedirs(source_dir)
    emb.filter(F.col("vec_id") % 10 != 7).coalesce(1).write.parquet(
        f"{work_dir}/embeddings.parquet"
    )
    emb.coalesce(1).write.parquet(f"{grown_dir}/embeddings.parquet")
    n_base = emb.filter(F.col("vec_id") % 10 != 7).count()
    n_grown = emb.count()
    assert lsh_bits(n_base) == lsh_bits(n_grown), (
        "fixture must not straddle an lsh_bits step"
    )
    held = emb.filter(F.col("vec_id") % 10 == 7)
    batch_ids = []
    for i in range(3):
        b = held.filter(F.col("vec_id") % 3 == i)
        batch_ids.append({r["vec_id"] for r in b.select("vec_id").collect()})
        stage = str(root / f"stage{i}")
        b.coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.move(part, f"{source_dir}/batch_{i}.parquet")
    return work_dir, grown_dir, source_dir, batch_ids


def test_streamed_index_matches_or_supersets_rebuild(spark, stream_dirs):
    work_dir, grown_dir, source_dir, batch_ids = stream_dirs
    schema = load_table(spark, grown_dir, "embeddings").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    q = near_dup_index_stream(
        spark, stream, work_dir,
        checkpoint_dir=f"{work_dir}/_ckpt",
    )
    q.awaitTermination(300)

    # an incomplete (no _SUCCESS) version left by a crash must be
    # invisible to readers — plant one above the real latest
    bogus = f"{work_dir}/near_dup_assignment.parquet/v=99"
    os.makedirs(bogus)
    final = _groups(read_assignment(spark, work_dir))
    shutil.rmtree(bogus)
    full = _groups(near_dup_clusters(spark, grown_dir))

    # coverage: the streamed index covers the full grown corpus exactly
    assert set(final) == set(full)

    # superset: every pair the rebuild co-clusters is co-clustered in
    # the streamed index (merge-monotone across micro-batches)
    missing = _co_pairs(full) - _co_pairs(final)
    assert not missing, f"rebuild pairs lost in stream: {sorted(missing)[:5]}"

    # twin rejoin for every streamed vector
    for ids in batch_ids:
        for v in ids:
            assert final[v] == final[v + TWIN_OFFSET], f"twin split for {v}"

    # the corpus table grew by exactly the streamed vectors
    n = spark.read.parquet(f"{work_dir}/embeddings.parquet").count()
    assert n == len(full) // 2
