"""Invariant tests for the corpus-statistics / packing / fusion
operators (value parity with DuckDB is pinned by the oracle gate; these
pin semantic invariants the hash compare can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.curation import (
    SEQ_LEN,
    sequence_packing,
)
from e_commerce_etl_pipeline_spark.extensions.dedup_fuzzy import (
    cross_source_overlap,
)
from e_commerce_etl_pipeline_spark.extensions.fusion import (
    lexical_semantic_pairs,
)
from e_commerce_etl_pipeline_spark.extensions.tfidf import (
    TOP_TERMS,
    tfidf_top_terms,
)


def test_sequence_packing_tape_is_contiguous(spark, sf_dir):
    rows = sequence_packing(spark, sf_dir).orderBy("doc_id").collect()
    assert rows, "packing output empty"
    offset = 0
    for r in rows:
        assert r.start_offset == offset, (r.doc_id, r.start_offset, offset)
        expected_crossing = (r.start_offset // SEQ_LEN) != (
            (r.start_offset + r.n_tokens - 1) // SEQ_LEN
        )
        assert r.crosses_boundary == expected_crossing
        assert r.seq_id == r.start_offset // SEQ_LEN
        offset += r.n_tokens


def test_sequence_packing_fills_every_sequence(spark, sf_dir):
    """Concat-then-chunk leaves no gaps: every sequence id up to the last
    one is populated by at least one document start or crossing."""
    rows = sequence_packing(spark, sf_dir).collect()
    total = sum(r.n_tokens for r in rows)
    last_seq = (total - 1) // SEQ_LEN
    covered = set()
    for r in rows:
        covered.update(
            range(r.start_offset // SEQ_LEN,
                  (r.start_offset + r.n_tokens - 1) // SEQ_LEN + 1)
        )
    assert covered == set(range(last_seq + 1))


def test_tfidf_rank_contract(spark, sf_dir):
    out = tfidf_top_terms(spark, sf_dir)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("term_rank").alias("max_rank"),
        F.min("tfidf_weight").alias("min_w"),
        F.max("tfidf_weight").alias("max_w"),
    ).collect()
    assert per_doc
    for r in per_doc:
        assert r.n <= TOP_TERMS
        assert r.max_rank == r.n  # ranks are 1..n dense
        assert r.max_w >= r.min_w > 0


def test_cross_source_overlap_is_canonicalized(spark, sf_dir):
    rows = cross_source_overlap(spark, sf_dir).collect()
    assert rows, "no candidate pairs — operator degenerate at this SF"
    seen = set()
    for r in rows:
        assert r.source_a <= r.source_b  # unordered pair canon
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert r.n_near_dup <= r.n_candidate_pairs
        assert 0.0 < r.max_jaccard <= 1.0


def test_lexical_semantic_pair_scores_are_bounded(spark, sf_dir):
    rows = lexical_semantic_pairs(spark, sf_dir).collect()
    assert rows, "no candidate pairs — operator degenerate at this SF"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0.0 <= r.jaccard <= 1.0
        assert -1.0000001 <= r.cosine <= 1.0000001
        assert r.lexical_dup == (r.jaccard >= 0.7)


def test_dedup_aware_sample_excludes_cluster_losers(spark, sf_dir):
    """Every sampled doc must be its cluster's best member (or
    unclustered), and the sample must draw from the mixed
    original∪mutation population — not just the raw documents table."""
    from e_commerce_etl_pipeline_spark.extensions.components import (
        dedup_canonical_best,
    )
    from e_commerce_etl_pipeline_spark.extensions.curation import (
        SAMPLE_QUOTA,
        dedup_aware_sample,
    )

    sample = dedup_aware_sample(spark, sf_dir)
    rows = sample.collect()
    assert rows
    per_lang = {}
    for r in rows:
        per_lang[r.lang] = max(per_lang.get(r.lang, 0), r.sample_rank)
    assert all(v <= SAMPLE_QUOTA for v in per_lang.values())
    from e_commerce_etl_pipeline_spark.extensions.components import (
        dedup_clusters,
    )

    best = {r.best_doc_id for r in dedup_canonical_best(spark, sf_dir).collect()}
    clustered = {r.doc_id for r in dedup_clusters(spark, sf_dir).collect()}
    sampled = {r.doc_id for r in rows}
    # a sampled doc is either unclustered, or its cluster's best member
    assert all(d in best or d not in clustered for d in sampled)
    # the winning member is sometimes the mutation: the population was
    # really the deduped mixed corpus
    assert any(d >= 1_000_000 for d in sampled)
