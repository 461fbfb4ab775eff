"""Exact-equivalence guards for the r12 Arrow scoring kernels.

The O(Q×N) scoring family (brute-force/quantized top-k, within-bucket
pair verification, the recall gates' ground-truth sweep) moved from
JVM inequality-joins + interpreted per-pair folds to vectorized Arrow
kernels with per-task top-k (similarity._topk_scored_arrow /
_bucket_pairs_arrow / _threshold_pairs_arrow). The DuckDB oracles pin
the outputs; these tests additionally pin the kernels against the
FORMER JVM formulations rebuilt inline, so a future kernel edit that
drifts from the fold's IEEE accumulation order (or from the
(score desc, id asc) tie order) fails here with a named culprit rather
than as an opaque oracle hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions import quantize as Q
from e_commerce_etl_pipeline_spark.extensions import similarity as S


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_brute_force_topk_matches_join_formulation(spark, sf_dir):
    emb = S._emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    pairs = queries.join(emb, F.col("vec_id") != F.col("qid"))
    scored = pairs.select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        (S.dot(F.col("qv"), F.col("v"))
         / (F.col("qnorm") * F.col("norm"))).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    legacy = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= S.TOP_K)
        .select("qid", "rank", "neighbor_id")
    )
    assert _rows(S.brute_force_topk(spark, sf_dir)) == _rows(legacy)


def test_quantized_topk_matches_join_formulation(spark, sf_dir):
    qv = Q._quantized(spark, sf_dir)
    queries = qv.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq"),
        F.col("qn").alias("qqn"),
    )

    def qdot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        )

    pairs = queries.join(qv, F.col("vec_id") != F.col("qid"))
    scored = pairs.select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        (qdot(F.col("qq"), F.col("q")).cast("double")
         / F.sqrt((F.col("qqn") * F.col("qn")).cast("double"))).alias("qcos"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id")
    )
    legacy = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= S.TOP_K)
        .select("qid", "rank", "neighbor_id")
    )
    assert _rows(Q.quantized_topk(spark, sf_dir)) == _rows(legacy)


def test_bucket_pairs_kernel_matches_self_join(spark, sf_dir):
    corpus = S._fence_buckets(S._near_dup_corpus(spark, sf_dir))
    a, b = corpus.alias("a"), corpus.alias("b")
    legacy = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (S.dot(F.col("a.v"), F.col("b.v"))
             / (F.col("a.norm") * F.col("b.norm"))).alias("cos"),
        )
        .filter(F.col("cos") >= S.NEAR_DUP_COS)
        .select("vec_a", "vec_b")
    )
    assert _rows(S.embedding_near_dup_pairs(spark, sf_dir)) == _rows(legacy)


def test_threshold_sweep_matches_join_formulation(spark, sf_dir):
    corpus = S._near_dup_corpus(spark, sf_dir)
    ranked = corpus.orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    ).limit(S.N_ND_SAMPLE)
    sample = ranked.select(
        F.col("vec_id").alias("sid"), F.col("v").alias("sv"),
        F.col("norm").alias("sn"),
    )
    legacy = (
        sample.join(corpus, F.col("vec_id") != F.col("sid"))
        .filter(
            S.dot(F.col("sv"), F.col("v")) / (F.col("sn") * F.col("norm"))
            >= S.NEAR_DUP_COS
        )
        .select(
            F.least("sid", "vec_id").alias("vec_a"),
            F.greatest("sid", "vec_id").alias("vec_b"),
        )
        .distinct()
    )
    q = S._collect_queries(ranked)
    assert q is not None
    kernel = S._threshold_pairs_arrow(
        corpus, q[0], q[1], q[2], S.NEAR_DUP_COS
    ).distinct()
    assert _rows(kernel) == _rows(legacy)


def test_topk_kernel_exact_across_tiny_batches(spark, sf_dir):
    """Partition top-k must stay exact when Arrow batches are tiny (the
    carry/merge path runs many times per task)."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        emb = S._emb(spark, sf_dir)
        q = S._collect_queries(emb.filter(F.col("vec_id") < S.N_QUERIES))
        assert q is not None
        small = S.brute_force_topk(spark, sf_dir)
        rows = small.collect()
        assert len(rows) > 0
        per_q = {}
        for r in rows:
            per_q.setdefault(r.qid, []).append(r.rank)
        for qid, ranks in per_q.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1)), qid
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_topk_kernel_small_batches_match_default(spark, sf_dir):
    base = _rows(S.brute_force_topk(spark, sf_dir))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        assert _rows(S.brute_force_topk(spark, sf_dir)) == base
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
