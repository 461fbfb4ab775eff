"""SemDeDup-on-trained-cells: verdict validity (every flagged dup has a
real >=NEAR_DUP_COS neighbor at the claimed dup_of) and twin capture
(the planted base/twin pairs are overwhelmingly flagged — the method's
recall on the one ground truth the corpus construction guarantees)."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.semantic_dedup import (
    semantic_dedup_cells,
)
from e_commerce_etl_pipeline_spark.extensions.similarity import (
    NEAR_DUP_COS,
    TWIN_OFFSET,
    _near_dup_corpus,
    dot,
)


def test_flagged_dups_are_real_and_canonical_kept(spark, sf_dir):
    verdict = semantic_dedup_cells(spark, sf_dir)
    corpus = _near_dup_corpus(spark, sf_dir).select("vec_id", "v", "norm")

    flagged = verdict.filter(F.col("is_semantic_dup"))
    # dup_of must point at a LOWER id (keep-first rule) and never at a
    # vector that is itself beyond the corpus.
    assert flagged.filter(F.col("dup_of") >= F.col("vec_id")).count() == 0
    # every claimed (dup_of, vec_id) pair verifies at >= NEAR_DUP_COS on
    # the actual vectors — no false flag can survive this recompute.
    a = corpus.select(
        F.col("vec_id").alias("dup_of"), F.col("v").alias("av"),
        F.col("norm").alias("an"),
    )
    b = corpus.select(
        F.col("vec_id").alias("vec_id"), F.col("v").alias("bv"),
        F.col("norm").alias("bn"),
    )
    checked = (
        flagged.join(a, "dup_of").join(b, "vec_id")
        .withColumn(
            "cos", dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))
        )
    )
    n_flagged = flagged.count()
    assert checked.count() == n_flagged
    assert checked.filter(F.col("cos") < NEAR_DUP_COS).count() == 0
    # unflagged rows carry no dup_of
    assert (
        verdict.filter(~F.col("is_semantic_dup"))
        .filter(F.col("dup_of").isNotNull()).count() == 0
    )


def test_twin_pairs_are_captured(spark, sf_dir):
    """Each base vector i has a planted twin i+TWIN_OFFSET at cosine
    ~0.9999998 >> NEAR_DUP_COS. The twin is missed only when the coarse
    quantizer splits the pair across cells AND no transitive chain
    neighbor links them — measure the capture rate and pin a floor."""
    verdict = semantic_dedup_cells(spark, sf_dir)
    n_base = (
        verdict.filter(F.col("vec_id") < TWIN_OFFSET).count()
    )
    # the twin is flagged with dup_of = its base (or an even lower-id
    # member of the same clone family)
    twins_flagged = (
        verdict.filter(F.col("vec_id") >= TWIN_OFFSET)
        .filter(F.col("is_semantic_dup"))
        .count()
    )
    capture = twins_flagged / float(n_base)
    assert capture >= 0.95, f"twin capture {capture:.3f} below floor"


def test_verdict_covers_whole_corpus_once(spark, sf_dir):
    verdict = semantic_dedup_cells(spark, sf_dir)
    n = verdict.count()
    assert n == verdict.select("vec_id").distinct().count()
    assert n == _near_dup_corpus(spark, sf_dir).count()
