"""corpus_prep extension: cleaning, vocabulary coverage, hash split."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.corpus_prep import (
    clean_text_col,
    split_col,
    train_val_split,
    unicode_clean_docs,
    vocab_coverage_docs,
)


def test_clean_strips_markup_controls_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "Hello <b>world</b>\x01\x02  spaced\t\nout "),
         (2, "already clean")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["c"]
           for r in df.select("doc_id", clean_text_col(F.col("text")).alias("c")).collect()}
    assert got[1] == "Hello world spaced out"
    assert got[2] == "already clean"


def test_clean_is_idempotent(spark, sf_dir):
    once = unicode_clean_docs(spark, sf_dir).select("doc_id", "clean_text")
    twice = once.select(
        "doc_id", clean_text_col(F.col("clean_text")).alias("again"),
        "clean_text",
    ).filter(F.col("again") != F.col("clean_text"))
    assert twice.count() == 0


def test_vocab_coverage_bounds(spark, sf_dir):
    cov = vocab_coverage_docs(spark, sf_dir)
    bad = cov.filter(
        (F.col("n_in_vocab") > F.col("n_tokens"))
        | (F.col("oov_ratio") < 0) | (F.col("oov_ratio") > 1)
    )
    assert bad.count() == 0
    # top-K vocabulary must cover a nontrivial share of a natural corpus
    avg_oov = cov.agg(F.avg("oov_ratio")).collect()[0][0]
    assert avg_oov < 0.9


def test_split_is_reshard_stable(spark, sf_dir):
    """A document's split must not depend on partitioning or row order —
    the property that keeps holdout membership fixed across corpus
    rebuilds."""
    from e_commerce_etl_pipeline_spark.plans.queries import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = {r["doc_id"]: r["s"]
         for r in docs.select("doc_id", split_col(F.col("doc_id")).alias("s")).collect()}
    b = {r["doc_id"]: r["s"]
         for r in docs.repartition(7).sortWithinPartitions(F.col("doc_id").desc())
         .select("doc_id", split_col(F.col("doc_id")).alias("s")).collect()}
    assert a == b
    assert set(a.values()) == {"train", "val"}


def test_split_summary_accounts_every_doc(spark, sf_dir):
    from e_commerce_etl_pipeline_spark.plans.queries import load_table

    total = load_table(spark, sf_dir, "documents").count()
    rows = train_val_split(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == total


def test_domain_link_stats_counts(spark, sf_dir):
    from e_commerce_etl_pipeline_spark.extensions.corpus_prep import domain_link_stats

    rows = {r["domain"]: (r["n_links"], r["n_docs"])
            for r in domain_link_stats(spark, sf_dir).collect()}
    # every 7th doc links one of 13 deterministic domains; each planted
    # URL is unique per doc, so n_links == n_docs per domain
    assert rows and all(links == docs for links, docs in rows.values())
    assert all(d.startswith("site-") and d.endswith(".example") for d in rows)


def test_curated_corpus_summary_consistency(spark, sf_dir):
    from e_commerce_etl_pipeline_spark.extensions.corpus_prep import (
        curated_corpus_summary,
        train_val_split,
    )

    summary = curated_corpus_summary(spark, sf_dir).collect()
    assert {r["split"] for r in summary} == {"train", "val"}
    # the curated corpus is a subset of the full corpus, split-wise
    full = {r["split"]: r["n_docs"] for r in train_val_split(spark, sf_dir).collect()}
    cur = {}
    for r in summary:
        cur[r["split"]] = cur.get(r["split"], 0) + r["n_docs"]
    assert all(cur[s] <= full[s] for s in cur)
    assert all(r["total_tokens"] > 0 for r in summary)
