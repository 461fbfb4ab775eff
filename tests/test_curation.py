"""Dataset-curation operators: stratified sampling and token-budget
selection — semantics plus the plan shape that makes them scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.curation import (
    SAMPLE_QUOTA,
    TOKEN_BUDGET,
    stratified_lang_sample,
    token_budget_sample,
)


def test_stratified_sample_quota_and_determinism(spark, sf_dir):
    df = stratified_lang_sample(spark, sf_dir)
    per_lang = {r["lang"]: r["n"] for r in
                df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per_lang and all(n <= SAMPLE_QUOTA for n in per_lang.values())
    # deterministic: two invocations select the identical doc set
    a = sorted(r["doc_id"] for r in df.collect())
    b = sorted(r["doc_id"] for r in stratified_lang_sample(spark, sf_dir).collect())
    assert a == b


def test_stratified_sample_uses_window_group_limit(spark, sf_dir):
    # The rank<=k filter must compile to WindowGroupLimit (partial top-k
    # before the shuffle) — the property that keeps a dominant language
    # from funneling its whole corpus through one reducer at 100 TB.
    plan = stratified_lang_sample(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_token_budget_respected_and_greedy(spark, sf_dir):
    rows = token_budget_sample(spark, sf_dir).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, docs in by_lang.items():
        total = sum(r["n_tokens"] for r in docs)
        assert total <= TOKEN_BUDGET, lang
        assert max(r["cum_tokens"] for r in docs) == total
