"""Dataset-curation operators: stratified sampling and token-budget
selection — semantics plus the plan shape that makes them scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.curation import (
    SAMPLE_QUOTA,
    TOKEN_BUDGET,
    leakage_safe_splits,
    near_dup_safe_splits,
    stratified_lang_sample,
    token_budget_sample,
)


def test_near_dup_safe_splits_clusters_co_travel(spark, sf_dir):
    """Any two documents the near-dup CLUSTER path links must land in
    the same split — the leakage property the operator exists for —
    and singletons (absent from the cluster artifact) key on their own
    id."""
    from e_commerce_etl_pipeline_spark.extensions.similarity import (
        TWIN_OFFSET,
        near_dup_clusters,
    )

    splits = near_dup_safe_splits(spark, sf_dir)
    clusters = (
        near_dup_clusters(spark, sf_dir)
        .filter(F.col("vec_id") < TWIN_OFFSET)
        .select("vec_id", F.col("canonical_id").alias("cluster_root"))
    )
    assert (
        splits.join(clusters, splits["doc_id"] == clusters["vec_id"])
        .groupBy("cluster_root")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )
    rows = splits.collect()
    docs = {r["doc_id"] for r in rows}
    clustered = {r["vec_id"] for r in clusters.collect()}
    for r in rows:
        if r["doc_id"] not in clustered:
            assert r["canonical_id"] == r["doc_id"]
    assert docs == {r["doc_id"] for r in rows}  # one row per doc
    assert sum(1 for r in rows if r["split"] == "train") / len(rows) > 0.7


def test_near_dup_safe_splits_exact_dups_co_travel_without_embeddings(
    spark, tmp_path
):
    """The near-dup tier must be a strict SUPERSET of the exact tier
    (ADVICE r8): byte-identical documents co-travel even when one copy
    has NO embedding row (so the cluster artifact can't see it) — the
    split keys on the exact-dup canonical first, then the cluster
    canonical of THAT canonical."""
    from e_commerce_etl_pipeline_spark.extensions.similarity import DIM

    d = str(tmp_path / "corpus")
    same = "the very same document text, repeated byte for byte"
    spark.createDataFrame(
        [
            (0, same, "en"),
            (1, "unrelated text one", "en"),
            (2, "unrelated text two", "en"),
            (3, same, "en"),          # byte-identical to doc 0
        ],
        "doc_id long, text string, lang string",
    ).write.parquet(d + "/documents.parquet")
    # embeddings for docs 0..2 ONLY — doc 3 is invisible to the
    # near-dup cluster chain (the advisor's exact failure scenario)
    spark.createDataFrame(
        [
            (i, [1.0 if j == i else 0.0 for j in range(DIM)])
            for i in range(3)
        ],
        "vec_id long, embedding array<float>",
    ).write.parquet(d + "/embeddings.parquet")

    rows = {r["doc_id"]: r for r in near_dup_safe_splits(spark, d).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0]["canonical_id"] == rows[3]["canonical_id"]
    assert rows[0]["split"] == rows[3]["split"]


def test_training_shards_contiguous_balanced_deterministic(spark, sf_dir):
    from e_commerce_etl_pipeline_spark.extensions.curation import (
        N_SHARDS,
        training_shards,
    )

    rows = training_shards(spark, sf_dir).collect()
    n = len(rows)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(N_SHARDS))
    # positions are 1..len contiguous inside each shard
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # md5 bucketing balances shards (loose: nobody holds > 2x fair share)
    assert max(len(p) for p in by_shard.values()) <= 2 * (n // N_SHARDS) + 1
    # byte-identical on re-run
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in
             training_shards(spark, sf_dir).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_temperature_mixture_flattens_the_head(spark, sf_dir):
    from e_commerce_etl_pipeline_spark.extensions.curation import (
        temperature_mixture_weights,
    )

    rows = temperature_mixture_weights(spark, sf_dir).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-9
    # alpha=0.5 flattens: smaller sources get LARGER oversample factors,
    # and ordering by tokens is exactly inverse to ordering by oversample
    by_tokens = sorted(rows, key=lambda r: r["n_tokens"])
    ov = [r["oversample"] for r in by_tokens]
    assert all(a >= b - 1e-12 for a, b in zip(ov, ov[1:]))
    # tempered weights sit between uniform and proportional
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        p = r["n_tokens"] / total
        lo, hi = sorted((p, 1 / len(rows)))
        assert lo - 1e-9 <= r["weight"] <= hi + 1e-9


def test_split_contamination_audits_the_boundary(spark, tmp_path):
    """A corpus where one eval-side doc textually contains a train-side
    4-gram and the others are disjoint: the report counts exactly the
    overlapping doc. Doc texts are chosen so split assignment is known
    (md5 buckets of the canonicals are fixed by doc_id)."""
    from e_commerce_etl_pipeline_spark.extensions.curation import (
        leakage_safe_splits,
        split_contamination_report,
    )

    # distinct texts: canonical = own doc_id; find ids per split first
    probe = [(i, f"probe {i}", "en") for i in range(64)]
    d0 = str(tmp_path / "probe")
    spark.createDataFrame(
        probe, "doc_id long, text string, lang string"
    ).write.parquet(d0 + "/documents.parquet")
    by_split: dict[str, list[int]] = {}
    for r in leakage_safe_splits(spark, d0).collect():
        by_split.setdefault(r["split"], []).append(r["doc_id"])
    assert by_split.get("train") and (by_split.get("val") or by_split.get("test"))
    train_id = by_split["train"][0]
    eval_split, eval_ids = next(
        (s, ids) for s, ids in by_split.items() if s != "train" and ids
    )
    leak_id, clean_id = eval_ids[0], (eval_ids + by_split["train"][1:])[1]

    shared = "alpha beta gamma delta"
    rows = [
        (train_id, f"{shared} one two three four", "en"),
        (leak_id, f"zero {shared} nine eight seven", "en"),  # shares 4-gram
        (clean_id, "totally different words here entirely now", "en"),
    ]
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(d + "/documents.parquet")
    got = {r["split"]: r for r in split_contamination_report(spark, d).collect()}
    assert got[eval_split]["n_overlap_docs"] == 1
    assert 0 < got[eval_split]["overlap_frac"] <= 1
    for r in got.values():  # never more overlaps than docs
        assert 0 <= r["n_overlap_docs"] <= r["n_docs"]


def test_leakage_safe_splits_duplicates_co_travel(spark, tmp_path):
    # doc 0/2/5 share text; 1/4 share text; 3 unique — whatever split
    # each family lands in, it lands there WHOLE.
    texts = ["alpha beta", "solo one", "alpha beta", "other text",
             "solo one", "alpha beta", None, ""]
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    ).write.parquet(d + "/documents.parquet")
    rows = leakage_safe_splits(spark, d).collect()
    assert len(rows) == len(texts)  # null text must not vanish
    by_doc = {r["doc_id"]: (r["canonical_id"], r["split"]) for r in rows}
    assert by_doc[0] == by_doc[2] == by_doc[5]
    assert by_doc[1] == by_doc[4]
    assert by_doc[6] == by_doc[7]  # NULL groups with ""
    assert by_doc[0][0] == 0 and by_doc[1][0] == 1 and by_doc[3][0] == 3
    assert by_doc[6][0] == 6


def test_leakage_safe_splits_fractions_and_determinism(spark, sf_dir):
    rows = leakage_safe_splits(spark, sf_dir).collect()
    n = len(rows)
    frac = {
        s: sum(1 for r in rows if r["split"] == s) / n
        for s in ("train", "val", "test")
    }
    # canonical-bucket split targets 89.8/5.1/5.1; doc-level fractions
    # wobble with duplicate-family mass, so bound loosely
    assert frac["train"] > 0.8
    assert frac["val"] > 0 and frac["test"] > 0
    again = {
        (r["doc_id"], r["canonical_id"], r["split"])
        for r in leakage_safe_splits(spark, sf_dir).collect()
    }
    assert again == {(r["doc_id"], r["canonical_id"], r["split"]) for r in rows}
    # exact duplicates co-travel on the driver corpus too
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    joined = (
        leakage_safe_splits(spark, sf_dir)
        .join(docs.select("doc_id", F.md5("text").alias("h")), "doc_id")
    )
    assert (
        joined.groupBy("h")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
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
