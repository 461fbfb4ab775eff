"""Diagnose near-dup pairs the hybrid chain-link cluster path misses
(r8: sf10 hybrid recall measured 0.931 — 14 of 202 exact sample pairs
not co-clustered, BENCH_near_dup_sf10_r8.json).

For the recall gate's exact ground-truth sample pairs NOT recovered by
near_dup_clusters, report per LSH table:

  same_bucket[t]   do the two vectors share table t's sign bucket?
  rank_dist[t]     |rank_a - rank_b| in the bucket's chain ordering
                   (null when different buckets)

This separates the two possible miss mechanisms:
  - rank_dist <= some d > W in a shared bucket  -> raise NEAR_DUP_CHAIN_W
  - different bucket in EVERY table             -> more tables/multiprobe
and quantifies how far each knob must move.

Usage: python tools/diag_near_dup_miss.py SF_DIR [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from e_commerce_etl_pipeline_spark.extensions import similarity as S  # noqa: E402
from e_commerce_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    out_file = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("diag_near_dup_miss")

    corpus = S._near_dup_corpus(spark, sf_dir)
    sample = (
        corpus.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(S.N_ND_SAMPLE)
        .select(
            F.col("vec_id").alias("sid"), F.col("v").alias("sv"),
            F.col("norm").alias("sn"),
        )
    )
    exact = (
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
    clusters = S.near_dup_clusters(spark, sf_dir)
    missed = (
        exact
        .join(
            clusters.select(F.col("vec_id").alias("vec_a"),
                            F.col("canonical_id").alias("ca")),
            "vec_a", "left",
        )
        .join(
            clusters.select(F.col("vec_id").alias("vec_b"),
                            F.col("canonical_id").alias("cb")),
            "vec_b", "left",
        )
        .filter(F.col("ca").isNull() | F.col("cb").isNull()
                | (F.col("ca") != F.col("cb")))
        .select("vec_a", "vec_b")
    ).cache()
    n_missed = missed.count()
    print(f"missed pairs: {n_missed}", file=sys.stderr)

    bits = S.lsh_bits(S.corpus_count(spark, sf_dir))
    base = corpus.select("vec_id", "v", "norm")
    per_pair: dict[tuple[int, int], dict] = {}
    for t in range(S.N_TABLES):
        ranked = base.select(
            "vec_id",
            S.sign_bucket(F.col("v"), t, bits).alias("bucket"),
            S._rot_sig(F.col("v"), t).alias("__sig"),
            S._chain_proj(F.col("v"), F.col("norm"), t).alias("__proj"),
        ).withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("bucket").orderBy("__sig", "__proj",
                                                     "vec_id")
            ),
        ).select("vec_id", "bucket", "rn")
        rows = (
            missed
            .join(ranked.select(F.col("vec_id").alias("vec_a"),
                                F.col("bucket").alias("ba"),
                                F.col("rn").alias("ra")), "vec_a")
            .join(ranked.select(F.col("vec_id").alias("vec_b"),
                                F.col("bucket").alias("bb"),
                                F.col("rn").alias("rb")), "vec_b")
            .select("vec_a", "vec_b", "ba", "bb", "ra", "rb")
            .collect()
        )
        for r in rows:
            d = per_pair.setdefault(
                (r.vec_a, r.vec_b),
                {"vec_a": r.vec_a, "vec_b": r.vec_b,
                 "same_bucket": [], "rank_dist": []},
            )
            same = r.ba == r.bb
            d["same_bucket"].append(same)
            d["rank_dist"].append(abs(r.ra - r.rb) if same else None)

    pairs = sorted(per_pair.values(),
                   key=lambda d: (d["vec_a"], d["vec_b"]))
    n_bucket_miss_all = sum(
        1 for d in pairs if not any(d["same_bucket"]))
    shared_dists = [min(x for x in d["rank_dist"] if x is not None)
                    for d in pairs if any(d["same_bucket"])]

    # ---- pass-2 view (r9): the same analysis over the REP corpus ----
    # Separates the two remaining miss mechanisms after the two-pass
    # build: the endpoints' pass-1 family canonicals are still > W apart
    # in the rep chain order, versus adjacent-but-REP-COSINE-fails (the
    # canonical members of two families can be far apart even when some
    # cross-family member pair is cos>=0.999 — drift chains put the
    # min-id member at a far end).
    p1 = S.near_dup_p1_clusters(spark, sf_dir).select(
        "vec_id", "canonical_id"
    )
    m_end = missed.select("vec_a", "vec_b")
    reps_of = (
        m_end.join(p1.withColumnRenamed("vec_id", "vec_a")
                   .withColumnRenamed("canonical_id", "ca1"), "vec_a", "left")
        .join(p1.withColumnRenamed("vec_id", "vec_b")
              .withColumnRenamed("canonical_id", "cb1"), "vec_b", "left")
        .select(
            "vec_a", "vec_b",
            F.coalesce("ca1", "vec_a").alias("ra_id"),
            F.coalesce("cb1", "vec_b").alias("rb_id"),
        )
    ).cache()
    rep_corpus = S.near_dup_rep_corpus(spark, sf_dir)
    rv = rep_corpus.select(
        F.col("vec_id").alias("rid"), F.col("v").alias("rv"),
        F.col("norm").alias("rn_"),
    )
    rep_cos = (
        reps_of
        .join(rv.withColumnRenamed("rid", "ra_id")
              .withColumnRenamed("rv", "va").withColumnRenamed("rn_", "na"),
              "ra_id")
        .join(rv.withColumnRenamed("rid", "rb_id")
              .withColumnRenamed("rv", "vb").withColumnRenamed("rn_", "nb"),
              "rb_id")
        .select(
            "vec_a", "vec_b", "ra_id", "rb_id",
            (S.dot(F.col("va"), F.col("vb"))
             / (F.col("na") * F.col("nb"))).alias("rep_cos"),
        )
        .collect()
    )
    p2_pair = {
        (r.vec_a, r.vec_b): {
            "rep_a": r.ra_id, "rep_b": r.rb_id,
            "rep_cos": round(r.rep_cos, 6),
            "rep_same_bucket": [], "rep_rank_dist": [],
        }
        for r in rep_cos
    }
    for t in range(S.N_TABLES):
        rranked = rep_corpus.select(
            "vec_id",
            S.sign_bucket(F.col("v"), t, bits).alias("bucket"),
            S._rot_sig(F.col("v"), t).alias("__sig"),
            S._chain_proj(F.col("v"), F.col("norm"), t).alias("__proj"),
        ).withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("bucket").orderBy("__sig", "__proj",
                                                     "vec_id")
            ),
        ).select("vec_id", "bucket", "rn")
        rows = (
            reps_of
            .join(rranked.select(F.col("vec_id").alias("ra_id"),
                                 F.col("bucket").alias("ba"),
                                 F.col("rn").alias("ra")), "ra_id")
            .join(rranked.select(F.col("vec_id").alias("rb_id"),
                                 F.col("bucket").alias("bb"),
                                 F.col("rn").alias("rb")), "rb_id")
            .select("vec_a", "vec_b", "ba", "bb", "ra", "rb")
            .collect()
        )
        for r in rows:
            d = p2_pair.get((r.vec_a, r.vec_b))
            if d is None:
                continue
            same = r.ba == r.bb
            d["rep_same_bucket"].append(same)
            d["rep_rank_dist"].append(abs(r.ra - r.rb) if same else None)
    for d in pairs:
        d.update(p2_pair.get((d["vec_a"], d["vec_b"]), {}))
    n_rep_cos_fail_adjacent = sum(
        1 for d in pairs
        if d.get("rep_cos") is not None and d["rep_cos"] < S.NEAR_DUP_COS
        and any(x is not None and x <= S.NEAR_DUP_CHAIN_W
                for x in d.get("rep_rank_dist", []))
    )
    n_rep_cos_fail = sum(
        1 for d in pairs
        if d.get("rep_cos") is not None and d["rep_cos"] < S.NEAR_DUP_COS
    )
    n_rep_far = sum(
        1 for d in pairs
        if d.get("rep_cos") is not None and d["rep_cos"] >= S.NEAR_DUP_COS
        and not any(x is not None and x <= S.NEAR_DUP_CHAIN_W
                    for x in d.get("rep_rank_dist", []))
    )

    result = {
        "sf_dir": sf_dir,
        "n_missed": n_missed,
        "n_all_tables_bucket_miss": n_bucket_miss_all,
        "n_shared_bucket_but_far": len(shared_dists),
        "min_rank_dist_when_shared": shared_dists,
        "n_rep_cos_fail": n_rep_cos_fail,
        "n_rep_cos_fail_adjacent": n_rep_cos_fail_adjacent,
        "n_rep_far_but_cos_ok": n_rep_far,
        "chain_w": S.NEAR_DUP_CHAIN_W,
        "n_tables": S.N_TABLES,
        "pairs": pairs,
    }
    line = json.dumps(result)
    print(line)
    if out_file:
        with open(out_file, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
