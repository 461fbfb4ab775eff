"""Incremental near-dup index maintenance bench (VERDICT r8 #4).

Measures per-batch wall time of incremental_near_dup_update on a real
corpus, CHAINED (batch N's priors are batch N-1's outputs — the
streaming shape), with the per-stage breakdown from
incremental_clusters.LAST_TIMINGS so fixed overhead is profiled, not
guessed. Batches are synthetic: BATCH_VECS stored vectors scaled x1.5
(same direction → same buckets/signatures) re-identified above the
stored max id, disjoint per batch.

Prints ONE JSON line; optional argv[3] writes it to a file.

With a 4th arg ``append``, each batch is APPENDED to a working copy of
the corpus between updates — the streaming shape, where the corpus
fingerprint changes per batch and the persisted keyed corpus
(nd_keyed_corpus) must rebuild, the dominant stream-mode overhead the
fixed-corpus mode amortizes away.

Usage: python tools/bench_incremental.py [SF_DIR] [N_BATCHES] [OUT_JSON]
                                         [append]
"""

from __future__ import annotations

import json
import os

os.environ.setdefault("SPARK_GRAFT_AQE_INIT_PARTS", "256")
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from e_commerce_etl_pipeline_spark.extensions import (  # noqa: E402
    incremental_clusters as IC,
    similarity as S,
)
from e_commerce_etl_pipeline_spark.plans.queries import load_table  # noqa: E402
from e_commerce_etl_pipeline_spark.session import get_spark  # noqa: E402

BATCH_VECS = 400


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out_file = sys.argv[3] if len(sys.argv) > 3 else None
    append_mode = len(sys.argv) > 4 and sys.argv[4] == "append"
    spark = get_spark("bench_incremental")

    if append_mode:
        import tempfile

        work = tempfile.mkdtemp(prefix="inc_append_")
        (
            load_table(spark, sf_dir, "embeddings")
            .write.parquet(f"{work}/embeddings.parquet")
        )
        sf_dir, src_dir = work, sf_dir

    max_id = S.corpus_max_vec_id(spark, sf_dir)
    seeds = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(BATCH_VECS * n_batches)
        .collect()
    )
    prior = S.near_dup_clusters(spark, sf_dir)
    prior_p1 = S.near_dup_p1_clusters(spark, sf_dir)
    n_prior = prior.count()
    bits = S.lsh_bits(S.corpus_count(spark, sf_dir))

    batches = []
    per_batch = []
    for b in range(n_batches):
        rows = [
            (
                int(r["vec_id"]) + (max_id + 1) * (b + 1),
                [float(x) * 1.5 for x in r["embedding"]],
            )
            for r in seeds[b * BATCH_VECS:(b + 1) * BATCH_VECS]
        ]
        batch = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).localCheckpoint()  # batch construction off the clock
        t0 = time.time()
        grown, grown_p1 = IC.incremental_near_dup_update(
            spark, sf_dir, batch, prior=prior, prior_p1=prior_p1,
            bits=bits, check_ids=False, return_p1=True,
        )
        grown = grown.localCheckpoint()
        # p1 was checkpointed inside the update; the final assignment's
        # checkpoint above is the batch's real end state
        n_assigned = grown.count()
        sec = time.time() - t0
        per_batch.append({
            "sec": round(sec, 3),
            "n_assigned": n_assigned,
            "stages": {k: round(v, 3) for k, v in IC.LAST_TIMINGS.items()},
        })
        prior, prior_p1 = grown, grown_p1
        if append_mode:
            # the streaming step 3: the batch joins the stored corpus,
            # invalidating the keyed-corpus cache for the next batch
            t_a = time.time()
            emb_type = (
                spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                .schema["embedding"].dataType
            )
            batch.select(
                F.col("vec_id"),
                F.col("embedding").cast(emb_type).alias("embedding"),
            ).write.mode("append").parquet(f"{sf_dir}/embeddings.parquet")
            per_batch[-1]["append_sec"] = round(time.time() - t_a, 3)
        batches.append(batch)
        print(f"# batch {b}: {sec:.2f}s assigned {n_assigned}",
              file=sys.stderr, flush=True)

    out = {
        "metric": ("near_dup_incremental_append"
                   if append_mode else "near_dup_incremental_chained"),
        "sf_dir": sf_dir,
        "corpus_vecs": S.corpus_count(spark, sf_dir),
        "prior_assignment_rows": n_prior,
        "batch_vecs": BATCH_VECS,
        "n_batches": n_batches,
        "per_batch": per_batch,
        "median_sec": sorted(p["sec"] for p in per_batch)[len(per_batch) // 2],
    }
    from tools.provenance import sf_provenance
    out["provenance"] = sf_provenance(src_dir if append_mode else sf_dir)
    line = json.dumps(out)
    if out_file:
        with open(out_file, "w") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
