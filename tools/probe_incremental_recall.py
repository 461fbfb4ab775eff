"""Recall of the near-dup index grown INCREMENTALLY (VERDICT r9 #4).

The r9 recall ladder (docs/SCALE.md) scored cold full builds; the
production stream grows the index per micro-batch instead. This probe
feeds the adversarial clone-heavy corpus through the real streaming
path and scores the STREAMED assignment against the same exact
brute-force sample the ladder used:

1. seed a work dir with (held_pct)% of the corpus held OUT (seed and
   grown corpus must share the lsh_bits tier — asserted);
2. run near_dup_index_stream over the held-out vectors as
   maxFilesPerTrigger=1 micro-batches (the nd_store O(batch) path,
   corpus appends included);
3. exact ground truth: brute-force cos >= NEAR_DUP_COS pairs for the
   hash-ranked N_ND_SAMPLE sample of the GROWN corpus (identical
   construction to near_dup_recall_eval);
4. score the streamed assignment, AND the cold full build of the same
   grown corpus, on those pairs; assert the merge-monotone superset
   (no full-build cluster splits across the streamed assignment).

Prints ONE JSON line; optional argv[2] writes it to a file.

Usage: python tools/probe_incremental_recall.py [SF_DIR] [OUT_JSON]
                                                [HELD_PCT] [BATCH_VECS]
"""

from __future__ import annotations

import glob
import json
import os
import shutil

os.environ.setdefault("SPARK_GRAFT_AQE_INIT_PARTS", "256")
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from e_commerce_etl_pipeline_spark.extensions import similarity as S  # noqa: E402
from e_commerce_etl_pipeline_spark.plans.queries import load_table  # noqa: E402
from e_commerce_etl_pipeline_spark.session import get_spark  # noqa: E402
from e_commerce_etl_pipeline_spark.streaming.incremental import (  # noqa: E402
    near_dup_index_stream,
    read_assignment,
)


def _recall_of(spark, assign_df, exact) -> tuple[int, int]:
    rec = (
        exact.join(
            assign_df.select(
                F.col("vec_id").alias("vec_a"),
                F.col("canonical_id").alias("comp_a"),
            ),
            "vec_a",
        )
        .join(
            assign_df.select(
                F.col("vec_id").alias("vec_b"),
                F.col("canonical_id").alias("comp_b"),
            ),
            "vec_b",
        )
        .filter(F.col("comp_a") == F.col("comp_b"))
        .count()
    )
    return rec, exact.count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10heavy"
    out_file = sys.argv[2] if len(sys.argv) > 2 else None
    held_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    batch_vecs = int(sys.argv[4]) if len(sys.argv) > 4 else 400
    spark = get_spark("probe_incremental_recall")

    root = tempfile.mkdtemp(prefix="inc_recall_")
    work, src = f"{root}/work", f"{root}/src"
    os.makedirs(src)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    held_cond = F.pmod(F.col("vec_id"), F.lit(100)) < held_pct
    emb.filter(~held_cond).write.parquet(f"{work}/embeddings.parquet")
    held = emb.filter(held_cond).localCheckpoint()
    n_seed = S.corpus_count(spark, work)
    n_held = held.count()
    assert S.lsh_bits(n_seed) == S.lsh_bits(n_seed + n_held), (
        "seed/grown corpus straddle an lsh_bits step — lower held_pct"
    )
    # held-out vectors as one parquet file per micro-batch, in a
    # deterministic order (hash-bucketed ids per batch)
    n_batches = (n_held + batch_vecs - 1) // batch_vecs
    ranked = held.withColumn(
        "__b",
        F.floor(
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
            / batch_vecs
        ),
    )
    for b in range(n_batches):
        stage = f"{root}/stage{b}"
        (
            ranked.filter(F.col("__b") == b).drop("__b")
            .coalesce(1).write.parquet(stage)
        )
        shutil.move(
            glob.glob(f"{stage}/part-*.parquet")[0],
            f"{src}/batch_{b:04d}.parquet",
        )

    t0 = time.time()
    q = near_dup_index_stream(
        spark,
        spark.readStream.schema(held.drop("__b").schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
        work,
        checkpoint_dir=f"{root}/ckpt",
    )
    q.awaitTermination()
    stream_sec = round(time.time() - t0, 3)
    streamed = read_assignment(spark, work).localCheckpoint()

    # exact sample on the grown corpus (identical rows to sf_dir's)
    corpus = S._near_dup_corpus(spark, work)
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
        .localCheckpoint()
    )
    n_rec_stream, n_exact = _recall_of(spark, streamed, exact)

    # the cold full build of the same grown corpus (the ladder's number)
    t0 = time.time()
    full = S.near_dup_clusters(spark, work)
    full_build_sec = round(time.time() - t0, 3)
    n_rec_full, _ = _recall_of(spark, full, exact)

    # merge-monotone superset: no full-build cluster splits across the
    # streamed assignment (distributed — clone-heavy pair sets are too
    # big to enumerate)
    splits = (
        full.select("vec_id", F.col("canonical_id").alias("full_cid"))
        .join(
            streamed.withColumnRenamed("canonical_id", "stream_cid"),
            "vec_id",
        )
        .groupBy("full_cid")
        .agg(F.count_distinct("stream_cid").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )

    out = {
        "metric": "near_dup_incremental_recall",
        "sf_dir": sf_dir,
        "corpus_vecs": n_seed + n_held,
        "seed_vecs": n_seed,
        "streamed_vecs": n_held,
        "n_batches": n_batches,
        "batch_vecs": batch_vecs,
        "stream_sec": stream_sec,
        "full_build_sec": full_build_sec,
        "n_exact": n_exact,
        "recall_streamed": round(n_rec_stream / n_exact, 4) if n_exact else None,
        "recall_full_build": round(n_rec_full / n_exact, 4) if n_exact else None,
        "full_cluster_splits_in_stream": splits,
    }
    from tools.provenance import sf_provenance
    out["provenance"] = sf_provenance(sf_dir)
    line = json.dumps(out)
    if out_file:
        with open(out_file, "w") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
