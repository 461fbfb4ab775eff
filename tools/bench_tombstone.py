"""Tombstone deletion cost at corpus scale (r12 follow-on to VERDICT
r11 #6): the contract says delete-time work is batch-scale and the
re-clustering lands on the compaction clock — this measures both at
sf10 (200k stored vectors) and compares three ways of reaching the
same post-deletion state:

    apply_sec       — apply_tombstones (two narrow fold scans + seq
                      write; the per-delete-batch cost)
    compact_sec     — the RE-CLUSTERING compaction (two-pass over the
                      remaining keyed rows + generation write + warm)
    plain_compact   — a fold-only compaction on an identical store
                      with no tombstones (the baseline maintenance
                      event the re-cluster replaces)
    rebuild_sec     — full cold build on the filtered corpus (what a
                      pipeline without a deletion path would pay:
                      keyed-corpus construction + both passes)

Equality of the re-clustered store vs the cold rebuild is asserted,
not assumed. Prints ONE JSON line; optional argv[1] writes to a file.

Usage: python tools/bench_tombstone.py [OUT_JSON] [SF_DIR] [N_DELETE]
                                       [--no-rebuild]

``--no-rebuild`` skips the cold-rebuild reference and its equality
assertion (used at sf100, where the rebuild alone is ~15 min; the
equality property is pinned at sf0.01/sf10 and by the pytest suite —
the decade probe only needs the COST numbers). A fold row-count
check still runs.
"""

from __future__ import annotations

import json
import os

os.environ.setdefault("SPARK_GRAFT_AQE_INIT_PARTS", "64")
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from e_commerce_etl_pipeline_spark.extensions import similarity as S  # noqa: E402
from e_commerce_etl_pipeline_spark.extensions.nd_store import (  # noqa: E402
    NearDupStore,
)
from e_commerce_etl_pipeline_spark.plans.queries import load_table  # noqa: E402
from e_commerce_etl_pipeline_spark.session import get_spark  # noqa: E402


def _copy_corpus(src_dir: str, dst_dir: str) -> None:
    src = f"{src_dir.rstrip('/')}/embeddings.parquet"
    dst = f"{dst_dir}/embeddings.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy2(src, dst)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--no-rebuild"]
    do_rebuild = "--no-rebuild" not in sys.argv
    out_file = args[0] if len(args) > 0 else None
    sf_dir = args[1] if len(args) > 1 else ".localdata/sf10"
    n_delete = int(args[2]) if len(args) > 2 else 1000
    spark = get_spark("bench-tombstone")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    work = tempfile.mkdtemp(prefix="tomb_bench_")
    work2 = tempfile.mkdtemp(prefix="tomb_bench_plain_")
    work3 = tempfile.mkdtemp(prefix="tomb_bench_rebuild_")
    try:
        _copy_corpus(sf_dir, work)
        bits = S.lsh_bits(S.corpus_count(spark, work))
        store = NearDupStore(spark, work, bits)
        t0 = time.time()
        store.seed()
        seed_sec = round(time.time() - t0, 3)
        store.warm()

        # deterministic takedown set: every k-th stored vector
        n_corpus = S.corpus_count(spark, work)
        step = max(1, n_corpus // n_delete)
        ids = [
            r["vec_id"]
            for r in load_table(spark, work, "embeddings")
            .filter(F.pmod(F.col("vec_id"), F.lit(step)) == 0)
            .select("vec_id").limit(n_delete).collect()
        ]

        t0 = time.time()
        res = store.apply_tombstones(ids)
        apply_sec = round(time.time() - t0, 3)
        assert not res.get("skipped"), res

        t0 = time.time()
        store.compact()  # re-clustering path (live tombstones)
        compact_sec = round(time.time() - t0, 3)

        # baseline: fold-only compaction on an identical tomb-free store
        _copy_corpus(sf_dir, work2)
        plain = NearDupStore(spark, work2, bits)
        plain.seed()
        plain.warm()
        t0 = time.time()
        plain.compact()
        plain_compact_sec = round(time.time() - t0, 3)

        got = store.final_fold()
        n_got = got.count()
        rebuild_sec = None
        equal = None
        if do_rebuild:
            # full cold rebuild on the filtered corpus
            # (no-deletion-path cost) + the equality assertion
            os.makedirs(f"{work3}", exist_ok=True)
            emb = load_table(spark, work, "embeddings")
            kept = emb.filter(~F.col("vec_id").isin(ids))
            kept.write.parquet(f"{work3}/embeddings.parquet")
            t0 = time.time()
            rebuilt = S.near_dup_clusters(spark, work3)
            rebuilt.count()
            rebuild_sec = round(time.time() - t0, 3)
            diff = (
                got.exceptAll(rebuilt).count()
                + rebuilt.exceptAll(got).count()
            )
            assert diff == 0, f"store != rebuild ({diff} differing rows)"
            equal = True

        out = {
            "metric": "tombstone_cost",
            "unit": "sec",
            "sf_dir": sf_dir,
            "corpus_vecs": n_corpus,
            "n_deleted_ids": len(ids),
            "seed_sec": seed_sec,
            "apply_sec": apply_sec,
            "compact_recluster_sec": compact_sec,
            "plain_compact_sec": plain_compact_sec,
            "rebuild_filtered_sec": rebuild_sec,
            "assignment_rows": n_got,
            "equal_to_rebuild": equal,
        }
        from tools.provenance import sf_provenance
        out["provenance"] = sf_provenance(sf_dir)
        line = json.dumps(out)
        if out_file:
            with open(out_file, "w") as fh:
                fh.write(line + "\n")
        print(line)
    finally:
        for w in (work, work2, work3):
            shutil.rmtree(w, ignore_errors=True)


if __name__ == "__main__":
    main()
