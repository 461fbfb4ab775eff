"""sf100 near-dup decade probe (VERDICT r8 #7): cluster COLD build +
hybrid recall at 2M base vectors, nothing else — the full
bench_near_dup family (fence counts, fenced pairs, semantic cells)
would triple the wall time without adding to the decade's question
(does the two-pass chain build and its recall hold one decade up?).

Requires SPARK_GRAFT_TWIN_OFFSET > 2M set BEFORE launch (the default
1M id space cannot hold 2M base vectors' twins).

Usage: SPARK_GRAFT_TWIN_OFFSET=10000000 \
       python tools/probe_near_dup_sf100.py SF_DIR [OUT_JSON]
"""

from __future__ import annotations

import json
import os

os.environ.setdefault("SPARK_GRAFT_AQE_INIT_PARTS", "256")
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e_commerce_etl_pipeline_spark.extensions import components  # noqa: E402
from e_commerce_etl_pipeline_spark.extensions.similarity import (  # noqa: E402
    NEAR_DUP_CHAIN_W,
    NEAR_DUP_P2_W,
    TWIN_OFFSET,
    _emb_table,
    corpus_count,
    near_dup_clusters,
    near_dup_recall_eval,
)
from e_commerce_etl_pipeline_spark.operators import index_store  # noqa: E402
from e_commerce_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    out_file = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("probe_near_dup_sf100")
    n = corpus_count(spark, sf_dir)
    assert 2 * n < TWIN_OFFSET, "widen SPARK_GRAFT_TWIN_OFFSET"

    index_store.invalidate(_emb_table(sf_dir), spark)
    t0 = time.time()
    clusters = near_dup_clusters(spark, sf_dir)
    n_members = clusters.count()
    cold_s = time.time() - t0
    cc_stats = dict(components.LAST_RUN_STATS)
    n_clusters = clusters.select("canonical_id").distinct().count()

    t0 = time.time()
    recall = {
        r["method"]: {
            "n_exact": r["n_exact"], "n_recovered": r["n_recovered"],
            "recall": r["recall"],
        }
        for r in near_dup_recall_eval(
            spark, sf_dir, methods=("hybrid_clusters",)
        ).collect()
    }
    recall_s = time.time() - t0

    out = {
        "metric": "near_dup_sf100_probe",
        "sf_dir": sf_dir,
        "corpus_vecs": n,
        "twin_offset": TWIN_OFFSET,
        "params": {"chain_w": NEAR_DUP_CHAIN_W, "p2_w": NEAR_DUP_P2_W},
        "hybrid_clusters": {
            "n_members": n_members, "n_clusters": n_clusters,
            "cold_build_seconds": round(cold_s, 3),
            "cc_iterations": cc_stats.get("iterations"),
            "cc_converged": cc_stats.get("converged"),
        },
        "recall": recall,
        "recall_eval_seconds": round(recall_s, 3),
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
