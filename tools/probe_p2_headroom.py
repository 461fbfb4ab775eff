"""Pass-2 kernel headroom at a 4th-decade boundary-corpus scale
(VERDICT r11 Next #2 / What's-wrong #3).

`boundary_corpus_rows` for a fixed 400-vec batch grows ~3x per corpus
decade (sf10 ~140k -> sf100 ~420k) because affected buckets hold more
boundary GROUPS at bigger corpora — wall cost stayed decade-flat
because the kernel is vectorized and the read pruned, but the trend
extrapolates to ~1.3M rows at the 4th decade and ~11M three decades
out. This probe converts that extrapolation into a measurement by
synthesizing the KERNEL INPUT directly (inflate rows-per-bucket, not
corpus vectors — the store layout makes the read side O(input) by
construction) and timing `chain_edges_arrow` — the stage that consumed
13.5 s of the 22.6 s sf100 batch median — at decade-equivalent scales:

    decade 2 (sf100 today):   1,600 buckets x ~260 rows  ~ 420k rows
    decade 3:                 1,600 buckets x ~780 rows  ~ 1.26M rows
    decade 4:                 1,600 buckets x ~2,340 rows ~ 3.8M rows
    (+ the 11M extrapolation point at x3 again)

Row shape mirrors the real boundary corpus: 4 tables, per-bucket rows
carrying (__sig, __proj) rank keys and unit vectors; a planted
fraction of rank-adjacent near-identical pairs keeps the verified-edge
density comparable to the measured sf100 batch (217k edges / 412k
rows ~ 0.5) so the probe times verification too, not just candidate
formation. Deterministic (hash-derived), no RNG.

Prints ONE JSON line; optional argv[1] writes it to a file.
Usage: python tools/probe_p2_headroom.py [OUT_JSON] [DECADES=2,3,4]
"""

from __future__ import annotations

import json
import os

os.environ.setdefault("SPARK_GRAFT_AQE_INIT_PARTS", "64")
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from e_commerce_etl_pipeline_spark.extensions import similarity as S  # noqa: E402
from e_commerce_etl_pipeline_spark.session import get_spark  # noqa: E402

DIM = 64
N_TABLES = 4
BUCKETS_PER_TABLE = 400          # 1,600 affected (t, bucket) groups
ROWS_SF100 = 260                 # ~420k rows total = today's decade
CLONE_EVERY = 2                  # every 2nd row clones its predecessor
                                 # -> ~0.5 verified-edge density


def _rows_frame(spark, rows_per_bucket: int):
    """Synthetic boundary-corpus rows: deterministic unit-ish vectors;
    every CLONE_EVERY-th row is a near-exact copy of the previous row
    in its bucket's rank order (same __sig, adjacent __proj), so the
    kernel both forms candidates AND verifies real >=0.999 pairs."""
    base = (
        spark.range(N_TABLES * BUCKETS_PER_TABLE * rows_per_bucket)
        .select(F.col("id").alias("rid"))
        .withColumn("t", (F.col("rid") % N_TABLES).cast("int"))
        .withColumn(
            "bucket",
            F.pmod((F.col("rid") / N_TABLES).cast("long"),
                   F.lit(BUCKETS_PER_TABLE)),
        )
        .withColumn(
            "slot",
            (F.col("rid") / (N_TABLES * BUCKETS_PER_TABLE)).cast("long"),
        )
        # the clone pairs share a seed slot; originals get their own
        .withColumn(
            "seed",
            F.when(
                F.col("slot") % CLONE_EVERY == 1, F.col("slot") - 1
            ).otherwise(F.col("slot")),
        )
    )
    comps = [
        (
            F.pmod(
                F.xxhash64(
                    F.col("t") * 1_000_003 + F.col("bucket") * 131
                    + F.col("seed") * 17 + F.lit(i)
                ),
                F.lit(2_000_001),
            ).cast("double") - 1_000_000.0
        ) / 1_000_000.0
        for i in range(DIM)
    ]
    v = F.array(*comps)
    return (
        base.withColumn("v", v)
        .withColumn(
            "norm",
            F.sqrt(F.aggregate(
                F.col("v"), F.lit(0.0), lambda a, x: a + x * x
            )),
        )
        .withColumn("vec_id", F.col("rid"))
        .withColumn("__sig", F.xxhash64(F.col("seed")))
        .withColumn("__proj", F.col("slot").cast("double"))
        .select("vec_id", "v", "norm", "t", "bucket", "__sig", "__proj")
    )


def main() -> None:
    out_file = sys.argv[1] if len(sys.argv) > 1 else None
    decades = [
        int(d) for d in (sys.argv[2] if len(sys.argv) > 2 else "2,3,4").split(",")
    ]
    spark = get_spark("probe-p2-headroom")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    points = []
    for dec in decades:
        rows_per_bucket = ROWS_SF100 * (3 ** (dec - 2))
        df = _rows_frame(spark, rows_per_bucket).localCheckpoint()
        n = df.count()
        t0 = time.time()
        edges = S.chain_edges_arrow(
            df, ["t", "bucket"], S.NEAR_DUP_P2_W, S.NEAR_DUP_COS
        )
        n_edges = edges.count()
        sec = round(time.time() - t0, 3)
        points.append({
            "decade": dec,
            "rows_per_bucket": rows_per_bucket,
            "boundary_rows": n,
            "p2_edges": n_edges,
            "kernel_sec": sec,
        })
        print(f"# decade {dec}: {n} rows -> {n_edges} edges in {sec}s",
              file=sys.stderr, flush=True)

    out = {
        "metric": "p2_kernel_headroom",
        "unit": "sec",
        "n_tables": N_TABLES,
        "buckets_per_table": BUCKETS_PER_TABLE,
        "p2_w": S.NEAR_DUP_P2_W,
        "trigger_budget_sec": 720,
        "sf100_batch_reference": {
            "boundary_corpus_rows": 412_174,
            "p2_edges_stage_sec": 13.5,
            "p2_edges": 208_653,
        },
        "points": points,
    }
    line = json.dumps(out)
    if out_file:
        with open(out_file, "w") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
