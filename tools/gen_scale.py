"""Scale-multiplied testdata generator: sfN -> sf(N*m) by
replicate-with-mutation (no network in this sandbox, so DuckDB's dbgen
is unavailable; this reproduces the SHAPE of a bigger scale factor from
the driver's own distributions).

Method: m copies of every fact table with per-copy key offsets
(offset = copy * (max_key + 1)), applied consistently on both sides of
every FK, so join fan-outs, group cardinalities per key, and value
distributions are exactly those of the source corpus — the same way
TPC-H itself scales (fixed dimension domains, scaled key spaces):

- region/nation: fixed (as in TPC-H — 5/25 rows at every sf).
- customer/supplier/part/orders/lineitem: key-offset copies; attribute
  columns untouched (distribution-preserving).
- events: event_id/user_id offset; ts untouched — total time density
  grows m-fold but PER-USER density (what sessionize/range-join cost
  depends on) is unchanged, like real traffic growth by new users.
- documents: doc_id offset; for copy i>0 every 3rd word is salted with
  a copy token. Every 3-gram shingle contains >=1 salted word, so
  cross-copy Jaccard ~ 0 and the near-dup graph does NOT collapse the
  copies into 10-clones clusters — each copy contributes its own
  (planted) near-dup structure, scaling the dedup workload linearly.
- embeddings: vec_id offset; deterministic per-copy linear perturbation
  of each component (preserves norm order-of-magnitude, de-duplicates
  neighbors across copies).

Usage: python tools/gen_scale.py SRC_DIR DST_DIR MULTIPLIER [HOT_PCT] [TABLES]
e.g.:  python tools/gen_scale.py /root/testdata/sf0.1 .localdata/sf1 10
       python tools/gen_scale.py /root/testdata/sf0.1 .localdata/sf1skew 10 30
       python tools/gen_scale.py .localdata/sf10 .localdata/sf100probe 10 0 \
           documents,lineitem   # subset gen for targeted scale probes

HOT_PCT > 0 plants JOIN-KEY SKEW in events: that percentage of event
rows is rerouted to user_id 0 (one hot user), deterministically by
event_id hash. The uniform generator never exercises the engine's skew
mitigations (salted join/agg, AQE skew-split) — a planted hot key at
scale is how their worth is measured (tools/bench_skew.py).
"""

from __future__ import annotations

import os

# Big-corpus tools: spill-proof shuffle sizing unless the caller chose.
os.environ.setdefault("SPARK_GRAFT_AQE_INIT_PARTS", "256")
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from e_commerce_etl_pipeline_spark.session import get_spark  # noqa: E402


def _copies(spark, m: int):
    return spark.range(m).select(F.col("id").cast("long").alias("__copy"))


def _offset(col: str, key_space: int) -> F.Column:
    return (F.col(col) + F.col("__copy") * F.lit(key_space)).alias(col)


def scale_table(
    df: DataFrame,
    m: int,
    key_spaces: dict[str, int],
    spark,
) -> DataFrame:
    """Cross-join with the copy index and offset every key column by
    copy * key_space. Non-key columns pass through unchanged."""
    out_cols = []
    for c in df.columns:
        if c in key_spaces:
            out_cols.append(_offset(c, key_spaces[c]))
        else:
            out_cols.append(F.col(c))
    return df.crossJoin(F.broadcast(_copies(spark, m))).select(*out_cols, "__copy")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf1"
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    hot_pct = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None

    def wanted(name: str) -> bool:
        return only is None or name in only

    spark = get_spark("gen-scale")
    os.makedirs(dst, exist_ok=True)

    def read(name):
        return spark.read.parquet(f"{src}/{name}.parquet")

    def write(df, name, parts):
        # Output file count scales with the multiplier (r13): the old
        # fixed counts (documents 8, embeddings 4, ...) capped every
        # downstream map stage's parallelism at that many input splits
        # REGARDLESS of core count — the r13 sf10 core-scaling probe
        # measured text-family 8c→32c ratios ≈1.0 purely because of the
        # file layout (8 row groups ≤ 8 tasks), which a real corpus at
        # that scale (thousands of row groups) never exhibits. Cap at
        # 256 to keep tiny tables from exploding into confetti files.
        parts = max(parts, min(256, parts * m // 8))
        df.drop("__copy").repartition(parts).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
        print(f"wrote {name} ({parts} files)", flush=True)

    # key spaces = max_key + 1, read once from the source corpus
    def key_space(name, col):
        return read(name).agg(F.max(col)).collect()[0][0] + 1

    if wanted("orders") or wanted("lineitem"):
        ko = key_space("orders", "o_orderkey")
    if wanted("customer") or wanted("orders"):
        kc = key_space("customer", "c_custkey")
    if wanted("part") or wanted("lineitem"):
        kp = key_space("part", "p_partkey")
    if wanted("supplier") or wanted("lineitem"):
        ks = key_space("supplier", "s_suppkey")
    if wanted("documents"):
        kd = key_space("documents", "doc_id")
    if wanted("embeddings"):
        kv = key_space("embeddings", "vec_id")
    if wanted("events"):
        ke = key_space("events", "event_id")
        ku = key_space("events", "user_id")

    # fixed dimensions: straight copies
    for name in ("region", "nation"):
        if not wanted(name):
            continue
        read(name).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"wrote {name}", flush=True)

    if wanted("customer"):
        write(scale_table(read("customer"), m, {"c_custkey": kc}, spark),
              "customer", 4)
    if wanted("supplier"):
        write(scale_table(read("supplier"), m, {"s_suppkey": ks}, spark),
              "supplier", 1)
    if wanted("part"):
        write(scale_table(read("part"), m, {"p_partkey": kp}, spark), "part", 4)
    if wanted("orders"):
        write(
            scale_table(read("orders"), m,
                        {"o_orderkey": ko, "o_custkey": kc}, spark),
            "orders", 8,
        )
    if wanted("lineitem"):
        write(
            scale_table(
                read("lineitem"), m,
                {"l_orderkey": ko, "l_partkey": kp, "l_suppkey": ks}, spark,
            ),
            "lineitem", 16,
        )
    if wanted("events"):
        events = scale_table(read("events"), m,
                             {"event_id": ke, "user_id": ku}, spark)
        if hot_pct > 0:
            # md5-derived routing (not pmod(event_id): offsets make raw ids
            # non-uniform mod 100) — deterministic, so re-runs are identical
            events = events.withColumn(
                "user_id",
                F.when(
                    F.pmod(F.abs(F.hash(F.col("event_id"))), F.lit(100)) < hot_pct,
                    F.lit(0).cast("long"),
                ).otherwise(F.col("user_id")),
            )
        write(events, "events", 8)

    if wanted("documents"):
        # documents: salt every 3rd word for copies > 0 so no 3-gram shingle
        # survives across copies (see module docstring)
        docs = scale_table(read("documents"), m, {"doc_id": kd}, spark)
        salted_words = F.transform(
            F.split(F.col("text"), " "),
            lambda w, i: F.when(
                (F.col("__copy") > 0) & (i % 3 == 0),
                F.concat(w, F.lit("x"), F.col("__copy").cast("string")),
            ).otherwise(w),
        )
        docs = docs.withColumn("text", F.array_join(salted_words, " ")).withColumn(
            "n_chars", F.length("text").cast("long")
        )
        write(docs, "documents", 8)

    if wanted("embeddings"):
        # embeddings: deterministic per-copy, per-position perturbation
        emb = scale_table(read("embeddings"), m, {"vec_id": kv}, spark)
        perturbed = F.transform(
            F.col("embedding"),
            lambda x, i: (
                x * (F.lit(1.0) + F.col("__copy") * F.lit(0.003))
                + (
                    F.col("__copy").cast("double")
                    * ((F.pmod(F.col("vec_id") + i, F.lit(13)) - F.lit(6.0)))
                    * F.lit(0.002)
                )
            ).cast("float"),
        )
        write(emb.withColumn("embedding", perturbed), "embeddings", 4)

    counts = {}
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        if not wanted(name):
            continue
        n = spark.read.parquet(f"{dst}/{name}.parquet").count()
        counts[name] = n
        print(f"{name}: {n}", flush=True)

    # Provenance sidecar (VERDICT r8 #6): every scale corpus records HOW
    # it was generated — in particular whether it was chained (×10 of a
    # ×10, heavier clone mass per the r8 near-dup recall split) or
    # direct (×100 of the base) — so BENCH/PROBE artifacts that copy it
    # (tools/provenance.py) are self-describing. The generator is
    # deterministic (no seed); chain depth is the nesting of
    # src_provenance.
    import json

    src_prov = None
    try:
        with open(f"{src.rstrip('/')}/_provenance.json") as fh:
            src_prov = json.load(fh)
    except OSError:
        pass
    with open(f"{dst.rstrip('/')}/_provenance.json", "w") as fh:
        json.dump({
            "generator": "tools/gen_scale.py",
            "src": src, "dst": dst, "multiplier": m, "hot_pct": hot_pct,
            "tables": sorted(only) if only else "all",
            "row_counts": counts,
            "src_provenance": src_prov,
        }, fh, indent=1)
    print("wrote _provenance.json", flush=True)


if __name__ == "__main__":
    main()
