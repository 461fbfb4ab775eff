"""Similarity search over the embeddings table (array<float>, 64-dim).

Two paths, per the large-corpus playbook:
- brute-force cosine top-k (the exactness baseline): query-set × corpus
  join, fold-based dot product, window top-k. O(Q×N) — fine for a bounded
  query set; the corpus side never collects.
- sign-LSH bucketed top-k (the scale path): 4-bit bucket from the signs
  of the first 4 dimensions; candidates only join within their bucket —
  at 100 TB the bucket count grows (more sign bits / IVF centroids) and
  the join stays shuffle-bounded per bucket.

Float determinism: elements are cast float->double (exact widening) and
folded strictly left-to-right (F.aggregate over the array; the SQL oracle
is a generated 64-term left-associated sum) — identical IEEE arithmetic
in both engines, so ranks match exactly. Output exposes ids + rank, with
cosine rounded via double ops only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.queries import load_table

DIM = 64
N_QUERIES = 50  # vec_id < 50 are the query vectors
TOP_K = 10


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Order-stable dot product (strictly left-to-right addition, matching
    the SQL oracle's left-associated sum). The ``aggregate`` fold is the
    fast path (measured faster than an expanded element_at chain, whose
    ANSI bounds checks + codegen size dominate); ``dim`` selects the
    expanded form for experimentation — both produce identical doubles."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    out = F.element_at(a, 1) * F.element_at(b, 1)
    for i in range(2, dim + 1):
        out = out + F.element_at(a, i) * F.element_at(b, i)
    return out


def l2_norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Per-pair cosine. Hot paths precompute norms once per vector
    (see the *_topk queries) instead of calling this per pair."""
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def with_norm(df, vcol: str = "v"):
    """Attach the vector's L2 norm once — the norm is recomputed per PAIR
    otherwise, which dominates similarity-join cost."""
    return df.withColumn("norm", l2_norm(F.col(vcol)))


def brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_norm(load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    pairs = queries.join(emb, F.col("vec_id") != F.col("qid"))
    scored = pairs.select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "rank", "neighbor_id")
    )


def _dot_sql(a: str, b: str) -> str:
    terms = [
        f"CAST({a}.embedding[{i}] AS DOUBLE) * CAST({b}.embedding[{i}] AS DOUBLE)"
        for i in range(1, DIM + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def _norm_sql(a: str) -> str:
    terms = [
        f"CAST({a}.embedding[{i}] AS DOUBLE) * CAST({a}.embedding[{i}] AS DOUBLE)"
        for i in range(1, DIM + 1)
    ]
    return "sqrt(" + " + ".join(terms) + ")"


BRUTE_FORCE_TOPK_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
         {_dot_sql('q', 'c')} / ({_norm_sql('q')} * {_norm_sql('c')}) AS cos
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), ranked AS (
  SELECT qid, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT qid, rank, neighbor_id FROM ranked WHERE rank <= {TOP_K}
"""


N_TABLES = 4  # L hash tables; table t buckets on signs of dims 4t+1..4t+4


def sign_bucket(v: Column, table: int = 0) -> Column:
    """4-bit LSH bucket from the signs of dims 4·table+1..4·table+4
    (random-hyperplane LSH with axis-aligned planes — deterministic and
    oracle-able; each table reads a disjoint dimension group)."""
    base = 4 * table
    bits = [
        F.when(F.element_at(v, base + i) >= 0, F.lit(1)).otherwise(F.lit(0))
        * (1 << (i - 1))
        for i in range(1, 5)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table sign-LSH: N_TABLES independent 4-bit tables;
    a candidate pair needs to collide in ANY table (union → distinct),
    then exact cosine ranks the top-3. One table alone misses most true
    neighbors (P(collide) = 2^-4 per table for unrelated dims); the union
    over L tables drives recall up at L× candidate cost — the standard
    (k, L) LSH tradeoff, measured by ann_recall_eval.

    Scale shape mirrors the minhash path: the candidate self-join carries
    only (table, bucket, id) — vectors re-attach by id afterwards — so
    the shuffle is narrow, and pairs only form inside buckets, never
    O(n²)."""
    emb = with_norm(load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
    ))
    banded = emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[sign_bucket(F.col("v"), t) for t in range(N_TABLES)])
        ).alias("tbl", "bucket"),
    )
    qb = banded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "tbl", "bucket"
    )
    cand = (
        qb.join(banded, ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("neighbor_id"))
        .dropDuplicates(["qid", "neighbor_id"])
    )
    qv = emb.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
                    F.col("norm").alias("qnorm"))
    nv = emb.select(F.col("vec_id").alias("neighbor_id"), "v", "norm")
    scored = cand.join(qv, "qid").join(nv, "neighbor_id").select(
        "qid", "neighbor_id",
        (dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("qid", "rank", "neighbor_id")
    )


def _bucket_sql(table: int) -> str:
    base = 4 * table
    return (
        "(" + " + ".join(
            f"CASE WHEN embedding[{base + i}] >= 0 THEN {1 << (i - 1)} ELSE 0 END"
            for i in range(1, 5)
        ) + ")"
    )


_BANDED_SQL = "\n  UNION ALL\n".join(
    f"  SELECT vec_id, {t} AS tbl, {_bucket_sql(t)} AS bucket FROM embeddings"
    for t in range(N_TABLES)
)

LSH_BUCKETED_TOPK_SQL = f"""
WITH b AS (
{_BANDED_SQL}
), cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS neighbor_id
  FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), scored AS (
  SELECT cand.qid, cand.neighbor_id,
         {_dot_sql('qe', 'ce')} / ({_norm_sql('qe')} * {_norm_sql('ce')}) AS cos
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.qid
  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
), ranked AS (
  SELECT qid, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT qid, rank, neighbor_id FROM ranked WHERE rank <= 3
"""


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label count + exact per-dimension mean over dims 1-4 (decimal-
    exact: elements scaled to micro-units as longs before summing)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = []
    for i in range(1, 5):
        x = F.element_at("embedding", i).cast("double")
        # scale to exact integers (1e-7 resolution) to make SUM associative
        dims.append(F.sum(F.floor(x * 10_000_000).cast("long")).alias(f"sum_d{i}_scaled"))
    return emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"), *dims)


EMBEDDING_CENTROIDS_SQL = """
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(CAST(floor(CAST(embedding[1] AS DOUBLE) * 10000000) AS BIGINT)) AS BIGINT) AS sum_d1_scaled,
       CAST(SUM(CAST(floor(CAST(embedding[2] AS DOUBLE) * 10000000) AS BIGINT)) AS BIGINT) AS sum_d2_scaled,
       CAST(SUM(CAST(floor(CAST(embedding[3] AS DOUBLE) * 10000000) AS BIGINT)) AS BIGINT) AS sum_d3_scaled,
       CAST(SUM(CAST(floor(CAST(embedding[4] AS DOUBLE) * 10000000) AS BIGINT)) AS BIGINT) AS sum_d4_scaled
FROM embeddings GROUP BY label
"""


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection: the corpus is
    embeddings ∪ slightly-perturbed copies (every element +1e-4, vec_id +
    1_000_000 — deterministic), candidate pairs restricted to the sign-LSH
    bucket (the scale path — perturbed twins share the bucket unless an
    element sits within 1e-4 of zero, which the threshold filter absorbs),
    verified by cosine >= 0.999."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    perturbed = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(F.col("v"), lambda x: x + F.lit(1e-4)).alias("v"),
    )
    corpus = with_norm(
        emb.unionByName(perturbed)
    ).withColumn("bucket", sign_bucket(F.col("v")))
    a = corpus.alias("a")
    b = corpus.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        (dot(F.col("a.v"), F.col("b.v"))
         / (F.col("a.norm") * F.col("b.norm"))).alias("cos"),
    )
    return pairs.filter(F.col("cos") >= 0.999).select("vec_a", "vec_b")


EMBEDDING_NEAR_DUP_SQL = f"""
WITH corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.0001) FROM embeddings
), b AS (
  SELECT vec_id, v,
         (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END
          + CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END
          + CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END
          + CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM corpus
), dotted AS (
  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
         {" + ".join(f"a.v[{i}] * b2.v[{i}]" for i in range(1, DIM + 1))} AS dot,
         sqrt({" + ".join(f"a.v[{i}] * a.v[{i}]" for i in range(1, DIM + 1))}) AS na,
         sqrt({" + ".join(f"b2.v[{i}] * b2.v[{i}]" for i in range(1, DIM + 1))}) AS nb
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
)
SELECT vec_a, vec_b FROM dotted WHERE dot / (na * nb) >= 0.999
"""


N_CELLS = 8  # IVF cells; centroids = vectors with vec_id 0..7 (deterministic)


N_PROBE = 2  # query-side multi-probe: search the 2 nearest cells


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantization to the nearest of 8 fixed
    centroids (deterministically the first 8 vectors — a production build
    would train k-means on a sample; fixed centroids keep the oracle
    exact), then top-3 cosine within the query's N_PROBE nearest cells.

    Multi-probe is THE recall lever of IVF (a vector near a cell border
    loses its true neighbors to the adjacent cell; probing 2 cells
    recovers them — measured by ann_recall_eval). Corpus vectors stay
    single-cell; only the tiny query set fans out ×N_PROBE.

    Scale shape: the assignment is a broadcast nested-loop over 8
    centroids (a map stage); the search join shuffles on cell id only —
    per-cell candidate sets, never O(n²)."""
    emb = with_norm(load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ))
    cents = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    # nearest centroid by cosine; total order (csim desc, cell) for ties
    wa = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cell"))
    ranked = (
        emb.join(F.broadcast(cents))
        .select(
            "vec_id", "v", "cell", "norm",
            (dot(F.col("v"), F.col("cv"))
             / (F.col("norm") * F.col("cnorm"))).alias("csim"),
        )
        .withColumn("__rn", F.row_number().over(wa))
    )
    assigned = ranked.filter(F.col("__rn") == 1).select("vec_id", "v", "cell", "norm")
    q = ranked.filter(
        (F.col("__rn") <= N_PROBE) & (F.col("vec_id") < N_QUERIES)
    ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "cell",
        F.col("norm").alias("qnorm"),
    )
    cand = q.join(assigned, "cell").filter(F.col("vec_id") != F.col("qid"))
    scored = cand.select(
        "qid", "cell", F.col("vec_id").alias("neighbor_id"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("qid", "cell", "rank", "neighbor_id")
    )


def _list_dot_sql(a: str, b: str) -> str:
    return "(" + " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(1, DIM + 1)) + ")"


def _list_norm_sql(a: str) -> str:
    return "sqrt(" + " + ".join(f"{a}[{i}] * {a}[{i}]" for i in range(1, DIM + 1)) + ")"


IVF_TOPK_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), cents AS (
  SELECT vec_id AS cell, v AS cv FROM v WHERE vec_id < {N_CELLS}
), assigned0 AS (
  SELECT vec_id, v, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
           {_list_dot_sql('v', 'cv')} / ({_list_norm_sql('v')} * {_list_norm_sql('cv')}) DESC, cell) AS rn
  FROM v CROSS JOIN cents
), assigned AS (
  SELECT vec_id, v, cell FROM assigned0 WHERE rn = 1
), q AS (
  SELECT vec_id AS qid, v AS qv, cell FROM assigned0
  WHERE rn <= {N_PROBE} AND vec_id < {N_QUERIES}
), scored AS (
  SELECT q.qid, q.cell, a.vec_id AS neighbor_id,
         {_list_dot_sql('q.qv', 'a.v')} / ({_list_norm_sql('q.qv')} * {_list_norm_sql('a.v')}) AS cos
  FROM q JOIN assigned a ON q.cell = a.cell AND a.vec_id <> q.qid
), ranked AS (
  SELECT qid, cell, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT qid, cell, rank, neighbor_id FROM ranked WHERE rank <= 3
"""


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of each approximate ANN path (sign-LSH buckets, IVF
    cells) against the brute-force exact top-3 — the quality side of the
    quality/cost tradeoff, measured inside the engine. At corpus scale
    this same query runs over a sampled query set and becomes the
    recall-regression gate for retuning bucket bits / cell counts."""
    exact3 = (
        brute_force_topk(spark, sf_dir)
        .filter(F.col("rank") <= 3)
        .select("qid", "neighbor_id")
        .withColumn("__hit", F.lit(1))
    )
    lsh = lsh_bucketed_topk(spark, sf_dir).select(
        F.lit("lsh").alias("method"), "qid", "neighbor_id"
    )
    ivf = ivf_topk(spark, sf_dir).select(
        F.lit("ivf").alias("method"), "qid", "neighbor_id"
    )
    approx = lsh.unionByName(ivf)
    denom = float(N_QUERIES * 3)
    return (
        approx.join(exact3, ["qid", "neighbor_id"], "left")
        .groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n_returned"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("hits"),
        )
        .withColumn("recall_at_3", F.col("hits").cast("double") / F.lit(denom))
    )


ANN_RECALL_SQL = f"""
WITH bf AS ({BRUTE_FORCE_TOPK_SQL}),
exact3 AS (SELECT qid, neighbor_id FROM bf WHERE rank <= 3),
lshq AS ({LSH_BUCKETED_TOPK_SQL}),
ivfq AS ({IVF_TOPK_SQL}),
approx AS (
  SELECT 'lsh' AS method, qid, neighbor_id FROM lshq
  UNION ALL
  SELECT 'ivf' AS method, qid, neighbor_id FROM ivfq
)
SELECT method, COUNT(*) AS n_returned,
       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM exact3 e
                             WHERE e.qid = a.qid AND e.neighbor_id = a.neighbor_id)
           THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM exact3 e
                             WHERE e.qid = a.qid AND e.neighbor_id = a.neighbor_id)
           THEN 1 ELSE 0 END) AS DOUBLE) / {float(N_QUERIES * 3)} AS recall_at_3
FROM approx a
GROUP BY method
"""


EXT_QUERIES = {
    "brute_force_topk": (brute_force_topk, BRUTE_FORCE_TOPK_SQL),
    "ivf_topk": (ivf_topk, IVF_TOPK_SQL),
    "lsh_bucketed_topk": (lsh_bucketed_topk, LSH_BUCKETED_TOPK_SQL),
    "embedding_label_centroids": (embedding_label_centroids, EMBEDDING_CENTROIDS_SQL),
    "embedding_near_dup_pairs": (embedding_near_dup_pairs, EMBEDDING_NEAR_DUP_SQL),
    "ann_recall_eval": (ann_recall_eval, ANN_RECALL_SQL),
}
