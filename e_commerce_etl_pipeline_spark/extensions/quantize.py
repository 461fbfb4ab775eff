"""Int8 embedding quantization + quantized similarity search.

The 100 TB rationale: a 64-dim float32 embedding column is 256 bytes/row;
symmetric per-vector int8 quantization cuts that to 64 bytes + one float
scale — 4× less scan bandwidth and shuffle payload for every similarity
pass, which at corpus scale is the difference between an ANN sweep that
fits in cluster memory and one that spills. The dot product becomes an
exact INTEGER sum (no float-association concerns at all), with one
trailing double division for the cosine.

Determinism contract (both engines produce bit-identical results):
- scale s = max(|x_i|) per vector; q_i = floor(x_i / s · 127 + 0.5)
  — floor is exact in IEEE arithmetic, unlike round(), whose half-way
  rule differs across engines;
- quantized dot/norms are BIGINT sums — associativity is a non-issue;
- the only doubles are the final cosine division and sqrt, computed from
  identical integers.

``quantized_recall_eval`` closes the loop: recall@3 of the int8 path
against the float brute-force exact top-3, measured in-engine like
``ann_recall_eval`` does for LSH/IVF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.queries import load_table
from .similarity import DIM, N_QUERIES, TOP_K, _as_double, brute_force_topk

QBITS_MAX = 127  # symmetric int8 range


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q: array<int>, qn: bigint) — per-vector symmetric int8
    quantization with the squared quantized norm. Staged selects so each
    array level is computed once per row."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    s = v.select(
        "vec_id", "v",
        F.array_max(F.transform(F.col("v"), F.abs)).alias("s"),
    )
    q = s.select(
        "vec_id",
        F.when(
            F.col("s") > 0,
            F.transform(
                F.col("v"),
                lambda x: F.floor(x / F.col("s") * F.lit(127.0) + F.lit(0.5)).cast("int"),
            ),
        ).otherwise(
            F.transform(F.col("v"), lambda x: F.lit(0).cast("int"))
        ).alias("q"),
    )
    return q.select(
        "vec_id", "q",
        F.aggregate(
            F.transform(F.col("q"), lambda x: x.cast("long") * x.cast("long")),
            F.lit(0).cast("long"), lambda a, b: a + b,
        ).alias("qn"),
    )


def quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k in int8 space: same O(Q×N) shape as
    ``brute_force_topk`` but every pair costs an integer dot product over
    4× less data — the quantization payoff measured on the same query
    set. Ranking key is the quantized cosine (exact-integer dot over
    sqrt of exact-integer norm product).

    r12: scored in ONE Arrow pass with per-task top-k (see
    similarity._topk_scored_arrow) instead of a BroadcastNestedLoopJoin
    feeding a full-width ranking window. The integer dot runs as an
    int64 matmul — BIGINT sums are order-independent, so unlike the
    float kernels no accumulation-order care is needed — and the one
    trailing division mirrors the JVM's ``dot.cast(double) /
    sqrt((qqn·qn).cast(double))`` exactly (products ≤ ~1.1e12 < 2^53
    are exact doubles). Identical ranking, identical output."""
    import numpy as np

    from ..operators import index_store
    from .similarity import _emb_table, _topk_scored_arrow

    qv = _quantized(spark, sf_dir)

    # bounded (≤ N_QUERIES) query set, memoized per table fingerprint
    # like similarity._query_vectors (r13): repeat invocations re-ran
    # the identical quantize+collect job otherwise
    def _collect_q():
        rows = qv.filter(F.col("vec_id") < N_QUERIES).select(
            "vec_id", "q", "qn"
        ).collect()
        if not rows:
            return None
        return (
            np.array([r[0] for r in rows], dtype=np.int64),
            np.array([list(r[1]) for r in rows], dtype=np.int64),
            np.array([r[2] for r in rows], dtype=np.int64),
        )

    q = index_store.cached_value(
        spark, _emb_table(sf_dir), "quantized_query_vectors", _collect_q
    )
    if q is None:
        return spark.createDataFrame(
            [], "qid long, rank long, neighbor_id long"
        )
    qids, qmat, qqn = q

    def score_batch(pdf):
        vmat = np.stack(pdf["q"].to_numpy()).astype(np.int64)
        qn = pdf["qn"].to_numpy(dtype=np.int64)
        dots = qmat @ vmat.T  # exact int64
        return dots.astype(np.float64) / np.sqrt(
            (qqn[:, None] * qn[None, :]).astype(np.float64)
        )

    scored = _topk_scored_arrow(
        qv.select("vec_id", "q", "qn"), qids, score_batch, TOP_K,
        score_col="qcos",
    )
    w = Window.partitionBy("qid").orderBy(F.col("qcos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "rank", "neighbor_id")
    )


_QUANT_CTE = f"""v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), s AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS s FROM v
), qz AS (
  SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(floor(x / s * 127.0 + 0.5) AS INT))
              ELSE list_transform(v, x -> CAST(0 AS INT)) END AS q
  FROM s
), qn AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT) AS qn
  FROM qz
)"""

_QDOT_SQL = (
    "CAST(list_sum(list_transform(range(" + str(DIM) + "), "
    "i -> CAST(a.q[i + 1] AS BIGINT) * CAST(b.q[i + 1] AS BIGINT))) AS BIGINT)"
)

QUANTIZED_TOPK_SQL = f"""
WITH {_QUANT_CTE}, scored AS (
  SELECT a.vec_id AS qid, b.vec_id AS neighbor_id,
         CAST({_QDOT_SQL} AS DOUBLE) / sqrt(CAST(a.qn * b.qn AS DOUBLE)) AS qcos
  FROM qn a JOIN qn b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < {N_QUERIES}
), ranked AS (
  SELECT qid, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY qcos DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
)
SELECT qid, rank, neighbor_id FROM ranked WHERE rank <= {TOP_K}
"""


def quantized_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the int8 path against the float exact top-3 — the
    accuracy cost of the 4× bandwidth cut, measured in-engine."""
    exact3 = (
        brute_force_topk(spark, sf_dir)
        .filter(F.col("rank") <= 3)
        .select("qid", "neighbor_id")
        .withColumn("__hit", F.lit(1))
    )
    approx = (
        quantized_topk(spark, sf_dir)
        .filter(F.col("rank") <= 3)
        .select(F.lit("int8").alias("method"), "qid", "neighbor_id")
    )
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


from .similarity import BRUTE_FORCE_TOPK_SQL  # noqa: E402

QUANTIZED_RECALL_SQL = f"""
WITH bf AS ({BRUTE_FORCE_TOPK_SQL}),
exact3 AS (SELECT qid, neighbor_id FROM bf WHERE rank <= 3),
qt AS ({QUANTIZED_TOPK_SQL}),
approx AS (SELECT 'int8' AS method, qid, neighbor_id FROM qt WHERE rank <= 3)
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
    "quantized_topk": (quantized_topk, QUANTIZED_TOPK_SQL),
    "quantized_recall_eval": (quantized_recall_eval, QUANTIZED_RECALL_SQL),
}
