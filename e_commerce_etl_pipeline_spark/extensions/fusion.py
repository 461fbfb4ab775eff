"""Lexical × semantic near-duplicate fusion: LSH candidate pairs from
the documents table scored on BOTH axes — shingle Jaccard (lexical) and
embedding cosine (semantic, via the embeddings table keyed by the same
id).

Modern corpus dedup runs both: MinHash catches verbatim/templated
copies, embedding similarity catches paraphrases; pairs where the two
signals disagree are exactly the ones worth human/model review. This
operator produces that review queue.

Scale shape (100 TB): candidate generation is the banded equi-join from
dedup_fuzzy (never all-pairs); the embedding re-attach is two keyed
joins carrying only (id, vector, norm). Everything downstream of
candidates is linear in the candidate count.

Cross-engine determinism: Jaccard is exact-integer division; cosine
folds the dot product strictly left-to-right with precomputed norms
(same contract as extensions/similarity.py), so doubles match the
oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup_fuzzy import (
    BAND_COLS,
    JACCARD_THRESHOLD,
    _SH,
    WORDS_SQL,
    _band_sql_exprs,
    jaccard,
    real_shingles,
)
from .similarity import _dot_sql, _emb, _norm_sql

SEMANTIC_THRESHOLD = 0.2  # synthetic 64-dim embeddings: cos ~ N(0, 1/8)


def lexical_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-candidate pairs scored with shingle Jaccard AND embedding
    cosine, flagged on each axis. Inner-joins to the embeddings table, so
    only pairs where both documents have a vector appear (the corpus
    contract: doc_id keys both tables)."""
    sh = real_shingles(spark, sf_dir)
    # band keys precomputed in the persisted artifact (r12) — the
    # self-join below references them twice; see real_shingles
    banded = sh.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(c) for c in BAND_COLS]))
        .alias("band_idx", "band_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
    emb = _emb(spark, sf_dir)
    ea = emb.select(F.col("vec_id").alias("doc_a"),
                    F.col("v").alias("va"), F.col("norm").alias("na"))
    eb = emb.select(F.col("vec_id").alias("doc_b"),
                    F.col("v").alias("vb"), F.col("norm").alias("nb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .join(ea, "doc_a").join(eb, "doc_b")
        .withColumn("jaccard", jaccard(F.col("sa"), F.col("sb")))
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .select(
            "doc_a", "doc_b", "jaccard", "cosine",
            (F.col("jaccard") >= JACCARD_THRESHOLD).alias("lexical_dup"),
            (F.col("cosine") >= SEMANTIC_THRESHOLD).alias("semantic_dup"),
        )
    )


LEXICAL_SEMANTIC_SQL = f"""
WITH base AS (
  SELECT doc_id, {WORDS_SQL.format(t='text')} AS w FROM documents
), sh AS (
  SELECT doc_id, {_SH} AS shingles FROM base
), hx AS (
  SELECT doc_id, shingles, list_transform(shingles, s -> md5(s)) AS hexes FROM sh
), banded0 AS (
  SELECT doc_id, {', '.join(_band_sql_exprs('hexes'))} FROM hx
), banded AS (
  SELECT doc_id, 0 AS band_idx, band_0 AS band_key FROM banded0
  UNION ALL
  SELECT doc_id, 1 AS band_idx, band_1 AS band_key FROM banded0
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), scored AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(wa.shingles, wb.shingles)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(wa.shingles, wb.shingles))) AS DOUBLE)
           AS jaccard,
         {_dot_sql('ea', 'eb')} / ({_norm_sql('ea')} * {_norm_sql('eb')}) AS cosine
  FROM cand
  JOIN sh wa ON cand.doc_a = wa.doc_id
  JOIN sh wb ON cand.doc_b = wb.doc_id
  JOIN embeddings ea ON cand.doc_a = ea.vec_id
  JOIN embeddings eb ON cand.doc_b = eb.vec_id
)
SELECT doc_a, doc_b, jaccard, cosine,
       jaccard >= {JACCARD_THRESHOLD} AS lexical_dup,
       cosine >= {SEMANTIC_THRESHOLD} AS semantic_dup
FROM scored
"""


EXT_QUERIES = {
    "lexical_semantic_pairs": (lexical_semantic_pairs, LEXICAL_SEMANTIC_SQL),
}
