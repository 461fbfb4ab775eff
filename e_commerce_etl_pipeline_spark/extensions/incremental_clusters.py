"""Incremental near-duplicate cluster maintenance.

At production scale the near-dup cluster index (similarity.
near_dup_clusters — the chain-link LSH path) cannot be rebuilt per
ingest batch: a full rebuild re-derives buckets, chain projections and
cosine-verified edges for EVERY stored vector (wide reads of the
embedding column across the whole corpus), where a batch only needs
vector-level work proportional to the buckets it touches. This module
grows the stored assignment instead:

  1. The batch (plus its planted perturbed twins, mirroring the corpus
     construction) is bucketed per LSH table with the BASE corpus's
     bit-width — incremental updates hold the hash granularity fixed;
     re-tier (full rebuild) when the corpus grows past the next
     ``lsh_bits`` step.
  2. Per table, only AFFECTED buckets (those receiving a new member)
     are re-ranked: existing members of those buckets union the batch,
     the same (rotated sign signature, normalized projection, vec_id)
     chain window orders them, and W-successor candidates are kept only
     where at least one side is NEW.
  3. Candidates are cosine-verified (>= similarity.NEAR_DUP_COS) and
     unioned with the prior assignment (each (vec_id, canonical_id) row
     is an edge), and one min-label connected-components pass produces
     the grown assignment.

Correctness shape (provable, and asserted by tests/test_incremental_
clusters.py against a from-scratch rebuild):

- For two EXISTING vectors, inserting members into a bucket can only
  push their chain ranks further apart — so any old-old edge a full
  rebuild of the grown corpus would emit already existed in the base
  build, and edges involving a new vector are re-derived here in the
  identical full-bucket order. Every co-clustered pair of the full
  rebuild is therefore co-clustered incrementally (superset).
- The converse is not exact: the base assignment may carry an edge the
  grown bucket order would no longer enumerate, so incremental
  clustering is merge-monotone (old clusters merge, never split).
  Every edge that ever entered the graph was cosine-verified, so the
  over-merge is bounded to genuine near-duplicate chains — the same
  transitivity semantics the full build has, evaluated on a growing
  edge set.

Scale shape: per-batch cost = (batch + affected-bucket members) window
+ W-successor join per table, plus an O(n) NARROW scan of the prior
(vec_id, canonical_id) assignment for the components pass — no wide
vector reads outside affected buckets, no full-corpus cosine work.

Reference behavior parity: the reference maintains its warehouse
incrementally (15-minute change windows) rather than re-extracting the
world per cycle (src/pipelines/incremental loaders); this operator is
that discipline applied to the cluster index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..plans.queries import load_table
from . import similarity as S
from .components import connected_components


def batch_near_dup_corpus(new_vecs: DataFrame) -> DataFrame:
    """The corpus transform applied to an ingest batch: each new base
    vector plus its perturbed twin (same construction as
    similarity._near_dup_corpus), normalized. ``new_vecs``:
    (vec_id, embedding array). Caller contract: vec_id < TWIN_OFFSET
    and disjoint from the stored corpus (checked in
    incremental_near_dup_update)."""
    emb = new_vecs.select(
        "vec_id", S._as_double(F.col("embedding")).alias("v")
    )
    twins = emb.select(
        (F.col("vec_id") + S.TWIN_OFFSET).alias("vec_id"),
        F.transform(F.col("v"), lambda x: x + F.lit(1e-4)).alias("v"),
    )
    return S.with_norm(emb.unionByName(twins))


def _new_member_edges(
    base_corpus: DataFrame, batch_corpus: DataFrame, bits: int
) -> DataFrame:
    """Cosine-verified chain edges involving >=1 batch vector, derived
    per LSH table over ONLY the buckets the batch touches, in the same
    full-bucket chain order a rebuild would use."""
    all_edges = None
    for t in range(S.N_TABLES):
        def tabled(df, is_new):
            return df.select(
                "vec_id", "v", "norm",
                S.sign_bucket(F.col("v"), t, bits).alias("bucket"),
                S._rot_sig(F.col("v"), t).alias("__sig"),
                S._chain_proj(F.col("v"), F.col("norm"), t).alias("__proj"),
                F.lit(is_new).alias("__new"),
            )

        nt = tabled(batch_corpus, True)
        # affected buckets: a batch is small relative to the corpus, so
        # the bucket list broadcasts and the base-side filter is a
        # broadcast semi-join (no shuffle of the base corpus).
        touched = nt.select("bucket").distinct()
        bt = tabled(base_corpus, False).join(
            F.broadcast(touched), "bucket", "left_semi"
        )
        members = bt.unionByName(nt)
        w = Window.partitionBy("bucket").orderBy("__sig", "__proj", "vec_id")
        r = members.withColumn("__rn", F.row_number().over(w))
        left = (
            r.select(
                "bucket", F.col("vec_id").alias("va"),
                F.col("v").alias("av"), F.col("norm").alias("an"),
                F.col("__new").alias("na"), F.col("__rn").alias("ra"),
            )
            .withColumn(
                "__k",
                F.explode(F.sequence(F.lit(1), F.lit(S.NEAR_DUP_CHAIN_W))),
            )
            .withColumn("rb", F.col("ra") + F.col("__k"))
        )
        right = r.select(
            "bucket", F.col("vec_id").alias("vb"), F.col("v").alias("bv"),
            F.col("norm").alias("bn"), F.col("__new").alias("nb"),
            F.col("__rn").alias("rb"),
        )
        edges_t = (
            left.join(right, ["bucket", "rb"])
            .filter(F.col("na") | F.col("nb"))
            .filter(
                S.dot(F.col("av"), F.col("bv"))
                / (F.col("an") * F.col("bn")) >= S.NEAR_DUP_COS
            )
            .select(F.col("va").alias("src"), F.col("vb").alias("dst"))
        )
        all_edges = (
            edges_t if all_edges is None
            else all_edges.unionByName(edges_t)
        )
    return all_edges


def incremental_near_dup_update(
    spark: SparkSession, sf_dir: str, new_vecs: DataFrame,
    check_ids: bool = True,
) -> DataFrame:
    """Grow the stored near-dup cluster assignment with an ingest batch
    WITHOUT rebuilding it. Returns the updated (vec_id, canonical_id)
    covering old and new vectors (see module docstring for semantics and
    the superset guarantee vs a full rebuild).

    ``new_vecs``: (vec_id, embedding) of vectors NOT in the stored
    corpus; their perturbed twins are synthesized here exactly as the
    corpus build does. ``check_ids`` runs the id-space guards (max id
    under TWIN_OFFSET, disjointness from the stored corpus — an
    aggregate and an anti-join count; disable only when the caller's id
    allocator already guarantees both).

    Production wiring: append the batch to the embeddings table, then
    write this result through ``operators.index_store.stored_df`` for
    the grown table — its content fingerprint differs from the base
    corpus's, so the store's keying stays correct with no extra
    invalidation step."""
    if check_ids:
        mx = new_vecs.agg(F.max("vec_id")).first()[0]
        if mx is not None and mx >= S.TWIN_OFFSET:
            raise ValueError(
                f"batch vec_id {mx} >= TWIN_OFFSET {S.TWIN_OFFSET}: "
                "base and twin ids would collide"
            )
        base_ids = load_table(spark, sf_dir, "embeddings").select("vec_id")
        clash = new_vecs.join(base_ids, "vec_id", "left_semi").limit(1).count()
        if clash:
            raise ValueError(
                "batch vec_ids overlap the stored corpus; incremental "
                "update requires disjoint ids"
            )

    base_corpus = S._near_dup_corpus(spark, sf_dir)
    # hash granularity pinned to the BASE corpus: incremental batches
    # must not re-tier bits mid-stream (rebuild when crossing a step)
    bits = S.lsh_bits(S.corpus_count(spark, sf_dir))
    batch_corpus = batch_near_dup_corpus(new_vecs)

    new_edges = _new_member_edges(
        base_corpus.select("vec_id", "v", "norm"), batch_corpus, bits
    )
    prior = S.near_dup_clusters(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("canonical_id").alias("dst")
    )
    # isolated new vectors (no edge at all) must still appear in the
    # assignment: self-edges register them as singleton components
    selves = batch_corpus.select(
        F.col("vec_id").alias("src"), F.col("vec_id").alias("dst")
    )
    merged = connected_components(
        new_edges.unionByName(prior).unionByName(selves), max_iter=64
    )
    return merged.select(
        F.col("node").alias("vec_id"), F.col("component").alias("canonical_id")
    )
