"""Incremental MinHash signature store.

At 100 TB the shingle + minhash map stage dominates near-dup detection,
and most of the corpus is unchanged between pipeline runs. This module
maintains a persistent signature table (the LSH banding state) with the
guarded keyed upsert writer (operators/upsert.py — the reference's MERGE
semantics, SURVEY §2.2 K4-K6), recomputing signatures ONLY for documents
that are new or whose text changed since the stored fingerprint.

This is the concrete form of the scale note in docs/SCALE.md: "at 100 TB
[the signature pass is] a checkpointed signatures table, computed
incrementally for new documents only". The skip set is decided by a
(doc_id, text_md5) anti-join — a narrow join against a two-column
projection of the store, never against the text itself.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import fsops
from ..operators.upsert import read_upsert_table, upsert
from .dedup_fuzzy import band_keys_from_hexes, shingle_hexes, shingle_set


def signature_batch(docs: DataFrame) -> DataFrame:
    """doc_id, text_md5, band_0..band_{B-1} for every input doc (the
    expensive map stage — narrow, no shuffle)."""
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    return (
        docs.select("doc_id", "text", fp.alias("text_md5"))
        .select("doc_id", "text_md5", shingle_set(F.col("text")).alias("__s"))
        .select("doc_id", "text_md5", shingle_hexes(F.col("__s")).alias("__h"))
        .select("doc_id", "text_md5", *band_keys_from_hexes(F.col("__h")))
    )


def update_signature_store(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    batch_seq: int,
) -> DataFrame:
    """Bring the signature store up to date with ``docs`` (doc_id, text).

    Only new/changed documents go through the shingle+minhash stage; the
    result is MERGE-upserted on doc_id with ``text_md5`` as the change
    guard, so replaying a batch is a no-op (SURVEY §2.8 ST3). Returns the
    recomputed rows (empty when the store is already current).
    """
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    incoming = docs.select("doc_id", "text", fp.alias("text_md5"))
    if fsops.exists(store_path, spark):
        seen = read_upsert_table(spark, store_path).select("doc_id", "text_md5")
        todo = incoming.join(seen, ["doc_id", "text_md5"], "left_anti")
    else:
        todo = incoming
    sigs = signature_batch(todo.select("doc_id", "text")).withColumn(
        "sig_seq", F.lit(batch_seq).cast("long")
    )
    # Materialize once, cutting lineage: the plan reads the store's
    # current files via the anti-join, and the upsert below rewrites
    # them — a lazy result would re-execute against deleted files. (In a
    # production deployment this would be a reliable checkpoint dir.)
    sigs = sigs.localCheckpoint(eager=True)
    if sigs.limit(1).count() == 0:
        return sigs
    upsert(
        spark,
        sigs,
        store_path,
        keys=["doc_id"],
        order_col="sig_seq",
        guard_cols=["text_md5"],
    )
    return sigs
