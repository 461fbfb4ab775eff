"""Long-horizon randomized churn property test for the appendable
near-dup store (VERDICT r10 #3).

The composed-remap never-collide argument (nd_store module docstring)
and the seq-dir fold were proven at unit scale (3 chained batches, one
compaction). This test drives ONE HUNDRED randomized batches through
``apply_batch_to_store`` — random family growth (exact clones), real
family MERGES (midpoints of planted drift pairs whose endpoints sit
just below NEAR_DUP_COS, so the bridge only appears when the midpoint
arrives), fresh singletons, occasional forced distributed-fallback
routes, and compaction interleaved on the stream's cadence — while an
independent frame-path chain (``incremental_near_dup_update`` with
threaded priors) computes the same assignments. Exact equality of both
assignments (final and pass-1) is asserted every 10th step and at the
end after a final compaction.

Determinism: one seeded ``random.Random``; everything derives from it.
Corpus appends happen AFTER each apply, exactly like the stream
(near_dup_index_stream applies the store delta, then appends), so both
paths see identical member sets per step.
"""

from __future__ import annotations

import pytest

import math
import os
import random

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions import similarity as S
from e_commerce_etl_pipeline_spark.extensions.incremental_clusters import (
    apply_batch_to_store,
    incremental_near_dup_update,
)
from e_commerce_etl_pipeline_spark.extensions.nd_store import NearDupStore

# r13 tier split (VERDICT r12 #1): 100-batch churn is the round-close
# full tier (also exercised standalone by tools/run_churn_full.py ->
# CHURN_r{N}.json).
pytestmark = pytest.mark.full_suite

DIM = 64  # the corpus convention: sign-LSH tables index up to dim 64
N_BASE_RANDOM = 30
N_DRIFT_PAIRS = 15          # pairs at cos ~0.9985 (< NEAR_DUP_COS)
# routine-suite default is 20 batches (~8 min: still >=2 merges, >=2
# compactions, and both forced-fallback routes); the FULL 100-batch
# run is the ROUND-CLOSE configuration (VERDICT r11 #4: the 100
# default made the suite a 40-min long pole nobody runs) —
# SPARK_GRAFT_CHURN_BATCHES=100 pytest tests/test_nd_store_longhorizon.py
# is executed at round close and its summary committed as
# CHURN_r{N}.json (tools/run_churn_full.py)
N_BATCHES = int(os.environ.get("SPARK_GRAFT_CHURN_BATCHES", "20"))
BATCH = 4
CHECK_EVERY = 10
COMPACT_EVERY = 7           # small cadence => ~13 compactions per 100
FALLBACK_AT = {
    s for s in (11, 18, 23, 46, 69, 92) if s <= N_BATCHES
}   # forced ScaleFallback routes (two land inside the 20-batch default)


def _unit(rng: random.Random) -> list[float]:
    v = [rng.gauss(0.0, 1.0) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _rotated(v: list[float], rng: random.Random, cos_target: float) -> list[float]:
    """A unit vector at exactly ``cos_target`` from unit ``v``."""
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


def test_hundred_batch_churn_store_equals_frame_chain(spark, tmp_path):
    rng = random.Random(0xA11CE)
    w = str(tmp_path / "w")
    os.makedirs(w)

    vecs: dict[int, list[float]] = {}
    drift_pairs: list[tuple[int, int]] = []
    nid = 0
    for _ in range(N_DRIFT_PAIRS):
        f = _unit(rng)
        g = _rotated(f, rng, 0.9985)  # below NEAR_DUP_COS=0.999
        vecs[nid], vecs[nid + 1] = f, g
        drift_pairs.append((nid, nid + 1))
        nid += 2
    for _ in range(N_BASE_RANDOM):
        vecs[nid] = _unit(rng)
        nid += 1

    emb_path = f"{w}/embeddings.parquet"
    spark.createDataFrame(
        sorted(vecs.items()), "vec_id long, embedding array<double>"
    ).coalesce(1).write.parquet(emb_path)

    bits = S.lsh_bits(S.corpus_count(spark, w))
    store = NearDupStore(spark, w, bits)
    store.seed()
    prior = store.final_fold().localCheckpoint()
    prior_p1 = store.p1_fold().localCheckpoint()

    unmerged = list(drift_pairs)
    n_fallbacks = n_compactions = n_merge_events = 0
    for step in range(1, N_BATCHES + 1):
        rows = []
        for _ in range(BATCH):
            roll = rng.random()
            if roll < 0.20 and unmerged:
                # bridge a planted drift pair -> a REAL family merge
                a, b = unmerged.pop(rng.randrange(len(unmerged)))
                v = _midpoint(vecs[a], vecs[b])
                n_merge_events += 1
            elif roll < 0.55:
                # exact-direction clone of any existing vector (family
                # growth; cross-batch edges when the donor is a prior
                # batch's row)
                donor = vecs[rng.choice(sorted(vecs))]
                v = [x * 1.001 for x in donor]
            else:
                v = _unit(rng)
            rows.append((nid, v))
            vecs[nid] = v
            nid += 1
        batch = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).localCheckpoint()

        res = apply_batch_to_store(
            spark, store, batch,
            driver_cc_max_edges=0 if step in FALLBACK_AT else 200_000,
        )
        assert not res.get("skipped"), (step, res)
        if "fallback" in res:
            n_fallbacks += 1

        grown, grown_p1 = incremental_near_dup_update(
            spark, w, batch, prior=prior, prior_p1=prior_p1, bits=bits,
            check_ids=False, return_p1=True,
        )
        prior = grown.localCheckpoint()
        prior_p1 = grown_p1.localCheckpoint()

        # the stream appends AFTER applying; next step's keyed corpus
        # (both paths) then includes this batch
        batch.write.mode("append").parquet(emb_path)

        if store.latest_seq() - store.upto_seq >= COMPACT_EVERY:
            store.compact()
            n_compactions += 1

        if step % CHECK_EVERY == 0 or step == N_BATCHES:
            assert _groups(store.final_fold()) == _groups(prior), step
            assert _groups(store.p1_fold()) == _groups(prior_p1), step

    # the churn actually happened: merges produced composed-remap
    # entries at some point, fallbacks and compactions both fired
    assert n_merge_events >= N_BATCHES // 10, n_merge_events
    assert n_fallbacks == len(FALLBACK_AT)
    assert n_compactions >= N_BATCHES // 12, n_compactions

    # final fold-through-compaction is still exact
    store.compact()
    final = _groups(store.final_fold())
    assert final == _groups(prior)
    assert _groups(store.p1_fold()) == _groups(prior_p1)
    # every ingested batch vector AND its synthesized twin is assigned
    # (the incremental contract registers the whole batch corpus; base
    # rows may legitimately be absent only if the SEED build left an
    # edge-less singleton out, which twins make near-impossible here)
    batch_ids = {i for i in vecs if i >= 2 * N_DRIFT_PAIRS + N_BASE_RANDOM}
    missing = {
        i for i in batch_ids
        if i not in final or (i + S.TWIN_OFFSET) not in final
    }
    assert not missing, sorted(missing)[:10]
