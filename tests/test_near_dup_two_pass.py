"""Two-pass near-dup clustering (VERDICT r8 #1): an engineered clone
pile-up — a true cos>=0.999 pair separated in EVERY table's chain order
by more than W rows of interleaved blocker families — is missed by
pass 1 and healed by the pass-2 rerun over pass-1 canonicals, in both
the full build (similarity.near_dup_clusters) and the incremental
update (incremental_clusters.incremental_near_dup_update).

Construction (numpy, deterministic seeds): a base direction u with
every element bounded away from zero (so every vector in the corpus
shares all sign signatures and buckets in all tables); the target pair
a = u, b = u + EPS*w (cos 0.9992); N_FAMS blocker families of
FAM_SIZE members each, whose centers are SOLVED (least squares against
the actual chain hyperplanes) to project strictly between a and b in
every table while sitting at perpendicular distance 0.1 from u
(cos 0.995 — not near-dups of a, b, or each other). Pass-1 rank
distance between a and b is then ~2*N_FAMS*FAM_SIZE (members + twins)
in every table — far beyond W=16 — while each family contracts to one
rep, putting b within W of a in the pass-2 order. The construction is
CHECKED, not hoped: a seed whose geometry fails to produce a pass-1
miss is skipped and the next seed tried; zero working seeds fails the
test loudly.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions import similarity as S
from e_commerce_etl_pipeline_spark.extensions.incremental_clusters import (
    incremental_near_dup_update,
)

EPS = 0.04          # a-b separation: cos = 1/sqrt(1+EPS^2) ~ 0.99920
DELTA = 0.1         # blocker distance from u: cos ~ 0.99504
N_FAMS = 12         # pass-2 rank distance a->b = N_FAMS + 1 <= W
FAM_SIZE = 10       # pass-1 rank distance ~ 2*N_FAMS*FAM_SIZE >> W
A_ID, B_ID = 0, 200


def _orth_complement_noise(rng, fixed: np.ndarray, scale: float) -> np.ndarray:
    """A random vector of norm ``scale`` orthogonal to every row of
    ``fixed`` (the chain hyperplanes, u, w): noise that moves neither
    any table's projection nor the u/w geometry."""
    n = rng.standard_normal(fixed.shape[1])
    # project out the span of `fixed`
    q, _ = np.linalg.qr(fixed.T)
    n = n - q @ (q.T @ n)
    return n / np.linalg.norm(n) * scale


def _build_pileup(seed: int) -> tuple[dict[int, np.ndarray], np.ndarray]:
    rng = np.random.default_rng(seed)
    dim = S.DIM
    signs = rng.choice([-1.0, 1.0], dim)
    u = signs * (0.08 + 0.07 * rng.random(dim))
    u /= np.linalg.norm(u)

    g = np.array([S._chain_coefs(t) for t in range(S.N_TABLES)])
    w = _orth_complement_noise(rng, u[None, :], 1.0)
    b_vec = u + EPS * w

    vecs: dict[int, np.ndarray] = {A_ID: u, B_ID: b_vec}
    # constraint rows: the N_TABLES hyperplanes, u, and w
    cons = np.vstack([g, u[None, :], w[None, :]])
    gp = np.linalg.pinv(np.vstack([g, u[None, :]]))
    gw = g @ w  # per-table projection displacement of b relative to a
    for k in range(N_FAMS):
        alpha = (k + 1) / (N_FAMS + 1)
        # solve: g_t . p = alpha * EPS * (g_t . w) for all t; u . p = 0
        rhs = np.concatenate([alpha * EPS * gw, [0.0]])
        p_base = gp @ rhs
        fill = np.sqrt(max(DELTA**2 - p_base @ p_base, 1e-8))
        center = u + p_base + _orth_complement_noise(rng, cons, fill)
        for i in range(FAM_SIZE):
            m = _orth_complement_noise(rng, cons, 5e-4)
            vecs[10 + k * FAM_SIZE + i] = center + m
    return vecs, u


def _write_corpus(spark, root: str, vecs: dict[int, np.ndarray]) -> str:
    os.makedirs(root, exist_ok=True)
    rows = [(int(i), [float(x) for x in v]) for i, v in sorted(vecs.items())]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{root}/embeddings.parquet"
    )
    return root


def _canon(df) -> dict[int, int]:
    return {r["vec_id"]: r["canonical_id"] for r in df.collect()}


def _p1_misses_pair(spark, d: str) -> bool:
    p1 = _canon(S.near_dup_p1_clusters(spark, d))
    return p1.get(A_ID, A_ID) != p1.get(B_ID, B_ID)


@pytest.fixture(scope="module")
def pileup_dirs(spark, tmp_path_factory):
    """(grown_dir, base_dir, batch_df) for the first seed whose geometry
    produces a real pass-1 miss of the (a, b) pair."""
    tmp = tmp_path_factory.mktemp("pileup")
    for seed in range(8):
        vecs, _ = _build_pileup(seed)
        # sanity on the construction itself, before any Spark work
        def cos(x, y):
            return x @ y / (np.linalg.norm(x) * np.linalg.norm(y))
        assert cos(vecs[A_ID], vecs[B_ID]) >= S.NEAR_DUP_COS
        for k in range(N_FAMS):
            c = vecs[10 + k * FAM_SIZE]
            assert cos(c, vecs[A_ID]) < S.NEAR_DUP_COS
            assert cos(c, vecs[B_ID]) < S.NEAR_DUP_COS
        grown = _write_corpus(
            spark, str(tmp / f"grown{seed}"), vecs
        )
        if not _p1_misses_pair(spark, grown):
            continue  # geometry didn't interleave enough — next seed
        base_vecs = {i: v for i, v in vecs.items() if i != B_ID}
        base = _write_corpus(spark, str(tmp / f"base{seed}"), base_vecs)
        batch = spark.createDataFrame(
            [(B_ID, [float(x) for x in vecs[B_ID]])],
            "vec_id long, embedding array<double>",
        )
        return grown, base, batch
    pytest.fail("no seed produced a pass-1 miss — construction broken")


def test_full_build_pass2_heals_the_pileup_miss(spark, pileup_dirs):
    grown, _, _ = pileup_dirs
    # pass 1 alone misses the pair (the fixture guaranteed it) ...
    assert _p1_misses_pair(spark, grown)
    # ... and the two-pass build recovers it, with the family minimum
    # as the canonical
    final = _canon(S.near_dup_clusters(spark, grown))
    assert final[A_ID] == final[B_ID] == A_ID
    # blockers must NOT have been merged into the a/b family: pass 2
    # adds only cosine-verified edges
    for k in range(N_FAMS):
        assert final[10 + k * FAM_SIZE] != A_ID


def test_incremental_pass2_heals_the_pileup_miss(spark, pileup_dirs):
    """Ingesting b as a batch exercises the stage-2 rep-churn path: b
    becomes a new rep, its buckets are re-enumerated over the current
    rep set, and the (a, b) edge — invisible to the pass-1 increment,
    which sees b ~2*N_FAMS*FAM_SIZE ranks from a — lands via pass 2,
    matching the two-pass full rebuild."""
    grown, base, batch = pileup_dirs
    updated = _canon(incremental_near_dup_update(spark, base, batch))
    assert updated[A_ID] == updated[B_ID] == A_ID
    full = _canon(S.near_dup_clusters(spark, grown))
    # superset: every co-clustered rebuild pair is co-clustered here
    by_label: dict[int, list[int]] = {}
    for v, c in full.items():
        by_label.setdefault(c, []).append(v)
    for members in by_label.values():
        got = {updated[m] for m in members}
        assert len(got) == 1, f"rebuild cluster {sorted(members)[:4]} split"
