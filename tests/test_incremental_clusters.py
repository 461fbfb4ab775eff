"""Incremental near-dup cluster maintenance (extensions.
incremental_clusters): the grown assignment must cover the grown
corpus, contain every co-clustered pair a full rebuild of the grown
corpus finds (the provable superset property), never split a base
cluster (merge-monotone), and keep planted twins together — all
verified against an actual from-scratch rebuild of the grown corpus."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions import similarity as S
from e_commerce_etl_pipeline_spark.extensions.incremental_clusters import (
    incremental_near_dup_update,
)
from e_commerce_etl_pipeline_spark.extensions.similarity import (
    TWIN_OFFSET,
    lsh_bits,
    near_dup_clusters,
)
from e_commerce_etl_pipeline_spark.plans.queries import load_table


@pytest.fixture(scope="module")
def split_dirs(spark, sf_dir, tmp_path_factory):
    """Write the sf0.001 embeddings 90/10 into base/grown sf-dir layouts:
    base = vec_id % 10 != 7, grown = the full table (the rebuild
    reference). Returns (base_dir, grown_dir, batch_df)."""
    root = tmp_path_factory.mktemp("inc_nd")
    emb = load_table(spark, sf_dir, "embeddings")
    base_dir, grown_dir = str(root / "base"), str(root / "grown")
    os.makedirs(base_dir), os.makedirs(grown_dir)
    emb.filter(F.col("vec_id") % 10 != 7).coalesce(1).write.parquet(
        f"{base_dir}/embeddings.parquet"
    )
    emb.coalesce(1).write.parquet(f"{grown_dir}/embeddings.parquet")
    batch = emb.filter(F.col("vec_id") % 10 == 7)
    # the superset comparison is only meaningful if base and grown sit
    # in the same lsh_bits tier (incremental pins the base tier)
    n_base = emb.filter(F.col("vec_id") % 10 != 7).count() * 2
    n_grown = emb.count() * 2
    assert lsh_bits(n_base // 2) == lsh_bits(n_grown // 2), (
        "fixture must not straddle an lsh_bits step"
    )
    return base_dir, grown_dir, batch


def _groups(df) -> dict[int, int]:
    return {r["vec_id"]: r["canonical_id"] for r in df.collect()}


def _co_pairs(assign: dict[int, int]) -> set[tuple[int, int]]:
    from collections import defaultdict

    by_label = defaultdict(list)
    for v, c in assign.items():
        by_label[c].append(v)
    pairs = set()
    for members in by_label.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                pairs.add((a, b))
    return pairs


def test_incremental_matches_or_supersets_full_rebuild(spark, split_dirs):
    base_dir, grown_dir, batch = split_dirs
    updated = _groups(incremental_near_dup_update(spark, base_dir, batch))
    full = _groups(near_dup_clusters(spark, grown_dir))

    # coverage: every grown-corpus vector (bases + twins) exactly once
    assert set(updated) == set(full)

    # superset: every pair the full rebuild co-clusters is co-clustered
    # incrementally (the provable direction)
    full_pairs = _co_pairs(full)
    inc_pairs = _co_pairs(updated)
    missing = full_pairs - inc_pairs
    assert not missing, f"full-rebuild pairs lost incrementally: {sorted(missing)[:5]}"

    # planted twins: each batch vector rejoins its twin
    for r in batch.select("vec_id").collect():
        v = r["vec_id"]
        assert updated[v] == updated[v + TWIN_OFFSET], f"twin split for {v}"


def test_incremental_never_splits_a_base_cluster(spark, split_dirs):
    base_dir, _, batch = split_dirs
    base = _groups(near_dup_clusters(spark, base_dir))
    updated = _groups(incremental_near_dup_update(spark, base_dir, batch))
    from collections import defaultdict

    new_label_of = defaultdict(set)
    for v, c in base.items():
        new_label_of[c].add(updated[v])
    split = {c: ls for c, ls in new_label_of.items() if len(ls) > 1}
    assert not split, f"base clusters split: {dict(list(split.items())[:3])}"


def test_id_guards(spark, split_dirs):
    base_dir, _, batch = split_dirs
    bad_hi = spark.createDataFrame(
        [(TWIN_OFFSET + 5, [0.0] * S.DIM)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="TWIN_OFFSET"):
        incremental_near_dup_update(spark, base_dir, bad_hi)
    overlapping = load_table(spark, base_dir, "embeddings").limit(1)
    with pytest.raises(ValueError, match="overlap"):
        incremental_near_dup_update(spark, base_dir, overlapping)


def test_driver_and_distributed_cc_paths_agree(spark, split_dirs):
    """The size-adaptive components switch must be invisible: forcing
    the distributed path (driver_cc_max_edges=0 -> every edge count
    exceeds it) yields the identical assignment to the default
    driver union-find path."""
    base_dir, _, batch = split_dirs
    via_driver = _groups(
        incremental_near_dup_update(spark, base_dir, batch)
    )
    via_distributed = _groups(
        incremental_near_dup_update(
            spark, base_dir, batch, driver_cc_max_edges=-1
        )
    )
    assert via_driver == via_distributed


def test_touched_family_members_maps_noncanonical_to_full_family(spark):
    """ADVICE r9 #1: a family reached via a NON-canonical member must
    contribute ALL its members to the stage-2 re-enumeration scope —
    the raw touched set holds edge-endpoint member ids, and semi-joining
    canonical_id against those directly would miss every family touched
    only through a non-canonical member."""
    from e_commerce_etl_pipeline_spark.extensions.incremental_clusters import (
        _touched_family_members,
    )

    # families: {1, 5, 9} (canonical 1), {2, 6} (canonical 2);
    # 42 is a prior-absent singleton
    prior_p1 = spark.createDataFrame(
        [(1, 1), (5, 1), (9, 1), (2, 2), (6, 2)],
        "vec_id long, canonical_id long",
    )
    touched = spark.createDataFrame(
        [(9,), (42,)], "vec_id long"
    )  # 9 is NOT the canonical of its family
    got = {r["vec_id"] for r in _touched_family_members(prior_p1, touched).collect()}
    assert got == {1, 5, 9, 42}, got

    # touched via the canonical itself behaves identically
    touched_c = spark.createDataFrame([(2,)], "vec_id long")
    got_c = {
        r["vec_id"] for r in _touched_family_members(prior_p1, touched_c).collect()
    }
    assert got_c == {2, 6}, got_c
