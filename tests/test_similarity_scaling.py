"""Scale behavior of the data-driven ANN granularity (r2 verdict item 1):
bucket/cell counts must GROW with the corpus so occupancy stays bounded
as the corpus doubles — the 100 TB story for the similarity family.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.similarity import (
    DIM,
    MAX_BITS,
    MIN_BITS,
    N_TABLES,
    TARGET_BUCKET_OCC,
    TARGET_CELL_OCC,
    ivf_cells,
    lsh_bits,
    random_hyperplane_bucket,
    sign_bucket,
)


def test_mean_bucket_occupancy_bounded_under_doubling():
    """Doubling the corpus must not double mean occupancy: while the
    axis-aligned dim budget lasts, n / 2^bits(n) stays ≤ TARGET."""
    n = 1024
    while n <= TARGET_BUCKET_OCC * (1 << MAX_BITS):
        bits = lsh_bits(n)
        assert n / (1 << bits) <= TARGET_BUCKET_OCC, (n, bits)
        n *= 2
    # past the axis-aligned budget the formula caps (random_hyperplane_
    # bucket takes over there — dimension-unbounded, tested below)
    assert lsh_bits(n) == MAX_BITS


def test_bits_and_cells_monotone():
    ns = [2**k for k in range(6, 34)]
    bits = [lsh_bits(n) for n in ns]
    cells = [ivf_cells(n) for n in ns]
    assert bits == sorted(bits) and cells == sorted(cells)
    assert bits[0] == MIN_BITS and all(b <= MAX_BITS for b in bits)
    # mean cell occupancy ≤ TARGET while under the cell cap
    for n, k in zip(ns, cells):
        if k < 1024:
            assert n / k <= TARGET_CELL_OCC + 1


@pytest.fixture(scope="module")
def synth(request):
    """Deterministic synthetic corpus (values in [-1, 1), no sign skew)."""
    rng = np.random.default_rng(7)
    return {
        n: [(int(i), [float(x) for x in rng.uniform(-1, 1, DIM)])
            for i in range(n)]
        for n in (2048, 4096)
    }


@pytest.mark.parametrize("n", [2048, 4096])
def test_axis_aligned_occupancy_on_doubled_synthetic_corpus(spark, synth, n):
    """End-to-end occupancy: as the synthetic corpus doubles 2048→4096,
    lsh_bits grows 6→7 and max per-table bucket load stays ~flat
    (≤ 4× the target mean), instead of doubling."""
    df = spark.createDataFrame(synth[n], "vec_id long, v array<double>")
    bits = lsh_bits(n)
    banded = df.select(
        F.posexplode(
            F.array(*[sign_bucket(F.col("v"), t, bits) for t in range(N_TABLES)])
        ).alias("tbl", "bucket")
    )
    occ = banded.groupBy("tbl", "bucket").count()
    stats = occ.agg(F.max("count").alias("mx"),
                    F.countDistinct("bucket").alias("nb")).collect()[0]
    assert stats.mx <= 4 * TARGET_BUCKET_OCC, (n, bits, stats.mx)
    assert stats.nb > (1 << bits) // 2  # buckets actually populated


def test_random_hyperplane_bucket_deterministic_and_uniform(spark, synth):
    """The dimension-unbounded growth path: 8 pseudo-random hyperplanes
    over 64 dims give 256 near-uniform buckets, and the bucket ids are
    reproducible across invocations (literal coefficient planes)."""
    df = spark.createDataFrame(synth[2048], "vec_id long, v array<double>")
    b = df.select("vec_id", random_hyperplane_bucket(F.col("v"), 0, 8).alias("bk"))
    occ = b.groupBy("bk").count()
    stats = occ.agg(F.max("count").alias("mx"),
                    F.countDistinct("bk").alias("nb")).collect()[0]
    assert stats.nb > 128  # most of the 256 buckets populated
    assert stats.mx <= 4 * (2048 // 256)
    # determinism: recomputing yields identical assignments
    again = df.select("vec_id", random_hyperplane_bucket(F.col("v"), 0, 8).alias("bk2"))
    diff = b.join(again, "vec_id").filter(F.col("bk") != F.col("bk2")).count()
    assert diff == 0
