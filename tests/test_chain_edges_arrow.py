"""chain_edges_arrow: the Arrow shifted-array edge kernel must emit
EXACTLY the edge set of the former window+join formulation — including
pairs whose members land in different Arrow batches of one partition
(the pd.concat path), and across key-group boundaries."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.similarity import (
    chain_edges_arrow,
    dot,
)

W = 4
THRESHOLD = 0.999


def _corpus(spark, n_groups: int, per_group: int):
    """Deterministic vectors: group g member j = unit-ish vector with a
    tiny j-proportional perturbation, so adjacent members verify at
    >= 0.999 cosine and distant ones may not."""
    rows = []
    for g in range(n_groups):
        for j in range(per_group):
            base = [1.0 + 0.3 * ((g + i) % 7) for i in range(8)]
            vec = [x + 1e-4 * j for x in base]
            norm = math.sqrt(sum(vec[i] * vec[i] for i in range(8)))
            rows.append((g * 10_000 + j, g, vec, norm,
                         "s", float(j)))
    return spark.createDataFrame(
        rows,
        "vec_id long, grp long, v array<double>, norm double, "
        "__sig string, __proj double",
    )


def _reference_edges(df):
    """The former formulation: rank window + W-successor equi-join +
    fold-dot filter."""
    w = Window.partitionBy("grp").orderBy("__sig", "__proj", "vec_id")
    r = df.withColumn("__rn", F.row_number().over(w))
    left = (
        r.select("grp", F.col("vec_id").alias("va"), F.col("v").alias("av"),
                 F.col("norm").alias("an"), F.col("__rn").alias("ra"))
        .withColumn("__k", F.explode(F.sequence(F.lit(1), F.lit(W))))
        .withColumn("rb", F.col("ra") + F.col("__k"))
    )
    right = r.select("grp", F.col("vec_id").alias("vb"),
                     F.col("v").alias("bv"), F.col("norm").alias("bn"),
                     F.col("__rn").alias("rb"))
    return (
        left.join(right, ["grp", "rb"])
        .filter(dot(F.col("av"), F.col("bv"))
                / (F.col("an") * F.col("bn")) >= THRESHOLD)
        .select(F.col("va").alias("src"), F.col("vb").alias("dst"))
    )


@pytest.mark.parametrize("batch_size", [7, 10000])
def test_kernel_matches_join_formulation(spark, batch_size):
    """batch_size=7 forces every partition through MANY Arrow batches
    (groups straddle batch boundaries); 10000 is the single-batch
    path. Both must reproduce the join formulation's edge set."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_size))
    try:
        df = _corpus(spark, n_groups=6, per_group=13)
        got = set(
            (r["src"], r["dst"])
            for r in chain_edges_arrow(df, ["grp"], W, THRESHOLD).collect()
        )
        want = set(
            (r["src"], r["dst"]) for r in _reference_edges(df).collect()
        )
        assert got == want
        assert len(want) > 0  # the fixture must actually produce edges
        # and some groups must be larger than an Arrow batch
        assert batch_size >= 13 * 6 or 13 > batch_size
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_kernel_memory_bounded_per_batch(spark, tmp_path):
    """The r9 carry-over kernel must NOT materialize the partition: the
    peak combined frame each task holds is maxRecordsPerBatch + W rows
    (the probe records it), edges are still the exact join-formulation
    set, and nothing is emitted twice (pairs inside the carried prefix
    are suppressed, so the multiset has no duplicates)."""
    probe = tmp_path / "peaks"
    probe.mkdir()
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    batch_size = 7
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_size))
    try:
        # ONE group of 60 rows -> one partition crossed by ~9 batches;
        # whole-partition concat would record peak 60
        df = _corpus(spark, n_groups=1, per_group=60).coalesce(1)
        got = [
            (r["src"], r["dst"])
            for r in chain_edges_arrow(
                df, ["grp"], W, THRESHOLD, frame_probe=str(probe)
            ).collect()
        ]
        want = set(
            (r["src"], r["dst"]) for r in _reference_edges(df).collect()
        )
        assert set(got) == want and len(want) > 0
        assert len(got) == len(set(got)), "carry prefix pairs re-emitted"
        peaks = [int(p.read_text()) for p in probe.iterdir()]
        assert peaks, "probe recorded nothing"
        assert max(peaks) <= batch_size + W, (
            f"partition materialized: peak frame {max(peaks)} rows "
            f"> batch {batch_size} + W {W}"
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_kernel_never_links_across_groups(spark):
    df = _corpus(spark, n_groups=4, per_group=3)
    edges = chain_edges_arrow(df, ["grp"], W, THRESHOLD).collect()
    assert edges, "fixture should produce within-group edges"
    for r in edges:
        assert r["src"] // 10_000 == r["dst"] // 10_000


def test_wide_width_equals_group_bounded_width(spark):
    """The r9 occupancy cap: a width far beyond every group's size must
    emit exactly the edges of width = max group size - 1 (no pair can
    span a group boundary, so the extra iterations are skipped, not
    just filtered) — what makes the wide pass-2 default free on
    small-bucket corpora."""
    df = _corpus(spark, n_groups=5, per_group=9)
    wide = set(
        (r["src"], r["dst"])
        for r in chain_edges_arrow(df, ["grp"], 1000, THRESHOLD).collect()
    )
    bounded = set(
        (r["src"], r["dst"])
        for r in chain_edges_arrow(df, ["grp"], 8, THRESHOLD).collect()
    )
    assert wide == bounded and len(wide) > 0
