"""Skew-resilient aggregation: two-stage salted groupBy.

At 100 TB a hot group key (one merchant, one event type) concentrates a
shuffle partition. The standard fix when AQE's skew handling isn't
enough: salt the key into S shards, partially aggregate per
(key, salt), then merge the S partials per key. Works for any
algebraic aggregate (sum/count/min/max); result is IDENTICAL to the
plain groupBy — decimal sums make that bit-exact, so the same DuckDB
oracle verifies the salted plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_col: Column,
    n_salts: int = 16,
    sum_alias: str = "total",
    count_alias: str = "n",
) -> DataFrame:
    """groupBy(group_cols).agg(sum, count) via salt-and-merge.

    Salt comes from the whole-row hash — the same recompute-stable
    contract ``salted_join`` documents (rand() and
    monotonically_increasing_id are stable only per-execution; a task
    retry would re-salt rows differently mid-aggregation)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.sum(sum_col).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__psum").alias(sum_alias),
        F.sum("__pcnt").cast("long").alias(count_alias),
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: salt-and-replicate.

    The skewed (fact) side gets a deterministic salt derived from its
    whole row hash; the small (dim) side is replicated ×``n_salts`` via
    an exploded salt array. Joining on (key, salt) splits each hot key's
    rows across ``n_salts`` shuffle partitions instead of one straggler
    task. Result is row-identical to the plain join.

    When to use over AQE skew-join: AQE only splits *sort-merge* join
    partitions post-shuffle and needs the skew to show up in runtime
    stats; salting also covers shuffled-hash joins, repeated pipelines
    where the skew is known ahead of time, and joins feeding
    partitioning-sensitive downstream ops. Replication multiplies the
    small side's shuffle volume — keep it for genuinely small dims that
    just exceed the broadcast threshold.

    Salt must NOT come from rand() (non-deterministic breaks task retry
    at-least-once semantics) nor monotonically_increasing_id (stable
    only per-execution): the row-hash salt is recompute-stable.
    """
    salted = skewed.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in skewed.columns]),
                         F.lit(n_salts)),
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return salted.join(replicated, [key, "__salt"], how).drop("__salt")
