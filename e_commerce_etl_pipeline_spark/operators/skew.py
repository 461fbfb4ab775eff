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
    """groupBy(group_cols).agg(sum, count) via salt-and-merge."""
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.sum(sum_col).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__psum").alias(sum_alias),
        F.sum("__pcnt").cast("long").alias(count_alias),
    )
