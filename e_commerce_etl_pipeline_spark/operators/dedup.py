"""The reference's three distinct key-dedup semantics, kept distinct on purpose
(SURVEY.md §2.5 D1-D3: easy to silently collapse into one; don't).

All are single-shuffle window/aggregate rewrites that scale: partitioned by
the dedup key, so 100 TB input shuffles once on the key and never collects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(keys: Sequence[str]) -> list[Column]:
    return [F.col(k) for k in keys]


def keep_newest(df: DataFrame, keys: Sequence[str], order_col: str,
                tiebreak: Sequence[str] = ()) -> DataFrame:
    """D1: keep the row with max ``order_col`` per key.

    Reference: sort by update_time then drop_duplicates(keep='last')
    (tiktok_shop_staging_loader.py:361-371). ``tiebreak`` columns break
    equal-order ties deterministically (the reference relies on input order;
    for a distributed engine we demand an explicit total order).
    """
    order = [F.col(order_col).desc_nulls_last()] + [F.col(t).desc_nulls_last() for t in tiebreak]
    w = Window.partitionBy(*_cols(keys)).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_last(df: DataFrame, keys: Sequence[str], arrival_col: str | None = None) -> DataFrame:
    """D2: keep the last-arriving row per key (shopee_orders_loader.py:283-340).

    pandas ``drop_duplicates(keep='last')`` keeps the final occurrence in
    input order. Distributed input has no global order, so callers pass an
    explicit ``arrival_col`` (e.g. a source sequence number). Without one we
    approximate using a monotonic id over the current partitioning — stable
    for single-source reads, documented as such.
    """
    if arrival_col is None:
        df = df.withColumn("__arr", F.monotonically_increasing_id())
        arrival_col = "__arr"
    w = Window.partitionBy(*_cols(keys)).orderBy(F.col(arrival_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__arr")
    )


def drop_all_duplicates(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """D3: remove EVERY row of any duplicated key — not keep-one.

    Reference: ``duplicated(subset=keys, keep=False)`` mask inversion
    (misa_crm_loader.py:173-180). Window count, no join needed.
    """
    w = Window.partitionBy(*_cols(keys))
    return (
        df.withColumn("__cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("__cnt") == 1)
        .drop("__cnt")
    )


def drop_null_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """D5: no null keys reach the sink (misa_crm_loader.py:161-171)."""
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    return df.filter(cond)
