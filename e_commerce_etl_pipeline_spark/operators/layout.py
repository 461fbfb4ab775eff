"""Time-partitioned table layout: date-partition writes, partition-pruned
range reads, and metadata-only retention.

The bucketed-key layout (operators/upsert.py) optimizes keyed MERGE; this
module is the complementary axis for APPEND-mostly event streams — the
reference's events-shaped data (its incremental windows scan by
update_time, shopee_orders_extractor.py:738-768, and its retention delete
K10 filters on a timestamp cutoff). At 100 TB the two properties that
matter:

- **Range scans prune at the partition level.** A day's query over a
  year's table must list and read ~1/365th of the files. Spark does this
  for free when the predicate hits a partition column — the point of
  writing ``etl_date`` into the directory structure instead of relying
  only on parquet row-group min/max stats (which still apply WITHIN each
  partition for finer ``ts`` predicates).
- **Retention is O(partitions-dropped) metadata work, not a rewrite.**
  The reference's retention delete (``DELETE WHERE update_time < cutoff``)
  rewrites at the row level; on a date-partitioned lake the same policy
  is dropping whole directories — no data file is read or written.
  Rows inside the boundary partition are NOT touched (the cutoff is
  rounded down to a partition boundary), which is the standard lakehouse
  retention contract.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "etl_date"


def write_time_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write ``df`` date-partitioned on ``ts_col``. One shuffle on the
    partition value so each day lands as a small number of files
    (repartition by the partition column — without it every task writes
    a file into every day it touches, the classic small-file explosion)."""
    out = df.withColumn(PARTITION_COL, F.date_format(F.col(ts_col), "yyyy-MM-dd"))
    (
        out.repartition(F.col(PARTITION_COL))
        .write.partitionBy(PARTITION_COL)
        .mode(mode)
        .parquet(path)
    )


def read_time_range(
    spark: SparkSession, path: str, start_date: str, end_date: str
) -> DataFrame:
    """Read ``[start_date, end_date]`` (inclusive, 'yyyy-MM-dd'). The
    filter binds to the partition column, so the scan lists only the
    matching directories (PartitionFilters in the plan — asserted by
    tests/test_layout.py, not just claimed)."""
    df = spark.read.parquet(path)
    return df.filter(
        (F.col(PARTITION_COL) >= start_date) & (F.col(PARTITION_COL) <= end_date)
    ).drop(PARTITION_COL)


def retention_drop_partitions(
    spark: SparkSession, path: str, cutoff_date: str
) -> list[str]:
    """Drop every partition strictly older than ``cutoff_date``
    ('yyyy-MM-dd'). Pure directory metadata work — no file is read or
    rewritten; returns the dropped partition values. Lexicographic
    compare of zero-padded ISO dates equals chronological compare."""
    dropped: list[str] = []
    prefix = f"{PARTITION_COL}="
    for d in sorted(os.listdir(path)):
        if not d.startswith(prefix):
            continue
        value = d[len(prefix):]
        if value < cutoff_date:
            shutil.rmtree(os.path.join(path, d))
            dropped.append(value)
    if dropped:
        spark.catalog.refreshByPath(path)
    return dropped
