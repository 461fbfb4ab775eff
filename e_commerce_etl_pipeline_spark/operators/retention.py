"""Retention as partition lifecycle — SURVEY.md §2.2 K10 at scale.

The reference deletes expired rows with ``DELETE ... WHERE etl_created_at
< DATEADD(day,-N,GETDATE())`` per table (misa_crm_loader.py:1166-1213) —
a full-table scan-and-delete. At 100 TB the only sane realization is a
date-partitioned layout where retention drops whole partitions: an O(1)
metadata/filesystem operation per expired day, zero data read, zero data
rewritten. (On a lakehouse table format this is ``ALTER TABLE ... DROP
PARTITION`` / a storage lifecycle rule; on plain parquet it is deleting
the ``etl_date=...`` directories, which is what this module does.)

The row-filter flavor stays available as the read-side query
(`plans.queries.retention_filter`, oracle-checked); this module is the
write-side lifecycle, tested against real files in
tests/test_retention.py.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fsops

DATE_COL = "etl_date"


def write_dated(df: DataFrame, table_path: str, ts_col: str,
                mode: str = "append", compact: bool = True) -> None:
    """Write with an ``etl_date`` partition column derived from ``ts_col``
    — the layout every retention-managed staging table uses.

    ``compact`` (default) repartitions by the partition value first so
    each day lands as ONE file per write: without it every task writes a
    file into every day it touches — the small-file explosion that at
    100 TB degrades listing and task bookkeeping long before I/O. Pass
    False only when the input is already day-clustered."""
    out = df.withColumn(DATE_COL, F.to_date(F.col(ts_col)))
    if compact:
        out = out.repartition(F.col(DATE_COL))
    out.write.partitionBy(DATE_COL).mode(mode).parquet(table_path)


def list_partitions(
    table_path: str, spark: SparkSession | None = None
) -> list[datetime.date]:
    """Partition dates present in the table (directory listing through the
    Hadoop FileSystem API — works on file:/HDFS/S3A alike, no data read)."""
    out = []
    for d in fsops.list_child_names(table_path, spark):
        if d.startswith(f"{DATE_COL}="):
            out.append(datetime.date.fromisoformat(d.split("=", 1)[1]))
    return sorted(out)


def drop_expired_partitions(
    table_path: str,
    retention_days: int,
    now: datetime.date | None = None,
    spark: SparkSession | None = None,
) -> list[datetime.date]:
    """Delete partitions older than the retention horizon; returns the
    dropped dates. Pure directory operations through the Hadoop
    FileSystem API — cost is per expired day, independent of table size,
    and the same code path works on HDFS/S3A where the 100 TB layout
    actually lives."""
    now = now or datetime.date.today()
    cutoff = now - datetime.timedelta(days=retention_days)
    dropped = []
    for day in list_partitions(table_path, spark):
        if day < cutoff:
            fsops.delete(
                f"{table_path}/{DATE_COL}={day.isoformat()}", spark
            )
            dropped.append(day)
    return dropped


def read_dated(spark: SparkSession, table_path: str) -> DataFrame:
    """Read the partitioned table; a filter on ``etl_date`` partition-
    prunes (PartitionFilters in the scan, not a data filter)."""
    return spark.read.option("basePath", table_path).parquet(table_path)


def read_date_range(
    spark: SparkSession, table_path: str, start_date: str, end_date: str
) -> DataFrame:
    """Read ``[start_date, end_date]`` (inclusive, 'yyyy-MM-dd'). The
    predicate binds to the partition column, so the scan lists only the
    matching day directories — a day's query over a year's table reads
    ~1/365th of the files (PartitionFilters asserted from the physical
    plan in tests/test_layout.py, not just claimed)."""
    df = read_dated(spark, table_path)
    return df.filter(
        (F.col(DATE_COL) >= F.lit(start_date).cast("date"))
        & (F.col(DATE_COL) <= F.lit(end_date).cast("date"))
    ).drop(DATE_COL)
