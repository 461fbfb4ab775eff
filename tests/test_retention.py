"""K10 retention as partition lifecycle: drop expired etl_date partition
directories (no data read/rewrite), and prove reads partition-prune."""

from __future__ import annotations

import datetime

from e_commerce_etl_pipeline_spark.operators.retention import (
    drop_expired_partitions,
    list_partitions,
    read_dated,
    write_dated,
)


def _mk(spark, days):
    rows = [
        (i, f"o{i}", datetime.datetime(2024, 1, d, 12, 0))
        for i, d in enumerate(days)
    ]
    return spark.createDataFrame(rows, "id long, order_id string, etl_created_at timestamp")


def test_drop_expired_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_dated(_mk(spark, [1, 1, 5, 10, 20]), path, "etl_created_at",
                mode="overwrite")
    assert list_partitions(path) == [
        datetime.date(2024, 1, d) for d in (1, 5, 10, 20)
    ]

    dropped = drop_expired_partitions(
        path, retention_days=15, now=datetime.date(2024, 1, 21)
    )
    assert dropped == [datetime.date(2024, 1, 1), datetime.date(2024, 1, 5)]
    assert list_partitions(path) == [
        datetime.date(2024, 1, 10), datetime.date(2024, 1, 20)
    ]
    # surviving rows: the two recent days
    out = read_dated(spark, path)
    assert out.count() == 2
    # idempotent
    assert drop_expired_partitions(path, 15, datetime.date(2024, 1, 21)) == []


def test_read_partition_prunes(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_dated(_mk(spark, [1, 10, 20]), path, "etl_created_at", mode="overwrite")
    df = read_dated(spark, path).filter("etl_date >= date'2024-01-15'")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the date predicate must land in PartitionFilters (pruning), not as
    # a post-scan data Filter
    scan_detail = plan[plan.index("PartitionFilters"):]
    assert "etl_date" in scan_detail.splitlines()[0]
    assert df.count() == 1
