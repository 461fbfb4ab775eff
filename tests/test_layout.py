"""Date-partitioned layout (operators/retention.py): pruning and file
compaction are asserted from the physical plan and the filesystem, not
just claimed. The lifecycle (drop_expired_partitions) itself is covered
by tests/test_retention.py; this file covers the read/write/stream
surface added in round 4."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.operators.retention import (
    DATE_COL,
    read_date_range,
    write_dated,
)
from e_commerce_etl_pipeline_spark.plans.queries import load_table


def _partitions(path):
    return sorted(
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith(DATE_COL + "=")
    )


def test_write_read_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_day")
    events = load_table(spark, sf_dir, "events")
    write_dated(events, path, "ts", mode="overwrite")
    days = _partitions(path)
    assert len(days) > 3, "testdata spans multiple days"

    lo = hi = days[1]  # a single interior day
    got = read_date_range(spark, path, lo, hi)

    # 1) plan-level: the predicate must land in PartitionFilters
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and DATE_COL in plan.split("PartitionFilters", 1)[1][:300]

    # 2) value-level: identical to filtering the unpartitioned source
    expected = events.filter(F.date_format("ts", "yyyy-MM-dd") == lo)
    assert got.count() == expected.count() > 0
    a = {r["event_id"] for r in got.select("event_id").collect()}
    b = {r["event_id"] for r in expected.select("event_id").collect()}
    assert a == b


def test_one_file_per_day_no_small_file_explosion(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_compact")
    write_dated(load_table(spark, sf_dir, "events"), path, "ts", mode="overwrite")
    for d in os.listdir(path):
        if not d.startswith(DATE_COL + "="):
            continue
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: compact write must give one file per day, got {len(files)}"


def test_streaming_append_into_date_partitions(spark, tmp_path):
    """readStream -> time_partitioned_append_stream: rows land in the
    right day directories and range reads stay pruned."""
    from e_commerce_etl_pipeline_spark.streaming.incremental import (
        time_partitioned_append_stream,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    table = str(tmp_path / "events_stream")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, value double"

    rows = [
        (1, datetime.datetime(2024, 1, 1, 5), 1.0),
        (2, datetime.datetime(2024, 1, 2, 6), 2.0),
        (3, datetime.datetime(2024, 1, 2, 7), 3.0),
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(str(src / "b1"))
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q = time_partitioned_append_stream(spark, stream, table, checkpoint_dir=ckpt)
    q.awaitTermination(120)

    assert _partitions(table) == ["2024-01-01", "2024-01-02"]
    day2 = read_date_range(spark, table, "2024-01-02", "2024-01-02")
    assert {r["event_id"] for r in day2.collect()} == {2, 3}

    # a second micro-batch appends into an existing day without rewriting it
    spark.createDataFrame(
        [(4, datetime.datetime(2024, 1, 2, 8), 4.0)], schema
    ).write.mode("overwrite").parquet(str(src / "b2"))
    q2 = time_partitioned_append_stream(spark, stream, table, checkpoint_dir=ckpt)
    q2.awaitTermination(120)
    day2b = read_date_range(spark, table, "2024-01-02", "2024-01-02")
    assert {r["event_id"] for r in day2b.collect()} == {2, 3, 4}
