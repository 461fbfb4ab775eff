"""Incremental micro-batch ingestion (SURVEY.md §2.8).

The reference's 15-minute Airflow cron + lookback-window re-extract +
idempotent MERGE (dags/incremental_etl_dag.py:49-51, ST1-ST6) maps to
Structured Streaming: a file/stream source -> ``foreachBatch`` applying
the guarded keyed upsert. The ST3 late-data story is identical: windows
may overlap and batches may replay; the ``target.order < source.order``
guard makes re-delivery a no-op, so at-least-once delivery + keyed upsert
= effectively-once in the table.

Also provided: the batch-driver equivalent (``run_incremental_batch``)
with an explicit lookback window — the bridge/backfill path (ST4) is the
same function with a wider window.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import upsert


def run_incremental_batch(
    spark: SparkSession,
    source: DataFrame,
    table_path: str,
    keys: Sequence[str],
    order_col: str,
    guard_cols: Sequence[str] = (),
    lookback: timedelta | None = None,
    now: datetime | None = None,
) -> int:
    """One micro-batch: filter the source to the lookback window on
    ``order_col`` (ST2 watermark analog), upsert into the table. Returns
    rows considered. Replay-safe by construction.

    The lookback-filtered source is scanned ONCE: the batch is pinned with
    an eager localCheckpoint, so both the count and the upsert read the
    materialized blocks instead of re-running the source scan (the
    count-then-act double read was r4 finding #1; same fix shape as
    pipelines/etl.py's write-then-count)."""
    batch = source
    if lookback is not None:
        # naive-UTC to match the column convention (order_col timestamps
        # are session-tz/UTC); datetime.utcnow() is deprecated
        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        batch = source.filter(F.col(order_col) >= F.lit(now - lookback))
    batch = batch.localCheckpoint(eager=True)
    n = batch.count()
    if n:
        upsert(spark, batch, table_path, keys, order_col, guard_cols)
    return n


def incremental_upsert_stream(
    spark: SparkSession,
    stream: DataFrame,
    table_path: str,
    keys: Sequence[str],
    order_col: str,
    guard_cols: Sequence[str] = (),
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Structured Streaming driver: readStream source -> foreachBatch
    keyed upsert. ``Trigger.AvailableNow`` drains what's there and stops —
    the cron-equivalent; a processingTime trigger gives the continuous
    15-minute cadence."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert(spark, batch_df, table_path, keys, order_col, guard_cols)

    writer = stream.writeStream.foreachBatch(apply_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="15 minutes")
    return writer.start()


def time_partitioned_append_stream(
    spark: SparkSession,
    stream: DataFrame,
    table_path: str,
    ts_col: str = "ts",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Append-stream sink into the date-partitioned retention layout
    (operators/retention.py) — the event-firehose complement to the
    keyed upsert stream: no MERGE semantics, just partition-routed
    appends that keep range reads pruned and retention metadata-only.
    Each micro-batch adds at most one file per day it touches (the
    batch is repartitioned by day inside write_dated), so file growth
    is O(batches), bounded by compaction cadence, not O(tasks×days).
    Exactly-once: file-sink semantics come from the checkpoint — a
    replayed batch re-runs foreachBatch, so the append is at-least-once;
    downstream exact dedup (D1/exact_dedup) or an idempotent batch_id
    partition column is the standard remedy when the source replays."""
    from ..operators.retention import write_dated

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_dated(batch_df, table_path, ts_col, mode="append")

    writer = stream.writeStream.foreachBatch(apply_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="15 minutes")
    return writer.start()
