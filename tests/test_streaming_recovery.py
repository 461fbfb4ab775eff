"""ST6 crash-recovery proof: a streaming query killed AFTER a batch's
upsert is applied but BEFORE the checkpoint commits must, on restart,
replay that batch — and the replay guard must make the double
application invisible (effectively-once in the table).

This is the reference pipeline's core production property (15-minute
cron + lookback re-extract + guarded MERGE, dags/incremental_etl_dag.py:
49-51 with the K4 guards): the sink is at-least-once, the keyed upsert
is idempotent, the composition is effectively-once. The happy path is
covered in test_streaming.py; here the failure window itself is forced.

Crash injection: foreachBatch applies the REAL library upsert, then
raises — Structured Streaming fails the query with the batch applied
but uncommitted, which is exactly the state a driver crash between sink
write and checkpoint commit leaves behind. Restart from the same
checkpoint replays the uncommitted batch, then drains the rest.
"""

import datetime
import os
import time

import pytest
from pyspark.sql import types as T
from pyspark.sql.utils import StreamingQueryException

from e_commerce_etl_pipeline_spark.operators.upsert import (
    read_upsert_table,
    upsert as real_upsert,
)
from e_commerce_etl_pipeline_spark.streaming import incremental as inc

SCHEMA = T.StructType([
    T.StructField("order_id", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("update_time", T.TimestampType()),
])


def ts(s):
    return datetime.datetime.fromisoformat(s)


FILES = [
    [("o1", "created", "2024-01-01T00:00:00"),
     ("o2", "created", "2024-01-01T00:00:00")],
    [("o1", "shipped", "2024-01-02T00:00:00"),
     ("o3", "created", "2024-01-01T00:00:00")],
    [("o2", "cancelled", "2024-01-03T00:00:00"),
     ("o4", "created", "2024-01-01T00:00:00")],
]


def _write_files(spark, src_dir):
    """One parquet dir per micro-batch, mtimes strictly ascending so the
    file source (maxFilesPerTrigger=1) forms deterministic batches."""
    for i, rows in enumerate(FILES):
        p = str(src_dir / f"f{i}")
        spark.createDataFrame(
            [(o, s, ts(t)) for o, s, t in rows], SCHEMA
        ).coalesce(1).write.parquet(p)
        stamp = time.time() - 60 + i * 10
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (stamp, stamp))


def _stream(spark, src_dir):
    return (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
    )


def test_crash_between_sink_and_checkpoint_recovers_effectively_once(
    spark, tmp_path, monkeypatch
):
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    _write_files(spark, src_dir)
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    applications = []  # (sorted batch rows) per upsert application

    def spying_upsert(spark_, batch, *a, **kw):
        rows = sorted(
            (r.order_id, r.status) for r in batch.select(
                "order_id", "status").collect()
        )
        real_upsert(spark_, batch, *a, **kw)
        applications.append(rows)

    def crashing_upsert(spark_, batch, *a, **kw):
        spying_upsert(spark_, batch, *a, **kw)
        if len(applications) == 2:  # second batch: applied, then "crash"
            raise RuntimeError("injected crash after sink, before commit")

    # --- run 1: crashes on the second micro-batch -------------------------
    monkeypatch.setattr(inc, "upsert", crashing_upsert)
    q = inc.incremental_upsert_stream(
        spark, _stream(spark, src_dir), table, ["order_id"], "update_time",
        guard_cols=["status"], checkpoint_dir=ckpt,
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(180)
        raise AssertionError("query should have failed on the injected crash")

    # the crashed batch WAS applied to the table (sink-side state exists)
    mid = {r.order_id: r.status for r in read_upsert_table(spark, table).collect()}
    assert mid == {"o1": "shipped", "o2": "created", "o3": "created"}
    assert len(applications) == 2

    # --- run 2: restart from the same checkpoint --------------------------
    monkeypatch.setattr(inc, "upsert", spying_upsert)
    q2 = inc.incremental_upsert_stream(
        spark, _stream(spark, src_dir), table, ["order_id"], "update_time",
        guard_cols=["status"], checkpoint_dir=ckpt,
    )
    assert q2.awaitTermination(180)

    # the uncommitted batch replayed: its rows were applied TWICE overall
    crashed_rows = sorted([("o1", "shipped"), ("o3", "created")])
    assert applications.count(crashed_rows) == 2, applications
    # ... yet the table equals a single-shot upsert of the full input
    final = {
        (r.order_id, r.status, r.update_time)
        for r in read_upsert_table(spark, table).collect()
    }
    oneshot_path = str(tmp_path / "oneshot")
    all_rows = spark.createDataFrame(
        [(o, s, ts(t)) for f in FILES for o, s, t in f], SCHEMA
    )
    real_upsert(spark, all_rows, oneshot_path, ["order_id"], "update_time",
                guard_cols=["status"])
    expected = {
        (r.order_id, r.status, r.update_time)
        for r in read_upsert_table(spark, oneshot_path).collect()
    }
    assert final == expected
    assert len(final) == 4  # no lost rows, no duplicated keys
