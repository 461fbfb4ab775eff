"""Warehouse egress round-trip: the JDBC-shaped guarded-upsert sink must
produce byte-identical table state to the in-lake ``resolve_upsert``
(the MERGE semantics contract, K4-K6), including replay-safety and the
etl_created_at carve-out.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.operators.upsert import resolve_upsert
from e_commerce_etl_pipeline_spark.operators.warehouse import (
    foreach_batch_writer,
    jdbc_upsert_egress,
    tsql_merge_statement,
    upsert_statement,
)

SCHEMA = ("order_id string, status string, tracking string, update_time long, "
          "etl_created_at long, etl_updated_at long")
COLS = ["order_id", "status", "tracking", "update_time",
        "etl_created_at", "etl_updated_at"]
KEYS, ORDER, GUARDS = ["order_id"], "update_time", ["status", "tracking"]

TARGET = [
    ("T1", "CREATED", "tk1", 100, 10, 10),
    ("T2", "SHIPPED", "tk2", 500, 10, 10),
    ("T3", "DONE", None, 300, 10, 10),
]
SOURCE = [
    ("T1", "SHIPPED", "tk1", 200, 99, 20),   # newer -> update
    ("T1", "CANCEL", "tk0", 50, 99, 20),     # stale dup in batch -> deduped
    ("T2", "SHIPPED", "tk2", 500, 99, 20),   # tie, no guard diff -> no-op
    ("T3", "DONE", "tk3", 300, 99, 20),      # tie, tracking changed -> update
    ("T4", "NEW", None, 700, 99, 20),        # insert
    (None, "NOKEY", None, 900, 99, 20),      # NULL key -> dropped at egress
]


def _connect_fn(path):
    def connect():
        return duckdb.connect(path)
    return connect


def _mk_sink(path):
    con = duckdb.connect(path)
    con.execute(
        "CREATE TABLE orders_sink (order_id VARCHAR PRIMARY KEY, status VARCHAR,"
        " tracking VARCHAR, update_time BIGINT, etl_created_at BIGINT,"
        " etl_updated_at BIGINT)"
    )
    con.close()


def _read_sink(path):
    con = duckdb.connect(path)
    rows = sorted(con.sql("SELECT * FROM orders_sink").fetchall())
    con.close()
    return rows


@pytest.fixture()
def dbpath(tmp_path):
    p = str(tmp_path / "wh.duckdb")
    _mk_sink(p)
    return p


def _expected(spark):
    """The in-lake resolve_upsert result on the same target/source —
    batch_time pinned to the batch's own etl_updated_at stamp so both
    paths bump the audit column identically."""
    t = spark.createDataFrame(TARGET, SCHEMA)
    s = spark.createDataFrame(SOURCE, SCHEMA)
    out = resolve_upsert(t, s, KEYS, ORDER, GUARDS, batch_time=F.lit(20),
                         drop_null_key_rows=True)
    return sorted(tuple(r) for r in out.collect())


def test_roundtrip_matches_resolve_upsert(spark, dbpath):
    jdbc_upsert_egress(spark.createDataFrame(TARGET, SCHEMA), "orders_sink",
                       KEYS, ORDER, GUARDS, _connect_fn(dbpath), num_writers=1)
    jdbc_upsert_egress(spark.createDataFrame(SOURCE, SCHEMA), "orders_sink",
                       KEYS, ORDER, GUARDS, _connect_fn(dbpath), num_writers=1)
    assert _read_sink(dbpath) == _expected(spark)


def test_replay_and_stale_batches_are_noops(spark, dbpath):
    src = spark.createDataFrame(SOURCE, SCHEMA)
    jdbc_upsert_egress(spark.createDataFrame(TARGET, SCHEMA), "orders_sink",
                       KEYS, ORDER, GUARDS, _connect_fn(dbpath), num_writers=1)
    for _ in range(2):  # replay the same batch (ST3)
        jdbc_upsert_egress(src, "orders_sink", KEYS, ORDER, GUARDS,
                           _connect_fn(dbpath), num_writers=1)
    after_replay = _read_sink(dbpath)
    assert after_replay == _expected(spark)
    # an entirely-stale batch (older order col, different guards) no-ops
    stale = spark.createDataFrame(
        [("T1", "REGRESS", "x", 1, 0, 0), ("T4", "REGRESS", "x", 1, 0, 0)], SCHEMA
    )
    jdbc_upsert_egress(stale, "orders_sink", KEYS, ORDER, GUARDS,
                       _connect_fn(dbpath), num_writers=1)
    assert _read_sink(dbpath) == after_replay


def test_foreach_batch_writer_applies_micro_batches(spark, dbpath):
    writer = foreach_batch_writer("orders_sink", KEYS, ORDER, GUARDS,
                                  _connect_fn(dbpath), num_writers=1)
    writer(spark.createDataFrame(TARGET, SCHEMA), 0)
    writer(spark.createDataFrame(SOURCE, SCHEMA), 1)
    writer(spark.createDataFrame(SOURCE, SCHEMA), 1)  # redelivery
    assert _read_sink(dbpath) == _expected(spark)


def test_statement_shapes():
    up = upsert_statement("t", COLS, KEYS, ORDER, GUARDS, dialect="sqlite")
    assert "ON CONFLICT (order_id)" in up and "IS NOT excluded.tracking" in up
    assert "etl_created_at = excluded" not in up  # carve-out
    merge = tsql_merge_statement("t", COLS, KEYS, ORDER, GUARDS)
    assert merge.startswith("MERGE t AS tgt") and "WHEN NOT MATCHED" in merge
    assert "tgt.etl_created_at = src" not in merge
