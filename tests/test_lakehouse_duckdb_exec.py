"""Executed guard-matrix twin for the lakehouse MERGE binding
(VERDICT r10 #8).

``tests/test_lakehouse_delta_exec.py`` is this repo's one perpetual
skip: no delta-spark in the sandbox, so the ``MERGE INTO`` branch never
EXECUTES here — its guard matrix was covered structurally and by Spark
parsing the WHEN-MATCHED predicate over a joined frame. This module
closes that gap on an engine that IS present: the same condition
builders emit a duckdb-executable statement pair
(``merge_as_duckdb_statements``: guarded ``UPDATE .. FROM`` + anti-join
``INSERT``, provably equivalent to the MERGE because updates never
touch keys), and duckdb executes them over the full match matrix —
insert / stale-keep / newer-update / null-order-update /
guard-tie-update / tie-identical-keep — with the end state compared
cell-for-cell against ``resolve_upsert`` run by Spark on the same data.
The delta test keeps its skip (count unchanged); the guard matrix now
runs somewhere real on every suite run.

Reference semantics under test: the guarded SQL MERGE of
src/loaders/misa_crm_loader.py:292-501 and
tiktok_shop_staging_loader.py:453-468.
"""

from __future__ import annotations

import duckdb
import pytest

from e_commerce_etl_pipeline_spark.operators.lakehouse import (
    merge_as_duckdb_statements,
    merge_into_statement,
)
from e_commerce_etl_pipeline_spark.operators.upsert import resolve_upsert

TARGET = [
    (1, "OPEN", 10),   # newer source -> update
    (2, "OPEN", 20),   # older source -> keep
    (3, "OPEN", 30),   # tie + guard change -> update
    (4, "OPEN", 40),   # tie + identical -> keep
    (5, None, None),   # null order in target -> update
]
SOURCE = [
    (1, "SHIPPED", 11),
    (2, "STALE", 19),
    (3, "SHIPPED", 30),
    (4, "OPEN", 40),
    (5, "SHIPPED", 1),
    (6, "NEW", 5),     # not matched -> insert
]
EXPECT = {
    (1, "SHIPPED", 11),
    (2, "OPEN", 20),
    (3, "SHIPPED", 30),
    (4, "OPEN", 40),
    (5, "SHIPPED", 1),
    (6, "NEW", 5),
}


def _run_duckdb(target_rows, source_rows, cols, keys, order_col, guard_cols):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tgt_tbl (order_id INT, status VARCHAR, update_time INT)"
    )
    con.execute(
        "CREATE TABLE src_tbl (order_id INT, status VARCHAR, update_time INT)"
    )
    con.executemany("INSERT INTO tgt_tbl VALUES (?,?,?)", target_rows)
    con.executemany("INSERT INTO src_tbl VALUES (?,?,?)", source_rows)
    for stmt in merge_as_duckdb_statements(
        "tgt_tbl", "src_tbl", cols, keys, order_col, guard_cols
    ):
        con.execute(stmt)
    rows = set(
        con.execute(
            "SELECT order_id, status, update_time FROM tgt_tbl"
        ).fetchall()
    )
    con.close()
    return rows


def test_duckdb_executes_full_guard_matrix():
    got = _run_duckdb(
        TARGET, SOURCE, ["order_id", "status", "update_time"],
        ["order_id"], "update_time", ["status"],
    )
    assert got == EXPECT


def test_duckdb_twin_matches_resolve_upsert(spark):
    """End-state equality with the DataFrame resolve on the same data —
    the executed statements and the parquet path share one contract."""
    schema = "order_id int, status string, update_time int"
    resolved = resolve_upsert(
        spark.createDataFrame(TARGET, schema),
        spark.createDataFrame(SOURCE, schema),
        ["order_id"], "update_time", guard_cols=["status"],
    )
    spark_rows = {
        (r["order_id"], r["status"], r["update_time"])
        for r in resolved.collect()
    }
    got = _run_duckdb(
        TARGET, SOURCE, ["order_id", "status", "update_time"],
        ["order_id"], "update_time", ["status"],
    )
    assert got == spark_rows == EXPECT


def test_duckdb_replay_idempotent():
    """ST3: applying the identical batch twice is a no-op — the guard
    must evaluate false for every re-delivered row."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tgt_tbl (order_id INT, status VARCHAR, update_time INT)"
    )
    con.execute(
        "CREATE TABLE src_tbl (order_id INT, status VARCHAR, update_time INT)"
    )
    con.executemany("INSERT INTO tgt_tbl VALUES (?,?,?)", TARGET)
    con.executemany("INSERT INTO src_tbl VALUES (?,?,?)", SOURCE)
    stmts = merge_as_duckdb_statements(
        "tgt_tbl", "src_tbl", ["order_id", "status", "update_time"],
        ["order_id"], "update_time", ["status"],
    )
    for _ in range(2):
        for stmt in stmts:
            con.execute(stmt)
    got = set(
        con.execute(
            "SELECT order_id, status, update_time FROM tgt_tbl"
        ).fetchall()
    )
    con.close()
    assert got == EXPECT


def test_duckdb_hostile_identifiers():
    """Reserved words and spaces in column names survive the duckdb
    quoting path, same as the Spark path's backtick test."""
    con = duckdb.connect()
    con.execute('CREATE TABLE "order" ("key" INT, "select" VARCHAR, "update time" INT)')
    con.execute('CREATE TABLE "src tbl" ("key" INT, "select" VARCHAR, "update time" INT)')
    con.execute('INSERT INTO "order" VALUES (1, \'OPEN\', 10)')
    con.execute('INSERT INTO "src tbl" VALUES (1, \'SHIPPED\', 11), (2, \'NEW\', 5)')
    for stmt in merge_as_duckdb_statements(
        "order", "src tbl", ["key", "select", "update time"],
        ["key"], "update time", ["select"],
    ):
        con.execute(stmt)
    got = set(con.execute('SELECT * FROM "order"').fetchall())
    con.close()
    assert got == {(1, "SHIPPED", 11), (2, "NEW", 5)}


def test_both_emissions_share_one_predicate():
    """The duckdb statements and the Spark MERGE must render the same
    logical guard: identical text after normalizing quoting, null-safe
    equality, and alias spelling — drift between the emissions would
    quietly fork the contract."""
    args = (["order_id", "status", "update_time"], ["order_id"],
            "update_time", ["status"])
    spark_stmt = merge_into_statement("t", "s", *args)
    upd, _ins = merge_as_duckdb_statements("t", "s", *args)
    s_guard = spark_stmt.split("WHEN MATCHED AND (")[1].split(
        ") THEN UPDATE"
    )[0]
    d_guard = upd.split(" AND (", 1)[1].rsplit(")", 1)[0]
    norm_s = s_guard.replace("`", "").replace("tgt.", "T.").replace(
        "src.", "S."
    ).replace(" <=> ", " IS NOT DISTINCT FROM ")
    norm_d = d_guard.replace('"', "").replace("t.", "T.").replace(
        "s.", "S."
    )
    assert norm_s == norm_d


def test_etl_audit_carveouts_execute():
    """etl_created_at keeps the target value on UPDATE; etl_updated_at
    takes the batch stamp — executed, not just emitted."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tgt_tbl (k INT, v VARCHAR, o INT, "
        "etl_created_at INT, etl_updated_at INT)"
    )
    con.execute(
        "CREATE TABLE src_tbl (k INT, v VARCHAR, o INT, "
        "etl_created_at INT, etl_updated_at INT)"
    )
    con.execute("INSERT INTO tgt_tbl VALUES (1, 'a', 10, 100, 100)")
    con.execute(
        "INSERT INTO src_tbl VALUES (1, 'b', 11, 999, 999), "
        "(2, 'c', 5, 888, 888)"
    )
    for stmt in merge_as_duckdb_statements(
        "tgt_tbl", "src_tbl",
        ["k", "v", "o", "etl_created_at", "etl_updated_at"],
        ["k"], "o", batch_time_expr="777",
    ):
        con.execute(stmt)
    got = set(con.execute("SELECT * FROM tgt_tbl").fetchall())
    con.close()
    assert got == {
        # updated row: created_at kept (100), updated_at stamped (777)
        (1, "b", 11, 100, 777),
        # inserted row: source values verbatim
        (2, "c", 5, 888, 888),
    }


def test_delta_skip_is_still_the_only_skip():
    """The executed twin must not replace the real-Delta exec test —
    it keeps skipping (with its reason) wherever delta-spark is absent."""
    import importlib.util

    if importlib.util.find_spec("delta") is not None:
        pytest.skip("delta-spark present: the real exec test runs")
    from tests import test_lakehouse_delta_exec as t

    assert t.pytestmark.args[0] is True  # skipif condition active


def test_duckdb_alias_literal_column_names_execute():
    """Columns whose NAMES contain the literal text 'tgt.'/'src.' must
    survive emission and execute (ADVICE r11 #1: the old post-hoc alias
    string-replace corrupted 'src.note' inside its quoted identifier
    into invalid SQL). The parts are now built with the quoted table
    names as the alias prefixes, so this is correct by construction."""
    con = duckdb.connect()
    con.execute('CREATE TABLE t (k INT, "src.note" VARCHAR, "tgt.flag" INT, o INT)')
    con.execute('CREATE TABLE s (k INT, "src.note" VARCHAR, "tgt.flag" INT, o INT)')
    con.execute("INSERT INTO t VALUES (1, 'old', 0, 10)")
    con.execute("INSERT INTO s VALUES (1, 'new', 1, 11), (2, 'ins', 2, 5)")
    for stmt in merge_as_duckdb_statements(
        "t", "s", ["k", "src.note", "tgt.flag", "o"],
        ["k"], "o", ["src.note"],
    ):
        con.execute(stmt)
    got = set(con.execute("SELECT * FROM t").fetchall())
    con.close()
    assert got == {(1, "new", 1, 11), (2, "ins", 2, 5)}
