"""Warehouse (JDBC-shaped) egress: bind the engine's guarded MERGE
semantics to an external SQL store.

The reference's actual sink is SQL Server: batched T-SQL ``MERGE ...
WHEN MATCHED AND (target.update_time < source.update_time OR guard
changed) THEN UPDATE ... WHEN NOT MATCHED THEN INSERT`` executed over
pyodbc (tiktok_shop_staging_loader.py:339-480, misa_crm_loader.py:
292-501). The parquet-bucket upsert writer replicates those semantics
in-lake; this module is the OUT-OF-LAKE half: the same guarded-upsert
contract executed against any DB-API target, so a user of the reference
can point the engine at their warehouse and keep the MERGE behavior.

Shape (idiomatic Spark JDBC sink):
- ``jdbc_upsert_egress(df, ...)`` — dedups the batch keep-newest by key
  (the reference's D1 pre-MERGE dedup), then ``foreachPartition``:
  every executor opens its own connection and executes batched
  ``INSERT ... ON CONFLICT (keys) DO UPDATE ... WHERE <guard>``
  statements. No driver collect; per-partition batching mirrors the
  reference's parameter-limit batches (MERGE batch 20/40/100).
- ``foreach_batch_writer(...)`` — the same egress wrapped as a
  ``foreachBatch(batch_df, batch_id)`` callable for Structured
  Streaming incremental loads (ST1-ST3: replays are no-ops because the
  guard never lets an older row overwrite a newer one).

Guard parity with ``resolve_upsert`` (operators/upsert.py):
- insert when the key is absent;
- update when target.order_col < source.order_col, or on order_col tie
  when any guard column differs (the OR-of-changed-columns guard);
- ``etl_created_at`` keeps the target's value on update (carve-out);
  ``etl_updated_at`` takes the batch's stamp.

Dialects: ``duckdb``/``postgres`` use IS DISTINCT FROM; ``sqlite`` uses
its ``IS NOT`` spelling. SQL Server needs MERGE instead of ON CONFLICT —
``tsql_merge_statement`` emits the reference-equivalent T-SQL for
documentation/ops use. NULL natural keys don't participate in SQL unique
conflicts (NULLs compare distinct), so rows with NULL keys are dropped
before egress — the MISA loader does exactly this (D5,
misa_crm_loader.py:161-171).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame

from .dedup import drop_null_keys, keep_newest

_DISTINCT_OP = {
    "duckdb": "IS DISTINCT FROM",
    "postgres": "IS DISTINCT FROM",
    "sqlite": "IS NOT",
}


def upsert_statement(
    table: str,
    cols: Sequence[str],
    keys: Sequence[str],
    order_col: str,
    guard_cols: Sequence[str] = (),
    dialect: str = "duckdb",
    created_col: str = "etl_created_at",
) -> str:
    """Parameterized guarded-upsert statement (one placeholder per col)."""
    op = _DISTINCT_OP[dialect]
    placeholders = ", ".join("?" for _ in cols)
    set_cols = [c for c in cols if c not in keys and c != created_col]
    sets = ", ".join(f"{c} = excluded.{c}" for c in set_cols)
    guard = f"tgt.{order_col} IS NULL OR tgt.{order_col} < excluded.{order_col}"
    if guard_cols:
        diffs = " OR ".join(f"tgt.{g} {op} excluded.{g}" for g in guard_cols)
        guard += f" OR (tgt.{order_col} = excluded.{order_col} AND ({diffs}))"
    return (
        f"INSERT INTO {table} AS tgt ({', '.join(cols)}) VALUES ({placeholders}) "
        f"ON CONFLICT ({', '.join(keys)}) DO UPDATE SET {sets} "
        f"WHERE {guard}"
    )


def tsql_merge_statement(
    table: str,
    cols: Sequence[str],
    keys: Sequence[str],
    order_col: str,
    guard_cols: Sequence[str] = (),
    created_col: str = "etl_created_at",
) -> str:
    """The same contract as SQL Server T-SQL MERGE (reference parity:
    tiktok_shop_staging_loader.py:453-468). Emitted for deployments whose
    warehouse lacks ON CONFLICT; not executed in this container."""
    src_row = ", ".join("?" for _ in cols)
    on = " AND ".join(f"tgt.{k} = src.{k}" for k in keys)
    set_cols = [c for c in cols if c not in keys and c != created_col]
    sets = ", ".join(f"tgt.{c} = src.{c}" for c in set_cols)
    guard = f"tgt.{order_col} < src.{order_col}"
    for g in guard_cols:
        guard += (f" OR (tgt.{order_col} = src.{order_col}"
                  f" AND ((tgt.{g} <> src.{g}) OR (tgt.{g} IS NULL) <> (src.{g} IS NULL)))")
    return (
        f"MERGE {table} AS tgt USING (VALUES ({src_row})) AS src ({', '.join(cols)}) "
        f"ON {on} "
        f"WHEN MATCHED AND ({guard}) THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({', '.join(cols)}) "
        f"VALUES ({', '.join('src.' + c for c in cols)});"
    )


def _write_partition(
    rows: Iterator,
    connect_fn: Callable,
    statement: str,
    cols: Sequence[str],
    batch_size: int,
) -> None:
    con = connect_fn()
    try:
        batch = []
        for row in rows:
            batch.append(tuple(row[c] for c in cols))
            if len(batch) >= batch_size:
                con.executemany(statement, batch)
                batch = []
        if batch:
            con.executemany(statement, batch)
        if hasattr(con, "commit"):
            con.commit()
    finally:
        con.close()


def jdbc_upsert_egress(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    order_col: str,
    guard_cols: Sequence[str] = (),
    connect_fn: Callable | None = None,
    dialect: str = "duckdb",
    batch_size: int = 500,
    num_writers: int | None = None,
) -> None:
    """Apply a guarded keyed-upsert batch to an external SQL table.

    ``connect_fn`` runs ON THE EXECUTOR (one connection per partition) —
    pass a picklable zero-arg factory (DB-API for duckdb/sqlite/odbc).
    The target table must exist with a PRIMARY KEY/UNIQUE constraint on
    ``keys``. ``num_writers`` caps write parallelism (coalesce) for
    targets with connection or single-writer limits — embedded engines
    (duckdb/sqlite files) need 1; server warehouses take partition-
    parallel writers, which is the scale path."""
    statement = upsert_statement(table, df.columns, keys, order_col,
                                 guard_cols, dialect)
    cols = list(df.columns)
    out = drop_null_keys(keep_newest(df, keys, order_col), keys)
    if num_writers is not None:
        out = out.coalesce(num_writers)
    out.foreachPartition(
        lambda rows: _write_partition(rows, connect_fn, statement, cols, batch_size)
    )


def foreach_batch_writer(
    table: str,
    keys: Sequence[str],
    order_col: str,
    guard_cols: Sequence[str] = (),
    connect_fn: Callable | None = None,
    dialect: str = "duckdb",
    batch_size: int = 500,
    num_writers: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Structured-Streaming adapter: ``writeStream.foreachBatch(this)``.
    Replay-safe by construction — re-delivered micro-batches hit the
    order/guard WHERE clause and no-op (ST3/ST6)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        jdbc_upsert_egress(batch_df, table, keys, order_col, guard_cols,
                           connect_fn, dialect, batch_size, num_writers)

    return write
