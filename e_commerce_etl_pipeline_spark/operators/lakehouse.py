"""Lakehouse MERGE binding: the guarded-upsert contract as an executable
``MERGE INTO`` for Delta/Iceberg-capable sessions.

The reference's production sink is an actual SQL MERGE (SQL Server,
misa_crm_loader.py:292-501, tiktok_shop_staging_loader.py:453-468). The
in-lake replication here is ``operators/upsert.py`` (bucketed parquet +
``resolve_upsert``); this module closes the remaining parity gap: when the
session has a v2 catalog that understands row-level MERGE (Delta Lake,
Iceberg, or Spark's own v2 sources), emit and execute the SAME contract as
one ``MERGE INTO`` statement and let the table format do copy-on-write /
merge-on-read — at 100 TB that is strictly better than rewriting touched
buckets ourselves, because the format maintains file-level statistics and
deletion vectors we'd otherwise rebuild.

Contract parity with ``resolve_upsert`` (the single source of truth for
semantics — its pytest + oracle coverage is what this statement is tested
against):

- match on null-safe key equality (``<=>``), like the full-outer join;
- UPDATE iff target order_col is NULL, older than source, or ties while
  any guard column differs (null-safely);
- ``etl_created_at`` keeps the target value on UPDATE (carve-out);
- ``etl_updated_at`` takes the batch stamp on UPDATE, source value on
  INSERT;
- INSERT when not matched;
- the source is deduped keep-newest per key first (MERGE requires a
  unique source key; the reference dedups pre-MERGE the same way, D1).

Sandbox note: neither delta-spark nor an Iceberg catalog ships in this
container, so ``lakehouse_upsert`` falls back to the parquet-bucket
writer when no MERGE-capable catalog is detected. The emitted statement
is tested two ways without Delta: structurally, and semantically — the
WHEN-MATCHED predicate is parsed and evaluated by Spark itself over a
joined frame and must pick exactly the rows ``resolve_upsert`` updates.
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from .dedup import drop_null_keys, keep_newest

ETL_CREATED = "etl_created_at"
ETL_UPDATED = "etl_updated_at"


def _q(name: str) -> str:
    """Backtick-quote one identifier (column, alias). Embedded backticks
    double, per Spark's quoting rule — generated SQL must survive
    reserved words, spaces, and hyphens, exactly like the parquet path
    does (r4 finding #3)."""
    return "`" + name.replace("`", "``") + "`"


def _q_table(name: str) -> str:
    """Quote a possibly multi-part table name (catalog.schema.table):
    each dot-separated part is quoted on its own."""
    return ".".join(_q(p) for p in name.split("."))


def merge_matched_condition(
    order_col: str, guard_cols: Sequence[str] = ()
) -> str:
    """The WHEN MATCHED guard as a Spark SQL boolean expression over
    ``tgt``/``src`` aliases. Mirrors resolve_upsert's ``update_applies``:
    stale target, or same version with a changed guard column."""
    oc = _q(order_col)
    stale = f"tgt.{oc} IS NULL OR tgt.{oc} < src.{oc}"
    if not guard_cols:
        return stale
    diffs = " OR ".join(f"NOT (tgt.{_q(g)} <=> src.{_q(g)})" for g in guard_cols)
    return (
        f"{stale} OR (tgt.{oc} <=> src.{oc} AND ({diffs}))"
    )


def merge_into_statement(
    target_table: str,
    source_view: str,
    cols: Sequence[str],
    keys: Sequence[str],
    order_col: str,
    guard_cols: Sequence[str] = (),
    batch_time_expr: str = "current_timestamp()",
) -> str:
    """Emit the Spark-dialect ``MERGE INTO`` equivalent of
    ``resolve_upsert`` for a Delta/Iceberg target table. All identifiers
    are backtick-quoted; raises ValueError when no updatable column
    exists (every column a key or the created_at carve-out) rather than
    emitting a malformed empty UPDATE SET."""
    on = " AND ".join(f"tgt.{_q(k)} <=> src.{_q(k)}" for k in keys)
    guard = merge_matched_condition(order_col, guard_cols)
    sets = []
    for c in cols:
        if c in keys or c == ETL_CREATED:
            continue  # keys immutable under match; created_at carve-out
        if c == ETL_UPDATED:
            sets.append(f"tgt.{_q(c)} = {batch_time_expr}")
        else:
            sets.append(f"tgt.{_q(c)} = src.{_q(c)}")
    if not sets:
        raise ValueError(
            "MERGE has no updatable columns (every column is a key or "
            f"{ETL_CREATED}); an insert-only load should use append, not MERGE"
        )
    col_list = ", ".join(_q(c) for c in cols)
    src_vals = ", ".join(f"src.{_q(c)}" for c in cols)
    return (
        f"MERGE INTO {_q_table(target_table)} AS tgt "
        f"USING {_q_table(source_view)} AS src "
        f"ON {on} "
        f"WHEN MATCHED AND ({guard}) THEN UPDATE SET {', '.join(sets)} "
        f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({src_vals})"
    )


def merge_capable(spark: SparkSession) -> bool:
    """True when the session is configured with a MERGE-capable v2
    extension (Delta/Iceberg). Detection is by session extension config —
    the formats register their SQL rules there; a plain parquet session
    has none and must take the bucketed-parquet path."""
    try:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
    except Exception:
        return False
    return "DeltaSparkSessionExtension" in ext or "IcebergSparkSessionExtensions" in ext


def lakehouse_upsert(
    spark: SparkSession,
    source: DataFrame,
    target_table: str,
    keys: Sequence[str],
    order_col: str,
    guard_cols: Sequence[str] = (),
    drop_null_key_rows: bool = False,
    fallback_path: str | None = None,
    num_buckets: int = 64,
    tiebreak: Sequence[str] = (),
) -> str:
    """Apply a guarded keyed-upsert batch through the best available
    backend. Returns the backend used: ``"merge"`` or ``"parquet"``.

    ``target_table`` is a catalog table name for the MERGE path;
    ``fallback_path`` is the bucketed-parquet table directory used when
    the session has no MERGE-capable catalog (this container).

    ``tiebreak`` completes the source dedup's total order exactly as in
    ``resolve_upsert``: without it, a batch holding two rows with equal
    (key, order_col) but different guard values picks a nondeterministic
    survivor and replay idempotence (ST3) fails in the guard-tie case —
    on BOTH backends, since the MERGE path dedups the source the same way.
    """
    batch = keep_newest(source, keys, order_col, tiebreak)
    if drop_null_key_rows:
        batch = drop_null_keys(batch, keys)

    if merge_capable(spark):
        view = f"__merge_src_{uuid.uuid4().hex}"
        batch.createOrReplaceTempView(view)
        try:
            stmt = merge_into_statement(
                target_table, view, spark.table(target_table).columns,
                keys, order_col, guard_cols,
            )
            spark.sql(stmt)
        finally:
            spark.catalog.dropTempView(view)
        return "merge"

    if fallback_path is None:
        raise ValueError(
            "session has no MERGE-capable catalog and no fallback_path given"
        )
    from .upsert import upsert

    upsert(spark, batch, fallback_path, keys, order_col, guard_cols,
           num_buckets=num_buckets, drop_null_key_rows=drop_null_key_rows,
           tiebreak=tiebreak)
    return "parquet"
