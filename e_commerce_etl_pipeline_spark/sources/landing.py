"""JSONL landing path, end-to-end and oracle-checked.

``land_jsonl`` (api_adapter) is the large-backfill landing protocol —
the scalable replacement for the reference's Parquet/XCom handoff
(dags/full_load_etl_dag.py:233-251): extractors stream newline-JSON to
storage, Spark reads it back splittable with a DECLARED schema (no
inference scan). This module gives that path a correctness gate: a
deterministic synthetic order corpus is landed via the real
``land_jsonl`` writer, read back with ``spark.read.schema(...).json``,
flattened with the engine's coercion/array kernels, and compared against
a DuckDB ``read_json`` oracle over the SAME landed file.

The corpus is a pure function of nothing (fixed generator), so the
landed file is byte-stable: whichever engine reads first, both see
identical bytes. ``ensure_landed`` writes atomically (tmp + rename) on
every call — cheap at this size, race-free, and self-healing if the tmp
file was deleted.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .api_adapter import land_jsonl

LANDING_DIR = os.path.join(tempfile.gettempdir(), "spark_graft_landing")
LANDING_PATH = os.path.join(LANDING_DIR, "api_orders.jsonl")

N_ORDERS = 240
_STATUSES = ["CREATED", "SHIPPED", "DELIVERED", "CANCELLED"]

LANDED_ORDER_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("create_time", T.LongType()),
    T.StructField("update_time", T.LongType()),
    T.StructField("amount", T.StringType()),   # decimal-as-string (F2 parity)
    T.StructField("line_items", T.ArrayType(T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("price", T.StringType()),
    ]))),
])


def synthetic_order_batches(n: int = N_ORDERS, page: int = 50):
    """Deterministic nested-order pages (the shape S1 yields): every 4th
    order is itemless (the T1/T5 explode_outer edge), amounts/prices are
    decimal strings with cents, epochs are mixed stale/fresh."""
    batch = []
    for i in range(n):
        items = [
            {"id": f"L{i}-{j}", "quantity": (i + j) % 5 + 1,
             "price": f"{(i * 7 + j * 3) % 400}.{i % 100:02d}"}
            for j in range(i % 4)
        ]
        batch.append({
            "id": f"T{i:04d}",
            "status": _STATUSES[i % len(_STATUSES)],
            "create_time": 1_700_000_000 + i * 60,
            "update_time": 1_700_000_000 + i * 60 + (i % 7) * 3600,
            "amount": f"{(i * 13) % 900}.{(i * 37) % 100:02d}",
            "line_items": items,
        })
        if len(batch) == page:
            yield batch
            batch = []
    if batch:
        yield batch


def ensure_landed(path: str = LANDING_PATH) -> str:
    """Land the synthetic corpus atomically; returns the path."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    land_jsonl(synthetic_order_batches(), tmp)
    os.replace(tmp, path)
    return path


def jsonl_landing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the landed JSONL with the declared schema and aggregate per
    status: order counts, array-derived item stats (A6 semantics — no
    shuffle, computed from array length), coerced decimal totals. The
    DuckDB oracle reads the SAME file via read_json, so this green row
    certifies the whole land -> schema-read -> coerce -> aggregate path.
    (sf_dir is unused: the landed corpus is fixed — the point is the
    landing protocol, not the TPC-H tables.)"""
    path = ensure_landed()
    df = spark.read.schema(LANDED_ORDER_SCHEMA).json(path)
    qty_sum = F.aggregate(
        F.coalesce("line_items", F.array()),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x["quantity"],
    )
    per_order = df.select(
        "id", "status", "update_time",
        F.size(F.coalesce("line_items", F.array())).alias("n_items"),
        qty_sum.alias("qty"),
        F.col("amount").cast("decimal(18,2)").alias("amount_dec"),
    )
    return per_order.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("n_items") == 0, 1).otherwise(0)).cast("long").alias("itemless_orders"),
        F.sum("n_items").cast("long").alias("total_items"),
        F.sum("qty").cast("long").alias("total_qty"),
        F.sum("amount_dec").cast("double").alias("total_amount"),
        F.max("update_time").alias("max_update_time"),
    )


JSONL_LANDING_SQL = f"""
WITH landed AS (
  SELECT * FROM read_json('{LANDING_PATH}', format='newline_delimited',
    columns={{'id': 'VARCHAR', 'status': 'VARCHAR', 'create_time': 'BIGINT',
             'update_time': 'BIGINT', 'amount': 'VARCHAR',
             'line_items': 'STRUCT(id VARCHAR, quantity BIGINT, price VARCHAR)[]'}})
), per_order AS (
  SELECT status, update_time,
         len(COALESCE(line_items, [])) AS n_items,
         COALESCE(list_sum(list_transform(line_items, x -> x.quantity)), 0) AS qty,
         CAST(amount AS DECIMAL(18,2)) AS amount_dec
  FROM landed
)
SELECT status, COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN n_items = 0 THEN 1 ELSE 0 END) AS BIGINT) AS itemless_orders,
       CAST(SUM(n_items) AS BIGINT) AS total_items,
       CAST(SUM(qty) AS BIGINT) AS total_qty,
       CAST(SUM(amount_dec) AS DOUBLE) AS total_amount,
       MAX(update_time) AS max_update_time
FROM per_order GROUP BY status
"""

LANDING_QUERIES = {
    "jsonl_landing_stats": (jsonl_landing_stats, JSONL_LANDING_SQL),
}
