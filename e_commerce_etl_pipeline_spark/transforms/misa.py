"""MISA sale-order flatten (T8) + entity transforms (T10).

Parity with src/transformers/misa_crm_transformer.py:260-369: one row per
``sale_order_product_mappings[]`` element, ``order_``/``item_`` prefixed
columns, itemless orders emit one NULL-item row with
``total_items_in_order=0`` / ``has_multiple_items=False`` (:359-366).

The reference's two-pass dynamic key union (:270-299) maps to schema
inference + ``unionByName(allowMissingColumns=True)``; here the prefix
rename is derived from whatever columns the parsed DataFrame actually has,
so unknown keys flow through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.coercions import iso_to_ts, safe_bool_default_false
from ..operators.flatten import explode_outer_prefixed

ARRAY_COL = "sale_order_product_mappings"

# ISO-datetime order columns coerced at transform (misa_crm_transformer.py:172-181)
_ORDER_DATE_COLS = {"sale_order_date", "created_date", "modified_date"}


def transform_misa_sale_orders(raw: DataFrame) -> DataFrame:
    order_cols = []
    for c in raw.columns:
        if c == ARRAY_COL:
            continue
        if c in _ORDER_DATE_COLS:
            order_cols.append(iso_to_ts(c).alias(f"order_{c}"))
        else:
            order_cols.append(F.col(c).alias(f"order_{c}"))
    flat = explode_outer_prefixed(raw, ARRAY_COL, order_cols, item_prefix="item_")
    return flat


def transform_misa_entity(raw: DataFrame, date_cols: tuple[str, ...] = (),
                          bool_cols: tuple[str, ...] = ()) -> DataFrame:
    """T10 generic entity transform: ISO date coercion + the MISA
    NaN->False bool rule (misa_crm_transformer.py:113-204,523-678)."""
    out = raw
    for c in date_cols:
        if c in out.columns:
            out = out.withColumn(c, iso_to_ts(c))
    for c in bool_cols:
        if c in out.columns:
            out = out.withColumn(c, safe_bool_default_false(c))
    return out


def validate_misa_flatten(raw: DataFrame, flat: DataFrame) -> dict:
    """Reference validator parity (misa_crm_transformer.py:771-846)."""
    a = raw.agg(
        F.count("*").alias("orders_in"),
        F.sum(F.size(F.coalesce(ARRAY_COL, F.array()))).alias("items_in"),
        F.sum((F.size(F.coalesce(ARRAY_COL, F.array())) > 1).cast("int")).alias("multi_in"),
        F.sum((F.size(F.coalesce(ARRAY_COL, F.array())) == 0).cast("int")).alias("empty_in"),
    ).collect()[0]
    b = flat.agg(
        F.countDistinct("order_id").alias("orders_out"),
        F.count("item_id").alias("items_out"),
    ).collect()[0]
    return {
        "orders_match": a.orders_in == b.orders_out,
        "items_match": (a.items_in or 0) == b.items_out,
        "multi_item_orders": a.multi_in,
        "itemless_orders": a.empty_in,
    }
