"""MISA CRM payload schemas.

MISA sale orders have a *dynamic* schema in the reference — a two-pass key
union across the batch (src/transformers/misa_crm_transformer.py:270-299).
In Spark that's schema inference (spark.read.json) or, for a stable core,
this declared subset; unknown extra keys are tolerated via
``unionByName(allowMissingColumns=True)`` in the transform.

The minimal item-mapping key set is the reference's fallback list
(misa_crm_transformer.py:286-299).
"""

from pyspark.sql import types as T

_s = T.StringType()

FALLBACK_ITEM_KEYS = [
    "id", "product_code", "unit", "price", "amount", "total",
    "tax_percent", "discount_percent", "stock_name", "description",
]

ITEM_MAPPING_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("product_code", _s),
    T.StructField("unit", _s),
    T.StructField("price", T.DoubleType()),
    T.StructField("amount", T.DoubleType()),
    T.StructField("total", T.DoubleType()),
    T.StructField("tax_percent", T.DoubleType()),
    T.StructField("discount_percent", T.DoubleType()),
    T.StructField("stock_name", _s),
    T.StructField("description", _s),
])

MISA_SALE_ORDER_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("sale_order_no", _s),
    T.StructField("sale_order_name", _s),
    T.StructField("sale_order_date", _s),       # ISO-8601 w/ offset
    T.StructField("status", _s),
    T.StructField("total_amount", T.DoubleType()),
    T.StructField("customer_id", T.LongType()),
    T.StructField("customer_name", _s),
    T.StructField("created_date", _s),
    T.StructField("modified_date", _s),
    T.StructField("sale_order_product_mappings", T.ArrayType(ITEM_MAPPING_SCHEMA)),
])
