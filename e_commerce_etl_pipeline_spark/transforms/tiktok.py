"""TikTok order flatten: nested order JSON -> one row per (order, line item).

Parity with src/transformers/tiktok_shop_transformer.py:47-366 (T1-T5 in
SURVEY.md §2.3), expressed as a single declarative select + explode_outer:

- order-level projection (T2): renamed scalars + payment.* struct fields +
  packages[0].id + JSON-stringified sub-objects (:146-261)
- recipient projection (T3): recipient_address.* + district_info JSON (:263-297)
- item projection (T4): line_items.* + whole-item JSON (:299-337)
- itemless orders emit one row with NULL item fields (T1/T5, :126-129) —
  exactly ``explode_outer``.

One narrow stage, no shuffle: at 100 TB this is a pure map over the source
partitions; Catalyst prunes unread struct fields down to the parquet/JSON
reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.coercions import (
    epoch_to_ts,
    json_stringify,
    safe_decimal,
)

# order-level epoch-second fields (tiktok_shop_transformer.py:167-185)
_EPOCH_S_FIELDS = [
    "create_time", "update_time", "paid_time", "rts_time",
    "cancel_order_sla_time", "collection_due_time", "shipping_due_time",
    "rts_sla_time", "tts_sla_time",
]
# recommended_shipping_time arrives in ms — the heuristic handles it (:431)

_ORDER_STR_FIELDS = [
    "status", "buyer_email", "buyer_message", "fulfillment_type",
    "payment_method_name", "warehouse_id", "user_id", "request_id", "shop_id",
    "region", "commerce_platform", "delivery_option_id", "delivery_option_name",
    "delivery_type", "order_type", "shipping_provider", "shipping_provider_id",
    "shipping_type", "tracking_number", "cancel_reason", "split_or_combine_tag",
]
_ORDER_BOOL_FIELDS = [
    "has_updated_recipient_address", "is_cod", "is_on_hold_order",
    "is_replacement_order", "is_sample_order", "is_buyer_request_cancel",
]
_PAYMENT_MONEY_FIELDS = [
    "original_shipping_fee", "original_total_product_price", "platform_discount",
    "seller_discount", "shipping_fee", "shipping_fee_cofunded_discount",
    "shipping_fee_platform_discount", "shipping_fee_seller_discount",
    "sub_total", "tax", "total_amount",
]
_RECIPIENT_FIELDS = [
    "address_detail", "address_line1", "address_line2", "address_line3",
    "address_line4", "first_name", "first_name_local_script", "last_name",
    "last_name_local_script", "name", "full_address", "phone_number",
    "postal_code", "region_code",
]
_ITEM_STR_FIELDS = [
    "product_id", "product_name", "sku_id", "sku_name", "sku_type", "sku_image",
    "seller_sku", "currency", "display_status", "package_id", "package_status",
    "shipping_provider_id", "shipping_provider_name", "tracking_number",
    "cancel_reason",
]
_ITEM_MONEY_FIELDS = [
    "original_price", "sale_price", "platform_discount", "seller_discount",
]


def transform_tiktok_orders(raw: DataFrame) -> DataFrame:
    """Nested raw orders -> flat order-item fact (~110 cols)."""
    order_cols = (
        [F.col("id").alias("order_id")]
        + [F.col(f) for f in _ORDER_STR_FIELDS]
        + [epoch_to_ts(f).alias(f) for f in _EPOCH_S_FIELDS]
        + [epoch_to_ts("recommended_shipping_time").alias("recommended_shipping_time")]
        + [F.col(f) for f in _ORDER_BOOL_FIELDS]
        + [F.col("fulfillment_priority_level")]
        + [F.col("payment.currency").alias("payment_currency")]
        + [
            safe_decimal(F.col(f"payment.{f}")).alias(f"payment_{f}")
            for f in _PAYMENT_MONEY_FIELDS
        ]
        + [F.try_element_at("packages", F.lit(1))["id"].alias("package_id_main")]
        + [
            json_stringify("payment").alias("payment_info_json"),
            json_stringify("recipient_address").alias("recipient_address_json"),
            json_stringify("line_items").alias("line_items_json"),
            json_stringify("packages").alias("packages_json"),
        ]
        + [
            F.col(f"recipient_address.{f}").alias(f"recipient_{f}")
            for f in _RECIPIENT_FIELDS
        ]
        + [json_stringify("recipient_address.district_info").alias("recipient_district_info_json")]
    )
    exploded = raw.select(*order_cols, F.explode_outer("line_items").alias("__item"))
    item_cols = (
        [F.col("__item.id").alias("item_id")]
        + [F.col(f"__item.{f}").alias(f"item_{f}") for f in _ITEM_STR_FIELDS]
        + [F.col("__item.quantity").alias("item_quantity"),
           F.col("__item.is_gift").alias("item_is_gift")]
        + [safe_decimal(F.col(f"__item.{f}")).alias(f"item_{f}") for f in _ITEM_MONEY_FIELDS]
        + [epoch_to_ts(F.col("__item.rts_time")).alias("item_rts_time"),
           json_stringify("__item").alias("item_sku_attributes")]
    )
    keep = [c for c in exploded.columns if c != "__item"]
    return exploded.select(*keep, *item_cols)


def validate_tiktok_flatten(raw: DataFrame, flat: DataFrame) -> dict:
    """A7 reconciliation invariants (tiktok_shop_transformer.py:451-491,
    misa_crm_transformer.py:771-846): distinct output orders == input orders;
    non-null item rows == sum of input array lengths."""
    agg = raw.agg(
        F.count("*").alias("orders_in"),
        F.sum(F.size(F.coalesce("line_items", F.array()))).alias("items_in"),
    ).collect()[0]
    out = flat.agg(
        F.countDistinct("order_id").alias("orders_out"),
        F.count("item_id").alias("items_out"),
    ).collect()[0]
    return {
        "orders_in": agg.orders_in,
        "orders_out": out.orders_out,
        "items_in": agg.items_in or 0,
        "items_out": out.items_out,
        "orders_match": agg.orders_in == out.orders_out,
        "items_match": (agg.items_in or 0) == out.items_out,
    }
