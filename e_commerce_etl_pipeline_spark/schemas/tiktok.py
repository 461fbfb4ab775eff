"""Declared StructType for the raw TikTok order payload.

Field inventory from the reference transformer's reads
(src/transformers/tiktok_shop_transformer.py:146-337) and FIXTURES.md §1.
Times arrive as epoch seconds (``recommended_shipping_time`` may be epoch
milliseconds — the ms/s heuristic's home case). Money arrives as
decimal-as-string or number; we declare string and coerce (safe_decimal).
"""

from pyspark.sql import types as T

_s = T.StringType()
_l = T.LongType()
_b = T.BooleanType()

PAYMENT_FIELDS = [
    "currency", "original_shipping_fee", "original_total_product_price",
    "platform_discount", "seller_discount", "shipping_fee",
    "shipping_fee_cofunded_discount", "shipping_fee_platform_discount",
    "shipping_fee_seller_discount", "sub_total", "tax", "total_amount",
]

PAYMENT_SCHEMA = T.StructType(
    [T.StructField("currency", _s)]
    + [T.StructField(f, _s) for f in PAYMENT_FIELDS if f != "currency"]
)

DISTRICT_INFO_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("address_level", _s),
    T.StructField("address_level_name", _s),
    T.StructField("address_name", _s),
]))

RECIPIENT_SCHEMA = T.StructType([
    T.StructField(f, _s) for f in [
        "address_detail", "address_line1", "address_line2", "address_line3",
        "address_line4", "first_name", "first_name_local_script", "last_name",
        "last_name_local_script", "name", "full_address", "phone_number",
        "postal_code", "region_code",
    ]
] + [T.StructField("district_info", DISTRICT_INFO_SCHEMA)])

LINE_ITEM_SCHEMA = T.StructType([
    T.StructField("id", _s),
    T.StructField("product_id", _s),
    T.StructField("product_name", _s),
    T.StructField("sku_id", _s),
    T.StructField("sku_name", _s),
    T.StructField("sku_type", _s),
    T.StructField("sku_image", _s),
    T.StructField("seller_sku", _s),
    T.StructField("quantity", T.IntegerType()),
    T.StructField("currency", _s),
    T.StructField("display_status", _s),
    T.StructField("is_gift", _b),
    T.StructField("original_price", _s),
    T.StructField("sale_price", _s),
    T.StructField("platform_discount", _s),
    T.StructField("seller_discount", _s),
    T.StructField("package_id", _s),
    T.StructField("package_status", _s),
    T.StructField("shipping_provider_id", _s),
    T.StructField("shipping_provider_name", _s),
    T.StructField("tracking_number", _s),
    T.StructField("cancel_reason", _s),
    T.StructField("rts_time", _l),
])

TIKTOK_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("id", _s, False),
        T.StructField("status", _s),
        T.StructField("buyer_email", _s),
        T.StructField("buyer_message", _s),
        T.StructField("create_time", _l),
        T.StructField("update_time", _l),
        T.StructField("paid_time", _l),
        T.StructField("rts_time", _l),
        T.StructField("cancel_order_sla_time", _l),
        T.StructField("collection_due_time", _l),
        T.StructField("shipping_due_time", _l),
        T.StructField("rts_sla_time", _l),
        T.StructField("tts_sla_time", _l),
        T.StructField("recommended_shipping_time", _l),  # epoch ms!
        T.StructField("fulfillment_type", _s),
        T.StructField("payment_method_name", _s),
        T.StructField("warehouse_id", _s),
        T.StructField("user_id", _s),
        T.StructField("request_id", _s),
        T.StructField("shop_id", _s),
        T.StructField("region", _s),
        T.StructField("commerce_platform", _s),
        T.StructField("delivery_option_id", _s),
        T.StructField("delivery_option_name", _s),
        T.StructField("delivery_type", _s),
        T.StructField("fulfillment_priority_level", T.IntegerType()),
        T.StructField("has_updated_recipient_address", _b),
        T.StructField("is_cod", _b),
        T.StructField("is_on_hold_order", _b),
        T.StructField("is_replacement_order", _b),
        T.StructField("is_sample_order", _b),
        T.StructField("order_type", _s),
        T.StructField("shipping_provider", _s),
        T.StructField("shipping_provider_id", _s),
        T.StructField("shipping_type", _s),
        T.StructField("tracking_number", _s),
        T.StructField("is_buyer_request_cancel", _b),
        T.StructField("cancel_reason", _s),
        T.StructField("split_or_combine_tag", _s),
        T.StructField("payment", PAYMENT_SCHEMA),
        T.StructField("recipient_address", RECIPIENT_SCHEMA),
        T.StructField("line_items", T.ArrayType(LINE_ITEM_SCHEMA)),
        T.StructField("packages", T.ArrayType(T.StructType([T.StructField("id", _s)]))),
    ]
)
