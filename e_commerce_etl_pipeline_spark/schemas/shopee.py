"""Declared StructType for the raw Shopee order payload.

Field inventory per src/transformers/shopee_orders_transformer.py:167-365
and docs/debug_get_order_detail.json (FIXTURES.md §2). Epoch fields are
seconds with the 0=>NULL rule. ``product_location_id`` may arrive as a
list OR a scalar string — declared as array; the string case is normalized
at parse time by the source adapter (list-or-scalar test, :294-314).
"""

from pyspark.sql import types as T

_s = T.StringType()
_l = T.LongType()
_i = T.IntegerType()
_d = T.DoubleType()
_b = T.BooleanType()

RECIPIENT_SCHEMA = T.StructType([
    T.StructField(f, _s)
    for f in ["name", "phone", "town", "district", "city", "state", "region",
              "zipcode", "full_address"]
])

ITEM_SCHEMA = T.StructType([
    T.StructField("order_item_id", _l),
    T.StructField("item_id", _l),
    T.StructField("item_name", _s),
    T.StructField("item_sku", _s),
    T.StructField("model_id", _l),
    T.StructField("model_name", _s),
    T.StructField("model_sku", _s),
    T.StructField("model_quantity_purchased", _i),
    T.StructField("model_original_price", _d),
    T.StructField("model_discounted_price", _d),
    T.StructField("wholesale", _b),
    T.StructField("weight", _d),
    T.StructField("add_on_deal", _b),
    T.StructField("main_item", _b),
    T.StructField("add_on_deal_id", _l),
    T.StructField("promotion_type", _s),
    T.StructField("promotion_id", _l),
    T.StructField("promotion_group_id", _l),
    T.StructField("is_prescription_item", _b),
    T.StructField("is_b2c_owned_item", _b),
    T.StructField("consultation_id", _s),
    T.StructField("image_info", T.StructType([T.StructField("image_url", _s)])),
    T.StructField("product_location_id", T.ArrayType(_s)),
    T.StructField("hot_listing_item", _b),
])

PACKAGE_ITEM_SCHEMA = T.StructType([
    T.StructField("order_item_id", _l),
    T.StructField("item_id", _l),
    T.StructField("model_id", _l),
    T.StructField("model_quantity", _i),
    T.StructField("promotion_group_id", _l),
    T.StructField("product_location_id", _s),
    T.StructField("parcel_chargeable_weight", _i),
])

PACKAGE_SCHEMA = T.StructType([
    T.StructField("package_number", _s),
    T.StructField("logistics_status", _s),
    T.StructField("logistics_channel_id", _l),
    T.StructField("shipping_carrier", _s),
    T.StructField("allow_self_design_awb", _b),
    T.StructField("parcel_chargeable_weight_gram", _i),
    T.StructField("group_shipment_id", _l),
    T.StructField("sorting_group", _s),
    T.StructField("item_list", T.ArrayType(PACKAGE_ITEM_SCHEMA)),
])

INVOICE_SCHEMA = T.StructType([
    T.StructField("number", _s),
    T.StructField("series_number", _s),
    T.StructField("access_key", _s),
    T.StructField("issue_date", _l),
    T.StructField("total_value", _d),
    T.StructField("products_total_value", _d),
    T.StructField("tax_code", _s),
])

_EPOCH_FIELDS = [
    "create_time", "update_time", "ship_by_date", "note_update_time", "pay_time",
    "pickup_done_time", "edt_from", "edt_to", "return_request_due_date",
]

SHOPEE_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_sn", _s, False),
        T.StructField("region", _s),
        T.StructField("currency", _s),
        T.StructField("cod", _b),
        T.StructField("total_amount", _d),
        T.StructField("order_status", _s),
        T.StructField("shipping_carrier", _s),
        T.StructField("payment_method", _s),
        T.StructField("estimated_shipping_fee", _d),
        T.StructField("message_to_seller", _s),
        T.StructField("note", _s),
    ]
    + [T.StructField(f, _l) for f in _EPOCH_FIELDS]
    + [
        T.StructField("days_to_ship", _i),
        T.StructField("buyer_user_id", _l),
        T.StructField("buyer_username", _s),
        T.StructField("actual_shipping_fee", _d),
        T.StructField("actual_shipping_fee_confirmed", _b),
        T.StructField("goods_to_declare", _b),
        T.StructField("dropshipper", _s),
        T.StructField("dropshipper_phone", _s),
        T.StructField("split_up", _b),
        T.StructField("buyer_cancel_reason", _s),
        T.StructField("cancel_by", _s),
        T.StructField("cancel_reason", _s),
        T.StructField("buyer_cpf_id", _s),
        T.StructField("fulfillment_flag", _s),
        T.StructField("reverse_shipping_fee", _d),
        T.StructField("order_chargeable_weight_gram", _i),
        T.StructField("booking_sn", _s),
        T.StructField("advance_package", _b),
        T.StructField("is_buyer_shop_collection", _b),
        T.StructField("hot_listing_order", _b),
        T.StructField("recipient_address", RECIPIENT_SCHEMA),
        T.StructField("item_list", T.ArrayType(ITEM_SCHEMA)),
        T.StructField("package_list", T.ArrayType(PACKAGE_SCHEMA)),
        T.StructField("invoice_data", INVOICE_SCHEMA),
    ]
)

EPOCH_FIELDS = _EPOCH_FIELDS
