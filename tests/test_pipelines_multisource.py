"""End-to-end pipelines for the Shopee 6-table fan-out and the MISA
flatten (null-key-drop parity) through full_load + incremental."""

import json

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.operators.upsert import read_upsert_table
from e_commerce_etl_pipeline_spark.pipelines import (
    full_load_pipeline,
    incremental_pipeline,
)
from e_commerce_etl_pipeline_spark.pipelines.etl import SourcePipeline
from e_commerce_etl_pipeline_spark.schemas import (
    MISA_SALE_ORDER_SCHEMA,
    SHOPEE_ORDER_SCHEMA,
)
from e_commerce_etl_pipeline_spark.transforms import (
    transform_misa_sale_orders,
    transform_shopee_orders,
)

SHOPEE_ORDERS = [
    {
        "order_sn": "SP1", "order_status": "SHIPPED", "update_time": 1000,
        "create_time": 900, "total_amount": 10.0,
        "recipient_address": {"name": "X", "city": "Hanoi"},
        "item_list": [
            {"order_item_id": 1, "item_id": 11, "model_id": 5,
             "product_location_id": ["L1"]},
        ],
        "package_list": [
            {"package_number": "P1",
             "item_list": [{"order_item_id": 1, "item_id": 11, "model_id": 5}]},
        ],
    },
    {"order_sn": "SP2", "order_status": "UNPAID", "update_time": 1100,
     "create_time": 1000, "total_amount": 5.0},
]


def _shopee_pipe(spark, orders):
    def extract(s, window=None):
        recs = orders
        if window:
            recs = [o for o in orders if window[0] <= o["update_time"] < window[1]]
        return s.read.schema(SHOPEE_ORDER_SCHEMA).json(
            s.sparkContext.parallelize([json.dumps(o) for o in recs] or [""], 1)
        )

    return SourcePipeline(
        name="shopee",
        extract=extract,
        transform=transform_shopee_orders,
        keys=["order_sn", "order_item_id", "model_id", "package_number",
              "location_id"],
        order_col="update_time",
        guard_cols=["order_status", "shipping_carrier"],
        vn_naive_stamp=True,
    )


def test_shopee_full_load_six_tables(spark, tmp_path):
    staging = str(tmp_path / "staging")
    counts = full_load_pipeline(spark, _shopee_pipe(spark, SHOPEE_ORDERS), staging)
    assert counts == {
        "shopee_orders": 2,
        "shopee_recipient_address": 1,
        "shopee_order_items": 1,
        "shopee_order_item_locations": 1,
        "shopee_packages": 1,
        "shopee_package_items": 1,
    }
    orders = read_upsert_table(spark, f"{staging}/shopee_orders")
    # +07-naive stamp convention (MISA/Shopee)
    assert dict(orders.dtypes)["etl_created_at"] == "timestamp_ntz"


def test_shopee_incremental_updates_order_status(spark, tmp_path):
    staging = str(tmp_path / "staging")
    full_load_pipeline(spark, _shopee_pipe(spark, SHOPEE_ORDERS), staging)
    updated = [dict(SHOPEE_ORDERS[1], order_status="COMPLETED", update_time=2000)]
    incremental_pipeline(
        spark, _shopee_pipe(spark, SHOPEE_ORDERS + updated), staging,
        window=(1500, 3000),
    )
    out = {r.order_sn: r.order_status for r in
           read_upsert_table(spark, f"{staging}/shopee_orders").collect()}
    assert out == {"SP1": "SHIPPED", "SP2": "COMPLETED"}


MISA_ORDERS = [
    {"id": 1, "sale_order_no": "SO1", "modified_date": "2024-01-02T00:00:00Z",
     "sale_order_product_mappings": [
         {"id": 11, "product_code": "A", "price": 10.0}]},
    {"id": 2, "sale_order_no": "SO2", "modified_date": "2024-01-03T00:00:00Z",
     "sale_order_product_mappings": []},  # itemless -> null item_id
]


def test_misa_null_key_drop_parity(spark, tmp_path):
    staging = str(tmp_path / "staging")

    def extract(s, window=None):
        return s.read.schema(MISA_SALE_ORDER_SCHEMA).json(
            s.sparkContext.parallelize([json.dumps(o) for o in MISA_ORDERS], 1)
        )

    pipe = SourcePipeline(
        name="misa_sale_orders_flattened",
        extract=extract,
        transform=transform_misa_sale_orders,
        keys=["order_id", "item_id"],
        order_col="order_modified_date",
        vn_naive_stamp=True,
        drop_null_key_rows=True,  # misa_crm_loader.py:161-171
    )
    counts = full_load_pipeline(spark, pipe, staging)
    tbl = read_upsert_table(spark, f"{staging}/misa_sale_orders_flattened")
    # itemless order SO2 dropped at load (MISA parity); SO1's item remains
    assert tbl.count() == 1
    assert tbl.collect()[0].order_id == 1
    assert counts["misa_sale_orders_flattened"] == 1


def test_table_configs_make_pipeline(spark, tmp_path):
    import json as _json

    from e_commerce_etl_pipeline_spark.pipelines.configs import (
        TIKTOK_ORDER_DETAIL,
        make_pipeline,
    )
    from e_commerce_etl_pipeline_spark.schemas import TIKTOK_ORDER_SCHEMA
    from e_commerce_etl_pipeline_spark.transforms import transform_tiktok_orders

    def extract(s, window=None):
        o = {"id": "T1", "status": "CREATED", "update_time": 100,
             "line_items": [{"id": "L1", "quantity": 1}]}
        return s.read.schema(TIKTOK_ORDER_SCHEMA).json(
            s.sparkContext.parallelize([_json.dumps(o)], 1))

    pipe = make_pipeline("tiktok_shop_order_detail", TIKTOK_ORDER_DETAIL,
                         extract, transform_tiktok_orders)
    staging = str(tmp_path / "s")
    counts = full_load_pipeline(spark, pipe, staging)
    assert counts == {"tiktok_shop_order_detail": 1}
    assert pipe.guard_cols == ["status", "tracking_number", "shipping_provider"]
