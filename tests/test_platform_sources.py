"""Platform source presets: reference parameter parity (SURVEY §2.1)."""

from e_commerce_etl_pipeline_spark.sources.platforms import (
    MISA_INCREMENTAL_MAX_PAGES,
    SHOPEE_DETAIL_BATCH,
    SHOPEE_MAX_SPAN_S,
    SeenSetDedup,
    misa_endpoint,
    shopee_order_detail,
    shopee_order_list,
    tiktok_order_search,
)


def test_tiktok_search_params():
    calls = []

    def fetch(endpoint, params):
        calls.append((endpoint, dict(params)))
        return {"orders": [{"id": "1"}], "more": False}

    src = tiktok_order_search(fetch, by_update_time=True)
    list(src.pages(window=(100, 200)))
    ep, p = calls[0]
    assert ep == "/order/202309/orders/search"
    assert p["update_time_ge"] == 100 and p["update_time_lt"] == 200
    assert p["sort_field"] == "update_time" and p["page_size"] == 100


def test_shopee_list_and_detail_params():
    calls = []

    def fetch(endpoint, params):
        calls.append((endpoint, dict(params)))
        if "get_order_list" in endpoint:
            return {"order_list": [{"order_sn": "a"}], "next_cursor": ""}
        return {"order_list": [{"order_sn": sn} for sn in params["order_sn_list"]]}

    lst = shopee_order_list(fetch, time_range_field="update_time")
    list(lst.pages(window=(1, 2)))
    ep, p = calls[0]
    assert p["time_range_field"] == "update_time"
    assert p["time_from"] == 1 and p["time_to"] == 2

    det = shopee_order_detail(fetch)
    batches = list(det.fetch_details(
        [f"sn{i}" for i in range(20)], SHOPEE_DETAIL_BATCH,
        ids_param="order_sn_list", fields=["order_status"]))
    assert [len(b) for b in batches] == [15, 5]
    assert calls[-1][1]["response_optional_fields"] == "order_status"

    assert SHOPEE_MAX_SPAN_S == 10 * 86400


def test_misa_incremental_page_cap():
    calls = []

    def fetch(endpoint, params):
        calls.append(dict(params))
        return {"data": [{"id": i} for i in range(100)]}  # always full page

    src = misa_endpoint(fetch, "Customers", incremental=True)
    batches = list(src.pages())
    assert len(batches) == MISA_INCREMENTAL_MAX_PAGES  # capped at 3 pages
    assert calls[0]["pageSize"] == 100


def test_seen_set_dedup():
    d = SeenSetDedup(key="order_sn")
    b1 = d.filter_batch([{"order_sn": "a"}, {"order_sn": "b"}])
    b2 = d.filter_batch([{"order_sn": "b"}, {"order_sn": "c"}])
    assert [r["order_sn"] for r in b1] == ["a", "b"]
    assert [r["order_sn"] for r in b2] == ["c"]


def test_shopee_list_or_scalar_location(spark):
    from e_commerce_etl_pipeline_spark.schemas import SHOPEE_ORDER_SCHEMA
    from e_commerce_etl_pipeline_spark.sources.api_adapter import to_dataframe
    from e_commerce_etl_pipeline_spark.sources.platforms import normalize_shopee_order
    from e_commerce_etl_pipeline_spark.transforms.shopee import (
        order_item_locations_table,
    )

    records = [[{
        "order_sn": "S1",
        "item_list": [
            {"order_item_id": 1, "model_id": 2, "product_location_id": "SCALAR"},
            {"order_item_id": 3, "model_id": 4, "product_location_id": ["L1", "L2"]},
        ],
    }]]
    raw = to_dataframe(spark, iter(records), SHOPEE_ORDER_SCHEMA,
                       normalizer=normalize_shopee_order)
    locs = {(r.order_item_id, r.location_id)
            for r in order_item_locations_table(raw).collect()}
    assert locs == {(1, "SCALAR"), (3, "L1"), (3, "L2")}
