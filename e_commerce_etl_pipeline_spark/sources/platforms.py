"""Per-platform source presets — the reference's endpoint parameters
bound onto the generic adapter (SURVEY.md §2.1).

Page sizes, cursor fields, window parameter names, detail-batch caps and
chunk spans are the reference's own values (citations inline). Transport
(``fetch_fn``) is injected; nothing here talks HTTP.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from .api_adapter import PageSpec, PaginatedApiSource

DAY_S = 86_400


def tiktok_order_search(fetch_fn: Callable, by_update_time: bool = False,
                        **kw) -> PaginatedApiSource:
    """S1/S2: POST /order/202309/orders/search — cursor pagination,
    page_size<=100, time filter in the body (tiktok_shop_extractor.py:42-158,
    298-353). ``by_update_time`` selects the incremental change-scan params."""
    field = "update_time" if by_update_time else "create_time"
    return PaginatedApiSource(
        fetch_fn=fetch_fn,
        spec=PageSpec(
            strategy="cursor", page_size=100,
            cursor_param="page_token", cursor_field="next_page_token",
            more_field="more", records_field="orders",
            window_start_param=f"{field}_ge", window_end_param=f"{field}_lt",
        ),
        endpoint="/order/202309/orders/search",
        rate_limit_s=0.0,
        extra_params={"sort_field": field, "sort_order": "DESC"},
        **kw,
    )


def tiktok_order_detail(fetch_fn: Callable, **kw) -> PaginatedApiSource:
    """S4: GET /order/202309/orders?ids=... — batches of 50
    (tiktok_shop_extractor.py:355-452)."""
    return PaginatedApiSource(
        fetch_fn=fetch_fn,
        spec=PageSpec(strategy="cursor", records_field="orders"),
        endpoint="/order/202309/orders",
        **kw,
    )


TIKTOK_DETAIL_BATCH = 50   # tiktok_shop_extractor.py:368
SHOPEE_DETAIL_BATCH = 15   # shopee_orders_extractor.py:461-468
SHOPEE_MAX_SPAN_S = 10 * DAY_S  # shopee_orders_extractor.py:611-623


def shopee_order_list(fetch_fn: Callable, time_range_field: str = "create_time",
                      **kw) -> PaginatedApiSource:
    """S5: get_order_list — cursor pagination, page_size 100,
    time_range_field in {create_time, update_time}
    (shopee_orders_extractor.py:333-445)."""
    return PaginatedApiSource(
        fetch_fn=fetch_fn,
        spec=PageSpec(
            strategy="page_token", page_size=100,
            cursor_param="cursor", cursor_field="next_cursor",
            records_field="order_list",
            window_start_param="time_from", window_end_param="time_to",
        ),
        endpoint="/api/v2/order/get_order_list",
        extra_params={"time_range_field": time_range_field},
        **kw,
    )


def shopee_order_detail(fetch_fn: Callable, **kw) -> PaginatedApiSource:
    """S6: get_order_detail, <=15 order_sn per call, explicit
    response_optional_fields projection (shopee_orders_extractor.py:447-591)."""
    return PaginatedApiSource(
        fetch_fn=fetch_fn,
        spec=PageSpec(
            strategy="cursor", records_field="order_list",
            fields_param="response_optional_fields",
        ),
        endpoint="/api/v2/order/get_order_detail",
        **kw,
    )


MISA_ENDPOINTS = ("Customers", "SaleOrders", "Contacts", "Stocks", "Products")
MISA_INCREMENTAL_MAX_PAGES = 3  # misa_crm_extractor.py:525


def misa_endpoint(fetch_fn: Callable, endpoint: str,
                  incremental: bool = False, **kw) -> PaginatedApiSource:
    """S9/S10: GET /api/v2/{endpoint}, page/pageSize=100, stop on short
    page; incremental caps at 3 pages and relies on a client-side
    modified_date cutoff filter downstream (misa_crm_extractor.py:344-566)."""
    return PaginatedApiSource(
        fetch_fn=fetch_fn,
        spec=PageSpec(
            strategy="page_index", page_size=100,
            page_size_param="pageSize", records_field="data",
            max_pages=MISA_INCREMENTAL_MAX_PAGES if incremental else 50_000,
        ),
        endpoint=f"/api/v2/{endpoint}",
        **kw,
    )


# S10's client-side cutoff: per-endpoint time-field priority
# (misa_crm_extractor.py:533-563)
MISA_TIME_FIELD = {
    "Customers": ("modified_date",),
    "SaleOrders": ("modified_date", "created_date", "sale_order_date"),
    "Contacts": ("modified_date",),
    "Stocks": ("modified_date",),
    "Products": ("modified_date",),
}


def normalize_shopee_order(record: dict) -> dict:
    """The list-or-scalar quirk (shopee_orders_transformer.py:294-314):
    ``item_list[].product_location_id`` arrives as a list OR a bare
    string. The declared Spark schema is array<string>; a scalar would
    silently parse to NULL, so normalize at the landing boundary (the
    record is still a dict here) — exactly where the reference fixes it."""
    items = record.get("item_list")
    if items:
        for it in items:
            loc = it.get("product_location_id")
            if isinstance(loc, str):
                it["product_location_id"] = [loc]
    return record


@dataclass
class SeenSetDedup:
    """S7's cross-page dedup during chunked extraction
    (shopee_orders_extractor.py:704-710): skip records whose key was
    already fetched in an earlier chunk. Driver-side state for the
    extraction loop; the downstream writer dedups again anyway."""

    key: str
    _seen: set = None

    def __post_init__(self):
        self._seen = set()

    def filter_batch(self, batch: Sequence[dict]) -> list[dict]:
        out = []
        for r in batch:
            k = r.get(self.key)
            if k not in self._seen:
                self._seen.add(k)
                out.append(r)
        return out
