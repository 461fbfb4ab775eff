"""The reference's per-table natural keys, change-order columns, and
update guards, as data (SURVEY.md §2.2 K4-K6; FIXTURES.md §4).

Sources:
- TikTok: key (order_id, item_id), order update_time, guard
  status/tracking/shipping change (tiktok_shop_staging_loader.py:382-404)
- Shopee pk_map: shopee_orders_loader.py:498-532; guard update_time +
  (orders only) order_status/shipping_carrier (:672-695)
- MISA keys: misa_crm_loader.py:550-564; guard modified_date
  (order_modified_date for the flattened orders) (:566-586); null keys
  dropped at load (:161-171)

``make_pipeline`` binds a config + extract/transform callables into a
SourcePipeline ready for the full-load/incremental drivers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from .etl import SourcePipeline


@dataclass(frozen=True)
class TableConfig:
    keys: tuple[str, ...]
    order_col: str
    guard_cols: tuple[str, ...] = ()
    vn_naive_stamp: bool = False
    drop_null_key_rows: bool = False


TIKTOK_ORDER_DETAIL = TableConfig(
    keys=("order_id", "item_id"),
    order_col="update_time",
    guard_cols=("status", "tracking_number", "shipping_provider"),
)

# Shopee: one pipeline, six tables; the flat key union is filtered per
# table by column presence (children carry their parents' key columns by
# construction). Guard applies only where the columns exist (orders).
SHOPEE_ORDERS = TableConfig(
    keys=("order_sn", "order_item_id", "model_id", "package_number",
          "location_id"),
    order_col="update_time",
    guard_cols=("order_status", "shipping_carrier"),
    vn_naive_stamp=True,
)

MISA_TABLES: dict[str, TableConfig] = {
    "misa_customers": TableConfig(
        keys=("id",), order_col="modified_date", vn_naive_stamp=True,
        drop_null_key_rows=True),
    "misa_sale_orders_flattened": TableConfig(
        keys=("order_id", "item_id"), order_col="order_modified_date",
        vn_naive_stamp=True, drop_null_key_rows=True),
    "misa_contacts": TableConfig(
        keys=("id",), order_col="modified_date", vn_naive_stamp=True,
        drop_null_key_rows=True),
    "misa_stocks": TableConfig(
        keys=("stock_code",), order_col="modified_date", vn_naive_stamp=True,
        drop_null_key_rows=True),
    "misa_products": TableConfig(
        keys=("id",), order_col="modified_date", vn_naive_stamp=True,
        drop_null_key_rows=True),
}


def make_pipeline(name: str, config: TableConfig,
                  extract: Callable, transform: Callable) -> SourcePipeline:
    return SourcePipeline(
        name=name,
        extract=extract,
        transform=transform,
        keys=list(config.keys),
        order_col=config.order_col,
        guard_cols=list(config.guard_cols),
        vn_naive_stamp=config.vn_naive_stamp,
        drop_null_key_rows=config.drop_null_key_rows,
    )
