"""SQL-interface parity: the ANSI-portable subset of the oracle SQL
strings must run through ``spark.sql`` and produce exactly the rows the
DataFrame programs produce. One SQL text, three execution paths (Spark
DataFrame, Spark SQL, DuckDB oracle) — this test pins the first two
together and guards against DataFrame/SQL drift when queries evolve.

The non-portable remainder use DuckDB list/regex builtins
(list_transform, string_split_regex) or 1-based bracket indexing — their
Spark side is the DataFrame program itself, already oracle-checked.
"""

from __future__ import annotations

import pytest

from e_commerce_etl_pipeline_spark.plans.queries import TABLES, load_table

import __spark_entry__ as entrymod

# Verified-portable oracle texts (probe: run each through spark.sql and
# compare). Shrinking this list is a regression.
PORTABLE = [
    "asof_last_purchase", "big_order_customers", "cheapest_part_per_brand",
    "cube_sales", "customer_order_stats", "customer_spend_deciles",
    "customers_without_orders",
    "dedup_drop_all", "dedup_keep_newest", "events_hourly_windows",
    "explode_flatten_orders", "first_last_item_per_order",
    "funnel_conversion",
    "customer_order_distribution",
    "excess_volume_suppliers", "exclusive_fault_suppliers",
    "idle_rich_customers", "lang_distribution", "load_statistics",
    "merge_upsert_orders", "nation_trade_volume", "order_priority_counts",
    "part_activity_setops",
    "part_supplier_stats", "pivot_status_by_priority",
    "product_profit_by_nation", "promo_revenue_share",
    "regional_market_share", "returned_revenue_customers",
    "stratified_lang_sample", "supplier_count_by_part_attrs",
    "top_revenue_supplier",
    "q1_pricing_summary", "q3_top_unshipped", "q5_revenue_by_nation",
    "q6_sql_interface", "retention_filter", "revenue_by_year_region",
    "row_count_report", "sales_rollup", "salted_event_type_totals",
    "small_quantity_revenue", "special_bracket_revenue",
    "top_suppliers_per_nation",
    "urgent_share_by_flag", "user_running_totals", "user_value_median",
    "user_value_median_pandas",
    "copurchase_pairs", "basket_lift", "table_profile_orders",
    "train_val_split",
]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark


def _rows(df):
    cols = sorted(df.columns)
    idx = [df.columns.index(c) for c in cols]
    return cols, sorted(tuple(str(r[i]) for i in idx) for r in df.collect())


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_matches_dataframe(views, sf_dir, name):
    spark = views
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    df_cols, df_rows = _rows(qs[name](spark, sf_dir))
    sql_cols, sql_rows = _rows(spark.sql(osql[name]))
    assert df_cols == sql_cols
    assert df_rows == sql_rows
