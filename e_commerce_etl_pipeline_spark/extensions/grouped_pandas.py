"""Grouped custom aggregation via applyInPandas — the sanctioned slow
path for semantics the built-ins can't express exactly.

Exact median is the canonical case: Spark's native ``percentile_approx``
is approximate; an exact distributed median needs the group's values in
one place. ``applyInPandas`` ships each group to one task as an Arrow
batch — per-group memory, partition-parallel across groups, no driver
involvement. (Spark does also have an exact ``median`` aggregate now;
this module exists to exercise the grouped-Pandas operator shape with an
oracle-checkable computation.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..plans.queries import load_table

MEDIAN_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("median_value", T.DoubleType()),
])


def _median_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    vals = pdf["value"].sort_values()
    return pd.DataFrame({
        "user_id": [pdf["user_id"].iloc[0]],
        "n_events": [len(pdf)],
        "median_value": [float(vals.median())],
    })


def user_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-user event-value median via grouped Pandas."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    return ev.groupBy("user_id").applyInPandas(_median_fn, MEDIAN_SCHEMA)


USER_VALUE_MEDIAN_SQL = """
SELECT user_id, COUNT(*) AS n_events, median(value) AS median_value
FROM events GROUP BY user_id
"""


EXT_QUERIES = {
    "user_value_median": (user_value_median, USER_VALUE_MEDIAN_SQL),
}
