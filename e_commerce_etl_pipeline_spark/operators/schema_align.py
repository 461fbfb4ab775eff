"""D9 schema alignment: project a DataFrame onto a target column list —
intersect kept, missing added as typed NULLs, extras dropped, order fixed.

Parity with the reference's runtime reconciliation against
INFORMATION_SCHEMA (misa_crm_loader.py:339-404,
shopee_orders_loader.py:539-632): there it's a loop over the DB catalog;
here it collapses into one select, which Catalyst folds into the scan
(missing columns cost nothing, dropped columns are never read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    cols = []
    for field in target.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
