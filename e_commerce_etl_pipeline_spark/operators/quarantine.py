"""Bad-record quarantine (SURVEY §2.2 K7 rethought for Spark).

The reference degrades to row-by-row inserts on batch failure, stopping
after 10 errors (misa_crm_loader.py:503-548). In Spark, task retries
handle transient failures; what remains valuable is the *data* half:
rows that would violate sink invariants get split off to a quarantine
sink with a reason, instead of failing the batch or being silently
dropped. One pass, no shuffle: the split is two filters over the same
validated projection, and Catalyst shares the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_quarantine(
    df: DataFrame,
    rules: dict[str, Column],
) -> tuple[DataFrame, DataFrame]:
    """``rules``: {reason: predicate-that-must-hold}. Returns
    (good, quarantined) where quarantined rows carry a ``_quarantine_reason``
    column listing every violated rule."""
    reasons = F.array_compact(F.array(*[
        F.when(~pred, F.lit(reason)) for reason, pred in rules.items()
    ]))
    tagged = df.withColumn("_quarantine_reasons", reasons)
    good = tagged.filter(F.size("_quarantine_reasons") == 0).drop("_quarantine_reasons")
    bad = tagged.filter(F.size("_quarantine_reasons") > 0).withColumn(
        "_quarantine_reason", F.concat_ws(",", "_quarantine_reasons")
    ).drop("_quarantine_reasons")
    return good, bad


def null_key_rule(keys: Sequence[str]) -> dict[str, Column]:
    """The D5 invariant as a quarantine rule instead of a silent drop."""
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    return {"null_key": cond}
