"""K7 rethought: bad-record quarantine split."""

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.operators.quarantine import (
    null_key_rule,
    split_quarantine,
)


def test_split_quarantine(spark):
    df = spark.createDataFrame(
        [("o1", "i1", 5.0), ("o2", None, 3.0), (None, "i3", -1.0), ("o4", "i4", -2.0)],
        "order_id string, item_id string, amount double",
    )
    rules = {**null_key_rule(["order_id", "item_id"]),
             "negative_amount": F.col("amount") >= 0}
    good, bad = split_quarantine(df, rules)
    assert {r.order_id for r in good.collect()} == {"o1"}
    quarantined = {r.order_id: r._quarantine_reason for r in bad.collect()}
    assert quarantined["o2"] == "null_key"
    assert quarantined[None] == "null_key,negative_amount"
    assert quarantined["o4"] == "negative_amount"
