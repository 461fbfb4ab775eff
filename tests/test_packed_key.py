"""dedup_keep_newest packed recency key: exact decode at the event_id
contract boundary (ADVICE r8 — floor(pk/shift) planned as decimal(38,6)
HALF_UP, decoding ts one microsecond high for event_id >= 999999500000;
the fix uses integral `div`)."""

from __future__ import annotations

import datetime as dt

from e_commerce_etl_pipeline_spark.plans.queries import dedup_keep_newest


def test_packed_key_exact_at_id_boundary(spark, tmp_path):
    ts = dt.datetime(2024, 3, 1, 12, 0, 0, 123456)
    rows = [
        # event_id in the HALF_UP danger zone (>= 999999500000 < 10^12)
        (999999999999, ts, 1, "click", 1.0, None),
        (999999500000, ts - dt.timedelta(seconds=1), 1, "click", 2.0, None),
        # a benign id for contrast
        (7, ts - dt.timedelta(seconds=2), 2, "view", 3.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r.user_id, r.event_type): r
        for r in dedup_keep_newest(spark, str(tmp_path)).collect()
    }
    winner = out[(1, "click")]
    assert winner.event_id == 999999999999
    assert winner.ts == ts          # old floor-div decoded ts + 1us here
    assert winner.value == 1.0
    assert out[(2, "view")].ts == ts - dt.timedelta(seconds=2)
