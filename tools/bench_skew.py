"""Measure the engine's skew mitigations against a planted hot key.

Input: an events table with join-key skew (gen_scale.py HOT_PCT > 0 —
e.g. 30% of rows on user_id 0). Three join configurations over
events ⋈ users-dim on the skewed key, broadcast disabled (the 100 TB
scenario: the dim outgrew the broadcast threshold):

  plain_aqe_skew_off — sort-merge join with AQE's skew splitting
      disabled: the hot key's rows land in ONE task; its runtime is the
      straggler floor every other config is judged against.
  plain_aqe_skew_on  — Spark's own mitigation (AQE skewedJoin splits
      the oversized partition; matching dim rows are duplicated across
      the splits).
  salted_join        — the engine's operators/skew.salted_join:
      row-hash salt on the fact side × explode-replicated dim, so the
      hot key spreads over n_salts shuffle partitions REGARDLESS of
      runtime statistics (also covers shuffled-hash joins and
      known-ahead skew, which AQE's detector does not).

Plus the aggregation pair on the same hot key: plain
groupBy(user_id).sum vs operators/skew.salted_sum_count. Expected
result (and the honest story): ~parity — hash aggregation already does
map-side partial aggregation, so each task emits ONE row per (key)
before the shuffle and the hot key never concentrates rows. The salt
earns its keep on JOINS (and on aggregates partial-agg can't collapse,
e.g. exact collect/distinct states); the measurement documents that
boundary instead of asserting a blanket win.

Each timing is min-of-N warm runs (N=SPARK_GRAFT_BENCH_WARM_RUNS,
default 3). Prints one JSON line; optional argv[2] writes it to a file.

Usage: python tools/bench_skew.py [EVENTS_SF_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from e_commerce_etl_pipeline_spark.operators.skew import (  # noqa: E402
    salted_join,
    salted_sum_count,
)
from e_commerce_etl_pipeline_spark.plans.queries import load_table  # noqa: E402
from e_commerce_etl_pipeline_spark.session import get_spark  # noqa: E402

N_SALTS = 32


def timed(fn, runs: int) -> float:
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1skew"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_WARM_RUNS", "3")))
    spark = get_spark("bench-skew")

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    ).persist()
    n = events.count()

    top = (
        events.groupBy("user_id").count()
        .orderBy(F.col("count").desc()).limit(1).collect()[0]
    )
    hot_share = round(top["count"] / n, 3)

    # users dim: every distinct user + a derived attribute; in the 100 TB
    # scenario this is the dimension that just outgrew broadcast
    users = events.select("user_id").distinct().withColumn(
        "user_tag", F.md5(F.col("user_id").cast("string"))
    ).persist()
    n_users = users.count()

    def run_plain():
        joined = events.join(users, "user_id")
        return joined.agg(F.count(F.lit(1)), F.min("user_tag")).collect()

    def run_salted():
        joined = salted_join(events, users, "user_id", n_salts=N_SALTS)
        return joined.agg(F.count(F.lit(1)), F.min("user_tag")).collect()

    timings: dict[str, float] = {}
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timings["join_plain_aqe_skew_off"] = timed(run_plain, runs)
        timings["join_salted"] = timed(run_salted, runs)

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        timings["join_plain_aqe_skew_on"] = timed(run_plain, runs)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)

    # correctness cross-check: identical join cardinality either way
    n_plain = events.join(users, "user_id").count()
    n_salted = salted_join(events, users, "user_id", n_salts=N_SALTS).count()
    assert n_plain == n_salted == n, (n, n_plain, n_salted)

    dec = F.col("value").cast("decimal(18,2)")

    def run_agg_plain():
        return events.groupBy("user_id").agg(
            F.sum(dec).alias("t"), F.count(F.lit(1)).alias("c")
        ).agg(F.count(F.lit(1))).collect()

    def run_agg_salted():
        return salted_sum_count(events, ["user_id"], dec, n_salts=N_SALTS).agg(
            F.count(F.lit(1))
        ).collect()

    timings["agg_plain"] = timed(run_agg_plain, runs)
    timings["agg_salted"] = timed(run_agg_salted, runs)

    out = {
        "metric": "skew_mitigation_bench",
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_events": n,
        "n_users": n_users,
        "hot_user": int(top["user_id"]),
        "hot_share": hot_share,
        "n_salts": N_SALTS,
        "warm_runs": runs,
        "timings": timings,
        "join_speedup_vs_straggler": round(
            timings["join_plain_aqe_skew_off"] / timings["join_salted"], 2
        ),
    }
    line = json.dumps(out)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
