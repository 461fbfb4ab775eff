"""Pathological-basket fence (r4 finding #4).

Per-order pair output is C(items,2); a degenerate order with 1e4 distinct
items would emit ~5e7 pairs from a single join key — and AQE skew-split
cannot shrink one key's cross-product. ``_basket_items`` truncates each
order to its MAX_BASKET_ITEMS lowest part keys, so the pair space from
any one order is hard-capped at C(128,2)=8128. The truncation is
observed (Observation metric) rather than re-counted, and mirrored in
the DuckDB oracle SQL via QUALIFY.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.plans import queries as Q


def _write_lineitem(spark, path, rows):
    spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint").write.mode(
        "overwrite"
    ).parquet(f"{path}/lineitem.parquet")


def test_degenerate_order_is_fenced(spark, tmp_path):
    sf_dir = str(tmp_path)
    # one pathological order with 10_000 distinct items + two sane orders
    rows = [(1, p) for p in range(10_000)]
    # sane orders use part ids ABOVE the fence's kept range of order 1
    # (0..127), so their pair count is unaffected by the big order
    rows += [(2, 500), (2, 501), (3, 500), (3, 501)]
    _write_lineitem(spark, sf_dir, rows)

    t0 = time.time()
    out = Q.copurchase_pairs(spark, sf_dir)
    # pair (500,501) appears in both sane orders; the degenerate order's
    # pair space is capped at C(128,2) so it dominates the top-25
    top = out.collect()
    elapsed = time.time() - t0
    assert elapsed < 120, f"fenced query took {elapsed:.1f}s — fence not applied?"

    # (500,501) is the only pair in two orders — everything from the
    # fenced degenerate order co-occurs once — so it ranks first
    assert (top[0]["part_a"], top[0]["part_b"], top[0]["n_orders"]) == (500, 501, 2)

    # total pair space: C(128,2) from order 1 (+ the sane pairs, which
    # overlap with part ids 7,8 < 128 already counted there)
    items = Q._basket_items(spark, sf_dir)
    per_order = items.groupBy("l_orderkey").count().collect()
    counts = {r["l_orderkey"]: r["count"] for r in per_order}
    assert counts[1] == Q.MAX_BASKET_ITEMS
    assert counts[2] == 2 and counts[3] == 2

    # the fence reports what it dropped — 10_000 - 128 rows from order 1
    dropped = Q.basket_fence_dropped_rows(sf_dir)
    assert dropped == 10_000 - Q.MAX_BASKET_ITEMS

    # deterministic truncation: the LOWEST part keys survive
    kept = sorted(
        r["l_partkey"]
        for r in items.filter(F.col("l_orderkey") == 1).collect()
    )
    assert kept == list(range(Q.MAX_BASKET_ITEMS))


def test_fence_noop_on_sane_data_and_oracle_green(spark, tmp_path):
    """On baskets under the cap the fence changes nothing, and the
    QUALIFY-mirrored oracle SQL agrees with the Spark plan exactly."""
    import duckdb

    sf_dir = str(tmp_path)
    rows = [(o, p) for o in range(1, 30) for p in range(o % 5 + 2)]
    _write_lineitem(spark, sf_dir, rows)

    got = {
        (r["part_a"], r["part_b"]): r["n_ab"]
        for r in Q.basket_lift(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet/*.parquet')"
    )
    want = {
        (pa, pb): n
        for pa, pb, n in con.execute(
            f"SELECT part_a, part_b, n_ab FROM ({Q.BASKET_LIFT_SQL})"
        ).fetchall()
    }
    assert got == want and len(got) > 0
