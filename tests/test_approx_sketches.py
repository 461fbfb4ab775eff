"""Error bounds for approx_sketch_stats (VERDICT r4 item 8).

The registry's only rows-only entry is approximate BY DESIGN (HLL++
distinct counts, quantile sketch) so it has no value-hash oracle — but
"approximate" still means BOUNDED error, and the bounds are documented:

- ``approx_count_distinct`` uses HLL++ with default rsd = 0.05 (5%
  relative standard deviation). We assert within 3×rsd = 15% of exact —
  a ~99.7% band, deterministic in practice because the hash is seedless.
- ``percentile_approx`` with default accuracy 10000 guarantees rank
  error <= 1/10000; at sf0.01 group sizes (~15k rows) that is a handful
  of ranks. We assert each sketched quantile lies between the exact
  quantiles at q ± 0.01 (a 100× looser rank window, immune to duplicate
  value plateaus).
"""

from __future__ import annotations

import duckdb

from e_commerce_etl_pipeline_spark.plans.queries import approx_sketch_stats

SF_DIR = "/root/testdata/sf0.01"
RSD_BOUND = 3 * 0.05
RANK_EPS = 0.01
QUANTILES = (0.5, 0.95, 0.99)


def test_sketches_within_documented_error(spark):
    got = {
        r["l_returnflag"]: r for r in approx_sketch_stats(spark, SF_DIR).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    exact = con.execute(
        """
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS orders,
               COUNT(DISTINCT l_partkey) AS parts,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY 1
        """
    ).fetchall()
    assert {r[0] for r in exact} == set(got)

    for flag, orders, parts, n_rows in exact:
        row = got[flag]
        assert row["n_rows"] == n_rows  # the exact column stays exact
        for approx, truth, label in (
            (row["approx_orders"], orders, "orders"),
            (row["approx_parts"], parts, "parts"),
        ):
            rel = abs(approx - truth) / truth
            assert rel <= RSD_BOUND, (
                f"{flag}/{label}: approx {approx} vs exact {truth} "
                f"({rel:.1%} > {RSD_BOUND:.0%})"
            )

    # quantile sketch: each reported quantile must fall inside the exact
    # [q - eps, q + eps] value bracket
    for flag in got:
        row = got[flag]
        for q, v in zip(QUANTILES, row["price_quantiles"]):
            lo, hi = con.execute(
                f"""
                SELECT quantile_cont(l_extendedprice, {max(q - RANK_EPS, 0.0)}),
                       quantile_cont(l_extendedprice, {min(q + RANK_EPS, 1.0)})
                FROM lineitem WHERE l_returnflag = ?
                """,
                [flag],
            ).fetchone()
            assert float(lo) <= float(v) <= float(hi), (
                f"{flag}/q{q}: {v} outside [{lo}, {hi}]"
            )
