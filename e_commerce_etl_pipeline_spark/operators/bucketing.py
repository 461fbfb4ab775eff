"""Bucketed table layout for co-located, shuffle-free joins.

At 100 TB the dominant cost of a repeated fact⨝fact join (e.g. the
staging `orders` table against its line items, or any key-to-key
reconciliation the reference runs per 15-minute cycle) is the shuffle of
BOTH sides on the join key — every batch, forever. Writing the tables
bucketed on that key (``bucketBy(n, key)``) records the hash layout in
the catalog; Spark's scan then reports the partitioning, and every
subsequent equi-join or aggregation on the key skips its Exchange
entirely. One shuffle at write time, zero at read time, amortized over
every downstream query.

This is the cluster-grade analog of the reference's secondary indexes on
hot key columns (sql/00_master_setup.sql:203-207 — SURVEY.md §4 O8): the
index made point MERGEs cheap on SQL Server; bucketing makes keyed joins
and MERGE-style rewrites cheap on Spark.

Rules that make co-location actually fire (all enforced/encoded here):
- both tables bucketed on the join key with the SAME bucket count
  (different counts shuffle the smaller-bucketed side);
- join/groupBy expressions must be the raw bucket columns (wrapping the
  key in an expression defeats the partitioning report);
- broadcast must not pre-empt the test of the layout — at real scale
  neither side broadcasts anyway; callers can pass a merge hint.

``bucketBy`` requires a catalog table (``saveAsTable``) — a plain
``.parquet(path)`` write drops the layout metadata. We write external
tables (explicit ``path``) so the data lives wherever the caller's
storage layout dictates and only the metadata hits the catalog.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: Sequence[str],
    num_buckets: int = 32,
    path: str | None = None,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed catalog table (external when ``path``
    given). ``sort_cols`` additionally sorts within buckets — when each
    bucket lands as a single file, sort-merge joins also skip their Sort."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, keys[0], *keys[1:])
        .sortBy(*(sort_cols or keys))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching layouts the physical plan contains NO Exchange — verify with
    ``assert_no_exchange`` (tests do)."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, list(on), how)


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange operators in the (pre-AQE) physical plan —
    bucketing's effect is planner-time, so the initial plan is the
    honest witness (AQE can only remove more)."""
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\)\s+Exchange", line.strip())
    )
