"""Skew-resilient aggregation: two-stage salted groupBy.

At 100 TB a hot group key (one merchant, one event type) concentrates a
shuffle partition. The standard fix when AQE's skew handling isn't
enough: salt the key into S shards, partially aggregate per
(key, salt), then merge the S partials per key. Works for any
algebraic aggregate (sum/count/min/max); result is IDENTICAL to the
plain groupBy — decimal sums make that bit-exact, so the same DuckDB
oracle verifies the salted plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_col: Column,
    n_salts: int = 16,
    sum_alias: str = "total",
    count_alias: str = "n",
) -> DataFrame:
    """groupBy(group_cols).agg(sum, count) via salt-and-merge.

    Salt comes from the whole-row hash — the same recompute-stable
    contract ``salted_join`` documents (rand() and
    monotonically_increasing_id are stable only per-execution; a task
    retry would re-salt rows differently mid-aggregation)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.sum(sum_col).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__psum").alias(sum_alias),
        F.sum("__pcnt").cast("long").alias(count_alias),
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: salt-and-replicate.

    The skewed (fact) side gets a deterministic salt derived from its
    whole row hash; the small (dim) side is replicated ×``n_salts`` via
    an exploded salt array. Joining on (key, salt) splits each hot key's
    rows across ``n_salts`` shuffle partitions instead of one straggler
    task. Result is row-identical to the plain join.

    When to use over AQE skew-join: AQE only splits *sort-merge* join
    partitions post-shuffle and needs the skew to show up in runtime
    stats; salting also covers shuffled-hash joins, repeated pipelines
    where the skew is known ahead of time, and joins feeding
    partitioning-sensitive downstream ops. Replication multiplies the
    small side's shuffle volume — keep it for genuinely small dims that
    just exceed the broadcast threshold.

    Salt must NOT come from rand() (non-deterministic breaks task retry
    at-least-once semantics) nor monotonically_increasing_id (stable
    only per-execution): the row-hash salt is recompute-stable.
    """
    salted = skewed.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in skewed.columns]),
                         F.lit(n_salts)),
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return salted.join(replicated, [key, "__salt"], how).drop("__salt")


def hot_keys(
    df: DataFrame,
    key: str,
    min_share: float = 0.01,
    max_keys: int = 100,
) -> list:
    """Heavy-hitter detection for targeted salting: keys holding at
    least ``min_share`` of the rows, via one hash aggregate + top-k.
    The collect is bounded by ``max_keys`` (production: a handful of hot
    merchants/users/null-ish defaults), never data-sized."""
    n = df.count()
    rows = (
        df.groupBy(key).count()
        .filter(F.col("count") >= n * min_share)
        .orderBy(F.col("count").desc(), F.col(key))
        .limit(max_keys)
        .collect()
    )
    return [r[key] for r in rows]


def salted_join_targeted(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    hot: list,
    n_salts: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join that salts ONLY the hot keys.

    ``salted_join`` replicates the ENTIRE dim ×n_salts — at n_salts=32
    and a dim half the fact's size, the replication shuffle costs more
    than the straggler it removes (measured, tools/bench_skew.py: blanket
    salting ~parity with the straggler at 30%-hot/10M rows; targeted
    salting beats both). Production skew is a handful of heavy hitters
    (one merchant, a default user id), so: fact rows on a hot key get a
    row-hash salt in [0, n_salts); all other rows salt 0. Dim rows for
    hot keys replicate ×n_salts; every other dim row stays single. The
    join key becomes (key, salt): hot keys spread over n_salts shuffle
    partitions, cold keys pay nothing. Row-identical to the plain join.

    ``hot`` comes from ``hot_keys()`` (one aggregate, bounded collect) or
    from prior knowledge; passing it explicitly keeps this function a
    pure plan transform (no hidden action), so it composes with streams
    and cached plans. Same recompute-stable row-hash salt contract as
    ``salted_join``."""
    hot_arr = F.array(*[F.lit(h) for h in hot])
    is_hot = F.array_contains(hot_arr, F.col(key)) if hot else F.lit(False)
    salted = skewed.withColumn(
        "__salt",
        F.when(
            is_hot,
            F.pmod(F.hash(*[F.col(c) for c in skewed.columns]),
                   F.lit(n_salts)),
        ).otherwise(F.lit(0)),
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(
            F.when(is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1)))
            .otherwise(F.array(F.lit(0)))
        ),
    )
    return salted.join(replicated, [key, "__salt"], how).drop("__salt")


def salt_decision(
    df: DataFrame,
    key: str,
    min_share: float = 0.05,
    min_hot_rows: int = 1_000_000,
    max_keys: int = 100,
    table_path: str | None = None,
) -> dict:
    """Should this join be salted? Decide from data, not folklore.

    The skew benchmarks (tools/bench_skew.py, docs/SCALE.md) measured a
    real crossover: at ~3 M rows on one key the salted join beats the
    straggler 1.56x, but at ~300 k rows per hot key every mitigation
    costs MORE than the straggler it removes — below roughly a second
    of single-key work there is no straggler worth splitting. So a key
    qualifies as hot only when it is BOTH relatively heavy (>=
    ``min_share`` of the rows — a balanced key distribution never
    triggers) and absolutely heavy (>= ``min_hot_rows`` — the measured
    floor under which the salt is overhead; tune per cluster, the
    default is conservative for executor-scale hardware).

    One hash aggregate + bounded top-k collect (never data-sized).
    Returns ``{"hot": [...], "use_salt": bool, "total_rows": n}`` so
    callers can log the decision (no silent plan changes).

    ``table_path`` (r7): the key distribution is a per-corpus-SNAPSHOT
    fact, not a per-call one — when the fact side is a scan of a stored
    table, pass its path and the decision is memoized through
    ``index_store.cached_value`` (content-fingerprint keyed: an upsert /
    rewrite re-decides, a repeat call on unchanged data launches ZERO
    jobs). The caller owns the contract that ``df``'s rows are the
    table's rows (projections are fine — the decision reads only
    ``key``); pass ``None`` for filtered/derived frames.
    """
    def compute() -> dict:
        n = df.count()
        rows = (
            df.groupBy(key).count()
            .filter(
                (F.col("count") >= n * min_share)
                & (F.col("count") >= min_hot_rows)
            )
            .orderBy(F.col("count").desc(), F.col(key))
            .limit(max_keys)
            .collect()
        )
        hot = [r[key] for r in rows]
        return {"hot": hot, "use_salt": bool(hot), "total_rows": n}

    if table_path is None:
        return compute()
    from . import index_store

    artifact = f"salt_decision/{key}/{min_share}/{min_hot_rows}/{max_keys}"
    return index_store.cached_value(
        df.sparkSession, table_path, artifact, compute
    )


def auto_salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 32,
    how: str = "inner",
    min_share: float = 0.05,
    min_hot_rows: int = 1_000_000,
    table_path: str | None = None,
) -> DataFrame:
    """Equi-join that salts itself only when the data says to.

    Runs ``salt_decision`` (one aggregate over the fact side), then
    either the plain join (no qualifying hot key — the common case, and
    below the measured crossover the fastest one) or
    ``salted_join_targeted`` on exactly the detected heavy hitters.
    Row-identical to the plain join either way, so the same oracle
    verifies both plans.

    NOTE: unlike ``salted_join_targeted`` this is NOT a pure plan
    transform — the decision is an action. Pass ``table_path`` (the fact
    side's stored-table path) to pay that action ONCE per corpus
    snapshot: the decision memoizes through the fingerprint-keyed
    ``index_store`` and repeat joins on unchanged data take the
    decision branch with zero extra jobs (measured: the decision
    aggregate was most of auto's gap to targeted at local scale —
    tools/bench_skew.py ``join_auto_memoized``). For streaming / cached
    plans, compute ``hot_keys`` out-of-band and call the targeted
    variant.
    """
    decision = salt_decision(
        skewed, key, min_share=min_share, min_hot_rows=min_hot_rows,
        table_path=table_path,
    )
    if not decision["use_salt"]:
        return skewed.join(small, key, how)
    return salted_join_targeted(
        skewed, small, key, decision["hot"], n_salts=n_salts, how=how
    )
