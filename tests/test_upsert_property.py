"""Property-based checks (hypothesis) for the guarded-upsert resolve —
the engine's MERGE core. Instead of a handful of fixed cases, generate
arbitrary target/source batches and assert the reference's invariants
(SURVEY §2.2 K4-K6, §2.8 ST3) hold on every one:

1. replay idempotence: applying the same batch twice == applying once;
2. no regression: a key's order_col never decreases;
3. key conservation: result keys == target keys ∪ source keys;
4. newest wins: for every key in both, the surviving order_col is the
   max of the two sides (source pre-deduped keep-newest).

All examples run through resolve_upsert (pure, no I/O) on small frames —
one Spark job per assertion keeps the suite inside the property-test
budget used by test_coercions_property.py.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from e_commerce_etl_pipeline_spark.operators.upsert import resolve_upsert

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

SCHEMA = "k int, status string, ord int"

row = st.tuples(
    st.integers(min_value=0, max_value=5),                     # key (collisions likely)
    st.sampled_from(["a", "b", "c"]),                          # guard col
    st.integers(min_value=0, max_value=9),                     # order col
)
batch = st.lists(row, min_size=0, max_size=8)


def _collect(df):
    return sorted((r["k"], r["status"], r["ord"]) for r in df.collect())


def _by_key(rows):
    out = {}
    for k, s, o in rows:
        out.setdefault(k, []).append((o, s))
    return out


@given(target=batch, source=batch)
@SETTINGS
def test_upsert_invariants(spark, target, source):
    # target must be key-unique (it models table contents)
    seen, t_rows = set(), []
    for k, s, o in target:
        if k not in seen:
            seen.add(k)
            t_rows.append((k, s, o))
    t = spark.createDataFrame(t_rows, SCHEMA) if t_rows else \
        spark.createDataFrame([], SCHEMA)
    s_df = spark.createDataFrame(source, SCHEMA) if source else \
        spark.createDataFrame([], SCHEMA)

    # tiebreak=["status"] completes the total order: generated batches
    # may hold two rows with equal (k, ord) but different status, where
    # an arbitrary pick would legitimately break replay idempotence.
    once = _collect(resolve_upsert(t, s_df, ["k"], "ord",
                                   guard_cols=["status"], tiebreak=["status"]))

    # 1) replay idempotence: re-applying the same batch is a no-op
    once_df = spark.createDataFrame(once, SCHEMA) if once else \
        spark.createDataFrame([], SCHEMA)
    twice = _collect(resolve_upsert(once_df, s_df, ["k"], "ord",
                                    guard_cols=["status"], tiebreak=["status"]))
    assert twice == once

    # 2-4) per-key invariants vs the inputs
    t_map = {k: (s, o) for k, s, o in t_rows}
    s_best = {k: max(v) for k, v in _by_key(source).items()}  # keep-newest
    out_map = {k: (s, o) for k, s, o in once}

    assert set(out_map) == set(t_map) | set(s_best)
    for k, (s, o) in out_map.items():
        if k in t_map:
            assert o >= t_map[k][1], "order_col regressed"
        if k in t_map and k in s_best:
            assert o == max(t_map[k][1], s_best[k][0]), "newest did not win"
        elif k in s_best:
            assert (o, s) == (s_best[k][0], s_best[k][1]), "insert not from newest source row"
        else:
            assert (s, o) == t_map[k], "untouched target row changed"
