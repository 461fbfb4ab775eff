"""Self-check harness mimicking the driver's t2 gate: run each declared
Spark query AND its DuckDB oracle on the same parquet, compare row count,
sorted column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def norm_cell(v):
    """Type-tagged canonical form. STRICTER than the driver on purpose: a
    Decimal and a float with equal value get different tags, so any query
    whose Spark/DuckDB result types diverge fails here first (driver round-1
    flagged 28 such rows as hash_match:false on formatting alone)."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "B:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "F:NaN"
        return "F:" + repr(v)
    if isinstance(v, decimal.Decimal):
        return "D:" + str(v)
    if isinstance(v, int):
        return "I:" + str(v)
    if isinstance(v, datetime.datetime):
        return "T:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _is_transient_oom(exc: BaseException) -> bool:
    """Transient ALLOCATION failure, not a wrong answer: observed in-suite
    as DuckDB `Out of Memory Error: Failed to allocate block of 2048
    bytes (bad allocation)` — std::bad_alloc for a 2 KB block on a 125 GB
    box while concurrent Spark JVMs spiked RSS. The comparison itself is
    deterministic; the allocation environment is not, so these retry
    instead of failing the gate."""
    msg = str(exc)
    return isinstance(exc, MemoryError) or (
        "Out of Memory" in msg
        or "bad allocation" in msg
        or "bad_alloc" in msg
        or "Cannot allocate memory" in msg
    )


_LIMIT_BOUND_RE = None


def _is_limit_bound(exc: BaseException) -> bool:
    """DETERMINISTIC memory-limit failure, not ambient pressure: DuckDB's
    buffer manager hitting its configured ceiling reports usage against
    the limit — 'failed to pin block of memory size ... (7.4 GiB/7.4 GiB
    used)' / 'could not allocate block ... memory limit'. Replaying these
    unchanged can never succeed (r7 ADVICE: 3 pointless replays of the
    sf1 ann_recall_eval pin failure); the right reaction is raising the
    limit once."""
    global _LIMIT_BOUND_RE
    if _LIMIT_BOUND_RE is None:
        import re
        _LIMIT_BOUND_RE = re.compile(
            r"\([0-9.]+ ?[KMGT]iB/[0-9.]+ ?[KMGT]iB used\)|memory limit"
        )
    msg = str(exc)
    if "bad allocation" in msg or "bad_alloc" in msg \
            or "Cannot allocate memory" in msg:
        return False  # OS/allocator-level: ambient, not the limit
    return bool(_LIMIT_BOUND_RE.search(msg))


def _retry_oom(step, attempts=3, wait_s=10.0, escalate=None):
    """Run ``step()``; classify allocation failures (r8 hardening):

    - limit-bound (deterministic — DuckDB pinned against its configured
      memory_limit): call ``escalate()`` ONCE to raise the limit and
      retry immediately; without an escalator, or if it already ran,
      re-raise at once — replaying an unchanged limit failure is
      pointless.
    - ambient (std::bad_alloc under sibling-process RSS spikes): gc and
      retry after a pause, up to ``attempts``.

    Non-OOM exceptions propagate immediately."""
    import gc

    escalated = False
    i = 0
    while True:
        try:
            return step()
        except Exception as exc:  # noqa: BLE001 — classified below
            if not _is_transient_oom(exc) and not _is_limit_bound(exc):
                raise
            if _is_limit_bound(exc):
                if escalate is None or escalated:
                    raise
                escalated = True
                escalate()
                continue  # deterministic: retry NOW with the raised limit
            i += 1
            if i >= attempts:
                raise
            gc.collect()
            time.sleep(wait_s)


def run_checks(sf_dir, only=(), spark=None, out=print):
    """Compare every registry query against its DuckDB oracle at ``sf_dir``.

    Returns the list of failing query names. Used by the CLI below AND by
    tests/test_full_registry_oracle.py — the CI guard that keeps queries
    outside the driver's graded window oracle-verified every run.
    """
    import duckdb

    import __spark_entry__ as entrymod
    from e_commerce_etl_pipeline_spark.session import get_spark

    only = set(only)
    if spark is None:
        spark = get_spark("check_oracle")
    con = duckdb.connect()
    # Bounded footprint: without a limit DuckDB's buffer manager is free
    # to claim 80% of RAM, which composes badly with a Spark JVM in the
    # same process tree (the observed bad_alloc flake). 12 GB covers
    # every oracle through sf1 (the old 8 GB default pinned out on the
    # sf1 ann_recall_eval oracle at 7.4 GiB — r7 ADVICE); when a bigger
    # corpus still pins out, _retry_oom escalates ONCE to the ceiling
    # below instead of failing (or pointlessly replaying).
    con.sql(f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCKDB_MEM', '12GB')}'")
    con.sql("SET threads TO 8")

    def raise_duckdb_limit():
        ceiling = os.environ.get("SPARK_GRAFT_DUCKDB_MEM_MAX", "48GB")
        out(f"  (memory-limit pin: escalating DuckDB memory_limit to {ceiling})")
        con.sql(f"SET memory_limit='{ceiling}'")
    for t in TABLES:
        # driver testdata ships single-file tables; generated scale
        # corpora (tools/gen_scale.py) are Spark-written DIRECTORIES of
        # part files — DuckDB needs the glob form for those. Subset
        # scale corpora (gen_scale's TABLES argument) legitimately lack
        # tables: register what exists, so checks scoped to the present
        # tables run; a query touching a missing one fails loudly with
        # DuckDB's missing-view error.
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            out(f"  (no {t}.parquet in {sf_dir} — view not registered)")
            continue
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    # Shared-closure mode (VERDICT r8 #8, opt-in via env): at big SFs the
    # minhash-pair transitive closure embedded by dedup_canonical_best
    # AND (twice) by dedup_aware_sample dominates — each embedding
    # recomputes it (r8 extrapolated 45-60 min each at sf10). With
    # SPARK_GRAFT_ORACLE_SHARED_CLOSURE=1 the closure is computed ONCE
    # into a temp table (still DuckDB's own recursive CTE — the oracle
    # algorithm is unchanged, just not repeated) and the embedded text
    # is substituted with a scan. Default OFF: at graded SFs the direct
    # form is fast and maximally independent.
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    closure_sql = None
    if os.environ.get("SPARK_GRAFT_ORACLE_SHARED_CLOSURE") == "1":
        from e_commerce_etl_pipeline_spark.extensions.components import (
            _dedup_clusters_sql,
        )

        closure_sql = _dedup_clusters_sql().strip()
    closure_ready = False

    def _oracle_sql_for(name: str) -> str:
        nonlocal closure_ready
        osql = oracles[name]
        if closure_sql and closure_sql in osql:
            if not closure_ready:
                t = time.time()
                con.sql(
                    "CREATE TEMP TABLE oracle_dedup_closure AS "
                    + closure_sql
                )
                out(f"  (shared dedup closure materialized once, "
                    f"{time.time()-t:.1f}s)")
                closure_ready = True
            osql = osql.replace(
                closure_sql, "SELECT * FROM oracle_dedup_closure"
            )
        return osql

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            def spark_side():
                sdf = fn(spark, sf_dir)
                return sdf, sdf.columns, [tuple(r) for r in sdf.collect()]

            sdf, scols, srows = _retry_oom(spark_side)
        except Exception as e:
            out(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            out(f"SKIP {name}: no oracle ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            def duck_side():
                rel = con.sql(_oracle_sql_for(name))
                return rel, rel.columns, rel.fetchall()

            rel, dcols, drows = _retry_oom(duck_side, escalate=raise_duckdb_limit)
        except Exception as e:
            out(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        # pandas-path dtype check: a pandas/Arrow-based canonicalizer sees
        # Spark decimals as object(Decimal) but DuckDB decimals as float64
        # (and DuckDB HUGEINT sums as float64/object) — catch any column
        # whose dtype KIND diverges between the two conversion paths.
        try:
            spd, dpd = _retry_oom(lambda: (sdf.toPandas(), rel.df()),
                                  escalate=raise_duckdb_limit)
            for c in sorted(set(spd.columns) & set(dpd.columns)):
                sk, dk = spd[c].dtype.kind, dpd[c].dtype.kind
                # every kind divergence is a finding (the old extra clause
                # `{sk, dk} != {"O"}` was vacuous: only reached when sk != dk,
                # where the set always has two elements)
                if sk != dk:
                    problems.append(f"pandas dtype kind mismatch {c}: spark={spd[c].dtype} duckdb={dpd[c].dtype}")
        except Exception as e:  # pandas conversion itself failing is a finding
            problems.append(f"pandas conversion error: {e}")
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            sh, dh = table_hash(scols, srows), table_hash(dcols, drows)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show first differing line for debugging
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sl = sorted("|".join(norm_cell(r[i]) for i in so) for r in srows)
                dl = sorted("|".join(norm_cell(r[i]) for i in do) for r in drows)
                for a, b in zip(sl, dl):
                    if a != b:
                        problems.append(f"  spark:  {a[:200]}")
                        problems.append(f"  duckdb: {b[:200]}")
                        break
        if problems:
            out(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                out(p)
            failures.append(name)
        else:
            out(f"OK   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    out(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    failures = run_checks(sf_dir, only=sys.argv[2:])
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
