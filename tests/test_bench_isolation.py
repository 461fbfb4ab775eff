"""bench.py fault isolation: one broken query must not zero the artifact.

Round 3 lost the entire BENCH artifact because a single failing query
aborted the harness before the JSON line was printed. This drives
``bench.main()`` with a deliberately broken query injected into a
two-entry headline list and asserts the JSON line still comes out, with
the failure recorded per-query and timings for the healthy query intact.
"""

from __future__ import annotations

import json
import os


def test_bench_emits_json_despite_broken_query(spark, monkeypatch, capsys):
    import bench
    import __spark_entry__ as entrymod

    real = entrymod.queries()

    def broken(_spark, _sf_dir):
        raise RuntimeError("deliberately broken for the isolation test")

    fake = dict(real)
    fake["__broken__"] = broken
    monkeypatch.setattr(entrymod, "queries", lambda: fake)
    monkeypatch.setattr(bench, "HEADLINE", ["__broken__", "q1_pricing_summary"])
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_TAIL", "0")
    # get_spark reuses the active session, so no second JVM spins up
    bench.main()

    stdout = capsys.readouterr().out
    lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {stdout!r}"
    out = json.loads(lines[0])
    assert out["metric"] == "headline_queries_total_time"
    assert "q1_pricing_summary" in out["queries"]
    assert "__broken__" not in out["queries"]
    assert "deliberately broken" in out["errors"]["__broken__"]
    # A partial run must not masquerade as a comparable total (ADVICE r4):
    # errors present => valid false and the headline totals nulled.
    assert out["valid"] is False
    assert out["value"] is None
    assert out["total_warm"] is None


def test_bench_clean_run_is_valid(spark, monkeypatch, capsys):
    import bench

    monkeypatch.setattr(bench, "HEADLINE", ["q1_pricing_summary"])
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_TAIL", "0")
    bench.main()

    stdout = capsys.readouterr().out
    out = json.loads([ln for ln in stdout.splitlines() if ln.startswith("{")][0])
    assert out["valid"] is True
    assert out["value"] is not None and out["value"] > 0
    assert out["total_warm"] is not None
    assert "errors" not in out
