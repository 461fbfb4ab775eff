"""Scaling-exponent report: two bench.py JSON artifacts -> per-query
alpha, where warm time t ~ n^alpha between the two scale factors
(alpha = log(t_big/t_small) / log(sf_big/sf_small)).

Reading the exponents honestly: local[32] wall-clock includes a
per-query constant (job scheduling, plan execution setup, small-stage
latency) that dominates sub-100ms queries, so tiny-t queries show
alpha ~ 0 regardless of their true complexity; alpha is only
meaningful when the bigger run spends real executor time. The report
therefore also prints the absolute times and flags only queries that
are BOTH slow at the big sf AND super-linear.

Usage: python tools/scaling_report.py SMALL.json BIG.json [ratio]
"""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict[str, float]:
    d = json.load(open(path))
    out = dict(d.get("queries_warm") or {})
    out.update(d.get("registry_tail_warm") or {})
    return out


def main() -> None:
    small, big = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for name in sorted(set(small) & set(big)):
        ts, tb = small[name], big[name]
        if ts <= 0 or tb <= 0:
            continue
        alpha = math.log(tb / ts) / math.log(ratio)
        rows.append((alpha, tb, ts, name))
    rows.sort(reverse=True)

    print(f"| query | warm@small (s) | warm@big (s) | alpha |")
    print("|---|---|---|---|")
    for alpha, tb, ts, name in rows:
        flag = " ⚠" if alpha > 1.15 and tb > 1.0 else ""
        print(f"| {name}{flag} | {ts:.3f} | {tb:.3f} | {alpha:+.2f} |")

    worst = [(a, n) for a, tb, _, n in rows if a > 1.15 and tb > 1.0]
    tot_s = sum(ts for _, _, ts, _ in rows)
    tot_b = sum(tb for _, tb, _, _ in rows)
    print(f"\ntotal warm: {tot_s:.1f}s -> {tot_b:.1f}s "
          f"(overall alpha {math.log(tot_b / tot_s) / math.log(ratio):+.2f})")
    if worst:
        print(f"super-linear AND slow (alpha>1.15, t>1s): {worst}")
    else:
        print("no query is both super-linear and slow")


if __name__ == "__main__":
    main()
