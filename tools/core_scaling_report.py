"""Core-scaling report: two bench_core_scaling.py artifacts (same SF,
different $SPARK_GRAFT_CPUS) -> per-query speedup ratio
t_low_cores / t_high_cores. Data-bound entries should approach the core
ratio; ratios ~1 mean the entry is at its fixed-cost floor at this SF
(or serial), and ratios are reported next to absolute times so the two
cases are distinguishable (a 0.2 s entry showing 1.0x is floor, a 20 s
one is a finding).

Usage: python tools/core_scaling_report.py LOW.json HIGH.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    low = json.load(open(sys.argv[1]))
    high = json.load(open(sys.argv[2]))
    lw, hw = low["queries_warm"], high["queries_warm"]
    print(f"| query | warm@{low['cpus']}c (s) | warm@{high['cpus']}c (s) "
          f"| ratio |")
    print("|---|---|---|---|")
    rows = []
    for name in sorted(set(lw) & set(hw)):
        if hw[name] <= 0:
            continue
        rows.append((lw[name] / hw[name], lw[name], hw[name], name))
    rows.sort(reverse=True)
    for r, tl, th, name in rows:
        print(f"| {name} | {tl:.3f} | {th:.3f} | {r:.2f}x |")
    tot_l = sum(tl for _, tl, _, _ in rows)
    tot_h = sum(th for _, _, th, _ in rows)
    print(f"\ntotal warm: {tot_l:.1f}s @{low['cpus']}c -> {tot_h:.1f}s "
          f"@{high['cpus']}c ({tot_l / tot_h:.2f}x)  "
          f"calib {low['calib_sec']} vs {high['calib_sec']}")


if __name__ == "__main__":
    main()
