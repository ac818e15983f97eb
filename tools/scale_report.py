"""Scaling report: per-query wall-time growth between two BENCH_DETAIL
snapshots at different scale factors.

    python tools/scale_report.py BENCH_DETAIL.json BENCH_DETAIL_sf1.json

For a data-size ratio R (sf ratio), a perfectly linear query grows <= R
(in practice far less on small data, where fixed overheads dominate).
The report buckets queries by growth/R:

  sub-linear   growth <= 0.5 R     (fixed costs still dominate)
  linear       growth <= 1.5 R     (data-bound, the design target)
  super-linear growth  > 1.5 R     (flagged: quadratic candidate
                                    generation, collapsed parallelism,
                                    or spill — investigate each)

Caveats printed with the numbers: sub-second queries carry ~2x run-to-
run jitter on shared hosts (CLAUDE.md), so only queries above a floor
(default 0.3 s at the larger SF) are eligible for the super-linear flag.
"""

from __future__ import annotations

import argparse
import json
import math


def load(path: str) -> tuple[dict[str, float], float]:
    d = json.load(open(path))
    qs = d["queries"] if "queries" in d else d
    return {k: float(v) for k, v in qs.items()}, float(d.get("sf", 0) or 0)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("small")
    ap.add_argument("large")
    ap.add_argument("--flag-floor", type=float, default=0.3,
                    help="min seconds at the larger SF for super-linear flagging")
    ap.add_argument("--markdown", action="store_true")
    ns = ap.parse_args()
    small, sf_s = load(ns.small)
    large, sf_l = load(ns.large)
    if not sf_s or not sf_l:
        raise SystemExit("both snapshots must carry an 'sf' field")
    R = sf_l / sf_s
    common = sorted(set(small) & set(large))
    rows = []
    for n in common:
        g = large[n] / small[n] if small[n] > 0 else math.inf
        rows.append((n, small[n], large[n], g))
    gm = math.exp(sum(math.log(r[3]) for r in rows) / len(rows)) if rows else 1.0
    sub = [r for r in rows if r[3] <= 0.5 * R]
    lin = [r for r in rows if 0.5 * R < r[3] <= 1.5 * R]
    sup = [r for r in rows if r[3] > 1.5 * R and r[2] >= ns.flag_floor]
    noise_sup = [r for r in rows if r[3] > 1.5 * R and r[2] < ns.flag_floor]
    print(f"data ratio R={R:g}; {len(common)} common queries; "
          f"geomean growth {gm:.2f}x (vs R={R:g} for linear)")
    print(f"  sub-linear (<=0.5R): {len(sub)}   linear (<=1.5R): {len(lin)}   "
          f"super-linear flagged: {len(sup)}   (below-floor noise: {len(noise_sup)})")
    for n, s, l, g in sorted(sup, key=lambda r: -r[3]):
        print(f"  SUPER-LINEAR {n}: {s:.3f}s -> {l:.3f}s ({g:.1f}x, {g / R:.2f}R)")
    if ns.markdown:
        print()
        print(f"| query | {sf_s:g} s | {sf_l:g} s | growth | growth/R |")
        print("|---|---|---|---|---|")
        for n, s, l, g in sorted(rows, key=lambda r: -r[3])[:20]:
            print(f"| {n} | {s:.3f} | {l:.3f} | {g:.1f}x | {g / R:.2f} |")
    return 1 if sup else 0


if __name__ == "__main__":
    raise SystemExit(main())
