"""Subset bench: time a named subset of the registry at a given SF dir
and write a scale_report-compatible snapshot.

    python tools/subset_bench.py --sf-dir .scaledata/sf10 --sf 10 \
        --out BENCH_SUBSET_sf10.json name1 name2 ...

Exists for the second-decade scale proof: running all 365 queries at
sf10 costs ~an hour and proves nothing the sf1 full sweep didn't — the
tail is already sub-linear at R=10, so only the top growers need the
second decade. Protocol matches bench.py (best-of-2 count(), cache/memo
eviction between queries is NOT needed for a ~20-query subset but a
final clear releases everything). Output JSON carries {sf, queries}
so tools/scale_report.py can diff two subset snapshots directly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_seattle_call_data_spark.operators.util import clear_caches
from etl_seattle_call_data_spark.plans.queries import REGISTRY
from etl_seattle_call_data_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--sf", type=float, required=True,
                    help="scale factor recorded in the snapshot (for scale_report's R)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("names", nargs="+")
    ns = ap.parse_args()
    unknown = [n for n in ns.names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark()
    timings: dict[str, float] = {}
    for name in ns.names:
        # evict BETWEEN queries: a subset run at sf10 in one JVM OOMs on
        # accumulated memoized caches (shingle/edge tables) otherwise,
        # and per-query eviction keeps small-SF vs large-SF timings
        # comparable (each query pays its own cache builds at both SFs)
        clear_caches()
        spark.catalog.clearCache()
        best, rows = None, 0
        for _ in range(ns.reps):
            t0 = time.perf_counter()
            rows = REGISTRY[name].spark(spark, ns.sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s rows={rows}", file=sys.stderr)
        sys.stderr.flush()
    clear_caches()
    doc = {
        "metric": "subset_query_wall_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "sf": ns.sf,
        "sf_dir": ns.sf_dir,
        "queries": timings,
    }
    with open(ns.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in ("metric", "value", "sf")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
