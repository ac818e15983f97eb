"""Close the interval_overlap_pairs sf10 verification gap.

The REGISTERED oracle is the readable pair-materializing range join —
the right semantics spec at gate SFs, but physically intractable at
sf10: qualifying-pair density grows ~x100 per decade (docs/SCALING.md),
so DuckDB must enumerate ~10^10 pairs it immediately aggregates away.
No patience fixes that; the oracle needs the same algorithmic insight
as the engine (count pairs without materializing them).

This tool therefore verifies in TWO CHAINED exact steps:

1. EQUIVALENCE (at every tractable SF given on the command line): the
   registered range-join oracle and an independent O(n log n) DuckDB
   cumsum-differencing formulation (window running count read at signed
   +/-W probe markers — the same telescoping identity the Spark plan
   uses, but written in DuckDB SQL against DuckDB's own window engine)
   must produce IDENTICAL rows. This pins the cumsum formulation to the
   readable spec.
2. SCALE (sf10): the Spark plan vs the cumsum formulation, compared via
   verify_oracle's in-engine digest (count + SUM/XOR of per-row md5) —
   no row collect, both engines O(n log n).

Tie story (same as the Spark plan's): counted rows order BEFORE probe
markers at equal microseconds (ORDER BY us_key, flag with flag 0 =
counted), so a +W marker at t counts events with us <= t+W inclusively
and a -W-1 marker excludes us <= t-W-1 — the difference is exactly
[t-W, t+W]. Markers carry weight 0, so intra-tie order among markers
(ROWS frame arbitrariness) cannot change any cum value they read.

Usage:
    python tools/verify_interval_overlap_sf10.py \
        --equiv-sf /root/testdata/sf0.1 --equiv-sf .scaledata/sf1 \
        --scale-sf .scaledata/sf10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

W = 120_000_000

CUMSUM_SQL = f"""
WITH ev AS (SELECT event_type AS t, epoch_us(ts) AS us FROM events),
types AS (SELECT DISTINCT t FROM ev),
counted AS (
  SELECT t AS type_a, NULL::VARCHAR AS type_b, us AS us_key,
         0 AS flag, 1 AS w, 0 AS sign
  FROM ev
),
marks AS (
  SELECT ty.t AS type_a, e.t AS type_b, m.us_key, 1 AS flag, 0 AS w, m.sign
  FROM ev e
  JOIN types ty ON ty.t < e.t,
  LATERAL (VALUES (e.us + {W}, 1), (e.us - {W} - 1, -1)) AS m(us_key, sign)
),
tl AS (SELECT * FROM counted UNION ALL SELECT * FROM marks),
cum AS (
  SELECT type_a, type_b, flag, sign,
         SUM(w) OVER (PARTITION BY type_a ORDER BY us_key, flag
                      ROWS UNBOUNDED PRECEDING) AS c
  FROM tl
)
SELECT type_a, type_b, CAST(SUM(sign * c) AS BIGINT) AS n_pairs
FROM cum WHERE flag = 1
GROUP BY type_a, type_b
HAVING SUM(sign * c) > 0
"""


def _con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--equiv-sf", action="append", default=[],
                    help="SF dir(s) where BOTH oracle forms run; rows must match")
    ap.add_argument("--scale-sf", default=".scaledata/sf10",
                    help="SF dir for the Spark-vs-cumsum digest compare")
    ns = ap.parse_args()

    from etl_seattle_call_data_spark.plans.queries import REGISTRY
    from verify_oracle import duck_digest, spark_digest

    q = REGISTRY["interval_overlap_pairs"]

    for sf in ns.equiv_sf:
        con = _con(sf)
        a = sorted(map(tuple, con.execute(q.oracle).fetchall()))
        b = sorted(map(tuple, con.execute(CUMSUM_SQL).fetchall()))
        assert a == b, f"EQUIVALENCE FAILED at {sf}: {len(a)} vs {len(b)} rows"
        print(f"equivalence OK at {sf}: {len(a)} rows, "
              f"{sum(r[2] for r in a):,} total pairs", file=sys.stderr)

    from etl_seattle_call_data_spark.operators.util import clear_caches
    from etl_seattle_call_data_spark.session import get_spark

    spark = get_spark(app_name="interval-overlap-sf10")
    clear_caches()
    sdf = q.spark(spark, ns.scale_sf)
    cols, od = duck_digest(_con(ns.scale_sf), CUMSUM_SQL)
    assert sorted(sdf.columns) == cols, (sorted(sdf.columns), cols)
    sd = spark_digest(sdf)
    assert sd == od, f"SCALE DIGEST MISMATCH: spark={sd} cumsum-oracle={od}"
    print(f"scale OK at {ns.scale_sf}: DIGEST {sd}", file=sys.stderr)
    print("interval_overlap_pairs sf10: VERIFIED (equivalence + digest chain)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
