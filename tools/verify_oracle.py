"""Driver-contract simulation: run every `queries()` entry on a
default-config SparkSession and hash-compare against its `oracle_sql()`
via DuckDB on the same parquet tables.

Usage:
    python tools/verify_oracle.py [query ...]      # default: all queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/verify_oracle.py
    python tools/verify_oracle.py --tuned [query ...]   # NON-driver-sim

--tuned swaps the driver-contract session (static 200 shuffle
partitions, no AQE) for the engine's own tuned session
(etl_seattle_call_data_spark.session.get_spark: AQE on, coalesce/skew
adaptive). It exists ONLY for off-contract scale verification (sf1+,
where the iterative composites are impractically slow under the static
driver config); gate-SF sweeps must stay un-tuned so they simulate the
driver exactly. The mode is labeled in the log.

Canonicalization mirrors the driver's order-insensitive value compare:
columns sorted by name, rows sorted, cells normalized (numpy scalars
unwrapped, timestamps → ISO strings, floats repr'd — exact, no
tolerance, because the driver hashes values).
"""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    import decimal

    import numpy as np
    import pandas as pd

    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, decimal.Decimal):
        # arrow returns DECIMAL cells as Decimal; Spark rows carry float
        # after the house to-double casts — normalize to the float repr
        v = float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def main() -> int:
    from pyspark.sql import SparkSession

    import duckdb
    import __spark_entry__ as e

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    argv = sys.argv[1:]
    tuned = "--tuned" in argv
    only = set(a for a in argv if not a.startswith("--"))

    if tuned:
        # NON-driver-sim: the engine's own AQE session, for off-contract
        # scale verification only (sf1+). Correctness semantics are
        # config-independent; this changes plan shape/speed, not results.
        from etl_seattle_call_data_spark.session import get_spark

        print("MODE: --tuned (AQE session, NOT driver simulation)",
              file=sys.stderr)
        spark = get_spark(app_name="verify-oracle-tuned")
    else:
        # Default-config session on local[8] = driver-contract simulation.
        # For off-contract scale runs (sf1+), opt-in knobs size the JVM to
        # the SF — the driver itself never runs those SFs:
        #   SPARK_GRAFT_VERIFY_CPUS=16 SPARK_GRAFT_DRIVER_MEM=8g
        builder = SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_VERIFY_CPUS', '8')}]"
        )
        # Full-registry sweeps (no query args) run 350+ queries in one JVM —
        # far past the driver's own <= 50/session contract — so they get a
        # bigger heap by default; targeted runs keep the stock driver config.
        mem = os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", None if only else "6g"
        )
        if mem:
            builder = builder.config("spark.driver.memory", mem)
        spark = builder.getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    if not only:
        rows = e.entry(spark).collect()
        assert len(rows) > 0, "entry() returned 0 rows"
        print(f"entry OK: {len(rows)} rows", file=sys.stderr)

    qs, osql = e.queries(), e.oracle_sql()
    fails = []
    done = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        # Full-sweep hygiene: the driver's own sessions run <= 50
        # queries; a 350+-query sweep in ONE 1g-heap JVM accumulates
        # memoized caches (corpus/shingle tables) until the tail of the
        # alphabet dies with a dead-JVM ConnectionRefused. Evict
        # between batches — per-query semantics are unaffected.
        done += 1
        if not only and done % 40 == 0:
            spark.catalog.clearCache()
        if tuned:
            # scale runs: evict memoized caches (shingle/edge tables)
            # between queries — at sf10 they accumulate to JVM death
            from etl_seattle_call_data_spark.operators.util import clear_caches

            clear_caches()
            spark.catalog.clearCache()
        if name not in osql:
            n = qs[name](spark, sf).count()
            print(f"{name}: NO-ORACLE rows-only ({n} rows)", file=sys.stderr)
            continue
        try:
            sdf = qs[name](spark, sf)
            cols = sorted(sdf.columns)
            srows = sorted(tuple(canon(r[c]) for c in cols) for r in sdf.collect())
            # Arrow fetch, NOT fetchdf(): pandas stores SQL NULL as NaN
            # in float columns, silently conflating NULL with a genuine
            # IEEE NaN — at emptiness-edge SFs every NULL ratio row
            # would false-mismatch against Spark's None (and a real
            # NaN-vs-NULL engine divergence would false-PASS under the
            # same conflation). Arrow preserves the distinction.
            otbl = con.execute(osql[name]).fetch_arrow_table()
            if sorted(otbl.column_names) != cols:
                fails.append((name, f"cols {cols} vs {sorted(otbl.column_names)}"))
                continue
            orows = sorted(
                tuple(canon(row[c]) for c in cols) for row in otbl.to_pylist()
            )
            if srows != orows:
                nd = sum(1 for s, o in zip(srows, orows) if s != o) + abs(len(srows) - len(orows))
                first = next(((s, o) for s, o in zip(srows, orows) if s != o), (srows[-1:], orows[-1:]))
                fails.append((name, f"{nd} row diffs (of {len(srows)}/{len(orows)}); first: {first}"))
                continue
            print(f"{name}: OK ({len(srows)} rows)", file=sys.stderr)
        except Exception as ex:
            fails.append((name, f"EXC {type(ex).__name__}: {ex}"))

    print(f"\n{len(fails)} FAILURES", file=sys.stderr)
    for n, msg in fails:
        print(f"  FAIL {n}: {str(msg)[:400]}", file=sys.stderr)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
