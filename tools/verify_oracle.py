"""Driver-contract simulation: run every `queries()` entry on a
default-config SparkSession and hash-compare against its `oracle_sql()`
via DuckDB on the same parquet tables.

Usage:
    python tools/verify_oracle.py [query ...]      # default: all queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/verify_oracle.py
    python tools/verify_oracle.py --tuned [query ...]   # NON-driver-sim
    python tools/verify_oracle.py --digest [query ...]  # no-collect compare

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

--digest replaces the row collect with an order-insensitive aggregate
digest computed INSIDE each engine: (row count, SUM and BIT_XOR of a
60-bit per-row md5 over a canonical row string). No result row ever
crosses to the driver, so arbitrarily large results (the sf10
salted_join_parity 15M-row output that killed the row-mode harness,
docs/SCALING.md "harness-bounded" table) verify in O(result) engine
time and O(1) driver memory. Exactness story:

* integers / decimals / dates / booleans / strings: CAST AS STRING is
  format-identical across Spark and DuckDB (decimal casts preserve
  scale on both).
* timestamps: pinned to a 6-digit-micros format on both engines
  (date_format vs strftime) — CAST differs (DuckDB trims trailing
  zeros), so we never use it.
* doubles: string formatting is NOT portable (Java's %.17e pads the
  shortest-repr digits instead of correctly rounding — verified:
  1/3 → ...333300e-01 in Java vs ...333315e-01 in C), so doubles are
  decomposed ARITHMETICALLY into sign:exponent:52-bit-mantissa using
  only exact operations (power-of-two scaling, one log2 guess with an
  exact-comparison correction) — bit-exact in both engines, verified
  on subnormals, extremes, NaN/Inf. ±0.0 intentionally collapse to
  '0' on both sides (row mode distinguishes them; the digest doesn't
  need to — the collapse is symmetric).
* the 60-bit row hash: Spark takes the first 15 hex chars of md5
  big-endian via conv(); DuckDB exposes the first 8 digest bytes
  little-endian (md5_number_upper), so the tool byteswaps in HUGEINT
  arithmetic and floor-divides by 16 — verified equal on both engines.

SUM is carried as DECIMAL(38,0)/HUGEINT (no bigint overflow at any
realistic row count); SUM+XOR+COUNT together make an adversarial
collision implausible and an accidental one ~2^-120.
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


# ---------------------------------------------------------------- digest

NULL_SENTINEL = "<NULL>"
CELL_SEP = "\x1f"

# sign:exponent:mantissa decomposition of a double using only exact ops.
# {c} is the column reference; engine-portable modulo the literal spellings
# handled by the two wrappers below.
_DECOMP = (
    # the explicit NULL arm matters on DuckDB: its concat() skips NULL
    # args, so the ELSE decomposition of a NULL double would yield a
    # non-NULL fragment and dodge the outer coalesce sentinel
    "CASE WHEN {c} IS NULL THEN NULL"
    " WHEN isnan({c}) THEN 'NaN'"
    " WHEN {c} = {inf} THEN 'Inf'"
    " WHEN {c} = {ninf} THEN '-Inf'"
    " WHEN {c} = 0 THEN '0'"
    " ELSE {body} END"
)


def _decomp_body(c: str, p2: str) -> str:
    """Exact (sign, exponent, 53-bit significand) of double `c`.

    `p2(e)` must be the engine's exact power-of-two; log2's float error
    at bin boundaries is corrected by two exact comparisons. Subnormals
    are pre-scaled by 2^300 (exact) into the normal range.
    """
    x2 = f"(CASE WHEN abs({c}) < {p2}(-900) THEN {c} * {p2}(300) ELSE {c} END)"
    bias = f"(CASE WHEN abs({c}) < {p2}(-900) THEN 300 ELSE 0 END)"
    eg = f"CAST(floor(log2(abs({x2}))) AS INT)"
    e = (
        f"(CASE WHEN abs({x2}) >= {p2}(({eg})+1) THEN ({eg})+1"
        f" WHEN abs({x2}) < {p2}({eg}) THEN ({eg})-1 ELSE ({eg}) END)"
    )
    return (
        f"concat(CASE WHEN {x2} < 0 THEN '-' ELSE '+' END, ':',"
        f" CAST(({e}) - {bias} AS STRING), ':',"
        f" CAST(CAST(abs({x2}) / {p2}({e}) * 4503599627370496 AS BIGINT) AS STRING))"
    )


def _spark_cell(col: str, dtype: str) -> str:
    c = f"`{col}`"
    dt = dtype.lower()
    if dt in ("double", "float"):
        if dt == "float":
            c = f"CAST({c} AS DOUBLE)"
        # _P2_ placeholder keeps the engine-specific power-of-two spelling
        # out of the shared decomposition template
        expr = _DECOMP.format(
            c=c,
            inf="double('Infinity')",
            ninf="double('-Infinity')",
            body=_decomp_body(c, "_P2_"),
        ).replace("_P2_(", "power(2.0d, ")
        return expr
    if dt.startswith("decimal") or dt in (
        "bigint", "int", "smallint", "tinyint", "boolean", "string", "date"
    ):
        return f"CAST({c} AS STRING)"
    if dt.startswith("timestamp"):
        return f"date_format({c}, 'yyyy-MM-dd HH:mm:ss.SSSSSS')"
    raise ValueError(f"digest mode: unsupported Spark type {dtype} for column {col}")


def _duck_cell(col: str, dtype: str) -> str:
    c = f'"{col}"'
    dt = dtype.upper()
    if dt in ("DOUBLE", "FLOAT", "REAL"):
        c = f"CAST({c} AS DOUBLE)"
        return _DECOMP.format(
            c=c,
            inf="'infinity'::DOUBLE",
            ninf="'-infinity'::DOUBLE",
            body=_decomp_body(c, "_P2_"),
        ).replace("_P2_(", "power(2.0, ").replace(" AS STRING", " AS VARCHAR")
    if dt.startswith("DECIMAL") or dt in (
        "HUGEINT", "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
        "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT", "BOOLEAN", "VARCHAR", "DATE",
    ):
        return f"CAST({c} AS VARCHAR)"
    if dt.startswith("TIMESTAMP"):
        return f"strftime({c}, '%Y-%m-%d %H:%M:%S.%f')"
    raise ValueError(f"digest mode: unsupported DuckDB type {dtype} for column {col}")


def spark_digest(sdf):
    """(count, hash_sum, hash_xor) computed inside Spark — no row collect."""
    from pyspark.sql import functions as F

    cols = sorted(sdf.columns)
    cells = [
        F.coalesce(F.expr(_spark_cell(c, dict(sdf.dtypes)[c])), F.lit(NULL_SENTINEL))
        for c in cols
    ]
    h = F.expr(
        "CAST(conv(substring(md5(__row__), 1, 15), 16, 10) AS BIGINT)"
    )
    out = (
        sdf.select(F.concat_ws(CELL_SEP, *cells).alias("__row__"))
        .select(h.alias("__h__"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("__h__").cast("decimal(38,0)")).alias("hsum"),
            F.expr("bit_xor(__h__)").alias("hxor"),
        )
        .collect()[0]
    )
    return int(out["cnt"]), int(out["hsum"] or 0), int(out["hxor"] or 0)


def duck_digest(con, sql: str):
    """(count, hash_sum, hash_xor) computed inside DuckDB on the oracle SQL.

    Returns (cols, digest). md5_number_upper is the little-endian first 8
    digest bytes; the HUGEINT byteswap + //16 reproduces Spark's
    conv(first-15-hex-chars) exactly (verified).
    """
    con.execute("CREATE OR REPLACE TEMP VIEW __digest_q AS " + sql)
    desc = con.execute("DESCRIBE __digest_q").fetchall()
    types = {r[0]: r[1] for r in desc}
    cols = sorted(types)
    cells = ", ".join(
        f"coalesce({_duck_cell(c, types[c])}, '{NULL_SENTINEL}')" for c in cols
    )
    swap = " + ".join(
        f"(u >> {8 * i} & 255)::HUGEINT * {1 << (8 * (7 - i))}" for i in range(8)
    )
    row = con.execute(
        f"""
        WITH r AS (SELECT concat_ws(chr(31), {cells}) AS s FROM __digest_q),
        h AS (SELECT CAST((SELECT {swap} FROM (SELECT md5_number_upper(s) AS u)) // 16 AS BIGINT) AS h FROM r)
        SELECT count(*) AS cnt, sum(h) AS hsum, bit_xor(h) AS hxor FROM h
        """
    ).fetchone()
    return cols, (int(row[0]), int(row[1] or 0), int(row[2] or 0))


def main() -> int:
    from pyspark.sql import SparkSession

    import duckdb
    import __spark_entry__ as e

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    argv = sys.argv[1:]
    known_flags = {"--tuned", "--digest"}
    bad = [a for a in argv if a.startswith("--") and a not in known_flags]
    if bad:
        print(
            f"usage: verify_oracle.py [--tuned] [--digest] [query ...]; "
            f"unknown flags: {bad}",
            file=sys.stderr,
        )
        return 2
    tuned = "--tuned" in argv
    digest = "--digest" in argv
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
        if digest:
            try:
                sdf = qs[name](spark, sf)
                ocols, od = duck_digest(con, osql[name])
                if sorted(sdf.columns) != ocols:
                    fails.append((name, f"cols {sorted(sdf.columns)} vs {ocols}"))
                    continue
                sd = spark_digest(sdf)
                if sd != od:
                    fails.append((name, f"digest spark={sd} oracle={od}"))
                    continue
                print(
                    f"{name}: DIGEST OK (count={sd[0]}, sum={sd[1]}, xor={sd[2]})",
                    file=sys.stderr,
                )
            except Exception as ex:
                fails.append((name, f"EXC {type(ex).__name__}: {ex}"))
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
