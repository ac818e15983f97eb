"""Replicates the driver's correctness gate locally: run every registered
query on Spark AND its DuckDB oracle on the same parquet, then compare
row count, column names, and exact cell values (order-insensitive).

Exact equality is intentional — if this passes, any reasonable
value-hashing scheme the driver uses also passes.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_seattle_call_data_spark.plans.queries import REGISTRY
from etl_seattle_call_data_spark.sources.registry import TABLES

import os

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")  # driver gate: sf0.01


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(rows, cols):
    """Sort columns by name, then rows; normalize cell values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)  # full precision — exactness is the point
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
WEAK_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    q = REGISTRY[name]
    sdf = q.spark(spark, SF_DIR)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(SF_DIR)
    rel = con.sql(q.oracle)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first={mismatches[0]}"


def test_no_rows_only_queries_remain():
    """Every query is oracle-paired — the rows-only fallback tier is
    empty (enforced structurally by test_plans.py's metadata test)."""
    assert WEAK_QUERIES == []


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
