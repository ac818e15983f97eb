"""Cross-engine property tests for verify_oracle's --digest mode.

The digest replaces the row-collect compare with in-engine aggregates
(count, SUM and BIT_XOR of a 60-bit per-row md5 over a canonical row
string). These tests pin the two load-bearing claims:

1. canonicalization parity — for every supported column type, Spark and
   DuckDB produce the SAME digest for the same logical values, including
   the nasty corners (subnormal doubles, NaN/Inf, NULLs, decimal scale,
   timestamp micros, 1-ulp neighbours being DISTINCT);
2. sensitivity — the digest detects a changed cell, a dropped row, a
   NULL-vs-value swap, and a cell-boundary shuffle ('ab','c' vs
   'a','bc').

Rationale for the arithmetic double decomposition (not string
formatting): Java's %.17e pads shortest-repr digits instead of
correctly rounding (1/3 renders ...333300e-01 in Java vs ...333315e-01
in C), so any printf-style scheme silently diverges between engines.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from verify_oracle import duck_digest, spark_digest  # noqa: E402


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


NASTY_DOUBLES = [
    ("1.0d/3.0d", "1.0/3.0"),  # 1.0/3.0 unsuffixed is DECIMAL division in Spark
    ("0.1d", "0.1::DOUBLE"),
    ("123.456d", "123.456::DOUBLE"),
    ("1e300d", "1e300::DOUBLE"),
    ("1e-300d", "1e-300::DOUBLE"),
    ("double('4.9e-324')", "5e-324::DOUBLE"),  # min subnormal
    ("double('4.9406564584124654e-310')", "4.9406564584124654e-310::DOUBLE"),
    ("double('1.7976931348623157e308')", "1.7976931348623157e308::DOUBLE"),
    ("2.0d", "2.0::DOUBLE"),
    ("-2.0d", "-2.0::DOUBLE"),
    ("0.0d", "0.0::DOUBLE"),
    ("double('NaN')", "'nan'::DOUBLE"),
    ("double('Infinity')", "'infinity'::DOUBLE"),
    ("double('-Infinity')", "'-infinity'::DOUBLE"),
    ("cast(null as double)", "NULL::DOUBLE"),
    # exact power-of-two boundaries where floor(log2(x)) is most fragile
    ("power(2.0d, 52)", "power(2.0, 52)"),
    ("power(2.0d, -1022)", "power(2.0, -1022)"),  # min normal
]


def test_double_decomposition_parity(spark, duck):
    spark_sql = " UNION ALL ".join(f"SELECT {s} AS x" for s, _ in NASTY_DOUBLES)
    duck_sql = " UNION ALL ".join(f"SELECT {d} AS x" for _, d in NASTY_DOUBLES)
    sd = spark_digest(spark.sql(spark_sql))
    cols, dd = duck_digest(duck, duck_sql)
    assert cols == ["x"]
    assert sd == dd


def test_one_ulp_neighbours_distinct(spark, duck):
    # nextafter(0.1) differs from 0.1 in the digest — exactness, not tolerance
    sd = spark_digest(spark.sql("SELECT 0.1d AS x"))
    _, dd = duck_digest(duck, "SELECT 0.1000000000000000055511151231257827::DOUBLE + 2e-17 AS x")
    assert sd != dd


def test_mixed_type_row_parity(spark, duck):
    sd = spark_digest(
        spark.sql(
            """
            SELECT 42 AS i, CAST(7 AS BIGINT) AS l, CAST(1 AS SMALLINT) AS s,
                   true AS b, 'héllo' AS t,
                   CAST('123.40' AS DECIMAL(12,2)) AS d,
                   DATE'2024-02-29' AS dt,
                   TIMESTAMP'2024-01-02 03:04:05.123456' AS ts,
                   CAST(NULL AS STRING) AS n
            """
        )
    )
    cols, dd = duck_digest(
        duck,
        """
        SELECT 42 AS i, 7::BIGINT AS l, 1::SMALLINT AS s,
               true AS b, 'héllo' AS t,
               '123.40'::DECIMAL(12,2) AS d,
               DATE '2024-02-29' AS dt,
               TIMESTAMP '2024-01-02 03:04:05.123456' AS ts,
               NULL::VARCHAR AS n
        """,
    )
    assert sd == dd
    assert cols == sorted(["i", "l", "s", "b", "t", "d", "dt", "ts", "n"])


def test_order_insensitive(spark, duck):
    sd = spark_digest(spark.sql("SELECT explode(array(3, 1, 2)) AS x"))
    _, dd = duck_digest(duck, "SELECT unnest([2, 3, 1]) AS x")
    assert sd == dd


@pytest.mark.parametrize(
    "duck_sql",
    [
        # changed cell
        "SELECT 1 AS a, 'x' AS c UNION ALL SELECT 2, 'Y'",
        # dropped row
        "SELECT 1 AS a, 'x' AS c",
        # NULL vs value
        "SELECT 1 AS a, 'x' AS c UNION ALL SELECT 2, NULL",
        # extra duplicate row (count catches it even if xor cancels)
        "SELECT 1 AS a, 'x' AS c UNION ALL SELECT 2, 'y' UNION ALL SELECT 2, 'y'",
    ],
)
def test_digest_detects_divergence(spark, duck, duck_sql):
    sd = spark_digest(spark.sql("SELECT 1 AS a, 'x' AS c UNION ALL SELECT 2, 'y'"))
    _, dd = duck_digest(duck, duck_sql)
    assert sd != dd


def test_cell_boundary_not_exploitable(spark, duck):
    sd = spark_digest(spark.sql("SELECT 'ab' AS a, 'c' AS b"))
    _, dd = duck_digest(duck, "SELECT 'a' AS a, 'bc' AS b")
    assert sd != dd


def test_unsupported_type_raises(spark):
    with pytest.raises(ValueError, match="unsupported Spark type"):
        spark_digest(spark.sql("SELECT array(1, 2) AS a"))
