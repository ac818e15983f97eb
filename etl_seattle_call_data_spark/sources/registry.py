"""Test-table registry: the driver's TPC-H-ish parquet datasets.

One `spark.read.parquet` per table — columnar scan, schema from parquet
footer, filter/column pushdown handled by Catalyst. Registered as temp
views so both the DataFrame and `spark.sql` query surfaces work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns written as parquet TIMESTAMP(NANOS) — Spark can only read these
# as raw nanosecond longs (spark.sql.legacy.parquet.nanosAsLong); we convert
# to microsecond timestamps by truncation, matching DuckDB's ns→µs scan.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the engine depends on, set defensively because the
    driver may hand us a session it configured itself."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _normalize_temporals(df: DataFrame, name: str) -> DataFrame:
    """NTZ → LTZ (value-preserving under UTC) and nanos-long → timestamp."""
    nanos = set(NANOS_TS_COLS.get(name, ()))
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if f.name in nanos and isinstance(f.dataType, T.LongType):
            # integral DIV: `/` would round-trip through double and lose µs
            c = F.timestamp_micros(F.expr(f"`{f.name}` DIV 1000"))
        elif isinstance(f.dataType, T.TimestampNTZType):
            c = c.cast("timestamp")
        cols.append(c.alias(f.name))
    return df.select(*cols)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_temporals(df, name)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES, register_views: bool = True
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
