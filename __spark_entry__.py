"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke on sf0.001.
``queries()`` — one named callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — matching DuckDB SQL for the hash-compare gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from etl_seattle_call_data_spark.plans.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The star-join revenue rollup: multi-hop dim joins + decimal-exact
    aggregation — the engine's headline relational path.
    """
    return REGISTRY["star_join_region_revenue"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted => rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
