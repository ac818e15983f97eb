"""Bucketed-table layout — the co-located join path.

At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
sides. Hash-bucketed tables (``bucketBy`` at write time) pre-shuffle the
data ON DISK: two tables bucketed by the same key into the same bucket
count join bucket-to-bucket with NO exchange at query time — the
pre-paid shuffle amortizes over every subsequent join/aggregation on
that key. ``sortBy`` within buckets additionally removes the sort from
sort-merge joins.

This is the persistent complement to ``repartition`` (per-query) and
``broadcast`` (small side only): use it for the handful of huge tables
that join on the same key constantly (fact↔fact, fact↔large-dim).

Spark requires bucketed data to live in a catalog table
(``saveAsTable``), not a bare path — the bucket spec is catalog
metadata. Plan evidence is asserted in tests/test_plans.py: the bucketed
join has no ShuffleExchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a hash-bucketed (optionally bucket-sorted)
    catalog table. ``n_buckets`` should match across tables that will
    join, and be sized so one bucket ≈ one task's worth of data at the
    target scale (e.g. 100 TB / 512 MB ≈ 200k buckets)."""
    writer = df.write.mode("overwrite").format(format).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table; Spark's scan reports the bucket
    spec as its output partitioning, which is what lets the planner drop
    the exchange."""
    return spark.table(table)
