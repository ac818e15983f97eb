"""Table profiling — the data-quality summary a pipeline runs before
trusting an input (the reference eyeballs ``printSchema``/``show`` at
extract time, /root/reference/ETL_Pipeline_Batch/extract.py:78-85;
this is that step made into an operator with defined output).

One pass, one row: every statistic is an aggregate expression in a
single ``agg`` call, so Spark computes the whole profile in one
partial+final aggregation over one scan — no per-column jobs, no
driver-side iteration. ``count_distinct`` is exact (a second shuffle
per distinct column); pass ``approx=True`` to use HLL++ instead, which
keeps the whole profile shuffle-free — the right trade at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    null_cols: list[str],
    distinct_cols: list[str],
    minmax_cols: list[str],
    approx: bool = False,
) -> DataFrame:
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"{c}_nulls")
        )
    for c in distinct_cols:
        d = F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
        aggs.append(d.alias(f"{c}_distinct"))
    for c in minmax_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.agg(*aggs)
