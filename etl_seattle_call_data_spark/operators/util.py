"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Small-input guard before CPU-heavy per-row ops (tokenize/explode,
    pair-join dot products): a table that arrives in a handful of parquet
    splits would otherwise run on a handful of tasks (observed: 1 task
    for a single-file table, serializing the whole stage). At real scale
    the scan has natural parallelism and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        # file count is a plan-side metadata probe; df.rdd.getNumPartitions()
        # would build (and translate) the whole RDD plan per invocation
        n_input = len(df.inputFiles())
    except Exception:
        return df.repartition(target)
    if 0 < n_input < target:
        return df.repartition(target)
    return df


_last_cached: dict[str, DataFrame] = {}


def cache_swap(key: str, df: DataFrame):
    """Persist ``df`` (MEMORY_AND_DISK), releasing whatever the same
    operator persisted on a previous invocation. Operators that persist
    an intermediate (e.g. the dedup shingle set) are re-invoked with
    fresh DataFrames every run; without this the executor cache
    accumulates one dead copy per invocation in a long-lived session."""
    from pyspark.storagelevel import StorageLevel

    old = _last_cached.get(key)
    if old is not None:
        old.unpersist(False)
    _last_cached[key] = df.persist(StorageLevel.MEMORY_AND_DISK)
    return _last_cached[key]
