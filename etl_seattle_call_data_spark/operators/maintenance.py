"""Table maintenance: small-file compaction.

Streaming sinks and fine-grained partitioned writes accumulate many
small files; at scale the file-listing and per-file open costs dominate
scans long before data volume does (the classic "millions of 1 MB
files" failure). Compaction rewrites a parquet directory into files of
roughly ``target_file_bytes`` each.

The rewrite is a read → repartition(n) → write of the same data — fully
distributed, no driver data movement; only file SIZES are consulted
driver-side (metadata, same class as a partition listing). Publication
is write-new-then-swap: readers mid-scan of the old directory are the
caller's concern (run in a maintenance window, or point readers through
a manifest like streaming/sinks.py does).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession




def _heal_and_swap(spark: SparkSession, path: str, tmp: str) -> None:
    """Publish ``tmp`` as ``path`` via rename-swap, healing leftovers of
    a previous crashed swap first: a stale ``__old`` beside a live
    ``path`` is deleted; a stale ``__old`` with ``path`` missing (crash
    between the two renames) is restored before swapping. Finishes with
    ``refreshByPath`` so Spark's cached file listings/data for the old
    files are invalidated (in-place rewrites otherwise serve stale
    cached scans)."""
    old = path.rstrip("/") + "__old"
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)  # prior run crashed after swap, before cleanup
        else:
            os.rename(old, path)  # prior run crashed mid-swap: restore
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    spark.catalog.refreshByPath(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Compact the parquet directory at ``path`` to ceil(total_bytes /
    target_file_bytes) files. Returns the new file count."""
    df = spark.read.parquet(path)
    files = [f[len("file:"):] if f.startswith("file:") else f for f in df.inputFiles()]
    total = sum(os.path.getsize(f) for f in files if os.path.exists(f))
    n = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    _heal_and_swap(spark, path, tmp)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet") or f.startswith("part-")]
    )


def cluster_parquet(
    spark: SparkSession,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
) -> int:
    """Rewrite a parquet directory range-partitioned + sorted on
    ``cluster_by`` — the linear-clustering analog of CLUSTER BY /
    OPTIMIZE ... ZORDER for the single-key case.

    Why it matters at scale: parquet stores per-row-group min/max stats,
    and a scan with a predicate on ``cluster_by`` skips every row group
    whose [min, max] misses the predicate. On randomly-laid-out data
    every row group straddles the whole key range (nothing skips); after
    clustering each file/row-group covers a narrow disjoint slice, so a
    point/range query reads O(selectivity) bytes instead of O(table).

    repartitionByRange samples the key to build balanced range bounds
    (one pass + one shuffle, fully distributed); sortWithinPartitions is
    a per-partition local sort with no extra shuffle. Returns the new
    file count."""
    df = spark.read.parquet(path)
    if n_files is None:
        n_files = max(1, df.rdd.getNumPartitions())
    clustered = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(*cluster_by)
    tmp = path.rstrip("/") + "__clustering"
    clustered.write.mode("overwrite").parquet(tmp)
    _heal_and_swap(spark, path, tmp)
    return len([f for f in os.listdir(path) if f.startswith("part-")])
