"""SparkSession factory.

Replaces the reference's static session tuning
(/root/reference/ETL_Pipeline_Batch/extract.py:15-27 — fixed 200 shuffle
partitions, 64m maxPartitionBytes, 4g heaps) with an AQE-first
configuration: adaptive execution re-plans shuffle partition counts and
skew joins at runtime, which is the posture that survives a 100 TB /
1000-executor scale-up without retuning static knobs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle-partition default tracks core count for the gate/bench SFs
# (AQE coalesces the excess), but at off-contract scale runs (sf100:
# 100GB-class shuffles on one box) the INITIAL partition count is the
# spill-size dial — 32 partitions × multi-GB each exceeds per-task
# execution memory before AQE can intervene. SPARK_GRAFT_SHUFFLE_PARTITIONS
# overrides independently of thread count; on a real cluster this is the
# usual 2-3× total-cores setting.
DEFAULT_SHUFFLE_PARTITIONS = int(
    os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
)


def get_spark(
    app_name: str = "etl-seattle-call-data-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    Local mode for tests/bench; on a real cluster the same config holds —
    AQE owns shuffle sizing, so there is no local-vs-cluster fork here.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime shuffle-partition coalescing, skew-join splitting,
        # broadcast-join demotion/promotion based on observed sizes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Coalesce floor: with the default 1m floor, a byte-light but
        # CPU-heavy shuffle (pair joins computing per-row dot products /
        # Jaccard) collapses to 1-2 tasks and serializes. 64k keeps such
        # stages wide; large shuffles are still governed by the 64m
        # advisory target, so this is scale-neutral.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Oracle parity: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas_udf / toPandas hop.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Off-contract scale runs need one-off knobs (e.g. zstd shuffle
    # compression to fit a 100x shuffle on one box's disk) without
    # changing call sites: SPARK_GRAFT_EXTRA_CONF="k=v;k=v".
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, env_conf.split(";")):
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
