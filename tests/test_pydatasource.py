"""Custom Python DataSource: deterministic partitioned reads that
compose with ordinary DataFrame ops (the Spark 4 extensibility path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_seattle_call_data_spark.sources.pydatasource import SensorDataSource


def _load(spark, sensors=4, rows=50):
    spark.dataSource.register(SensorDataSource)
    return (
        spark.read.format("deterministic_sensor")
        .option("sensors", str(sensors))
        .option("rows_per_sensor", str(rows))
        .load()
    )


def test_partitioned_read_shape_and_determinism(spark):
    df = _load(spark)
    assert df.count() == 4 * 50
    # one InputPartition per sensor: reader parallelism = sensor count
    assert df.rdd.getNumPartitions() == 4
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _load(spark).collect()))
    assert a == b  # deterministic across reads


def test_composes_with_relational_ops(spark):
    df = _load(spark, sensors=3, rows=40)
    agg = (
        df.filter(F.col("status") == "ok")
        .groupBy("sensor_id")
        .agg(
            F.count(F.lit(1)).alias("n_ok"),
            F.sum(F.round(F.col("reading") * 100).cast("long")).alias("total_fp"),
        )
        .orderBy("sensor_id")
        .collect()
    )
    assert len(agg) == 3
    assert all(r.n_ok > 0 and r.total_fp > 0 for r in agg)
    # faults are sparse but present (h % 17 == 0 happens within 40 rows at
    # some sensor for this seed) — the filter actually filtered
    total = df.count()
    assert sum(r.n_ok for r in agg) < total
