"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): a
deterministic partitioned synthetic source, the extensibility path for
ingesting from systems Spark has no built-in connector for (internal
REST APIs, bespoke file formats, simulators) WITHOUT leaving the
DataFrame surface — partitions parallelize across executors like any
scan, and Catalyst sees an ordinary relation (filters/projections
compose on top).

The demo source emits per-sensor readings derived from md5 integers —
no RNG, so every read of the same (sensors, rows) options produces
byte-identical data on any cluster layout: the property that makes a
custom source testable the same way the parquet tables are.

Scale posture: one InputPartition per sensor — reader parallelism is
the sensor count, each partition streams its rows lazily (generator,
never a materialized list), and no state is shared across partitions.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _h(s: str) -> int:
    """Deterministic 60-bit integer from md5 (the repo's portable-hash
    idiom, driver/executor-side Python flavor)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


class SensorReader(DataSourceReader):
    def __init__(self, options):
        self._sensors = int(options.get("sensors", "4"))
        self._rows = int(options.get("rows_per_sensor", "100"))

    def partitions(self):
        return [InputPartition(i) for i in range(self._sensors)]

    def read(self, partition):
        sid = partition.value
        for i in range(self._rows):
            h = _h(f"{sid}:{i}")
            yield (
                sid,
                _EPOCH + timedelta(seconds=30 * i),
                float(h % 100_000) / 100.0,   # 0.00 .. 999.99, deterministic
                "ok" if h % 17 else "fault",  # sparse deterministic faults
            )


class SensorDataSource(DataSource):
    """``spark.read.format("deterministic_sensor")`` after
    ``spark.dataSource.register(SensorDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "deterministic_sensor"

    def schema(self) -> str:
        return "sensor_id BIGINT, ts TIMESTAMP, reading DOUBLE, status STRING"

    def reader(self, schema) -> SensorReader:
        return SensorReader(self.options)
