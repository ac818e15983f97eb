"""Keyed upsert sink — the engine's replacement for the reference's
Cassandra primary-key table (last-write-wins on ``cad_event_number``,
/root/reference/Real_Time_Streaming/consumer/consumer_cassandra.py:106-155
and :216-222).

Implementation: versioned parquet snapshots. Each ``foreachBatch`` epoch
reads the latest snapshot, unions the new batch, keeps the newest row
per key (window row_number over the ordering column), and writes the
next snapshot directory — then publishes it via a one-line manifest.
Reading never overlaps the directory being written, so the sink is safe
against Spark's read-overwrite hazard and idempotent per epoch (epoch id
is embedded in the snapshot name; a retried epoch overwrites itself).

Scale note: a snapshot rewrite is O(store size) per epoch — fine for a
serving table keyed by recent events; at warehouse scale swap this class
for a Delta/Iceberg ``MERGE INTO`` sink (same interface, the jars aren't
in this environment). The rewrite itself is fully distributed (shuffle
on the key, no driver collect).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class KeyedUpsertSink:
    def __init__(self, path: str, key: str, order_col: str | None = None):
        self.path = path
        self.key = key
        self.order_col = order_col
        os.makedirs(path, exist_ok=True)

    @property
    def _manifest(self) -> str:
        return os.path.join(self.path, "_LATEST")

    def _latest_snapshot(self) -> str | None:
        if not os.path.exists(self._manifest):
            return None
        with open(self._manifest) as f:
            name = f.read().strip()
        return os.path.join(self.path, name) if name else None

    def read(self, spark: SparkSession) -> DataFrame | None:
        snap = self._latest_snapshot()
        return spark.read.parquet(snap) if snap else None

    def upsert_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        existing = self.read(spark)
        order_col = self.order_col or "__epoch"
        batch = batch_df.withColumn("__epoch", F.lit(epoch_id).cast("long"))
        if existing is not None:
            batch = existing.unionByName(batch, allowMissingColumns=True)
        order = [F.desc(order_col)]
        if order_col != "__epoch":
            order.append(F.desc("__epoch"))  # epoch as tiebreak for equal order values
        w = Window.partitionBy(self.key).orderBy(*order)
        latest = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        snap_name = f"snapshot-{epoch_id:012d}"
        latest.write.mode("overwrite").parquet(os.path.join(self.path, snap_name))
        tmp = self._manifest + ".tmp"
        with open(tmp, "w") as f:
            f.write(snap_name)
        os.replace(tmp, self._manifest)  # atomic publish

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``. Deliberately does NOT
        count()/show() per epoch (the reference does, forcing extra jobs
        per micro-batch — SURVEY §4.3); observe via StreamingQueryListener
        or ``query.lastProgress`` instead."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.upsert_batch(batch_df, epoch_id)

        return fn
