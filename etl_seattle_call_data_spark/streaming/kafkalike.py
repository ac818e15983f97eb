"""File-backed Kafka seam — a broker-shaped log so the producer→source→
sink round-trip (reference producer/producer.py:22-37 →
consumer_cassandra.py:247-259) is testable end-to-end with NO broker in
the environment.

This is deliberately NOT a mock of our own code: it reproduces the
*contract* both ends of a real Kafka deployment rely on, so swapping in
a real cluster changes exactly two constructor calls:

* ``FileKafkaBroker.producer()`` has kafka-python's producer shape
  (``send(topic, value, key=None)`` + ``flush()``) — the same shape
  ``KafkaFeeder`` already takes as its injected ``send``;
* ``kafka_like_stream`` returns a streaming DataFrame with the EXACT
  seven-column schema of Spark's Kafka source (key/value binary, topic,
  partition, offset, timestamp, timestampType), so everything
  downstream (``decode_json_payload`` → transforms → upsert sink) runs
  unmodified against either source.

Semantics carried over from Kafka, because the pipeline's correctness
leans on them:

* per-partition monotonically increasing offsets, persisted across
  producer restarts (a ``_meta.json`` per topic — the log IS the state);
* keyed records hash to a stable partition (murmur-free stand-in:
  ``xxhash``-style Python hash is NOT stable across processes, so we
  use a explicit FNV-1a — deterministic everywhere), keyless records
  round-robin;
* ``flush()`` publishes one atomically-renamed JSONL segment per
  touched partition — the file-source analogue of a completed produce
  batch: Spark's file stream lists whole files, so a consumer never
  observes a torn batch (same invariant FileStreamFeeder documents).

Scale: a real deployment replaces this with the Kafka source and
inherits its parallelism (one Spark input partition per topic
partition). The seam keeps that property: partition dirs are listed
independently and ``maxFilesPerTrigger`` paces backfill.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark's Kafka source output schema, reproduced column-for-column.
KAFKA_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)

# On-disk segment row schema (binary goes through base64).
_SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("key_b64", T.StringType()),
        T.StructField("value_b64", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def _fnv1a(data: bytes) -> int:
    """FNV-1a 32-bit — a deterministic cross-process key hash (Python's
    builtin ``hash`` is salted per process; Kafka uses murmur2, any
    stable hash preserves the 'same key → same partition' contract)."""
    h = 0x811C9DC5
    for b in data:
        h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
    return h


class FileKafkaProducer:
    """kafka-python-shaped producer over the file log. ``send`` buffers;
    ``flush`` assigns offsets and publishes one segment file per touched
    partition (atomic rename, hidden while in flight)."""

    def __init__(self, broker: "FileKafkaBroker"):
        self.broker = broker
        self._buffer: dict[tuple[str, int], list[tuple[bytes | None, bytes]]] = {}
        self._rr: dict[str, int] = {}

    def send(self, topic: str, value: bytes, key: bytes | None = None) -> None:
        n_parts = self.broker.partitions(topic)
        if key is not None:
            part = _fnv1a(key) % n_parts
        else:
            part = self._rr.get(topic, 0) % n_parts
            self._rr[topic] = part + 1
        self._buffer.setdefault((topic, part), []).append((key, value))

    def flush(self) -> int:
        import base64

        published = 0
        for (topic, part), records in self._buffer.items():
            start = self.broker._claim_offsets(topic, part, len(records))
            pdir = self.broker._partition_dir(topic, part)
            name = f"segment-{start:012d}-{uuid.uuid4().hex[:8]}.jsonl"
            tmp = os.path.join(pdir, f".{name}.tmp")
            ts_ms = int(time.time() * 1000)
            with open(tmp, "w") as f:
                for i, (key, value) in enumerate(records):
                    f.write(
                        json.dumps(
                            {
                                "key_b64": base64.b64encode(key).decode()
                                if key is not None
                                else None,
                                "value_b64": base64.b64encode(value).decode(),
                                "topic": topic,
                                "partition": part,
                                "offset": start + i,
                                "ts_ms": ts_ms,
                            }
                        )
                        + "\n"
                    )
            os.replace(tmp, os.path.join(pdir, name))
            published += len(records)
        self._buffer.clear()
        return published


class FileKafkaBroker:
    """Topic registry + per-partition offset ledger over a directory.

    Layout: ``<root>/<topic>/partition=<p>/segment-*.jsonl`` with a
    ``<root>/<topic>/_meta.json`` holding partition count and the next
    offset per partition. Offset claims are read-modify-write on the
    meta file — single-writer per topic, which is exactly the feeder's
    deployment shape (one poller process; reference producer.py runs
    one loop)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _meta_path(self, topic: str) -> str:
        return os.path.join(self.root, topic, "_meta.json")

    def create_topic(self, topic: str, partitions: int = 4) -> None:
        tdir = os.path.join(self.root, topic)
        os.makedirs(tdir, exist_ok=True)
        if not os.path.exists(self._meta_path(topic)):
            meta = {"partitions": partitions, "next_offset": {str(p): 0 for p in range(partitions)}}
            self._write_meta(topic, meta)
        for p in range(self.partitions(topic)):
            os.makedirs(self._partition_dir(topic, p), exist_ok=True)

    def _write_meta(self, topic: str, meta: dict) -> None:
        tmp = self._meta_path(topic) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path(topic))

    def _read_meta(self, topic: str) -> dict:
        with open(self._meta_path(topic)) as f:
            return json.load(f)

    def partitions(self, topic: str) -> int:
        return int(self._read_meta(topic)["partitions"])

    def _partition_dir(self, topic: str, part: int) -> str:
        return os.path.join(self.root, topic, f"partition={part}")

    def _claim_offsets(self, topic: str, part: int, n: int) -> int:
        meta = self._read_meta(topic)
        start = int(meta["next_offset"][str(part)])
        meta["next_offset"][str(part)] = start + n
        self._write_meta(topic, meta)
        return start

    def producer(self) -> FileKafkaProducer:
        return FileKafkaProducer(self)

    def end_offsets(self, topic: str) -> dict[int, int]:
        meta = self._read_meta(topic)
        return {int(p): int(o) for p, o in meta["next_offset"].items()}


def kafka_like_stream(
    spark: SparkSession,
    broker_root: str,
    topic: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming read of a FileKafkaBroker topic with the Kafka source's
    exact schema. Drop-in for ``pipeline.kafka_stream`` in environments
    without a broker; the glob keeps ``_meta.json`` out of the listing
    and partition dirs are independent list targets, mirroring the Kafka
    source's partition-parallel reads."""
    raw = (
        spark.readStream.schema(_SEGMENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(os.path.join(broker_root, topic, "partition=*", "segment-*.jsonl"))
    )
    return raw.select(
        F.unbase64(F.col("key_b64")).alias("key"),
        F.unbase64(F.col("value_b64")).alias("value"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.timestamp_millis(F.col("ts_ms")).alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
