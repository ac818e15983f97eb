"""Producer-side feeder (SURVEY S7/S8/T8) — the in-engine mirror of the
reference's producer process (/root/reference/Real_Time_Streaming/
producer/producer.py:7-52: poll the Socrata JSON API on a fixed cadence,
stamp each record, JSON-serialize it to Kafka).

Split the same way the reference is:

* a ``RecordSource`` pulls one poll's worth of records —
  ``HttpJsonSource`` (stdlib urllib, no vendor client) for a JSON HTTP
  endpoint with optional limit/offset pagination, ``CallableSource``
  for a local corpus / test generator;
* a feeder stamps ``processed_at`` and publishes the poll as one
  micro-batch: ``FileStreamFeeder`` writes an atomically-renamed JSONL
  file (exactly what ``file_json_stream`` consumes as one micro-batch),
  ``KafkaFeeder`` hands each record to an injected ``send(topic,
  bytes)`` callable (kafka clients aren't in this environment; with a
  real producer pass ``lambda t, v: producer.send(t, v)``);
* ``run()`` is the poll-loop cadence (reference producer.py:43-48),
  bounded by ``max_polls`` for tests.

Scale note: the feeder is a single lightweight process by design (it
mirrors one API poller); throughput scaling happens on the consumer
side, where Spark parallelizes by file/partition. Back-pressure comes
from ``maxFilesPerTrigger`` / Kafka consumer config, not the feeder.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
import urllib.request
import uuid
from collections.abc import Callable, Iterable
from datetime import datetime, timezone
from typing import Protocol


class RecordSource(Protocol):
    def fetch(self) -> list[dict]: ...


class HttpJsonSource:
    """Polls an HTTP endpoint returning a JSON array of objects
    (reference producer.py:7-20). ``limit`` enables limit/offset
    pagination: each poll advances ``offset`` by the rows received, so
    successive polls page through the upstream dataset the way the
    reference's ``$limit``/``$offset`` Socrata parameters do."""

    def __init__(
        self,
        url: str,
        limit: int | None = None,
        limit_param: str = "$limit",
        offset_param: str = "$offset",
        timeout_s: float = 10.0,
    ):
        self.url = url
        self.limit = limit
        self.limit_param = limit_param
        self.offset_param = offset_param
        self.timeout_s = timeout_s
        self.offset = 0

    def fetch(self) -> list[dict]:
        url = self.url
        if self.limit is not None:
            sep = "&" if urllib.parse.urlparse(url).query else "?"
            url += sep + urllib.parse.urlencode(
                {self.limit_param: self.limit, self.offset_param: self.offset}
            )
        with urllib.request.urlopen(url, timeout=self.timeout_s) as resp:
            records = json.loads(resp.read().decode("utf-8"))
        if not isinstance(records, list):
            raise ValueError(f"expected a JSON array of records from {url}")
        if self.limit is not None:
            self.offset += len(records)
        return records


class CallableSource:
    """Wraps any ``() -> iterable of dicts`` — a local JSON corpus
    reader, a test generator, a queue drain."""

    def __init__(self, fn: Callable[[], Iterable[dict]]):
        self.fn = fn

    def fetch(self) -> list[dict]:
        return list(self.fn())


def _stamped(records: list[dict], stamp_field: str) -> list[dict]:
    now = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
    return [{**r, stamp_field: now} for r in records]


class _PollLoop:
    """Shared poll cadence (T8): fetch → stamp → publish, sleeping
    ``interval_s`` between polls."""

    source: RecordSource
    stamp_field: str

    def poll_once(self):
        raise NotImplementedError

    def run(
        self,
        interval_s: float = 20.0,
        max_polls: int | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ) -> list:
        published = []
        n = 0
        while max_polls is None or n < max_polls:
            out = self.poll_once()
            if out is not None:
                published.append(out)
            n += 1
            if max_polls is None or n < max_polls:
                sleep(interval_s)
        return published


class FileStreamFeeder(_PollLoop):
    """One poll → one atomically-published JSONL file, which
    ``file_json_stream`` (maxFilesPerTrigger=1) consumes as exactly one
    micro-batch. The write goes to a dot-prefixed temp name (Spark's
    file source ignores hidden files) and is ``os.replace``d into place,
    so the consumer never lists a half-written file."""

    def __init__(self, out_dir: str, source: RecordSource, stamp_field: str = "processed_at"):
        self.out_dir = out_dir
        self.source = source
        self.stamp_field = stamp_field
        self._seq = 0
        os.makedirs(out_dir, exist_ok=True)

    def poll_once(self) -> str | None:
        records = self.source.fetch()
        if not records:
            return None
        name = f"batch-{self._seq:08d}-{uuid.uuid4().hex[:8]}.json"
        self._seq += 1
        tmp = os.path.join(self.out_dir, f".{name}.tmp")
        with open(tmp, "w") as f:
            for r in _stamped(records, self.stamp_field):
                f.write(json.dumps(r) + "\n")
        final = os.path.join(self.out_dir, name)
        os.replace(tmp, final)
        return final


class KafkaFeeder(_PollLoop):
    """One poll → one ``send(topic, json_bytes)`` per record (reference
    producer.py:22-37). The client is injected so the feeder depends on
    no Kafka library; any callable with that shape works (kafka-python's
    ``producer.send``, confluent's ``produce``, a test list.append)."""

    def __init__(
        self,
        source: RecordSource,
        topic: str,
        send: Callable[[str, bytes], None],
        stamp_field: str = "processed_at",
    ):
        self.source = source
        self.topic = topic
        self.send = send
        self.stamp_field = stamp_field

    def poll_once(self) -> int | None:
        records = self.source.fetch()
        if not records:
            return None
        for r in _stamped(records, self.stamp_field):
            self.send(self.topic, json.dumps(r).encode("utf-8"))
        return len(records)
