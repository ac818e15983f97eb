"""Streaming observability — the replacement for the reference's
per-epoch ``count()``/``show()`` (consumer_cassandra.py:204-212), which
forces an extra job per micro-batch on the hot path.

``ProgressCollector`` is a ``StreamingQueryListener``: Spark hands it
the metrics it already computed (rows, duration, event-time watermark)
for free — zero extra jobs. Attach once per session, read anytime.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    query_name: str
    batch_id: int
    num_input_rows: int
    duration_ms: int | None
    watermark: str | None


class ProgressCollector(StreamingQueryListener):
    """Collects per-micro-batch progress for all queries on the session.

    Usage::

        collector = ProgressCollector.attach(spark)
        ... run streaming ...
        collector.progress  # list[BatchProgress]

    Plain class (not a dataclass): PySpark wraps listener instances for
    the JVM bridge and generated __eq__/__init__ interfere with
    registration/removal."""

    def __init__(self) -> None:
        self.progress: list[BatchProgress] = []

    @classmethod
    def attach(cls, spark: SparkSession) -> "ProgressCollector":
        inst = cls()
        spark.streams.addListener(inst)
        return inst

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    # -- StreamingQueryListener interface ------------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API casing)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            BatchProgress(
                query_name=p.name or str(p.id),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=(p.durationMs or {}).get("triggerExecution"),
                watermark=p.eventTime.get("watermark") if p.eventTime else None,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
