"""Streaming tests (SURVEY §5.5): file-source micro-batches through the
stream transforms, keyed upsert last-write-wins semantics across epochs,
watermarked window aggregation vs the equivalent batch computation."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from etl_seattle_call_data_spark.sources.registry import load_table
from etl_seattle_call_data_spark.streaming.pipeline import (
    file_json_stream,
    run_upsert_stream,
    windowed_counts,
)
from etl_seattle_call_data_spark.streaming.schema import STREAM_SCHEMA
from etl_seattle_call_data_spark.streaming.sinks import KeyedUpsertSink
from etl_seattle_call_data_spark.streaming.transforms import (
    clean_duration_fields,
    decode_json_payload,
    rename_to_canonical,
)


def _record(event: str, priority: str, response: str, processed_at: str) -> dict:
    return {
        "cad_event_number": event,
        "call_type": "911",
        "priority": priority,
        "call_sign_response_time_s_": response,
        "processed_at": processed_at,
    }


def test_upsert_last_write_wins(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    sink = KeyedUpsertSink(str(tmp_path / "store"), key="cad_event_number", order_col="processed_at")

    # epoch 1: events A(v1), B(v1)  — written BEFORE the stream starts
    (src / "batch1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                _record("A", "1", "120 s", "2024-01-01T00:00:01"),
                _record("B", "2", "60s", "2024-01-01T00:00:02"),
            ]
        )
    )
    stream = file_json_stream(spark, str(src), STREAM_SCHEMA)
    q = run_upsert_stream(stream, sink, str(tmp_path / "ckpt"))
    q.processAllAvailable()

    # epoch 2: A updated (v2), C new — duplicate key must upsert
    (src / "batch2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                _record("A", "9", "~300~", "2024-01-01T00:10:00"),
                _record("C", "3", "45", "2024-01-01T00:10:01"),
            ]
        )
    )
    q.processAllAvailable()
    q.stop()

    out = {r.cad_event_number: r for r in sink.read(spark).collect()}
    assert set(out) == {"A", "B", "C"}
    assert out["A"].priority == "9"  # last write won
    assert out["A"].call_sign_response_time_s_ == 300  # noisy string cleaned to int
    assert out["B"].call_sign_response_time_s_ == 60
    assert out["C"].call_sign_response_time_s_ == 45
    assert "insert_timestamp" in sink.read(spark).columns


def test_upsert_retry_idempotent(spark, tmp_path):
    """Re-processing the same epoch (failure retry) must not duplicate keys."""
    sink = KeyedUpsertSink(str(tmp_path / "store"), key="k")
    batch = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    sink.upsert_batch(batch, epoch_id=0)
    sink.upsert_batch(batch, epoch_id=0)  # retry of the same epoch
    out = sink.read(spark)
    assert out.count() == 2


def test_decode_and_canonical_rename(spark):
    payload = json.dumps(_record("X", "1", "15 sec", "2024-01-01T00:00:00"))
    raw = spark.createDataFrame([(payload.encode("utf-8"),)], "value binary")
    decoded = decode_json_payload(raw)
    assert decoded.schema == STREAM_SCHEMA
    row = clean_duration_fields(decoded).select("call_sign_response_time_s_").first()
    assert row[0] == 15
    renamed = rename_to_canonical(decoded)
    assert "call_sign_response_time_s" in renamed.columns
    assert not any(c.endswith("_s_") for c in renamed.columns)


def test_windowed_counts_matches_batch(spark, tmp_path):
    """Stream the events table through watermarked 10-min tumbling windows
    (memory sink) and compare with the same aggregation computed in batch."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = tmp_path / "stream_src"
    events.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = windowed_counts(stream, watermark="0 seconds")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_test")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.window_start, r.event_type): (r.n, r.total_value)
            for r in spark.sql("SELECT * FROM win_test").collect()
        }
    finally:
        q.stop()

    batch = (
        events.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n", "total_value")
    )
    expected = {
        (r.window_start, r.event_type): (r.n, r.total_value) for r in batch.collect()
    }
    assert streamed == expected
    assert len(expected) > 0


def test_checkpoint_resume_skips_processed_files(spark, tmp_path):
    """With a checkpoint, a restarted stream must not re-process epoch-1
    files (exactly-once source accounting — the reference has no
    checkpoint and restarts from 'latest', T4)."""
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = KeyedUpsertSink(str(tmp_path / "store"), key="cad_event_number", order_col="processed_at")

    (src / "b1.json").write_text(json.dumps(_record("A", "1", "10", "2024-01-01T00:00:00")))
    stream = file_json_stream(spark, str(src), STREAM_SCHEMA)
    q = run_upsert_stream(stream, sink, ckpt)
    q.processAllAvailable()
    q.stop()

    # restart with the SAME checkpoint; add an older record for A
    (src / "b2.json").write_text(json.dumps(_record("A", "2", "20", "2023-12-31T00:00:00")))
    stream2 = file_json_stream(spark, str(src), STREAM_SCHEMA)
    q2 = run_upsert_stream(stream2, sink, ckpt)
    q2.processAllAvailable()
    q2.stop()

    out = {r.cad_event_number: r for r in sink.read(spark).collect()}
    # b2's record is OLDER by processed_at → the upsert keeps epoch-1's row;
    # and b1 was not re-processed (no duplicate-key explosion)
    assert out["A"].priority == "1"
    assert sink.read(spark).count() == 1
