"""Stream micro-batch transforms — pure DataFrame functions shared by
the streaming and batch paths."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_seattle_call_data_spark.streaming.schema import (
    STREAM_DURATION_COLUMNS,
    STREAM_SCHEMA,
    canonical_stream_names,
)


def decode_json_payload(df: DataFrame, schema=STREAM_SCHEMA, value_col: str = "value") -> DataFrame:
    """Kafka-style payload decode (reference consumer_cassandra.py:256-259):
    ``from_json(value.cast(string), schema)`` then struct flatten. Malformed
    fields become nulls (PERMISSIVE default)."""
    return df.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("data")
    ).select("data.*")


def clean_duration_fields(df: DataFrame, columns=STREAM_DURATION_COLUMNS) -> DataFrame:
    """Noisy duration strings → integer seconds (reference
    consumer_cassandra.py:165-196): strip non-digits, trim, cast int;
    guarded by isNotNull with no ``otherwise`` so nulls stay null. One
    projection for all columns (the reference loops withColumn)."""

    def clean(c: str) -> Column:
        return F.when(
            F.col(c).isNotNull(),
            F.trim(F.regexp_replace(F.col(c), "[^0-9]", "")).cast("int"),
        )

    present = [c for c in columns if c in df.columns]
    return df.withColumns({c: clean(c) for c in present})


def with_ingest_timestamp(df: DataFrame, col_name: str = "insert_timestamp") -> DataFrame:
    """Reference consumer_cassandra.py:205."""
    return df.withColumn(col_name, F.current_timestamp())


def rename_to_canonical(df: DataFrame) -> DataFrame:
    """Bridge Socrata trailing-underscore names to the batch path's
    canonical schema (SURVEY §7.4.7)."""
    return df.toDF(*[canonical_stream_names(c) for c in df.columns])
