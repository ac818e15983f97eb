"""Streaming record schema for the call-data event stream.

The reference consumer declares a fixed 45-field StructType over the
Socrata JSON payload (/root/reference/Real_Time_Streaming/consumer/
consumer_cassandra.py:18-82) — snake_case names with Socrata's
trailing-underscore duration suffixes (``…_time_s_``), durations typed
as noisy strings. Field names/types preserved verbatim; the canonical
rename shim bridges to the batch path's ``…_time_s`` names (column-name
drift noted in SURVEY §7.4.7).
"""

from __future__ import annotations

from pyspark.sql import types as T

_STRING_FIELDS_HEAD = (
    "cad_event_number",
    "cad_event_clearance_description",
    "call_type",
    "priority",
    "initial_call_type",
    "final_call_type",
)
_LOCATION_FIELDS = (
    "dispatch_precinct",
    "dispatch_sector",
    "dispatch_beat",
    "dispatch_longitude",
    "dispatch_latitude",
    "dispatch_reporting_area",
)

# Noisy-string duration fields (cleaned to int by the stream transform —
# reference consumer_cassandra.py:165-196)
STREAM_DURATION_COLUMNS = (
    "care_call_sign_total_service_time_s_",
    "co_response_call_sign_total_service_time_s_",
    "spd_call_sign_total_service_time_s_",
    "call_sign_total_service_time_s_",
    "first_care_call_sign_dispatch_delay_time_s_",
    "first_care_call_sign_response_time_s_",
    "first_co_response_call_sign_dispatch_delay_time_s_",
    "first_co_response_call_sign_response_time_s_",
    "first_spd_call_sign_dispatch_delay_time_s_",
    "first_spd_call_sign_response_time_s_",
    "call_sign_dispatch_delay_time_s_",
    "call_sign_response_time_s_",
    "cad_event_first_response_time_s_",
)

_TIMESTAMP_FIELDS = (
    "cad_event_original_time_queued",
    "cad_event_arrived_time",
    "call_sign_dispatch_time",
    "first_care_call_sign_at_scene_time",
    "first_care_call_sign_dispatch_time",
    "first_co_response_call_sign_at_scene_time",
    "first_co_response_call_sign_dispatch_time",
    "last_co_response_call_sign_in_service_time",
    "last_spd_call_sign_in_service_time",
    "call_sign_at_scene_time",
    "call_sign_in_service_time",
)
# The reference types these as strings (mixed-format feed values)
_STRINGLY_TIMESTAMPS = (
    "first_spd_call_sign_at_scene_time",
    "first_spd_call_sign_dispatch_time",
    "last_care_call_sign_in_service_time",
)
_STRING_FIELDS_TAIL = (
    "cad_event_response_category",
    "call_sign_dispatch_id",
    "call_type_indicator",
    "dispatch_neighborhood",
    "call_type_received_classification",
    "processed_at",  # producer-stamped ingest time (ISO string)
)


def _build_schema() -> T.StructType:
    fields: list[T.StructField] = []
    for n in _STRING_FIELDS_HEAD + _LOCATION_FIELDS:
        fields.append(T.StructField(n, T.StringType()))
    for n in _TIMESTAMP_FIELDS:
        fields.append(T.StructField(n, T.TimestampType()))
    for n in _STRINGLY_TIMESTAMPS + STREAM_DURATION_COLUMNS + _STRING_FIELDS_TAIL:
        fields.append(T.StructField(n, T.StringType()))
    return T.StructType(fields)


STREAM_SCHEMA = _build_schema()


def canonical_stream_names(name: str) -> str:
    """Socrata trailing-underscore duration names → the batch path's
    canonical ``…_time_s`` names."""
    return name[:-1] if name.endswith("_s_") else name
