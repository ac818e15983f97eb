from etl_seattle_call_data_spark.streaming.schema import (  # noqa: F401
    STREAM_DURATION_COLUMNS,
    STREAM_SCHEMA,
    canonical_stream_names,
)
from etl_seattle_call_data_spark.streaming.sinks import KeyedUpsertSink  # noqa: F401
