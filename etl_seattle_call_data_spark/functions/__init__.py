from etl_seattle_call_data_spark.functions.timestamps import (  # noqa: F401
    parse_mixed_timestamp,
    seconds_between,
)
