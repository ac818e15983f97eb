"""Seattle 911 call-data transform library.

Re-expresses the reference's 13-step batch transform chain
(/root/reference/ETL_Pipeline_Batch/transform.py:210-223) as composable
pure ``DataFrame -> DataFrame`` functions, Spark-first:

* no Python UDF — the AM/PM converter (transform.py:8-23) becomes a
  native parse ladder (functions/timestamps.py), so the whole chain stays
  inside whole-stage codegen and parquet/CSV pushdown survives;
* deterministic surrogate keys — ``monotonically_increasing_id``
  (transform.py:197-208) is partition-layout-dependent and changes across
  runs; we mint ``xxhash64`` of the natural row key instead, which is
  reproducible AND shuffle-free at any cluster size (a global
  ``row_number`` would serialize through one partition);
* every step is a single projection where possible so Catalyst collapses
  the chain into one stage.

Semantic-fidelity notes (SURVEY §7.4) are inline at each step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_seattle_call_data_spark.functions.timestamps import (
    parse_mixed_timestamp,
    seconds_between,
)

# Raw 12-hour timestamp columns (reference transform.py:43-58). The first
# entry also sources `event_date`.
RAW_TIMESTAMP_COLUMNS = [
    "CAD Event Original Time Queued",
    "CAD Event Arrived Time",
    "Call Sign Dispatch Time",
    "First CARE Call Sign At Scene Time",
    "First CARE Call Sign Dispatch Time",
    "First Co-Response Call Sign At Scene Time",
    "First Co-Response Call Sign Dispatch Time",
    "First SPD Call Sign at Scene Time",
    "First SPD Call Sign Dispatch Time",
    "Last CARE Call Sign In-Service Time",
    "Last Co-Response Call Sign In-Service Time",
    "Last SPD Call Sign In-Service Time",
    "Call Sign at Scene Time",
    "Call Sign In-Service Time",
]

# Agency-merge coalesce targets (reference transform.py:71-97). Argument
# order is load-bearing and asymmetric: timestamps prefer SPD, duration
# seconds prefer CARE — preserved verbatim.
AGENCY_MERGES: list[tuple[str, str, str]] = [
    ("first_response_at_scene_time", "First SPD Call Sign at Scene Time", "First CARE Call Sign At Scene Time"),
    ("first_response_dispatch_time", "First SPD Call Sign Dispatch Time", "First CARE Call Sign Dispatch Time"),
    ("last_response_in_service_time", "Last SPD Call Sign In-Service Time", "Last CARE Call Sign In-Service Time"),
    ("total_service_time_s", "CARE Call Sign Total Service Time (s)", "SPD Call Sign Total Service Time (s)"),
    ("dispatch_delay_time_s", "First CARE Call Sign Dispatch Delay Time (s)", "First SPD Call Sign Dispatch Delay Time (s)"),
    ("first_response_time_s", "First CARE Call Sign Response Time (s)", "First SPD Call Sign Response Time (s)"),
]

# Source columns consumed by the merges + location detail dropped outright
# (reference transform.py:99-110).
COLUMNS_DROPPED_AFTER_MERGE = [
    "First SPD Call Sign at Scene Time",
    "First CARE Call Sign At Scene Time",
    "First SPD Call Sign Dispatch Time",
    "First CARE Call Sign Dispatch Time",
    "Last SPD Call Sign In-Service Time",
    "Last CARE Call Sign In-Service Time",
    "CARE Call Sign Total Service Time (s)",
    "SPD Call Sign Total Service Time (s)",
    "First CARE Call Sign Dispatch Delay Time (s)",
    "First SPD Call Sign Dispatch Delay Time (s)",
    "First CARE Call Sign Response Time (s)",
    "First SPD Call Sign Response Time (s)",
    "Dispatch Longitude",
    "Dispatch Latitude",
    "Dispatch Reporting Area",
]

REQUIRED_RAW_COLUMNS = ("CAD Event Number", "Call Type", "Priority")

REQUIRED_TRANSFORMED_COLUMNS = (
    "call_sign_dispatch_id",
    "call_sign_dispatch_time",
    "dim_care_spd_id",
    "dim_co_response_id",
    "dim_cad_event_id",
    "dim_location_id",
    "dim_call_sign_id",
)


def require_columns(df: DataFrame, required: tuple[str, ...]) -> None:
    """Name-based schema validation (reference extract.py:136-140,
    transform.py:226-234)."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"required columns missing: {missing}")


def snake_case(name: str) -> str:
    """Column canonicalization (reference transform.py:119-128):
    ``"(s)"→"s"``, spaces→``_``, lowercase, hyphens→``_`` — in that order."""
    return name.replace("(s)", "s").replace(" ", "_").lower().replace("-", "_")


def parse_timestamps(df: DataFrame) -> DataFrame:
    """Derive `event_date` from the RAW string (first 10 chars, i.e.
    'MM/dd/yyyy' — reference transform.py:61 takes the substring BEFORE
    parsing), then parse all timestamp columns via the no-UDF ladder
    (reference transform.py:63-67)."""
    cols = [df[c] for c in df.columns]
    cols.append(F.substring(F.col(RAW_TIMESTAMP_COLUMNS[0]), 1, 10).alias("event_date"))
    df = df.select(*cols)
    present = [c for c in RAW_TIMESTAMP_COLUMNS if c in df.columns]
    return df.withColumns({c: parse_mixed_timestamp(df[c]) for c in present})


def merge_agency_columns(df: DataFrame) -> DataFrame:
    """SPD/CARE coalesce merges (reference transform.py:71-97) — one
    projection for all six derived columns."""
    return df.withColumns(
        {target: F.coalesce(F.col(f"`{a}`"), F.col(f"`{b}`")) for target, a, b in AGENCY_MERGES}
    )


def drop_merged_sources(df: DataFrame) -> DataFrame:
    """Reference transform.py:99-110."""
    return df.drop(*COLUMNS_DROPPED_AFTER_MERGE)


def derive_unit_id(df: DataFrame) -> DataFrame:
    """unit_id = dispatch id with the row's own event number stripped —
    column-valued regex pattern (reference transform.py:112-117)."""
    return df.withColumn(
        "unit_id",
        F.regexp_replace(
            F.col("`Call Sign Dispatch ID`"),
            F.col("`CAD Event Number`").cast("string"),
            F.lit(""),
        ),
    )


def rename_to_snake_case(df: DataFrame) -> DataFrame:
    """Reference transform.py:119-128."""
    return df.toDF(*[snake_case(c) for c in df.columns])


def repair_at_scene_time(df: DataFrame) -> DataFrame:
    """3-arm conditional repair of `call_sign_at_scene_time` (reference
    transform.py:25-39): prefer the merged first-response scene time when
    it is after dispatch, else fall back to dispatch time."""
    return df.withColumn(
        "call_sign_at_scene_time",
        F.when(
            (F.col("first_response_at_scene_time") > F.col("call_sign_dispatch_time"))
            & F.col("call_sign_at_scene_time").isNull(),
            F.col("first_response_at_scene_time"),
        )
        .when(F.col("call_sign_at_scene_time").isNull(), F.col("call_sign_dispatch_time"))
        .otherwise(F.col("call_sign_at_scene_time")),
    )


def fill_defaults(df: DataFrame) -> DataFrame:
    """Reference transform.py:134-136."""
    return df.na.fill({"dispatch_sector": "UNKNOWN", "priority": -1})


def drop_null_arrivals(df: DataFrame) -> DataFrame:
    """Reference transform.py:130-132."""
    return df.na.drop(subset=["cad_event_arrived_time"])


def drop_events_with_null_in_service(df: DataFrame) -> DataFrame:
    """Event-level cascade (reference transform.py:138-143, SURVEY §7.4.3):
    if ANY dispatch row of an event has a null in-service time, remove
    EVERY row of that event — a left-anti join against the distinct key
    set, not a row filter. The null-key set is small, so Catalyst/AQE
    plans a broadcast anti-join."""
    tainted_events = (
        df.filter(F.col("call_sign_in_service_time").isNull())
        .select("cad_event_number")
        .distinct()
    )
    return df.join(tainted_events, "cad_event_number", "left_anti")


def repair_response_seconds(df: DataFrame) -> DataFrame:
    """Fill missing response seconds from timestamp arithmetic (reference
    transform.py:145-154)."""
    return df.withColumn(
        "call_sign_response_time_s",
        F.when(
            F.col("call_sign_response_time_s").isNull(),
            seconds_between("call_sign_at_scene_time", "cad_event_original_time_queued"),
        ).otherwise(F.col("call_sign_response_time_s")),
    )


def repair_first_response(df: DataFrame) -> DataFrame:
    """Fill `first_response_at_scene_time` then derive missing
    `first_response_time_s` (reference transform.py:172-195 — the CALLED
    variant; transform.py:156-170 is dead code per SURVEY §7.4.6)."""
    df = df.withColumn(
        "first_response_at_scene_time",
        F.when(
            (F.col("call_sign_at_scene_time") > F.col("call_sign_dispatch_time"))
            & F.col("first_response_at_scene_time").isNull(),
            F.col("call_sign_at_scene_time"),
        )
        .when(F.col("first_response_at_scene_time").isNull(), F.col("call_sign_dispatch_time"))
        .otherwise(F.col("first_response_at_scene_time")),
    )
    return df.withColumn(
        "first_response_time_s",
        F.when(
            F.col("first_response_time_s").isNull(),
            seconds_between("first_response_at_scene_time", "cad_event_original_time_queued"),
        ).otherwise(F.col("first_response_time_s")),
    )


def mint_surrogate_keys(df: DataFrame, natural_key: str = "call_sign_dispatch_id") -> DataFrame:
    """Deterministic replacement for the reference's five
    ``monotonically_increasing_id`` keys (transform.py:197-208).

    The reference's observable semantics: all five dim ids carry the same
    per-row value, 1:1 with the fact row (vertical partition, dims NOT
    deduplicated — SURVEY §7.4.2). We preserve that but make the value a
    deterministic ``xxhash64`` of a composite row key — (cad_event_number,
    dispatch id, dispatch time), which together identify one dispatch
    record — so the id is reproducible across runs/partitionings with no
    shuffle or global ordering at any scale. Hashing the dispatch id
    alone would collide whenever a natural key repeats (and join_star's
    inner joins on the dim ids would then fan out m×m); the composite
    makes a collision require two rows identical in all three fields or
    a 64-bit birthday coincidence."""
    key = F.xxhash64(
        F.col("cad_event_number").cast("string"),
        F.col(natural_key).cast("string"),
        F.col("call_sign_dispatch_time").cast("string"),
    )
    return df.withColumns(
        {
            "dim_care_spd_id": key,
            "dim_co_response_id": key,
            "dim_cad_event_id": key,
            "dim_location_id": key,
            "dim_call_sign_id": key,
        }
    )


def transform_call_data(df: DataFrame) -> DataFrame:
    """Full 13-step chain (reference transform.py:210-236). Pure logical-
    plan building — no actions."""
    df = parse_timestamps(df)
    df = merge_agency_columns(df)
    df = drop_merged_sources(df)
    df = derive_unit_id(df)
    df = rename_to_snake_case(df)
    df = repair_at_scene_time(df)
    df = fill_defaults(df)
    df = drop_null_arrivals(df)
    df = drop_events_with_null_in_service(df)
    df = repair_response_seconds(df)
    df = repair_first_response(df)
    df = mint_surrogate_keys(df)
    require_columns(df, REQUIRED_TRANSFORMED_COLUMNS)
    return df
