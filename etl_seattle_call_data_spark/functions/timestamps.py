"""Timestamp expression helpers — native Catalyst expressions only.

The reference converts 12-hour AM/PM strings with a row-at-a-time Python
UDF (/root/reference/ETL_Pipeline_Batch/transform.py:8-23) followed by
``to_timestamp(col, "MM/dd/yyyy HH:mm:ss")`` (:67). A Python UDF in the
hot path breaks whole-stage codegen and costs a JVM↔Python round trip per
value, so here the same semantics are a pure-expression parse ladder:

* 12-hour strings (``"05/12/2024 01:23:45 PM"``) parse via the first
  pattern;
* already-24-hour strings (the UDF's pass-through branch for inputs it
  can't split) parse via the fallback pattern;
* anything else becomes NULL — exactly what the reference's subsequent
  ``to_timestamp`` does to unparseable pass-through values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_mixed_timestamp(c: Column | str, date_part: str = "MM/dd/yyyy") -> Column:
    """Parse a string column holding either 12-hour AM/PM or 24-hour
    timestamps (reference transform.py:8-23,61-69 equivalence — SURVEY §7.4.1).
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.coalesce(
        F.try_to_timestamp(c, F.lit(f"{date_part} hh:mm:ss a")),
        F.try_to_timestamp(c, F.lit(f"{date_part} HH:mm:ss")),
    )


def seconds_between(later: Column | str, earlier: Column | str) -> Column:
    """Whole seconds between two timestamps (reference transform.py:145-154:
    ``unix_timestamp(a) - unix_timestamp(b)``)."""
    later = F.col(later) if isinstance(later, str) else later
    earlier = F.col(earlier) if isinstance(earlier, str) else earlier
    return F.unix_timestamp(later) - F.unix_timestamp(earlier)
