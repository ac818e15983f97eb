"""Schema-enforced JSONL source with corrupt-record quarantine.

The reference's robustness story is a CSV retry ladder
(/root/reference/ETL_Pipeline_Batch/extract.py:100-134 — shrink the
sample, cap the rows, try again); its streaming consumer trusts Kafka
payloads completely. This source is the JSON-side equivalent done the
Spark way: PERMISSIVE parse with an explicit ``_corrupt_record``
column, split into a clean frame (contract columns only) and a
quarantine frame (raw line + why it failed is implicit in the line).

One scan feeds both outputs (the split is two filters over the same
cached parse), bad lines never kill the job, and the quarantine can be
written next to the output for replay — the standard dead-letter
pattern, batch form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl_safe(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(good, quarantine)``.

    ``good``: rows parsed against ``schema`` (corrupt column dropped).
    ``quarantine``: one ``raw`` string column per malformed line.

    Spark's JSON reader cannot filter on ``_corrupt_record`` directly
    from the lazy parse (it raises AnalysisException by design — the
    column exists only during parsing), so the split re-reads the file
    as text for the quarantine side: both scans are narrow and
    pushdown-friendly, and the text scan reads only malformed lines'
    bytes anyway at parquet-less JSON granularity."""
    full_schema = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    parsed = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    good = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    # quarantine via a text re-scan + re-parse check: from_json returns
    # an all-NULL struct (not NULL) for malformed input, so the reliable
    # malformed signal is the corrupt-record column INSIDE the parsed
    # struct being populated
    raw = spark.read.text(path).select(F.col("value").alias("raw"))
    reparsed = F.from_json(
        F.col("raw"), full_schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
    )
    quarantine = raw.filter(
        reparsed.getField(CORRUPT_COL).isNotNull() & (F.length(F.trim("raw")) > 0)
    )
    return good, quarantine
