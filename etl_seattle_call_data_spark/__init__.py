"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline (mdhttx/ETL-SEATTLE-CALL-DATA),
rebuilt Spark-first.

Layout:
    session     — SparkSession factory (AQE on, UTC, Arrow on)
    sources     — readers/writers (CSV sampled-inference, Parquet, JSON streams)
    operators   — relational + dataflow operator library
    functions   — scalar expression helpers (pure Column -> Column)
    plans       — named analytical queries over the test tables
    streaming   — Structured Streaming pipeline + keyed upsert sink
"""

__version__ = "0.1.0"

from etl_seattle_call_data_spark.session import get_spark  # noqa: F401
