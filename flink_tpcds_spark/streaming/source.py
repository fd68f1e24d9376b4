"""Streaming sources (reference StreamExecTableSourceScan — SURVEY §2.1).

``event_stream`` replays the driver's events parquet as a file-based
Structured Streaming source. The parquet stores TIMESTAMP(NANOS),
which Spark's scan rejects; the stream declares ts as long (via the
nanosAsLong legacy conf) and converts to a proper event-time column
with integer division, identical to the batch loader in schemas.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos-as-long at scan time
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as an unbounded stream with event-time ts."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # FileStreamSource wants a directory; select the single table file
    # out of the sf_dir with a glob filter.
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
