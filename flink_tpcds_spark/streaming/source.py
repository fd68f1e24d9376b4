"""Streaming sources (reference StreamExecTableSourceScan — SURVEY §2.1).

``event_stream`` replays the driver's events parquet as a file-based
Structured Streaming source. The parquet's physical ts type has
varied across driver rounds — TIMESTAMP(NANOS), which Spark's scan
rejects, vs plain timestamp[us] (NTZ) — so the stream schema is
sniffed from the file footer and ts is normalized to session-tz
TimestampType, identical to the batch loader in schemas.py.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts_is_nanos(sf_dir: str) -> bool:
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):  # multi-file table: sniff any part file
        path = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
    return str(pq.read_schema(path).field("ts").type) == "timestamp[ns]"


def _schema(ts_nanos: bool) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField(
                "ts",
                # nanos surface as long at scan time (legacy conf)
                T.LongType() if ts_nanos else T.TimestampNTZType(),
            ),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as an unbounded stream with event-time ts."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_nanos = _ts_is_nanos(sf_dir)
    # FileStreamSource wants a directory; select the single table file
    # out of the sf_dir with a glob filter.
    raw = (
        spark.readStream.schema(_schema(ts_nanos))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if ts_nanos:
        # integer division: ns values exceed 2^53 (see schemas.py)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))
