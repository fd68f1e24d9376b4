"""Streaming mergeable quantile sketch: the bottom-k-by-hash sample
(operators/sketch.py ``quantile_sketch``) maintained across
micro-batches with crash-safe parquet state.

The batch sketch's merge law

    sketch(A ∪ B) = bottom_k(sketch(A) ∪ sketch(B))

is a SET IDENTITY, so the streaming accumulation is exact by
induction: after any sequence of batches the state equals the sketch
of everything processed so far — no error term accumulates (unlike
the Misra-Gries path, which trades a bounded error for a bounded
summary of an unbounded DOMAIN; the quantile sample is bounded by
construction). Per batch: one distributed TakeOrdered over the batch
(each partition ships its local bottom-k), one O(k)-row merge with
the state, one atomic state swap — cost tracks batch size, state is
exactly ``size`` rows forever.

Reference anchor: the reference has no quantile-sketch surface at all
(its aggregates stop at exact percentiles inside one query); this is
the cross-job rollup a 100 TB pipeline needs — per-day sketches that
merge into the corpus sketch without rescanning history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..operators.sketch import quantile_sketch
from ..sources.incremental import CrashSafeParquetState

_STATE_SCHEMA = StructType(
    [StructField("v", DoubleType()), StructField("rk", StringType())]
)


class StreamingQuantileSketch(CrashSafeParquetState):
    """Maintains the exact bottom-``size``-by-md5(key) sample of an
    append-only micro-batch stream. ``result()`` returns the sketch
    rows (v, rk) — provably equal to the batch sketch of the whole
    stream so far."""

    def __init__(self, path: str, value_col: str, key_col: str, size: int = 64):
        super().__init__(path)
        self.value_col = value_col
        self.key_col = key_col
        self.size = size

    def _state(self, spark: SparkSession) -> DataFrame:
        self._recover()
        if os.path.isdir(self.path):
            return spark.read.schema(_STATE_SCHEMA).parquet(self.path)
        return spark.createDataFrame([], _STATE_SCHEMA)

    def result(self, spark: SparkSession) -> DataFrame:
        return self._state(spark).orderBy("rk", "v")

    def update(
        self, spark: SparkSession, batch_df: DataFrame, batch_id: int | None = None
    ) -> None:
        part = quantile_sketch(
            batch_df.select(
                F.col(self.value_col).cast("double").alias(self.value_col),
                self.key_col,
            ),
            self.value_col,
            self.key_col,
            self.size,
        )
        merged = (
            self._state(spark)
            .unionByName(part)
            .orderBy("rk", "v")
            .limit(self.size)
        )
        self._swap_in(merged, batch_id)

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._recover()
        if batch_id <= self._last_batch():
            return
        self.update(batch_df.sparkSession, batch_df, batch_id=batch_id)
