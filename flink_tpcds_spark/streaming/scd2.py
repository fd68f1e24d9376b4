"""Incrementally-maintained SCD Type-2 dimension (streaming).

The write-side of a temporal table (the reference's temporal table
function sources are the READ side, gated as the as-of joins): as
change events stream in, each key's open version closes when its
successor arrives — ``valid_to`` = the successor's timestamp — and
the successor becomes the open row. The maintained (closed log ∪
open state) must equal the batch SCD2 build over all data seen, row
for row.

Contract: per-key IN-ORDER arrival (the CDC-source ordering
guarantee — Kafka key partitioning, a Debezium topic, or the
time-range batching the gated entry uses). Out-of-order versions
would need retraction of already-closed intervals, which routes
through the retract sink instead.

State shape at 100 TB: the open state is ONE row per live key; each
batch touches only its own keys (join + anti-join on the key — no
full-state rewrite of untouched keys' closed history, which lives in
immutable per-batch log partitions). Crash safety: the closed log is
written to its ``__batch_id=N`` partition BEFORE the open-state swap
promotes the batch marker, so a replay overwrites the same
deterministic partition and re-runs the swap — at-least-once
delivery, exactly-once effect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.incremental import CrashSafeParquetState

_OPEN_SCHEMA = (
    "user_id long, event_id long, event_type string, valid_from timestamp"
)


class Scd2State(CrashSafeParquetState):
    """Open rows under ``<root>/open`` (crash-safe swap + batch
    marker); closed intervals under ``<root>/closed/__batch_id=N``
    (replay-idempotent overwrite)."""

    def __init__(self, root: str):
        super().__init__(os.path.join(root, "open"))
        self.closed = os.path.join(root, "closed")

    def _open(self, spark: SparkSession) -> DataFrame:
        self._recover()
        if os.path.isdir(self.path):
            return spark.read.parquet(self.path)
        return spark.createDataFrame([], _OPEN_SCHEMA)

    def update(
        self, spark: SparkSession, batch_df: DataFrame, batch_id: int
    ) -> None:
        self._recover()
        if batch_id <= self._last_batch():
            return  # replayed batch: closed partition already final
        rows = batch_df.select("user_id", "event_id", "event_type", "ts")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        chained = rows.withColumn("valid_to", F.lead("ts").over(w))
        closed_in_batch = chained.filter(
            F.col("valid_to").isNotNull()
        ).select(
            "user_id",
            "event_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            "valid_to",
        )
        batch_first = rows.groupBy("user_id").agg(
            F.min(F.struct("ts", "event_id")).alias("__f")
        ).select("user_id", F.col("__f.ts").alias("__first_ts"))
        state = self._open(spark)
        closed_prior = state.join(batch_first, "user_id").select(
            "user_id",
            "event_id",
            "event_type",
            "valid_from",
            F.col("__first_ts").alias("valid_to"),
        )
        new_open = chained.filter(F.col("valid_to").isNull()).select(
            "user_id",
            "event_id",
            "event_type",
            F.col("ts").alias("valid_from"),
        )
        carried = state.join(
            batch_first.select("user_id"), "user_id", "left_anti"
        )
        closed_out = closed_prior.unionByName(closed_in_batch)
        # closed partition FIRST (deterministic content → replay
        # overwrites it byte-identically), then the state swap
        # promotes the batch marker
        closed_out.write.mode("overwrite").parquet(
            os.path.join(self.closed, f"__batch_id={int(batch_id)}")
        )
        self._swap_in(
            carried.unionByName(new_open), batch_id=int(batch_id)
        )

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.update(batch_df.sparkSession, batch_df, batch_id)

    def result(self, spark: SparkSession) -> DataFrame:
        """closed log ∪ open rows (valid_to NULL, is_current) — must
        equal the one-shot batch SCD2 over everything ingested."""
        open_rows = self._open(spark).select(
            "user_id",
            "event_id",
            "event_type",
            "valid_from",
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
        if os.path.isdir(self.closed):
            closed = spark.read.parquet(self.closed).select(
                "user_id", "event_id", "event_type", "valid_from", "valid_to"
            )
            open_rows = closed.unionByName(open_rows)
        return open_rows.withColumn(
            "is_current", F.col("valid_to").isNull()
        )
