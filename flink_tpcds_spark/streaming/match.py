"""Streaming MATCH_RECOGNIZE: the V-shape (``PATTERN (DOWN+ UP+)``,
``AFTER MATCH SKIP PAST LAST ROW``) CEP operator over a keyed,
watermarked micro-batch stream.

The reference plans streaming MATCH_RECOGNIZE through StreamExecMatch
(flink-table-planner-blink .../physical/stream/StreamExecMatch.scala)
backed by a keyed CEP NFA with event-time semantics: buffer per-key
rows, sort by event time as the watermark advances, feed the NFA,
emit matches, discard consumed state. This module re-expresses that
contract Spark-first — per batch, ONE shuffle on the key, everything
else window/aggregate algebra on the JVM (no Python in the row path):

- rows are classified D/U/F against their predecessor and run-length
  grouped (the same algebra as the batch ``match_v_shapes``);
- a run is **closed** once its successor run's first row has event
  time below the watermark: rows still to come all carry ts ≥ wm, and
  in (ts, event_id) order none of them can sort into or directly
  after the run — its maximality is settled;
- an adjacent (D, U) run pair is emitted exactly when U is closed;
  SKIP PAST LAST ROW is structural (runs are maximal and disjoint);
- state keeps only what the future can still touch: the open tail
  pattern (a trailing D or D,U), the frozen-history anchor row that
  fixes the next row's direction, and every row with ts ≥ wm (the
  mutable region where on-time arrivals may still sort). A monotone
  key therefore holds O(rows-within-lateness) state, not O(stream) —
  the bound that matters at 100 TB.

Late rows (ts < the watermark at arrival) are dropped, Spark/Flink
watermark semantics. With a final ``flush()`` (wm → +∞) the emitted
set is EXACTLY the batch operator's output, which is how
``st_match_recognize`` gets a full value oracle.

State is a single CrashSafeParquetState dir holding both the pending
rows and the accumulated matches (kind column), so replayed batches
are idempotent and a crash between write and promote loses nothing.
The matches partition is rewritten per batch — O(total matches), the
same compaction trade the upsert sink makes; bucket it if a use case
ever emits millions of matches per key.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

from ..sources.incremental import CrashSafeParquetState

_STATE_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("start_ts", TimestampType()),
        StructField("bottom_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
        StructField("start_value", DoubleType()),
        StructField("bottom_value", DoubleType()),
        StructField("end_value", DoubleType()),
        StructField("down_rows", LongType()),
        StructField("up_rows", LongType()),
    ]
)

_MATCH_COLS = [
    "start_ts",
    "bottom_ts",
    "end_ts",
    "start_value",
    "bottom_value",
    "end_value",
    "down_rows",
    "up_rows",
]

_EPOCH = _dt.datetime(1970, 1, 1)
_FAR_FUTURE = _dt.datetime(9999, 1, 1)


class StreamingMatchRecognize(CrashSafeParquetState):
    """V-shape CEP over micro-batches of (user_id, ts, event_id,
    value) rows. Drive with ``foreach_batch``; call ``flush`` after
    the stream drains; read ``matches()``."""

    WM_MARKER = "_WATERMARK_US"
    LATE_MARKER = "_LATE_DROPPED"

    def __init__(self, path: str, lateness: _dt.timedelta):
        super().__init__(path)
        self.lateness = lateness

    # -- markers ------------------------------------------------------
    def watermark(self) -> _dt.datetime:
        self._recover()
        v = self._marker(self.WM_MARKER)
        if v is None:
            return _EPOCH
        return _EPOCH + _dt.timedelta(microseconds=int(v))

    def late_dropped(self) -> int:
        self._recover()
        v = self._marker(self.LATE_MARKER)
        return int(v) if v is not None else 0

    # -- state I/O ----------------------------------------------------
    def _state(self, spark: SparkSession) -> DataFrame:
        import os

        self._recover()
        if os.path.isdir(self.path):
            return spark.read.schema(_STATE_SCHEMA).parquet(self.path)
        return spark.createDataFrame([], _STATE_SCHEMA)

    def matches(self, spark: SparkSession) -> DataFrame:
        return (
            self._state(spark)
            .filter(F.col("kind") == "match")
            .select("user_id", *_MATCH_COLS)
        )

    # -- the operator -------------------------------------------------
    def update(
        self,
        spark: SparkSession,
        batch_df: DataFrame,
        batch_id: int | None = None,
        final: bool = False,
    ) -> None:
        state = self._state(spark)
        prev_matches = state.filter(F.col("kind") == "match")
        pending = state.filter(F.col("kind") == "pending").select(
            "user_id", "ts", "event_id", "value"
        )
        prev_wm = self.watermark()

        batch_df = batch_df.select("user_id", "ts", "event_id", "value")
        late = batch_df.filter(F.col("ts") < F.lit(prev_wm))
        n_late = late.count()
        on_time = batch_df.filter(F.col("ts") >= F.lit(prev_wm))

        if final:
            wm = _FAR_FUTURE
        else:
            hi = on_time.agg(F.max("ts")).collect()[0][0]
            wm = prev_wm
            if hi is not None:
                wm = max(prev_wm, hi - self.lateness)

        # touched-key isolation (same contract as streaming/cep.py):
        # only keys with new rows or newly-frozen pending rows
        # re-enter the window algebra; everything else passes through
        # verbatim, so per-batch cost is O(touched keys). flush()
        # makes every pending key touched (wm → +∞ freezes all).
        if final:
            touched = pending.select("user_id").unionByName(
                on_time.select("user_id")
            ).distinct()
        else:
            touched = (
                on_time.select("user_id")
                .unionByName(
                    pending.filter(
                        (F.col("ts") >= F.lit(prev_wm))
                        & (F.col("ts") < F.lit(wm))
                    ).select("user_id")
                )
                .distinct()
            )
        pending_untouched = pending.join(touched, "user_id", "left_anti")
        pending = pending.join(touched, "user_id", "left_semi")

        rows = pending.unionByName(on_time)

        # classification + run-length encoding (one shuffle on the key)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        prev_v = F.lag("value").over(w)
        c = rows.withColumn("_pos", F.row_number().over(w)).withColumn(
            "_dir",
            F.when(F.col("value") < prev_v, F.lit("D"))
            .when(F.col("value") > prev_v, F.lit("U"))
            .otherwise(F.lit("F")),
        )
        wp = Window.partitionBy("user_id").orderBy("_pos")
        c = c.withColumn(
            "_chg",
            F.when(
                F.lag("_dir").over(wp).isNull()
                | (F.lag("_dir").over(wp) != F.col("_dir")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        ).withColumn("_run", F.sum("_chg").over(wp))

        runs = c.groupBy("user_id", "_run").agg(
            F.min("_dir").alias("dir"),  # constant within a run
            F.min("_pos").alias("run_pos"),
            F.max("_pos").alias("run_end"),
            F.min_by("ts", "_pos").alias("first_ts"),
            F.min_by("value", "_pos").alias("first_v"),
            F.max_by("ts", "_pos").alias("last_ts"),
            F.max_by("value", "_pos").alias("last_v"),
            F.count(F.lit(1)).alias("n"),
        )
        w3 = Window.partitionBy("user_id").orderBy("run_pos")
        wm_lit = F.lit(wm)
        runs = (
            runs.withColumn("next_dir", F.lead("dir").over(w3))
            .withColumn("next_first_ts", F.lead("first_ts").over(w3))
            .withColumn(
                "closed",
                F.lit(final)
                | (
                    F.col("next_first_ts").isNotNull()
                    & (F.col("next_first_ts") < wm_lit)
                ),
            )
        )
        runs = (
            runs.withColumn("u_closed", F.lead("closed").over(w3))
            .withColumn("u_last_ts", F.lead("last_ts").over(w3))
            .withColumn("u_last_v", F.lead("last_v").over(w3))
            .withColumn("u_n", F.lead("n").over(w3))
            .withColumn("u_run_end", F.lead("run_end").over(w3))
        )
        # cache: emission, retention and the new state all reuse this
        runs = runs.localCheckpoint(eager=True)

        emit = runs.filter(
            (F.col("dir") == "D")
            & (F.col("next_dir") == "U")
            & F.col("u_closed")
        )
        new_matches = emit.select(
            F.lit("match").alias("kind"),
            "user_id",
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            F.col("first_ts").alias("start_ts"),
            F.col("last_ts").alias("bottom_ts"),
            F.col("u_last_ts").alias("end_ts"),
            F.col("first_v").alias("start_value"),
            F.col("last_v").alias("bottom_value"),
            F.col("u_last_v").alias("end_value"),
            F.col("n").alias("down_rows"),
            F.col("u_n").alias("up_rows"),
        )

        # ---- retention ------------------------------------------------
        # everything at or before an emitted match's U run is consumed
        consumed = emit.groupBy("user_id").agg(
            F.max("u_run_end").alias("consumed_end"),
            F.max(F.col("run_pos")).alias("consumed_d_run_pos"),
        )
        # droppable prefix among unconsumed runs: closed runs that are
        # not the D of a (D, U) head — they can never join a match
        live = runs.join(consumed, "user_id", "left").filter(
            F.col("consumed_end").isNull()
            | (F.col("run_pos") > F.col("consumed_end"))
        )
        live = live.withColumn(
            "droppable",
            F.col("closed")
            & ~((F.col("dir") == "D") & (F.col("next_dir") == "U")),
        )
        first_live = live.filter(~F.col("droppable")).groupBy("user_id").agg(
            F.min("run_pos").alias("first_live_pos")
        )

        keyed = (
            c.join(consumed, "user_id", "left")
            .join(first_live, "user_id", "left")
            .withColumn(
                "_consumed_end",
                F.coalesce(F.col("consumed_end"), F.lit(0)),
            )
        )
        unconsumed = keyed.filter(F.col("_pos") > F.col("_consumed_end"))
        # rows of live runs are retained; within the FIRST live run a
        # frozen (< wm) non-D prefix can never match — keep only its
        # tail. Attach each row's run_pos/dir first:
        run_info = runs.select(
            F.col("user_id").alias("_uid_j"),
            F.col("_run").alias("_run_j"),
            F.col("run_pos").alias("_row_run_pos"),
            F.col("dir").alias("_row_run_dir"),
        )
        unconsumed = unconsumed.join(
            run_info,
            (F.col("user_id") == F.col("_uid_j"))
            & (F.col("_run") == F.col("_run_j")),
            "left",
        ).drop("_uid_j", "_run_j")

        retained_live = unconsumed.filter(
            F.col("first_live_pos").isNotNull()
            & (F.col("_row_run_pos") >= F.col("first_live_pos"))
        )
        # head-run frozen-prefix trim (non-D head runs only): drop
        # rows with ts < wm except the last frozen row of that run
        head = retained_live.filter(
            (F.col("_row_run_pos") == F.col("first_live_pos"))
            & (F.col("_row_run_dir") != "D")
        )
        wh = Window.partitionBy("user_id", "_run").orderBy("_pos")
        head_keep = (
            head.withColumn("_frozen", F.col("ts") < wm_lit)
            .withColumn(
                "_last_frozen_pos",
                F.max(F.when(F.col("_frozen"), F.col("_pos"))).over(
                    Window.partitionBy("user_id", "_run")
                ),
            )
            .filter(
                ~F.col("_frozen")
                | (F.col("_pos") == F.col("_last_frozen_pos"))
            )
            .drop("_frozen", "_last_frozen_pos")
        )
        rest_live = retained_live.filter(
            ~(
                (F.col("_row_run_pos") == F.col("first_live_pos"))
                & (F.col("_row_run_dir") != "D")
            )
        )
        kept_live = head_keep.unionByName(rest_live)

        # anchor: the last row BEFORE the retained region (fixes the
        # next row's direction when runs are recomputed next batch);
        # dropped runs are closed, so their rows all sit below wm and
        # no future arrival can sort among them
        # the anchor may be a CONSUMED row (an emitted match's end row
        # is exactly what fixes the next row's direction), so anchor
        # candidates come from ALL rows before the retained region
        kept_pos = kept_live.groupBy("user_id").agg(
            F.min("_pos").alias("_retained_start")
        )
        anchor = (
            c.join(kept_pos, "user_id", "left")
            .filter(
                F.col("_retained_start").isNull()
                | (F.col("_pos") < F.col("_retained_start"))
            )
            .withColumn(
                "_max_pos",
                F.max("_pos").over(Window.partitionBy("user_id")),
            )
            .filter(F.col("_pos") == F.col("_max_pos"))
            .drop("_retained_start", "_max_pos")
        )

        cols = ["user_id", "ts", "event_id", "value"]
        new_pending = (
            kept_live.select(*cols)
            .unionByName(anchor.select(*cols))
            .dropDuplicates(["user_id", "ts", "event_id"])
        )
        if final:
            new_pending = new_pending.limit(0)
        else:
            # untouched keys keep their state rows verbatim
            new_pending = new_pending.unionByName(
                pending_untouched.select(*cols)
            )

        new_state = prev_matches.unionByName(new_matches).unionByName(
            new_pending.select(
                F.lit("pending").alias("kind"),
                "user_id",
                "ts",
                "event_id",
                "value",
                *[
                    F.lit(None).cast(t).alias(n)
                    for n, t in [
                        ("start_ts", "timestamp"),
                        ("bottom_ts", "timestamp"),
                        ("end_ts", "timestamp"),
                        ("start_value", "double"),
                        ("bottom_value", "double"),
                        ("end_value", "double"),
                        ("down_rows", "long"),
                        ("up_rows", "long"),
                    ]
                ],
            )
        )
        wm_us = int((wm - _EPOCH) / _dt.timedelta(microseconds=1))
        self._swap_in(
            new_state,
            batch_id,
            markers={
                self.WM_MARKER: str(wm_us),
                self.LATE_MARKER: str(self.late_dropped() + n_late),
            },
        )

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._recover()
        if batch_id <= self._last_batch():
            return
        self.update(batch_df.sparkSession, batch_df, batch_id=batch_id)

    def flush(self, spark: SparkSession) -> None:
        """Advance the watermark to +∞: every open run closes and the
        remaining (D, U) pairs emit — after this, ``matches()`` equals
        the batch operator's output on the on-time rows."""
        self._recover()
        self.update(
            spark,
            spark.createDataFrame(
                [], "user_id long, ts timestamp, event_id long, value double"
            ),
            batch_id=self._last_batch() + 1,
            final=True,
        )
