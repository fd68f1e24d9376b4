"""Streaming operators: windowed aggregation, dedup, interval join.

Reference → Spark mapping (SURVEY §2.5 / §2.7 / §2.3):

- StreamExecGroupWindowAggregate (WindowOperator.java:97, tumble/
  slide/session assigners, allowedLateness) → ``withWatermark`` +
  ``window()`` / ``session_window()`` aggregation. The watermark IS
  the reference's watermark (WatermarkAssignerOperator); late rows
  beyond it are dropped, matching WindowOperator's late-data policy.
- StreamExecDeduplicate (DeduplicateKeepFirstRowFunction) →
  state-backed ``dropDuplicates`` with a watermark bound on state.
- Interval join (RowTimeBoundedStreamJoin) → stream-stream join with
  a time-range condition; watermarks bound both sides' state.

Each function takes an *unbounded* DataFrame (from
``streaming.source.event_stream``) and returns the transformed
unbounded DataFrame — callers pick sink/output mode/trigger. The same
transformations applied to a bounded events DataFrame give the
oracle-checked batch results in queries/events.py: one definition of
the pipeline semantics, two execution modes (exactly the
batch/stream unification the reference's Blink planner advertises).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.deterministic import dsum


def tumbling_window_agg(
    events: DataFrame, size: str = "15 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """TUMBLE(ts, size) counts/sums per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(F.col("value")).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value"
        )
    )


def sliding_window_counts(
    events: DataFrame,
    size: str = "30 minutes",
    slide: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """HOP(ts, slide, size) counts per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """SESSION(ts, gap) per user (reference SessionWindowAssigner)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(F.col("value")).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "cnt",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep one row per key with bounded state (keep-first semantics;
    reference DeduplicateKeepFirstRowFunction)."""
    keys = keys or ["user_id", "event_type"]
    return events.withWatermark("ts", watermark).dropDuplicates(keys)


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    lower_seconds: float = 0,
    upper_seconds: float = 600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream equi-join on user_id within a time interval
    (reference RowTimeBoundedStreamJoin). Both sides carry watermarks
    so join state is evicted once the interval passes."""
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"""
            l.user_id = r.user_id AND
            r.ts >= l.ts + INTERVAL {lower_seconds} SECONDS AND
            r.ts <= l.ts + INTERVAL {upper_seconds} SECONDS
            """
        ),
    ).select(
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )


def streaming_dedup_keep_last(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the LATEST row per key (reference
    DeduplicateKeepLastRowFunction — dropDuplicates only keeps first).

    Implemented as a custom stateful operator: state holds the current
    winner per key; each batch emits nothing and updates state — the
    final state is read back with ``dedup_state_snapshot`` semantics in
    foreachBatch sinks, or emit-per-batch in update mode. Here we emit
    the per-batch winner (update-mode changelog: downstream sees the
    latest row per key as of each batch)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keys = keys or ["user_id", "event_type"]
    out_schema = "user_id long, event_type string, event_id long, ts timestamp, value double"
    state_schema = "ts double, event_id long, value double"

    def keep_last(key, pdfs, state):
        user_id, event_type = key
        best_ts, best_id, best_val = (
            state.get if state.exists else (None, None, None)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            # vectorized per-batch winner: one sort_values instead of
            # row-at-a-time iterrows (the batch max under (ts, event_id)
            # is the only row that can beat the state)
            top = pdf.sort_values(["ts", "event_id"]).iloc[-1]
            t = top["ts"].timestamp()
            if best_ts is None or (t, top["event_id"]) > (best_ts, best_id):
                best_ts, best_id, best_val = t, top["event_id"], top["value"]
        state.update((float(best_ts), int(best_id), float(best_val)))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "event_type": [event_type],
                "event_id": [best_id],
                "ts": pd.to_datetime([int(best_ts * 1e6)], unit="us"),
                "value": [best_val],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            keep_last, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )
