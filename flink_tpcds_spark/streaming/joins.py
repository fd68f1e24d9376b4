"""Streaming semi/anti join and streaming OVER aggregation.

Reference → Spark mapping:

- StreamingSemiAntiJoinOperator.java:35 (stream-stream IN/EXISTS and
  NOT IN/NOT EXISTS): Spark has native stream-stream ``left_semi``
  (3.x+); ``left_anti`` is not a supported stream-stream type, so the
  anti join is derived from the watermark-bounded LEFT OUTER join —
  a left row is emitted with NULL right side exactly when the
  watermark passes the join window with no match, which IS the
  streaming NOT EXISTS semantic (emit once match becomes impossible).
- StreamExecOverAggregate.scala:56 (event-time OVER with UNBOUNDED
  PRECEDING, RowTimeRangeUnboundedPrecedingFunction): implemented as
  a custom stateful operator — per-key running totals carried in
  ``applyInPandasWithState`` state, each batch vectorized (sort +
  cumsum) rather than row-at-a-time.

State at scale: semi/anti state is bounded by the watermark on both
sides (same eviction contract as the interval join); OVER state is
O(keys) — two doubles and a count per key — not O(rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bounded(df: DataFrame, watermark: str, side: str) -> DataFrame:
    return df.withWatermark("ts", watermark).alias(side)


def _interval_cond(lower_seconds: float, upper_seconds: float):
    return F.expr(
        f"""
        l.user_id = r.user_id AND
        r.ts >= l.ts - INTERVAL {upper_seconds} SECONDS AND
        r.ts <= l.ts - INTERVAL {lower_seconds} SECONDS
        """
    )


def streaming_semi_join(
    left: DataFrame,
    right: DataFrame,
    lower_seconds: float = 0,
    upper_seconds: float = 3600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Rows of ``left`` that have ≥1 ``right`` row from the same user
    in the time window [ts - upper, ts - lower] — streaming EXISTS.
    Native ``left_semi`` stream-stream join; watermarks bound state."""
    return (
        _bounded(left, watermark, "l")
        .join(
            _bounded(right, watermark, "r"),
            _interval_cond(lower_seconds, upper_seconds),
            "left_semi",
        )
        .select("event_id", "user_id", "ts", "value")
    )


def streaming_anti_join(
    left: DataFrame,
    right: DataFrame,
    lower_seconds: float = 0,
    upper_seconds: float = 3600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Rows of ``left`` with NO ``right`` row from the same user in
    the window — streaming NOT EXISTS. Spark does not support
    stream-stream ``left_anti``; the equivalent is the watermark-
    bounded left-outer join filtered to the null-padded rows (the
    runtime emits those only once a match is impossible)."""
    r = (
        right.withWatermark("ts", watermark)
        .select(F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"))
        .alias("r")
    )
    joined = _bounded(left, watermark, "l").join(
        r,
        F.expr(
            f"""
            l.user_id = r.r_user AND
            r.r_ts >= l.ts - INTERVAL {upper_seconds} SECONDS AND
            r.r_ts <= l.ts - INTERVAL {lower_seconds} SECONDS
            """
        ),
        "left_outer",
    )
    return joined.filter(F.col("r.r_user").isNull()).select(
        "event_id", "user_id", "ts", "value"
    )


def streaming_over_running_sum(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Event-time OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING): every input row is emitted with its
    running sum/count of ``value`` over all earlier rows of the key.

    Batch analog (the equivalence oracle in tests):

        SUM(value)  OVER (PARTITION BY user_id
                          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)

    State is (count, sum) per key; each batch is one vectorized
    sort+cumsum. Rows arriving across batches out of event-time order
    are accumulated in arrival order (same as the reference's
    row-time OVER once watermarks force in-order firing).

    The running sum is carried in int64 micro-units (the decimal
    bridge, functions/deterministic.py, applied to a stateful
    operator): per-row ``round(value·10⁶)`` is exact for the data's
    ≤6-decimal-digit values, the cumsum is integer (associative, no
    float drift across ANY batch split), and the emitted double is a
    single exact conversion — so the stream's output hash-matches
    ``CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (...) AS DOUBLE)``
    bit-for-bit on any cluster.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id long, event_id long, ts timestamp, value double, "
        "running_cnt long, running_sum double"
    )
    state_schema = "cnt long, total_micro long"

    def running(key, pdfs, state):
        (user_id,) = key
        cnt, total_micro = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            micro = (
                (pdf["value"] * 1_000_000).round().astype("int64")
            )
            # the docstring's preconditions, enforced (ADVICE r8): a
            # value with > 6 decimal digits would be silently
            # mis-rounded, and an int64 cumsum past ~9.2e12 in micro
            # units would silently wrap — fail loudly instead
            vals = pdf["value"].to_numpy()
            back = micro.to_numpy() / 1_000_000.0
            if not (back == vals).all():
                bad = vals[back != vals][0]
                raise ValueError(
                    "streaming_over_running_sum: value "
                    f"{bad!r} has more than 6 decimal digits — the "
                    "int64 micro-unit bridge cannot represent it "
                    "exactly; rescale or widen the bridge"
                )
            csum = micro.cumsum() + total_micro
            if int(np.abs(csum.to_numpy()).max()) >= 2**62:
                raise OverflowError(
                    "streaming_over_running_sum: running sum exceeds "
                    "the int64 micro-unit safety bound (~4.6e12 in "
                    "value units) — widen the bridge"
                )
            ccnt = pd.RangeIndex(1, len(pdf) + 1) + cnt
            out = pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": pdf["event_id"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "value": pdf["value"].to_numpy(),
                    "running_cnt": ccnt.to_numpy(),
                    "running_sum": csum.to_numpy() / 1_000_000.0,
                }
            )
            total_micro = int(csum.iloc[-1])
            cnt = int(ccnt[-1])
            yield out
        state.update((cnt, total_micro))

    return (
        events.select("user_id", "event_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            running,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
