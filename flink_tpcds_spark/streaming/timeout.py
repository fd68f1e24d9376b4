"""Streaming absence/timeout CEP: ``A notFollowedBy B within T``.

The one CEP capability the quantified-chain matchers (streaming/
match.py, streaming/cep.py) cannot express is NEGATION under a time
bound — Flink CEP's ``Pattern.begin("a").notFollowedBy("b").within(T)``
(flink-cep NFACompiler's NOT-state handling, surfaced through the
reference's StreamExecMatch stack). Semantics: for every key, emit
each A-event at time ``t`` for which NO B-event of the same key
exists in ``(t, t + T]``. The decision is only final once the
watermark passes ``t + T`` (every B that could cancel is frozen), so
the operator emits exactly then — never earlier, and not only at
stream end.

Spark-first design — unlike the pattern matchers this needs NO Python
row path at all: the per-batch transition is pure DataFrame algebra,
  * cancelled = pending-A  SEMI-JOIN  recent-B  ON key ∧ t < b.ts ≤ t+T
  * expired   = survivors with  t + T < watermark  → emit
  * retained  = open A's (deadline ≥ watermark)
                ∪ B's with ts > watermark − T   (older B's can cancel
                  nothing that is still open — the retention proof in
                  ``update``)
so every step is a keyed shuffle join Catalyst plans as a hash/SMJ —
whole-stage-codegen, broadcastable when the delta is small. Keyed
state is O(events in a (T + lateness) window), not O(stream).

Eager cancellation is sound because B-observations are monotone: once
a cancelling B is seen the A can never time out, so dropping it early
only shrinks state (replays re-observe the same B — event_id dedupe
makes the union idempotent).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..sources.incremental import CrashSafeParquetState

_STATE_SCHEMA = StructType(
    [
        StructField("kind", StringType()),  # match | pa | rb
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)

_EPOCH = _dt.datetime(1970, 1, 1)


class StreamingTimeout(CrashSafeParquetState):
    """``a_type`` not followed by ``b_type`` within ``within`` per
    ``user_id``, over micro-batches of
    (user_id, ts, event_id, event_type). Drive with ``foreach_batch``
    (replay-idempotent), ``flush`` at end-of-stream; read
    ``matches()`` — (user_id, event_id, a_ts)."""

    WM_MARKER = "_WATERMARK_US"
    LATE_MARKER = "_LATE_DROPPED"

    def __init__(
        self,
        path: str,
        a_type: str,
        b_type: str,
        within: _dt.timedelta,
        lateness: _dt.timedelta,
    ):
        super().__init__(path)
        if within <= _dt.timedelta(0):
            raise ValueError("within must be positive")
        self.a_type = a_type
        self.b_type = b_type
        self.within = within
        self.lateness = lateness

    # -- state accessors ----------------------------------------------------

    def watermark(self) -> _dt.datetime:
        self._recover()
        v = self._marker(self.WM_MARKER)
        return (
            _EPOCH + _dt.timedelta(microseconds=int(v))
            if v is not None
            else _EPOCH
        )

    def late_dropped(self) -> int:
        self._recover()
        v = self._marker(self.LATE_MARKER)
        return int(v) if v is not None else 0

    def _state(self, spark: SparkSession) -> DataFrame:
        self._recover()
        if os.path.isdir(self.path):
            return spark.read.schema(_STATE_SCHEMA).parquet(self.path)
        return spark.createDataFrame([], _STATE_SCHEMA)

    def matches(self, spark: SparkSession) -> DataFrame:
        return (
            self._state(spark)
            .filter(F.col("kind") == "match")
            .select("user_id", "event_id", F.col("ts").alias("a_ts"))
        )

    def pending_counts(self, spark: SparkSession) -> dict[str, int]:
        """(for tests) rows per state kind."""
        rows = self._state(spark).groupBy("kind").count().collect()
        return {r["kind"]: r["count"] for r in rows}

    # -- the batch transition ----------------------------------------------

    def update(
        self,
        spark: SparkSession,
        batch_df: DataFrame,
        batch_id: int | None = None,
        final: bool = False,
    ) -> None:
        state = self._state(spark)
        prev_matches = state.filter(F.col("kind") == "match")
        pa = state.filter(F.col("kind") == "pa").drop("kind")
        rb = state.filter(F.col("kind") == "rb").drop("kind")
        prev_wm = self.watermark()

        # microsecond rendering (ADVICE r9): an int(total_seconds())
        # cast would silently truncate a sub-second ``within``, making
        # the cancel/expiry bound disagree with an oracle that uses
        # the untruncated timedelta.
        ivl_us = (
            self.within.days * 86_400_000_000
            + self.within.seconds * 1_000_000
            + self.within.microseconds
        )
        ivl = F.expr(f"INTERVAL {ivl_us} MICROSECOND")

        rows = batch_df.select("user_id", "event_id", "ts", "event_type")
        n_late = rows.filter(F.col("ts") < F.lit(prev_wm)).count()
        on_time_all = rows.filter(F.col("ts") >= F.lit(prev_wm))

        if final:
            wm = _dt.datetime(9999, 1, 1)
        else:
            # the watermark advances on EVERY on-time row's event time
            # (a stream's watermark tracks the stream, not just the
            # pattern's alphabet)
            hi = on_time_all.agg(F.max("ts")).collect()[0][0]
            wm = prev_wm
            if hi is not None:
                wm = max(prev_wm, hi - self.lateness)
        on_time = on_time_all.filter(
            F.col("event_type").isin(self.a_type, self.b_type)
        )

        # union new arrivals into state; event_id dedupe makes
        # at-least-once replays a no-op
        all_pa = (
            pa.unionByName(
                on_time.filter(
                    F.col("event_type") == self.a_type
                ).select("user_id", "event_id", "ts")
            )
            .dropDuplicates(["event_id"])
        )
        all_rb = (
            rb.unionByName(
                on_time.filter(
                    F.col("event_type") == self.b_type
                ).select("user_id", "event_id", "ts")
            )
            .dropDuplicates(["event_id"])
        )

        # eager cancel: any A with a B in (t, t+T] can never time out
        b = all_rb.select(
            F.col("user_id").alias("b_uid"), F.col("ts").alias("b_ts")
        )
        cancel_cond = (
            (F.col("user_id") == F.col("b_uid"))
            & (F.col("b_ts") > F.col("ts"))
            & (F.col("b_ts") <= F.col("ts") + ivl)
        )
        live_pa = all_pa.join(b, cancel_cond, "left_anti")

        # an A is decided once every B that could cancel it is frozen:
        # stragglers below wm are dropped on arrival, so the B-set
        # over (t, t+T] is final exactly when t + T < wm
        expired = live_pa.filter(F.col("ts") + ivl < F.lit(wm))
        open_pa = live_pa.filter(F.col("ts") + ivl >= F.lit(wm))

        new_matches = expired.select(
            F.lit("match").alias("kind"), "user_id", "event_id", "ts"
        )
        # retention proof: every open A has t + T ≥ wm ⇒ t ≥ wm − T;
        # a B can only cancel A's with t ∈ [b.ts − T, b.ts), so a B
        # with ts ≤ wm − T cancels only A's with t < wm − T — none of
        # which are still open, and future A's arrive with t ≥ wm.
        keep_rb = all_rb.filter(F.col("ts") > F.lit(wm) - ivl)

        parts = [prev_matches, new_matches]
        if not final:
            parts.append(
                open_pa.select(
                    F.lit("pa").alias("kind"), "user_id", "event_id", "ts"
                )
            )
            parts.append(
                keep_rb.select(
                    F.lit("rb").alias("kind"), "user_id", "event_id", "ts"
                )
            )
        new_state = parts[0]
        for p in parts[1:]:
            new_state = new_state.unionByName(p)

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
        self._recover()
        self.update(
            spark,
            spark.createDataFrame(
                [],
                "user_id long, event_id long, ts timestamp, "
                "event_type string",
            ),
            batch_id=self._last_batch() + 1,
            final=True,
        )


def batch_timeouts(
    df: DataFrame, a_type: str, b_type: str, within: _dt.timedelta
) -> DataFrame:
    """Batch reference semantics: the same absence predicate as one
    anti-join over the whole input (the DataFrame form of the oracle's
    NOT EXISTS). Used by tests and as the batch-mode operator."""
    # Microsecond rendering, same contract as the streaming path
    # (update() above): int(total_seconds()) would silently truncate
    # a sub-second ``within`` and disagree with the streaming operator.
    ivl_us = (
        within.days * 86_400_000_000
        + within.seconds * 1_000_000
        + within.microseconds
    )
    ivl = F.expr(f"INTERVAL {ivl_us} MICROSECOND")
    a = df.filter(F.col("event_type") == a_type).select(
        "user_id", "event_id", "ts"
    )
    b = df.filter(F.col("event_type") == b_type).select(
        F.col("user_id").alias("b_uid"), F.col("ts").alias("b_ts")
    )
    cond = (
        (F.col("user_id") == F.col("b_uid"))
        & (F.col("b_ts") > F.col("ts"))
        & (F.col("b_ts") <= F.col("ts") + ivl)
    )
    return a.join(b, cond, "left_anti").select(
        "user_id", "event_id", F.col("ts").alias("a_ts")
    )
