"""Streaming COUNT windows: per-key tumbling OR sliding windows of N
rows (a window starts every ``slide`` rows; tumbling = slide of N).

Reference surface: CountTumblingWindowAssigner.java and
CountSlidingWindowAssigner.java (runtime/operators/window/assigners/)
— the reference fires a window every N elements per key, in arrival
order. Arrival order is not reproducible
across replays, so this operator uses the same determinism posture as
the rest of the streaming layer: rows enter their key's window
sequence in EVENT-TIME order (ts, event_id), and a row is folded only
once it is frozen (ts below the watermark — no straggler can ever
sort before it). Window k of a key is rows [kN, (k+1)N) of that
order; it fires exactly when its N-th row freezes. Semantics are
therefore identical to the batch row_number()-based assignment, which
is what the SQL oracle pins.

State per key is O(1) + O(mutable region): one PARTIAL row — the open
window's (count, exact micro-unit sum, min/max ts, next window index)
— plus the not-yet-frozen rows of the lateness window. The fold runs
in one Arrow-batched ``applyInPandas`` pass per TOUCHED key (a key is
re-folded only when a batch brings it rows or the watermark newly
freezes some of its pending rows; untouched keys' state passes
through verbatim), the same isolation contract as streaming/cep.py.

Sums are carried in int64 micro-units (the decimal bridge), so the
emitted total is bit-identical to the oracle's DECIMAL(18,6) sum on
any cluster; bounds are asserted at runtime like
streaming_over_running_sum.
"""

from __future__ import annotations

import datetime as _dt
import os

import pandas as pd

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

from ..sources.incremental import CrashSafeParquetState

_STATE_SCHEMA = StructType(
    [
        StructField("kind", StringType()),  # win | partial | pending | meta
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),  # pending rows
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("win", LongType()),  # win rows + partial.next_win
        StructField("cnt", LongType()),
        StructField("total_micro", LongType()),
        StructField("start_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
    ]
)

_EPOCH = _dt.datetime(1970, 1, 1)
_MICRO_BOUND = 4_600_000_000_000  # half the int64 range at 1e6 scale


class StreamingCountWindows(CrashSafeParquetState):
    """Count windows per user_id over micro-batches of
    (user_id, ts, event_id, value): tumbling (``slide`` omitted) or
    SLIDING (CountSlidingWindowAssigner — a window of ``n`` rows
    starts every ``slide`` rows, so a row belongs to up to
    ⌈n/slide⌉ windows). ``windows()`` returns
    (user_id, win, cnt, total, start_ts, end_ts) for every COMPLETED
    window; ``residuals()`` the open partials (never fired — the
    CountWindow contract). Per-key state: one META row (rows consumed
    so far — window starts are positional), ≤ ⌈n/slide⌉ open
    partials, and the mutable lateness region."""

    WM_MARKER = "_WATERMARK_US"
    LATE_MARKER = "_LATE_DROPPED"

    def __init__(
        self,
        path: str,
        n: int,
        lateness: _dt.timedelta,
        slide: int | None = None,
    ):
        super().__init__(path)
        if n < 1:
            raise ValueError("n must be ≥ 1")
        self.n = n
        self.slide = n if slide is None else slide
        if self.slide < 1:
            raise ValueError("slide must be ≥ 1")
        self.lateness = lateness

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

    def windows(self, spark: SparkSession) -> DataFrame:
        return (
            self._state(spark)
            .filter(F.col("kind") == "win")
            .select(
                "user_id",
                "win",
                "cnt",
                (F.col("total_micro") / 1_000_000.0).alias("total"),
                "start_ts",
                "end_ts",
            )
        )

    def residuals(self, spark: SparkSession) -> DataFrame:
        return (
            self._state(spark)
            .filter(F.col("kind") == "partial")
            .select("user_id", "win", "cnt")
        )

    def update(
        self,
        spark: SparkSession,
        batch_df: DataFrame,
        batch_id: int | None = None,
        final: bool = False,
    ) -> None:
        state = self._state(spark)
        done = state.filter(F.col("kind") == "win")
        carried = state.filter(
            F.col("kind").isin("partial", "pending", "meta")
        )
        prev_wm = self.watermark()

        rows = batch_df.select("user_id", "ts", "event_id", "value")
        n_late = rows.filter(F.col("ts") < F.lit(prev_wm)).count()
        on_time = rows.filter(F.col("ts") >= F.lit(prev_wm))

        if final:
            wm = _dt.datetime(9999, 1, 1)
        else:
            hi = on_time.agg(F.max("ts")).collect()[0][0]
            wm = prev_wm
            if hi is not None:
                wm = max(prev_wm, hi - self.lateness)

        # touched-key isolation (same contract as streaming/cep.py)
        touched = (
            on_time.select("user_id")
            .unionByName(
                carried.filter(
                    (F.col("kind") == "pending")
                    & (F.col("ts") >= F.lit(prev_wm))
                    & (F.col("ts") < F.lit(wm))
                ).select("user_id")
            )
            .distinct()
        )
        carried_t = carried.join(touched, "user_id", "left_semi")
        carried_u = carried.join(touched, "user_id", "left_anti")

        incoming = on_time.select(
            F.lit("pending").alias("kind"),
            "user_id",
            "ts",
            "event_id",
            "value",
            *[
                F.lit(None).cast(t).alias(c)
                for c, t in [
                    ("win", "long"),
                    ("cnt", "long"),
                    ("total_micro", "long"),
                    ("start_ts", "timestamp"),
                    ("end_ts", "timestamp"),
                ]
            ],
        )
        n = self.n
        slide = self.slide
        wm_py = wm
        out_schema = _STATE_SCHEMA
        cols = [f.name for f in _STATE_SCHEMA.fields]

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            uid = int(pdf["user_id"].iloc[0])
            meta = pdf[pdf["kind"] == "meta"]
            p = int(meta["cnt"].iloc[0]) if len(meta) else 0
            open_w = [
                {
                    "win": int(r["win"]),
                    "cnt": int(r["cnt"]),
                    "total": int(r["total_micro"]),
                    "lo": r["start_ts"],
                    "hi": r["end_ts"],
                }
                for _, r in pdf[pdf["kind"] == "partial"].iterrows()
            ]
            open_w.sort(key=lambda d: d["win"])
            ev = (
                pdf[pdf["kind"] == "pending"]
                .sort_values(["ts", "event_id"])
                .reset_index(drop=True)
            )
            out = []
            keep_from = 0
            for i in range(len(ev)):
                if ev["ts"].iloc[i] >= wm_py:
                    break
                keep_from = i + 1
                t = ev["ts"].iloc[i]
                micro = round(float(ev["value"].iloc[i]) * 1_000_000)
                if p % slide == 0:
                    # a new window starts every `slide` rows; its
                    # index is positional, so replays/batch splits
                    # cannot renumber it
                    open_w.append(
                        {
                            "win": p // slide,
                            "cnt": 0,
                            "total": 0,
                            "lo": None,
                            "hi": None,
                        }
                    )
                still = []
                for w in open_w:
                    w["cnt"] += 1
                    w["total"] += micro
                    if abs(w["total"]) > _MICRO_BOUND:
                        raise ValueError(
                            "count-window micro-unit sum exceeds "
                            "the int64 safety bound"
                        )
                    if w["lo"] is None or pd.isna(w["lo"]):
                        w["lo"] = t
                    w["hi"] = t
                    if w["cnt"] == n:
                        out.append(
                            {
                                "kind": "win",
                                "user_id": uid,
                                "ts": None,
                                "event_id": None,
                                "value": None,
                                "win": w["win"],
                                "cnt": w["cnt"],
                                "total_micro": w["total"],
                                "start_ts": w["lo"],
                                "end_ts": w["hi"],
                            }
                        )
                    else:
                        still.append(w)
                open_w = still
                p += 1
            for w in open_w:
                out.append(
                    {
                        "kind": "partial",
                        "user_id": uid,
                        "ts": None,
                        "event_id": None,
                        "value": None,
                        "win": w["win"],
                        "cnt": w["cnt"],
                        "total_micro": w["total"],
                        "start_ts": w["lo"],
                        "end_ts": w["hi"],
                    }
                )
            if p > 0:
                # the consumed-row count IS the window numbering —
                # keep it whenever the key has ever frozen a row
                out.append(
                    {
                        "kind": "meta",
                        "user_id": uid,
                        "ts": None,
                        "event_id": None,
                        "value": None,
                        "win": None,
                        "cnt": p,
                        "total_micro": None,
                        "start_ts": None,
                        "end_ts": None,
                    }
                )
            for i in range(keep_from, len(ev)):
                out.append(
                    {
                        "kind": "pending",
                        "user_id": uid,
                        "ts": ev["ts"].iloc[i],
                        "event_id": int(ev["event_id"].iloc[i]),
                        "value": float(ev["value"].iloc[i]),
                        "win": None,
                        "cnt": None,
                        "total_micro": None,
                        "start_ts": None,
                        "end_ts": None,
                    }
                )
            return pd.DataFrame(out, columns=cols)

        folded = (
            carried_t.unionByName(incoming)
            .groupBy("user_id")
            .applyInPandas(fold, out_schema)
        )
        if final:
            folded = folded.filter(F.col("kind") != "pending")
        new_state = done.unionByName(folded).unionByName(carried_u)

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
                [], "user_id long, ts timestamp, event_id long, value double"
            ),
            batch_id=self._last_batch() + 1,
            final=True,
        )
