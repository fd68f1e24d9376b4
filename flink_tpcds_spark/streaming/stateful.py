"""Custom stateful streaming operators via ``applyInPandasWithState``.

This is the engine's escape hatch for operators Structured Streaming
lacks as primitives — the analog of the reference writing a custom
``KeyedProcessFunction`` (e.g. its temporal join and top-n operators,
SURVEY §2.10). State lives in the state store per key; each
micro-batch hands the operator its new rows + prior state.

``stateful_session_counts`` re-implements session windows as a custom
operator (same semantics as ``session_window()``), demonstrating the
full state plumbing: schema-declared state, incremental merge, emit-on
-close. Real uses: CEP-lite pattern detection, custom decay counters,
per-key model state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, cnt long"
)
STATE_SCHEMA = "last_ts double, cur_start double, cur_cnt long"


def stateful_session_counts(
    events: DataFrame, gap_minutes: float = 30.0
) -> DataFrame:
    """Emit (user, session_start, session_end, cnt) for every CLOSED
    session; the open tail session stays in state across batches.

    session_end = last event ts + gap, matching ``session_window()``.
    """
    gap = gap_minutes * 60.0

    def sessionize(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts = (
            pd.concat([pdf["ts"] for pdf in pdfs])
            .sort_values()
            .map(lambda t: t.timestamp())
        )
        if state.exists:
            last, start, cnt = state.get
        else:
            last, start, cnt = None, None, 0
        closed: list[tuple] = []
        for t in ts:
            if last is not None and t - last > gap:
                closed.append((user_id, start, last + gap, cnt))
                start, cnt = t, 0
            if last is None:
                start = t
            cnt += 1
            last = t
        if last is not None:
            state.update((float(last), float(start), int(cnt)))
        out = pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "cnt"]
        )
        if not out.empty:
            for c in ("session_start", "session_end"):
                # exact integer microseconds: float-second datetimes
                # carry ns noise that Arrow's safe µs cast rejects
                out[c] = pd.to_datetime(
                    (out[c] * 1e6).round().astype("int64"), unit="us"
                )
        yield out

    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
