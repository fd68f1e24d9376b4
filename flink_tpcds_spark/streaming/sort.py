"""Streaming event-time sort (reference StreamExecTemporalSort /
StreamExecSort — SURVEY §2.7's "rarely needed" row).

The reference's temporal sort (flink-table-planner-blink/src/main/
scala/org/apache/flink/table/planner/plan/nodes/physical/stream/
StreamExecTemporalSort.scala) buffers rows per key and releases them
in event-time order as the watermark advances. Structured Streaming
has no sort on unbounded frames, so this is a custom stateful
operator: ``applyInPandasWithState`` buffers each key's rows in the
state store and, on every micro-batch (and on event-time timeout,
which also fires in the final no-data batch of an availableNow run),
emits the buffered prefix whose timestamp is at or below the current
watermark — sorted by (ts, event_id). Rows inside the watermark delay
stay buffered, exactly like an unclosed window in append mode.

Scale: state per key is O(rows inside the watermark delay), the same
bound the reference's sort operator carries; one shuffle on the key.
A global (non-keyed) event-time sort is the key=constant degenerate
case and is single-task by nature — the reference's StreamExecSort is
likewise parallelism-1.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SORT_OUT_SCHEMA = "user_id long, ts timestamp, event_id long, value double"
SORT_STATE_SCHEMA = (
    "ts_buf array<long>, id_buf array<long>, val_buf array<double>"
)


def event_time_sorted(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Emit each user's events in exact (ts, event_id) order, releasing
    rows only once the watermark has passed them."""

    def release(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts: list[int] = []
        ids: list[int] = []
        vals: list[float] = []
        if state.exists:
            t, i, v = state.get
            ts, ids, vals = list(t), list(i), list(v)
        for pdf in pdfs:
            ts += [int(x) for x in pd.DatetimeIndex(pdf["ts"]).asi8]  # ns
            ids += [int(x) for x in pdf["event_id"]]
            vals += [float(x) for x in pdf["value"]]
        wm_ns = state.getCurrentWatermarkMs() * 1_000_000
        order = sorted(range(len(ts)), key=lambda k: (ts[k], ids[k]))
        emit = [k for k in order if ts[k] <= wm_ns]
        keep = [k for k in order if ts[k] > wm_ns]
        if keep:
            state.update(
                (
                    [ts[k] for k in keep],
                    [ids[k] for k in keep],
                    [vals[k] for k in keep],
                )
            )
            # fire again as soon as the watermark moves (including the
            # terminal no-data batch), so buffered rows keep draining
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "ts": pd.to_datetime([ts[k] for k in emit], unit="ns"),
                "event_id": [ids[k] for k in emit],
                "value": [vals[k] for k in emit],
            }
        )

    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            release,
            SORT_OUT_SCHEMA,
            SORT_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
