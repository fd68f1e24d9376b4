from .joins import (
    streaming_anti_join,
    streaming_over_running_sum,
    streaming_semi_join,
)
from .sinks import ParquetRetractSink, ParquetUpsertSink
from .sort import event_time_sorted
from .source import event_stream
from .windows import (
    sliding_window_counts,
    session_window_agg,
    streaming_dedup,
    streaming_interval_join,
    tumbling_window_agg,
)

__all__ = [
    "event_stream",
    "event_time_sorted",
    "ParquetRetractSink",
    "ParquetUpsertSink",
    "tumbling_window_agg",
    "sliding_window_counts",
    "session_window_agg",
    "streaming_dedup",
    "streaming_interval_join",
    "streaming_semi_join",
    "streaming_anti_join",
    "streaming_over_running_sum",
]
