from .joins import asof_join, interval_join, lookup_join
from .match_recognize import (
    match_recognize,
    match_recognize_bounded,
    match_v_shapes,
)
from .topn import dedup_first, dedup_last, top_n

__all__ = [
    "top_n",
    "dedup_first",
    "dedup_last",
    "asof_join",
    "interval_join",
    "lookup_join",
    "match_recognize",
    "match_recognize_bounded",
    "match_v_shapes",
]
