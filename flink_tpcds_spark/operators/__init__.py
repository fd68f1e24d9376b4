from .joins import asof_join, interval_join, lookup_join
from .topn import dedup_first, dedup_last, top_n

__all__ = [
    "top_n",
    "dedup_first",
    "dedup_last",
    "asof_join",
    "interval_join",
    "lookup_join",
]
