from .csv import read_dsdgen_csv, write_csv
from .sinks import write_partitioned
from .bucketing import bucket_table, bucketed_join_ready

__all__ = [
    "read_dsdgen_csv",
    "write_csv",
    "write_partitioned",
    "bucket_table",
    "bucketed_join_ready",
]
