"""Table sinks (reference BatchExecSink + PartitionableTableSink /
OverwritableTableSink traits — SURVEY §2.1).

The reference models sinks as: partitionable (write into partition
dirs) and overwritable (INSERT OVERWRITE). Spark's DataFrameWriter
carries both natively; these helpers pin the engine's conventions
(dynamic partition overwrite, parquet) and exist so the §2 inventory
has a first-class, tested sink surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Partitioned write (PartitionableTableSink): one directory per
    partition value; with ``dynamic`` only the partitions present in
    ``df`` are replaced (Spark's dynamic partitionOverwriteMode) —
    the semantics a 100 TB incremental pipeline needs, instead of
    truncate-the-world."""
    writer = df.write.format(fmt).mode(mode).partitionBy(*partition_by)
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.save(path)
