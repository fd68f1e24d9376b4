"""Bucketed (pre-partitioned) tables for shuffle-free fact-fact joins.

At 100 TB the only joins that cannot broadcast are fact⋈fact
(lineitem⋈orders on the order key). Bucketing both tables on the join
key at write time makes every such join (and groupBy on the key)
shuffle-free forever after — the same idea as the reference's
hash-distributed BATCH shuffle reuse (BatchExecExchange hash
distribution, SURVEY §3 control boundaries).

Spark bucketing requires a table (metastore entry), not a bare path —
``bucket_table`` writes ``saveAsTable`` with sortBy for merge-ready
buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucket_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, on: str):
    """Join two same-bucketed tables — returns the joined DataFrame;
    the plan must contain NO Exchange on the join keys (asserted in
    tests/test_sources.py)."""
    return spark.table(left).join(spark.table(right), on)
