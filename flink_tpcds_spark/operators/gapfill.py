"""Time-series gap filling: densify a bucketed series and carry
observations forward (LOCF).

The time_bucket_gapfill / interpolation class of operator (TimescaleDB,
Flink's windowed interpolation): an aggregated series has no row at
all for an empty bucket, but downstream consumers (charting, joins
against other series, training-window assembly) need a dense grid.

Spark-first mechanics, zero UDFs:
- the dense grid is ``sequence(min_bucket, max_bucket, interval)``
  exploded once and cross-joined against the (tiny, broadcast) key
  dimension — the grid is generated, never shuffled;
- observed buckets left-join onto the grid;
- LOCF is ``last(value, ignorenulls=True)`` over an unbounded
  preceding window per key — one shuffle on the key, the same cost
  as any per-key ordered pass.

Counts/sums fill with zero (an empty bucket truly has zero events);
LOCF answers "what was the latest known level" — the distinction
matters and both columns are emitted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill(
    agg: DataFrame,
    key_col: str,
    bucket_col: str,
    zero_fill: dict[str, Column],
    locf_cols: list[str],
    interval: str = "1 hour",
) -> DataFrame:
    """Densify ``agg`` (one row per (key, bucket) OBSERVED) onto the
    full [min, max] bucket grid per key.

    ``zero_fill``: output column -> zero literal (applied when the
    bucket is absent). ``locf_cols``: columns additionally emitted as
    ``<col>_locf`` = last observed value at or before the bucket
    (NULL until the key's first observation — leading gaps have no
    level to carry).
    """
    bounds = agg.agg(
        F.min(bucket_col).alias("lo"), F.max(bucket_col).alias("hi")
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {interval}"))
        ).alias(bucket_col)
    )
    keys = agg.select(key_col).distinct()
    dense = grid.crossJoin(F.broadcast(keys))
    joined = dense.join(agg, [key_col, bucket_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    # LOCF BEFORE zero-fill: the carry-forward must see absent
    # buckets as NULL — a zero-filled column would "carry" the fill
    # value and erase the observed level.
    for col in locf_cols:
        out = out.withColumn(
            f"{col}_locf", F.last(col, ignorenulls=True).over(w)
        )
    for col, zero in zero_fill.items():
        out = out.withColumn(col, F.coalesce(F.col(col), zero))
    return out
