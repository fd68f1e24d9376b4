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


def linear_interpolate(
    dense: DataFrame,
    key_col: str,
    bucket_col: str,
    col: str,
) -> DataFrame:
    """Add ``<col>_interp``: linear interpolation of ``col`` across
    INTERIOR gaps of an already-densified uniform grid (leading and
    trailing gaps stay NULL — there is no second anchor to draw the
    line to, the time_bucket_gapfill ``interpolate()`` contract).

    Engine-exactness: the interpolation fraction is built from the
    grid's ROW INDEX (row_number per key), so the weights are exact
    small-integer ratios — no epoch/timezone arithmetic — and the
    formula ``prev + (next - prev) * frac`` in doubles is
    bit-identical on any engine evaluating the same text. Cost: the
    same single per-key ordered window pass as LOCF (two running
    scans, no extra shuffle)."""
    w_ord = Window.partitionBy(key_col).orderBy(bucket_col)
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    rn = F.row_number().over(w_ord)
    obs_rn = F.when(F.col(col).isNotNull(), rn)
    out = (
        dense.withColumn("__rn", rn)
        .withColumn("__obs_rn", obs_rn)
        .withColumn("__pv", F.last(col, ignorenulls=True).over(w_prev))
        .withColumn(
            "__pr", F.last("__obs_rn", ignorenulls=True).over(w_prev)
        )
        .withColumn("__nv", F.first(col, ignorenulls=True).over(w_next))
        .withColumn(
            "__nr", F.first("__obs_rn", ignorenulls=True).over(w_next)
        )
    )
    frac = (F.col("__rn") - F.col("__pr")).cast("double") / (
        F.col("__nr") - F.col("__pr")
    ).cast("double")
    interp = (
        F.when(F.col(col).isNotNull(), F.col(col).cast("double"))
        .when(
            F.col("__pv").isNotNull() & F.col("__nv").isNotNull(),
            F.col("__pv").cast("double")
            + (F.col("__nv").cast("double") - F.col("__pv").cast("double"))
            * frac,
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return out.withColumn(f"{col}_interp", interp).drop(
        "__rn", "__obs_rn", "__pv", "__pr", "__nv", "__nr"
    )
