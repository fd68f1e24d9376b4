"""Top-N / rank / deduplicate operators.

Reference operators re-expressed Spark-first:

- BatchExecRank / StreamExecRank TopN (reference:
  runtime/operators/rank/AppendOnlyTopNFunction.java:46,
  planner BatchExecRank.scala:56) → ``row_number()/rank() OVER`` +
  filter. Spark ≥3.5 pushes the filter into WindowGroupLimitExec, so
  the per-partition "keep a heap of N" behavior of the reference's
  TopNBuffer happens inside the window operator — no full sort of
  each partition at scale.
- StreamExecDeduplicate keep-first/keep-last (reference:
  runtime/operators/deduplicate/DeduplicateKeepLastRowFunction.java:34)
  → rank-1 window in batch; see streaming/dedup.py for the stateful
  streaming form.

All helpers demand an explicit, total ordering (ties broken by the
caller's order columns) so results are deterministic at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_RANK_FNS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def top_n(
    df: DataFrame,
    partition_by: list[str | Column],
    order_by: list[Column],
    n: int,
    rank_fn: str = "row_number",
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top ``n`` rows per partition under ``order_by``.

    ``rank_fn`` picks the reference's rank semantics (RANK keeps ties,
    ROW_NUMBER does not — BatchExecRank.scala:80 only supports RANK;
    we support all three).
    """
    if rank_fn not in _RANK_FNS:
        raise ValueError(f"rank_fn must be one of {sorted(_RANK_FNS)}")
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn("__rank", _RANK_FNS[rank_fn]().over(w))
    out = ranked.filter(F.col("__rank") <= n)
    if rank_col:
        return out.withColumnRenamed("__rank", rank_col)
    return out.drop("__rank")


def dedup_first(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """Keep the first row per key under ``order_by`` (deterministic
    ``dropDuplicates``). Batch analog of DeduplicateKeepFirstRowFunction."""
    return top_n(df, keys, order_by, 1, "row_number")


def dedup_last(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """Keep the last row per key under ``order_by``."""
    return top_n(df, keys, [c.desc() for c in order_by], 1, "row_number")
