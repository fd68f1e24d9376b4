"""Streaming PIVOT: fixed-category pivot over an unbounded stream.

Batch ``pivot()`` needs the category set before planning (Spark scans
for distinct values when they are not supplied) — on a stream that
scan is impossible, so the sound streaming semantics is pivot over a
DECLARED category list, which then compiles to one conditional
aggregate per (category, measure): exactly how Catalyst lowers batch
pivot with an explicit ``values`` list. The update-mode aggregate
keeps one row per group key with per-category running counts/sums —
O(groups) state, no per-event retention.

Reference analog: the Blink planner's streaming group aggregate with
FILTER-ed aggregate calls (``COUNT(*) FILTER (WHERE type = 'x')``) —
the SQL spelling of the same lowering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.deterministic import dsum


def pivot_aggs(
    pivot_col: str, categories: list[str], value_col: str
) -> list[Column]:
    """One (cnt, total) pair per declared category; the category name
    is sanitized into the output column names the way batch pivot
    does. Totals ride the decimal bridge so streaming partial-merge
    order cannot move the result."""
    aggs: list[Column] = []
    for cat in categories:
        is_cat = F.col(pivot_col) == cat
        aggs.append(
            F.count(F.when(is_cat, 1)).cast("bigint").alias(f"{cat}_cnt")
        )
        aggs.append(
            dsum(F.when(is_cat, F.col(value_col))).alias(f"{cat}_total")
        )
    return aggs


def streaming_pivot(
    stream: DataFrame,
    key_cols: list[str],
    pivot_col: str,
    categories: list[str],
    value_col: str,
) -> DataFrame:
    """Update-mode pivot aggregate: one output row per key, one
    (count, decimal-sum) column pair per declared category. Rows with
    an undeclared category contribute to no pivot column (the batch
    ``pivot(values=...)`` contract). One shuffle on the group key;
    state is rows x categories scalars."""
    return stream.groupBy(*key_cols).agg(
        *pivot_aggs(pivot_col, categories, value_col)
    )
