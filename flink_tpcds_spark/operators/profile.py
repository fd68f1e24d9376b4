"""Single-pass table profiling: per-column null / distinct / min /
max statistics.

The data-quality summary every ingestion pipeline runs before (and
after) a load — the queryable cousin of ``ANALYZE TABLE`` (whose
catalog stats feed the CBO but aren't a result set). The reference
has no profiling operator; on a 100 TB corpus this is the first
query a data engineer runs against a new delivery.

Shape: ONE aggregation pass computes every column's statistics
simultaneously (Catalyst plans the multiple DISTINCT aggregates via
one Expand — a single scan of the data, never one scan per column),
then the 1-row result is unpivoted driver-free with ``stack`` into
the (column, stat...) long form. Min/max are compared on the values
CAST TO STRING (lexicographic) so one schema fits every column type;
both engines apply the same cast, keeping the oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all) of ``df`` in one pass.

    Returns one row per column: ``(col_name, n_rows, n_nulls,
    n_distinct, min_value, max_value)`` with min/max rendered as
    strings (lexicographic over the string cast — engine-stable).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n_rows")]
    for i, c in enumerate(cols):
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__nn_{i}"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"__nd_{i}"),
            F.min(s).alias(f"__mn_{i}"),
            F.max(s).alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}"
        for i, c in enumerate(cols)
    )
    return one.selectExpr(
        "__n_rows as n_rows",
        f"stack({len(cols)}, {stack_args}) as "
        "(col_name, n_nulls, n_distinct, min_value, max_value)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
