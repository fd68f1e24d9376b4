"""UDAF / UDTAGG surface (reference §2.11: AggregateFunction,
TableAggregateFunction; §2.4 GroupTableAggregate).

- ``emit_above_group_mean`` — a table aggregate (UDTAGG): one group in,
  MULTIPLE rows out (reference GroupTableAggFunction). Expressed as
  ``groupBy().applyInPandas`` — Arrow-batched, one Python call per
  group partition, the idiomatic Spark form.
- ``weighted_mean_udaf`` — a custom aggregate (UDAF) as a GROUPED_AGG
  pandas UDF (reference AggregateFunction with accumulator).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def emit_above_group_mean(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Emit the rows of each group whose value exceeds the group mean
    (multiple rows out per group = table-aggregate shape)."""
    schema = df.schema

    def above_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf[pdf[value_col] > pdf[value_col].mean()]

    return df.groupBy(*keys).applyInPandas(above_mean, schema)


def weighted_mean_udaf():
    """GROUPED_AGG pandas UDF: sum(v·w)/sum(w), rounded to 6 digits so
    results are comparison-stable across engines."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        return round(float((v * w).sum() / w.sum()), 6)

    return weighted_mean
