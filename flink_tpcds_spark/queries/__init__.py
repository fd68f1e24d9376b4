"""Query corpus: each suite module exposes

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]``  (DuckDB-runnable ANSI SQL; may omit keys
  for non-SQL-expressible ops → driver records a rows-only check)

``all_queries()`` / ``all_oracles()`` merge the suites for the driver
contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import datapipe, events, operators, tpch

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (tpch, operators, events, datapipe):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {sorted(overlap)}")
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from . import datapipe, events, operators, tpch

    merged: dict[str, str] = {}
    for mod in (tpch, operators, events, datapipe):
        merged.update(mod.ORACLES)
    return merged
