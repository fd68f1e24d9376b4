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


def _modules():
    from . import datapipe, events, operators, tpcds_style, tpch

    # Order matters: the driver's correctness sweep covers the FIRST 50
    # entries of all_queries() (round 1 verified exactly 50). Round 1
    # already driver-greened the tpch/tpcds_style/operators families, so
    # the streaming-events + datapipe suites go first this round, then
    # the operator battery (its first entries include the round-2 fixes),
    # then the already-verified suites.
    return (events, datapipe, operators, tpch, tpcds_style)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {sorted(overlap)}")
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLES)
    return merged
