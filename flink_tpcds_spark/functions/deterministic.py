"""Order-insensitive (deterministic) floating-point aggregation.

Distributed SUM/AVG over doubles is not reproducible: IEEE addition is
non-associative, and the combine order depends on partitioning, AQE
decisions, and engine internals. The reference sidesteps this in its
result comparator by formatting to 4 decimal places
(TpcUtils.scala:51-64); we solve it at the *semantic* level instead:

    dsum(x)  ==  CAST(SUM(CAST(x AS DECIMAL(18, s))) AS DOUBLE)

Per-row double arithmetic is fully deterministic (same IEEE ops in any
engine); casting each row's value to a fixed-scale decimal makes the
subsequent SUM exact and associative, so ANY partitioning/combine order
— 32 local threads or 1000 executors — produces the identical decimal,
and the final cast back to double is a single deterministic conversion.

This is also how the engine stays honest against the DuckDB oracle: the
oracle SQL uses the same decimal bridge, so value hashes match bit-for-
bit instead of "close enough".

Cost at scale: decimal(18,s) sums stay in Spark's unscaled-long fast
path (precision ≤ 18 inputs), so hash aggregation remains codegen'd;
overhead vs raw double sum is small and the reproducibility is worth it
for benchmark-grade results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scale=6: the synthetic data's money/rate columns carry ≤2 decimal
# digits, so products of up to three of them are EXACT at 6 decimal
# digits — the decimal cast then never rounds, which matters because
# engines disagree on double→decimal tie-rounding (Spark HALF_UP,
# DuckDB HALF_EVEN) exactly when the true value sits on a tie.
DEFAULT_SCALE = 6


def dsum(col: Column, scale: int = DEFAULT_SCALE) -> Column:
    """Deterministic SUM over a double column, emitted as double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column, scale: int = DEFAULT_SCALE) -> Column:
    """Deterministic AVG: exact decimal sum / count, divided as doubles."""
    return dsum(col, scale) / F.count(col)


def dsum_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """The DuckDB-oracle rendering of :func:`dsum` (same semantics)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """The DuckDB-oracle rendering of :func:`davg`."""
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"
