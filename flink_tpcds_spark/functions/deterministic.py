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


def _scaled_long(col: Column, scale: int) -> Column:
    """Per-row HALF_UP rounding of ``col`` at ``scale`` decimal digits,
    emitted as the scaled BIGINT — bit-equivalent to
    ``CAST(col AS DECIMAL(18,scale))``'s unscaled value, but pure
    double+long codegen arithmetic (no per-row Decimal allocation).

    Equivalence argument (why this is the same rounding):
    - ``sign(x) * FLOOR(ABS(x)*10^s + 0.5)`` is HALF_UP at every input,
      including negative exact ties (HALF_UP = away from zero), which a
      bare ``FLOOR(x*10^s + 0.5)`` would get wrong.
    - The double product ``ABS(x)*10^s`` is only trusted while
      ``ABS(x) <= 10^(14-s)``: there the product is < 1e14, where one
      double ulp is 0.015625, so the combined representation+multiply+
      add rounding error stays far below the 0.5 that would flip the
      FLOOR. Values beyond the bound raise (ANSI-style fail-loud, same
      posture as the decimal cast's own overflow error at 1e(18-s)) —
      no silent wrong answers. No declared query's per-row aggregate
      input comes within two decades of the bound (prices/rates/
      revenues ≤ ~1e6).
    - NULL rows stay NULL (first WHEN passes them through), so SUM
      skips them exactly as it skips NULL decimals.
    """
    bound = float(10 ** (14 - scale))
    scaled = F.floor(F.abs(col) * F.lit(float(10**scale)) + F.lit(0.5)) * F.signum(col)
    return (
        F.when(F.abs(col) <= F.lit(bound), scaled.cast("bigint"))
        .when(
            col.isNotNull(),
            F.raise_error(
                F.lit(
                    f"dsum fast path out of range (|x| > 1e{14 - scale}); "
                    "use the decimal bridge for this column"
                )
            ).cast("bigint"),
        )
    )


def dsum(col: Column, scale: int = DEFAULT_SCALE) -> Column:
    """Deterministic SUM over a double column, emitted as double.

    Semantics are unchanged from the decimal bridge (the oracle SQL
    keeps the ``SUM(CAST(x AS DECIMAL))`` form): each row is rounded
    HALF_UP at ``scale`` digits, the rounded values are summed exactly,
    and the exact total is converted to double once. The implementation
    is the scaled-long fast path (see :func:`_scaled_long`): long
    accumulation is codegen-native, measured 7× faster than the decimal
    accumulator on the full-scan h01 aggregate (3.70 s → 0.53 s at
    sf0.1), bit-identical output. The final division runs in DECIMAL so
    the exact rational total/10^s is converted to double in a single
    correctly-rounded step — same one-rounding as DECIMAL(28,s)→DOUBLE.

    Capacity: the long accumulator holds Σ|x| up to ~9.2e(18-s); past
    that ANSI mode raises loudly (the decimal bridge's own input cast
    caps single values at 1e(18-s) likewise). At cluster scales beyond
    that, lower ``scale`` or revert the affected aggregate to the
    decimal accumulator.
    """
    total = F.sum(_scaled_long(col, scale))
    return (
        total.cast("decimal(28,0)")
        / F.lit(10**scale).cast(f"decimal({scale + 1},0)")
    ).cast("double")


def davg(col: Column, scale: int = DEFAULT_SCALE) -> Column:
    """Deterministic AVG: exact decimal sum / count, divided as doubles."""
    return dsum(col, scale) / F.count(col)


def dsum_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """The DuckDB-oracle rendering of :func:`dsum` (same semantics)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """The DuckDB-oracle rendering of :func:`davg`."""
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"
