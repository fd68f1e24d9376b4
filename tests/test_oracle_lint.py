"""Oracle arithmetic linter: ban cross-engine-flaky decimal division.

Root cause class (CORRECTNESS_r09's only red, ``ops_lateral_alias``):
DuckDB evaluates DECIMAL / INTEGER in DOUBLE (``typeof(CAST(x AS
DECIMAL(15,2)) / 7)`` is DOUBLE, duckdb 1.x) and casts the binary
result to the target decimal, while Spark divides exactly in decimal
and HALF_UP-rounds. When the true quotient's decimal expansion does
NOT terminate (divisor has a prime factor other than 2 or 5), rows
whose rounding digit sits near a boundary flip between engines —
data- and environment-dependent flakiness that a local parity check
can pass while the driver reads a hash mismatch.

Rule enforced over every registered suite oracle (``all_oracles()``
minus the TPC-DS corpus entries):

    a ``/`` with a literal numeric divisor whose value is not of the
    form m / 10^k with m = 2^a * 5^b (i.e. the quotient may be
    non-terminating in decimal) is an error UNLESS the left operand
    is already a ``CAST(... AS DOUBLE)`` — double / literal is IEEE-
    exact-identical on both engines, so e.g. h17's
    ``CAST(SUM(..) AS DOUBLE) / 7.0`` is fine.

Corpus entries (q1..q99a/b) are exempt: their float/decimal output
columns are canonicalized to ``round(CAST(x AS DOUBLE), 4)`` on both
engines and every oracle is certified offline by
scripts/gen_corpus_oracles.py running the exact driver comparison
(see queries/corpus.py docstring).
"""

from __future__ import annotations

import re
from fractions import Fraction

import pytest

from flink_tpcds_spark.queries import all_oracles
from flink_tpcds_spark.queries.corpus import QUERIES as CORPUS_QUERIES

_DIV = re.compile(r"(?<![/*])/(?![/*=])\s*([0-9]+(?:\.[0-9]+)?)")


def _terminating(lit: str) -> bool:
    """True iff dividing by this literal keeps a terminating decimal
    expansion (denominator of the reduced reciprocal is 2^a * 5^b)."""
    d = Fraction(lit).limit_denominator(10**12)
    n = d.numerator  # divisor's numerator becomes the denominator of 1/d
    for p in (2, 5):
        while n % p == 0:
            n //= p
    return n == 1


def _left_operand(sql: str, slash_pos: int) -> str:
    """Text of the expression immediately left of the ``/``."""
    i = slash_pos - 1
    while i >= 0 and sql[i].isspace():
        i -= 1
    if i < 0:
        return ""
    end = i + 1
    if sql[i] == ")":
        depth = 0
        while i >= 0:
            if sql[i] == ")":
                depth += 1
            elif sql[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        # include a preceding function identifier (CAST, SUM, round…)
        j = i - 1
        while j >= 0 and (sql[j].isalnum() or sql[j] == "_"):
            j -= 1
        return sql[j + 1 : end]
    while i >= 0 and (sql[i].isalnum() or sql[i] in "._"):
        i -= 1
    return sql[i + 1 : end]


_DOUBLE_CAST = re.compile(r"AS\s+DOUBLE\s*\)\s*$", re.IGNORECASE)


def test_no_nonterminating_decimal_division_in_suite_oracles():
    corpus = set(CORPUS_QUERIES)
    offenders: list[str] = []
    for name, sql in sorted(all_oracles().items()):
        if name in corpus:
            continue  # canonicalized + offline-certified (module docstring)
        for m in _DIV.finditer(sql):
            if _terminating(m.group(1)):
                continue
            left = _left_operand(sql, m.start())
            if _DOUBLE_CAST.search(left):
                continue  # IEEE double path — identical on both engines
            offenders.append(
                f"{name}: '... {left} / {m.group(1)}' — non-terminating "
                "decimal division outside a CAST(... AS DOUBLE) context"
            )
    assert not offenders, (
        "cross-engine-flaky division (see module docstring; use a "
        "terminating divisor like /8, or cast the dividend to DOUBLE):\n"
        + "\n".join(offenders)
    )


@pytest.mark.parametrize(
    ("lit", "ok"),
    [
        ("2", True),
        ("8", True),
        ("50", True),
        ("100.0", True),
        ("256.0", True),
        ("0.125", True),
        ("281474976710656.0", True),  # 2^48
        ("7", False),
        ("7.0", False),
        ("3", False),
        ("12", False),  # 2^2 * 3
        ("0.3", False),  # 3/10 → reciprocal 10/3, non-terminating
    ],
)
def test_terminating_classifier(lit: str, ok: bool):
    assert _terminating(lit) is ok


def test_left_operand_extraction():
    sql = "SELECT CAST(SUM(x) AS DOUBLE) / 7.0 AS a FROM t"
    pos = sql.index("/")
    assert _DOUBLE_CAST.search(_left_operand(sql, pos))
    sql2 = "SELECT o_totalprice / 7 FROM t"
    assert _left_operand(sql2, sql2.index("/")) == "o_totalprice"


# ---------------------------------------------------------------------------
# Output-type rule (round 11, VERDICT r10): a suite entry's FINAL
# Spark schema may not contain DecimalType / ArrayType / MapType /
# StructType. The driver canonicalizes both engines' results through
# pandas: DuckDB's fetch_df coerces DECIMAL to float64 while Spark
# keeps decimal.Decimal (renders diverge → hash mismatch at matching
# rows/schema — the exact r10 signature of ops_lateral_alias /
# ops_mv_rewrite / ops_mv_incremental), and container cells crash
# pandas' factorize ("unhashable type: 'list'" — dp_bpe_tokens).
# Bridge in the final select on BOTH engines: CAST(x AS DOUBLE) for
# decimals (exact while the value terminates within 2^53) and
# array_join / array_to_string for arrays. The rule itself is
# enforced over every built suite DataFrame by
# tests/test_oracle_parity.py::test_query_matches_oracle (which
# already constructs each entry) and by oracle.compare's "driver"
# fetch mode; the tests below pin the helper + the certification
# mode's teeth.
# ---------------------------------------------------------------------------


def test_banned_final_types_helper():
    from pyspark.sql import types as T

    from flink_tpcds_spark.oracle import banned_final_types

    bad = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("d", T.DecimalType(18, 6)),
            T.StructField("a", T.ArrayType(T.StringType())),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
            T.StructField(
                "s",
                T.StructType([T.StructField("x", T.LongType())]),
            ),
        ]
    )
    flagged = banned_final_types(bad)
    assert [f.split(":")[0] for f in flagged] == ["d", "a", "m", "s"]

    good = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("n", T.LongType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("dt", T.DateType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    assert banned_final_types(good) == []


def test_decimal_canary_fails_driver_mode(spark, oracle_con):
    """A deliberately DECIMAL-typed entry must FAIL the driver-faithful
    certification even when its VALUES are bit-identical cross-engine —
    the r10 blind spot made unrepresentable (VERDICT r10 item 3)."""
    from flink_tpcds_spark.oracle import compare

    sql = "SELECT CAST(1234.5 AS DECIMAL(18,6)) AS v"
    df = spark.sql(sql)
    ok_modes = {
        m: compare("canary", df, oracle_con, sql, fetch=m).ok
        for m in ("native", "pandas", "driver")
    }
    # values identical → the lenient modes pass (that WAS the blind
    # spot); the driver mode alone must refuse the schema.
    assert ok_modes["native"] and ok_modes["pandas"]
    assert not ok_modes["driver"]
    res = compare("canary", df, oracle_con, sql, fetch="driver")
    assert "driver-canon-unsafe" in res.detail


def test_driver_render_distinguishes_decimal_from_float():
    from decimal import Decimal

    from flink_tpcds_spark.oracle import _render, _render_driver

    # the lenient renderer normalizes them equal (the blind spot) …
    assert _render(Decimal("123.456000")) == _render(123.456)
    # … the driver-faithful one never does.
    assert _render_driver(Decimal("123.456000")) != _render_driver(123.456)
    with pytest.raises(TypeError):
        _render_driver(["a", "b"])
