"""Randomized differential testing: Spark vs DuckDB on generated SQL.

The reference's correctness net is fixed golden outputs (SURVEY §5 —
"No randomized/property-based testing"). This goes beyond it:
hypothesis generates predicates over a dialect-neutral SQL template
(decimal-bridged SUM, so float aggregation is bit-deterministic in
both engines — the repo's decimal-bridge rule), and the exact same
query text must hash-match between Spark and DuckDB.

The grammar deliberately stays inside the common dialect (int
compares, modulo, string equality, timestamp literals) — the
dialect-divergent constructs (division, casts, NULL ordering) are
covered by the curated oracle suite instead.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_tpcds_spark.oracle import value_hash
from flink_tpcds_spark.schemas import load_table

_ATOMS = [
    lambda draw: f"l_quantity < {draw(st.integers(1, 50))}",
    lambda draw: (
        f"l_orderkey % {draw(st.sampled_from([2, 3, 5, 7]))}"
        f" = {draw(st.integers(0, 1))}"
    ),
    lambda draw: f"l_returnflag = '{draw(st.sampled_from('ANR'))}'",
    lambda draw: f"l_linestatus = '{draw(st.sampled_from('FO'))}'",
    lambda draw: f"l_extendedprice > {draw(st.integers(100, 90000))}",
    lambda draw: (
        "l_shipdate < TIMESTAMP '"
        f"199{draw(st.integers(5, 8))}-"
        f"{draw(st.integers(1, 12)):02d}-15 00:00:00'"
    ),
]


@st.composite
def predicates(draw):
    n = draw(st.integers(1, 3))
    parts = []
    for _ in range(n):
        atom = draw(st.sampled_from(_ATOMS))(draw)
        if draw(st.booleans()):
            atom = f"NOT ({atom})"
        parts.append(atom)
    ops = [draw(st.sampled_from([" AND ", " OR "])) for _ in range(n - 1)]
    out = parts[0]
    for op, p in zip(ops, parts[1:]):
        out = f"({out}{op}{p})"
    return out


def _sql(pred: str) -> str:
    return f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s_qty,
           MIN(l_extendedprice) AS mn_price, MAX(l_orderkey) AS mx_ok
    FROM lineitem
    WHERE {pred}
    GROUP BY l_returnflag, l_linestatus
    """


@pytest.fixture(scope="module")
def lineitem_view(spark, sf_dir):
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicates())
def test_random_aggregates_match_duckdb(lineitem_view, oracle_con, pred):
    sql = _sql(pred)
    s = lineitem_view.sql(sql)
    s_rows = [tuple(r) for r in s.collect()]
    r = oracle_con.execute(sql)
    o_cols = [d[0] for d in r.description]
    o_rows = r.fetchall()
    assert value_hash(s.columns, s_rows) == value_hash(o_cols, o_rows), (
        f"divergence on: {pred!r}"
    )
