"""Engine facade tests: SQL entry, table handles, gap functions in SQL
text, plan explain."""

from __future__ import annotations

import pytest

from flink_tpcds_spark.engine import AnalyticsEngine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return AnalyticsEngine(spark=spark, sf_dir=sf_dir)


def test_sql_entry(engine):
    row = engine.sql(
        """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).first()
    assert row.l_returnflag == "A" and row.n > 0


def test_table_handle_composition(engine):
    from pyspark.sql import functions as F

    df = (
        engine.table("orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .count()
    )
    assert df.count() > 0


def test_undeclared_table_rejected(engine):
    with pytest.raises(KeyError):
        engine.table("not_a_table")


def test_gap_functions_usable_in_sql(engine):
    row = engine.sql(
        """
        SELECT split_index('a,b,c', ',', 1) AS s1,
               split_index('a,b,c', ',', 9) AS s9,
               keyvalue('k1=v1;k2=v2', ';', '=', 'k2') AS kv,
               is_digit('12345') AS d1, is_digit('12a') AS d2,
               is_alpha('abc') AS a1, is_decimal('-3.25') AS dec1,
               hash_code('x') AS hc
        """
    ).first()
    assert row.s1 == "b" and row.s9 is None
    assert row.kv == "v2"
    assert row.d1 is True and row.d2 is False
    assert row.a1 is True and row.dec1 is True
    assert isinstance(row.hc, int)


def test_explain_has_pushdown(engine):
    text = engine.explain(
        "SELECT l_orderkey FROM lineitem WHERE l_quantity < 5"
    )
    assert "PushedFilters" in text and "l_quantity" in text


def test_python_udtf_lateral(engine):
    """§2.11 UDTF: one row in, many out, via SQL table-function call."""
    from flink_tpcds_spark.operators.udtf import register_udtfs

    register_udtfs(engine.spark)
    rows = engine.sql(
        "SELECT word, pos, length FROM tokenize('alpha beta gamma')"
    ).collect()
    assert [(r.word, r.pos, r.length) for r in rows] == [
        ("alpha", 0, 5),
        ("beta", 1, 4),
        ("gamma", 2, 5),
    ]
    # lateral application over a table
    n = engine.sql(
        """
        SELECT d.doc_id, t.word
        FROM documents d, LATERAL tokenize(d.text) t
        WHERE d.doc_id < 5
        """
    ).count()
    assert n > 0


def test_analyze_tables_feeds_cbo(engine):
    engine.analyze_tables(["region", "nation"])
    # what CBO actually consumes: the optimized plan's row-count stats
    stats = (
        engine.table("region")._jdf.queryExecution().optimizedPlan().stats()
    )
    assert stats.rowCount().isDefined()
    assert stats.rowCount().get() == 5


def test_engine_sql_materialized(spark, sf_dir):
    from flink_tpcds_spark.engine import AnalyticsEngine

    eng = AnalyticsEngine(spark=spark, sf_dir=sf_dir)
    sql = """
    with t as (select o_custkey, count(*) c from orders group by o_custkey)
    select (select count(*) from t) n1, (select sum(c) from t) s1
    """
    got = eng.sql_materialized(sql).collect()
    eng.release_materialized()
    assert got == eng.sql(sql).collect()


def test_blink_bit_functions(spark):
    """Named Blink bit ops agree with Python integer semantics, both
    as Column helpers and as SQL-registered functions."""
    from pyspark.sql import functions as F

    from flink_tpcds_spark.functions.scalar import (
        bitand,
        bitnot,
        bitor,
        bitxor,
        register_scalar_functions,
    )

    df = spark.createDataFrame(
        [(12, 10), (-7, 3), (0, 0), (255, 129)], "a long, b long"
    )
    rows = df.select(
        "a", "b",
        bitand(F.col("a"), F.col("b")).alias("ba"),
        bitor(F.col("a"), F.col("b")).alias("bo"),
        bitxor(F.col("a"), F.col("b")).alias("bx"),
        bitnot(F.col("a")).alias("bn"),
    ).collect()
    for r in rows:
        assert r.ba == r.a & r.b
        assert r.bo == r.a | r.b
        assert r.bx == r.a ^ r.b
        assert r.bn == ~r.a
    register_scalar_functions(spark)
    df.createOrReplaceTempView("bits_t")
    got = spark.sql(
        "SELECT bitand(a,b), bitor(a,b), bitxor(a,b), bitnot(a) FROM bits_t"
    ).collect()
    for (r, g) in zip(rows, got):
        assert tuple(g) == (r.a & r.b, r.a | r.b, r.a ^ r.b, ~r.a)
