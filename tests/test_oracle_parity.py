"""Mirror of the driver's correctness gate: every queries() entry with
an oracle must hash-match DuckDB on the same parquet tables.

This is the translation of the reference's golden-file comparison
(TpcDsBatchExecITCase / BatchTestBase.compareResult) — the oracle
replaces checked-in golden results.
"""

from __future__ import annotations

import pytest

from flink_tpcds_spark.oracle import compare
from flink_tpcds_spark.queries import all_oracles, all_queries

_QUERIES = all_queries()
_ORACLES = all_oracles()


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, oracle_con, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    if name not in _ORACLES:
        # rows-only check (non-SQL-expressible op) — must at least run.
        assert df.count() >= 0
        return
    res = compare(name, df, oracle_con, _ORACLES[name])
    assert res.ok, (
        f"{name}: rows {res.spark_rows}/{res.oracle_rows}, "
        f"cols_match={res.columns_match}, hash_match={res.hash_match}, "
        f"{res.detail}"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
