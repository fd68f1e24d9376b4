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

# The TPC-DS corpus is parity-gated in tests/test_tpcds.py AND every
# registered oracle was certified offline with this exact comparison
# (scripts/gen_corpus_oracles.py), so re-running all 103 here would
# only double the suite's runtime. A small sample stays to prove the
# registered wiring (rotation, canonicalization, self-contained
# oracle text) end-to-end.
_CORPUS_SAMPLE = {"q3", "q7", "q23a", "q76", "q96"}
_PARITY = sorted(
    n for n in _QUERIES if not n.startswith("q") or n in _CORPUS_SAMPLE
)


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_driver_window_is_fully_oracled():
    """The first 50 entries (the driver's sweep window) must all be
    hash-checkable — zero rows-only entries in the window."""
    window = list(_QUERIES)[:50]
    assert len(window) == 50
    assert [n for n in window if n not in _ORACLES] == []


@pytest.mark.parametrize("name", _PARITY)
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
