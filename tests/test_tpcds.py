"""The full 103-query TPC-DS corpus, Spark vs DuckDB exact parity.

Mirrors the reference's TpcDsBatchExecITCase.scala gate (reference:
flink-table-planner-blink/src/test/scala/org/apache/flink/table/tpc/
TpcDsBatchExecITCase.scala:104-135): every query file under
``flink_tpcds_spark/tpcds/queries/`` runs on Spark SQL and on DuckDB
over the same generated parquet; rows compare as sorted multisets with
the reference's 4-decimal numeric posture (TpcUtils.scala). The eight
queries the reference marks ``isUncertain`` compare on row count only.

Data is generated deterministically on first use (cached under
``tests/data/tpcds/`` by a marker file) — see tpcds/datagen.py.
"""

from __future__ import annotations

import pytest

from flink_tpcds_spark.tpcds import datagen, runner


@pytest.fixture(scope="session")
def tpcds_env(spark):
    data_dir = datagen.generate()
    runner.register_spark_views(spark, data_dir)
    con = runner.duckdb_conn(data_dir)
    yield spark, con
    con.close()


@pytest.mark.parametrize("name", runner.query_names())
def test_tpcds_query(tpcds_env, name):
    spark, con = tpcds_env
    res = runner.run_one(name, spark, con)
    assert res.ok, f"{name}: {res.detail} (rows {res.spark_rows}/{res.duck_rows})"
