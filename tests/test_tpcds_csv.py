"""CSV-loaded corpus smoke: the reference benches its TPC-DS corpus
from dsdgen-convention CSV (fork-added CsvTableSource2.java:46,
loading conventions TpcDsBatchExecITCase.scala:59-61). This gate
round-trips the generated tables through ``sources/csv.py``'s
dsdgen conventions (|-delimited, explicit schema, empty→NULL) and
re-runs a cross-channel sample of corpus queries from the CSV
views, comparing canonical row multisets against the parquet-path
results — closing the loader-fidelity loop.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from flink_tpcds_spark.sources.csv import read_dsdgen_csv, write_csv
from flink_tpcds_spark.tpcds import datagen, runner
from flink_tpcds_spark.tpcds.schema import TPCDS_SCHEMAS

# Cheap queries spanning all three sales channels + returns + dims.
SAMPLE = ["q3", "q7", "q19", "q42", "q43", "q52", "q55", "q62", "q93", "q96"]


def _tables_used(names: list[str]) -> set[str]:
    used = set()
    for name in names:
        txt = runner.query_text(name, "spark").lower()
        used.update(t for t in TPCDS_SCHEMAS if t in txt)
    return used


@pytest.fixture(scope="module")
def csv_corpus(spark, tmp_path_factory):
    """Parquet-path rows for the sample, then the same views rebound
    to CSV round-tripped tables. Restores parquet views on teardown."""
    data_dir = datagen.generate()
    runner.register_spark_views(spark, data_dir)
    parquet_rows = {n: runner.run_spark(n, spark) for n in SAMPLE}

    csv_root = tmp_path_factory.mktemp("tpcds_csv")
    for t in sorted(_tables_used(SAMPLE)):
        pq = spark.read.parquet(f"{data_dir}/{t}.parquet")
        dest = str(csv_root / t)
        write_csv(pq, dest)
        ddl = ", ".join(f"{c} {ty}" for c, ty in TPCDS_SCHEMAS[t])
        read_dsdgen_csv(spark, dest, T.StructType.fromDDL(ddl)).createOrReplaceTempView(t)

    yield spark, parquet_rows
    runner.register_spark_views(spark, data_dir)  # restore for later tests


@pytest.mark.parametrize("name", SAMPLE)
def test_corpus_query_from_csv_matches_parquet_path(csv_corpus, name):
    spark, parquet_rows = csv_corpus
    csv_rows = runner.run_spark(name, spark)
    assert runner.canon_rows(csv_rows) == runner.canon_rows(parquet_rows[name])
