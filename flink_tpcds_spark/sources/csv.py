"""CSV source/sink with the reference's benchmark-loading semantics.

The reference's fork-added ``CsvTableSource2``
(flink-table-api-java-bridge/.../sources/CsvTableSource2.java:46) is a
projectable CSV source used to load dsdgen output: ``|``-delimited,
``\\n`` lines, explicit schema, empty string → NULL
(TpcDsBatchExecITCase.scala:59-61). Spark's CSV reader provides every
one of those as options, including projection pushdown via the
vectorized reader — this module pins the conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_dsdgen_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    delimiter: str = "|",
    empty_as_null: bool = True,
) -> DataFrame:
    """dsdgen-convention CSV scan: explicit schema (never inferred —
    the reference registers fixed schemas, SURVEY §1.2), | delimiter,
    empty → NULL for all types."""
    reader = (
        spark.read.schema(schema)
        .option("sep", delimiter)
        .option("header", "false")
        .option("nullValue", "" if empty_as_null else None)
        .option("emptyValue", None if empty_as_null else "")
        .option("mode", "PERMISSIVE")
    )
    return reader.csv(path)


def write_csv(
    df: DataFrame, path: str, delimiter: str = "|", mode: str = "overwrite"
) -> None:
    """CsvTableSink analog (reference CsvTableSink.java)."""
    df.write.option("sep", delimiter).option("header", "false").mode(mode).csv(
        path
    )
