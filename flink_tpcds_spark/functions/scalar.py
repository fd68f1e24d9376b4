"""Scalar-function gap layer.

SURVEY.md §2.9: >95% of FlinkSqlOperatorTable (reference:
flink-table-planner-blink/.../functions/sql/FlinkSqlOperatorTable.java)
maps 1:1 onto pyspark.sql.functions. This module covers the remainder
as JVM-side column compositions (NOT Python UDFs — they stay inside
whole-stage codegen) and registers SQL-callable versions via Spark 4
SQL UDFs so ``spark.sql`` text can use the Blink names too.

Gap list (SURVEY §2.9): SPLIT_INDEX, KEYVALUE, IS_ALPHA, IS_DIGIT,
IS_DECIMAL, HASH_CODE, and the Blink named bit ops BITAND/BITOR/
BITXOR/BITNOT (Spark exposes them only as operators). PRINT (a
side-effecting debug function) and the PROCTIME/ROWTIME window
auxiliaries are N/A by design: Spark has no processing-time attribute
— event-time watermarks cover the semantics (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def split_index(col: Column, delim: str, idx: int) -> Column:
    """Blink SPLIT_INDEX(str, delim, i): i-th field (0-based), NULL if out of range."""
    arr = F.split(col, F.lit(delim), -1)
    return F.when(F.size(arr) > idx, arr.getItem(idx))


def keyvalue(col: Column, pair_delim: str, kv_delim: str, key: str) -> Column:
    """Blink KEYVALUE(str, pairDelim, kvDelim, key): value for key in 'k1=v1;k2=v2'."""
    return F.str_to_map(col, F.lit(pair_delim), F.lit(kv_delim)).getItem(key)


def is_digit(col: Column) -> Column:
    """Blink IS_DIGIT: true iff all chars are digits (non-empty)."""
    return col.rlike("^[0-9]+$")


def is_alpha(col: Column) -> Column:
    """Blink IS_ALPHA: true iff all chars are letters (non-empty)."""
    return col.rlike("^[A-Za-z]+$")


def is_decimal(col: Column) -> Column:
    """Blink IS_DECIMAL: true iff parseable as a decimal number."""
    return col.rlike(r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$")


def hash_code(col: Column) -> Column:
    """Blink HASH_CODE: deterministic 32-bit hash of a string (Murmur3)."""
    return F.hash(col)


def bitand(a: Column, b: Column) -> Column:
    """Blink BITAND(a, b) — named form of the & operator."""
    return a.bitwiseAND(b)


def bitor(a: Column, b: Column) -> Column:
    """Blink BITOR(a, b) — named form of the | operator."""
    return a.bitwiseOR(b)


def bitxor(a: Column, b: Column) -> Column:
    """Blink BITXOR(a, b) — named form of the ^ operator."""
    return a.bitwiseXOR(b)


def bitnot(a: Column) -> Column:
    """Blink BITNOT(a) — two's-complement negation, ~a = -a - 1."""
    return -a - F.lit(1)


# SQL-callable registrations (Spark 4 SQL UDFs: stay JVM-side, no Python
# round trip — equivalent to the reference's codegen'd scalar calls).
_SQL_UDFS = [
    """CREATE OR REPLACE TEMPORARY FUNCTION split_index(s STRING, d STRING, i INT)
       RETURNS STRING
       RETURN CASE WHEN size(split(s, d, -1)) > i THEN split(s, d, -1)[i] END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION keyvalue(s STRING, pd STRING, kd STRING, k STRING)
       RETURNS STRING
       RETURN str_to_map(s, pd, kd)[k]""",
    """CREATE OR REPLACE TEMPORARY FUNCTION is_digit(s STRING)
       RETURNS BOOLEAN RETURN s RLIKE '^[0-9]+$'""",
    """CREATE OR REPLACE TEMPORARY FUNCTION is_alpha(s STRING)
       RETURNS BOOLEAN RETURN s RLIKE '^[A-Za-z]+$'""",
    """CREATE OR REPLACE TEMPORARY FUNCTION is_decimal(s STRING)
       RETURNS BOOLEAN RETURN s RLIKE '^[+-]?([0-9]+(\\\\.[0-9]*)?|\\\\.[0-9]+)$'""",
    """CREATE OR REPLACE TEMPORARY FUNCTION hash_code(s STRING)
       RETURNS INT RETURN hash(s)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bitand(a BIGINT, b BIGINT)
       RETURNS BIGINT RETURN a & b""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bitor(a BIGINT, b BIGINT)
       RETURNS BIGINT RETURN a | b""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bitxor(a BIGINT, b BIGINT)
       RETURNS BIGINT RETURN a ^ b""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bitnot(a BIGINT)
       RETURNS BIGINT RETURN -a - 1""",
]


def register_scalar_functions(spark: SparkSession) -> None:
    """Register the gap functions for SQL use on this session."""
    for ddl in _SQL_UDFS:
        spark.sql(ddl)
