"""Python UDTF surface (reference TableFunction / BatchExecCorrelate —
SURVEY §2.2/§2.11). Spark 3.5+ has native Python UDTFs: a class whose
``eval`` yields zero-or-more rows per input row, used via LATERAL join
— the exact shape of the reference's ``TableFunction.collect()``.

For hot paths preferring JVM execution, ``explode``-based equivalents
exist (ops_explode_words); the UDTF is the extensibility surface for
logic built-ins can't express.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="word: string, pos: int, length: int")
class TokenizeUDTF:
    """Emit (word, position, length) per whitespace token — a table
    function: one row in, many rows out."""

    def eval(self, text: str):  # noqa: D102 — contract defined by Spark
        if text is None:
            return
        for pos, word in enumerate(text.split()):
            yield word, pos, len(word)


def register_udtfs(spark: SparkSession) -> None:
    """Make the UDTFs callable from SQL (LATERAL / table-function
    syntax), mirroring TableEnvironment.registerFunction."""
    spark.udtf.register("tokenize", TokenizeUDTF)
