"""Explicit schema registry + table loading.

The reference registers tables with explicit name/type arrays (trait
``TpcDsSchema`` in TpcDsSchemaProvider.scala:36-48 — no runtime schema
inference). We do the same: every table the engine operates on has a
declared StructType, and loaders validate the on-disk parquet against
it (names + a compatible type) instead of silently inferring.

Two table families:

- TPCH_TABLES  — the driver's TPC-H-ish star schema (TESTDATA.md),
  which is a column-subset of the reference's TpcHSchemaProvider
  schemas (FIXTURES.md §1).
- AUX_TABLES   — events (stream table), documents + embeddings
  (LLM-data-pipeline tables).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Declared schemas (driver testdata layout — TESTDATA.md / FIXTURES.md)
# ---------------------------------------------------------------------------

TPCH_TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
}

AUX_TABLES: dict[str, T.StructType] = {
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

ALL_TABLES: dict[str, T.StructType] = {**TPCH_TABLES, **AUX_TABLES}

# Small dimensions that are always broadcast-join candidates at any fact
# scale (the reference's broadcast-threshold decision, made static).
BROADCASTABLE_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


# Posture redirects: table name → catalog table that serves it
# instead of the parquet path (installed by
# sources.bucketing.install_bucketed_posture — the warehouse stance
# where fact tables are bucketed on their join keys so fact⋈fact
# joins read shuffle-free). Process-wide by design: a posture is a
# session-level storage decision, not a per-query one. Callers that
# install a redirect own scoping it (try/finally around the block).
_TABLE_REDIRECTS: dict[str, str] = {}


def set_table_redirect(name: str, catalog_table: str) -> None:
    _TABLE_REDIRECTS[name] = catalog_table


def clear_table_redirects() -> None:
    _TABLE_REDIRECTS.clear()


# On-disk schema memo: path -> ((mtime_ns, size), inferred StructType).
# Schema inference re-reads the parquet footer on EVERY spark.read.parquet
# call (~260 ms/call measured at the bench posture — a query touching 5
# tables pays >1 s of driver-side footer reads per construction). The
# footer is metadata, not data: caching it keyed on (mtime, size) changes
# nothing about what the query computes and invalidates on any rewrite.
_SCHEMA_CACHE: dict[str, tuple[tuple[int, int], T.StructType]] = {}


def _read_with_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    try:
        st = os.stat(path)
        key = (st.st_mtime_ns, st.st_size)
    except OSError:
        # missing path: let spark.read raise its own (clearer) error
        return spark.read.parquet(path)
    hit = _SCHEMA_CACHE.get(path)
    if hit is not None and hit[0] == key:
        return spark.read.schema(hit[1]).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[path] = (key, df.schema)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one declared table from ``{sf_dir}/{name}.parquet``
    (or its redirect target — see ``set_table_redirect``).

    The read path keeps Spark's vectorized parquet reader + pushdown:
    we do NOT apply the declared schema with a projection/cast wrapper
    unless it differs, so ``PushedFilters``/``ReadSchema`` reach the scan.
    """
    if name not in ALL_TABLES:
        raise KeyError(f"undeclared table {name!r}; declared: {sorted(ALL_TABLES)}")
    if name in _TABLE_REDIRECTS:
        t = spark.table(_TABLE_REDIRECTS[name])
        # fresh expression ids per load: the catalog relation cache
        # hands every spark.table() call the SAME attribute ids, so a
        # query loading the table twice (h18/h21 self-joins) trips the
        # ambiguous-self-join check that path reads never hit. A
        # rename-to-itself Project mints new ids; ProjectExec is
        # alias-aware, so bucketing-derived output partitioning
        # survives and bucketed joins stay exchange-free.
        return t.select([F.col(c).alias(c) for c in t.columns])
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # The driver's events.ts parquet type has varied across
        # rounds: TIMESTAMP(NANOS) (which Spark 4 rejects outright,
        # PARQUET_TYPE_ILLEGAL) and plain timestamp[us] with
        # isAdjustedToUTC=false (which Spark 4 reads as
        # TIMESTAMP_NTZ). Normalize both to session-tz TimestampType
        # (tz pinned UTC in session.py, so the wall clock — and
        # DuckDB oracle parity — is unchanged):
        # - nanos: read as long (legacy conf), truncate to micros
        #   with *integer* division (ns values exceed 2^53; float
        #   division would lose precision), matching DuckDB's ns→µs;
        # - micros NTZ: a plain cast.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_with_cached_schema(spark, path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return _read_with_cached_schema(spark, path)


def register_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view. Returns the dict."""
    out: dict[str, DataFrame] = {}
    for name in names or list(ALL_TABLES):
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
