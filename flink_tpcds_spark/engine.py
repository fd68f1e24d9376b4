"""User-facing engine facade — the reference's ``TableEnvironment``
(TableEnvironmentImpl.java:300 ``sqlQuery`` / ``from``/``insertInto``)
re-expressed over a SparkSession.

A user of the reference drives everything through tEnv:
``tEnv.sqlQuery("...")``, ``tEnv.from("t").select(...)``,
``tEnv.registerFunction``. The Spark-native equivalents are
``spark.sql``, ``spark.table`` and SQL UDF registration; this facade
binds them to the engine's schema registry, scalar-function gap layer
and optimizer posture so one object is the whole API surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .functions.scalar import register_scalar_functions
from .schemas import ALL_TABLES, register_tables
from .session import get_spark


class AnalyticsEngine:
    """One-stop engine: tables registered, gap functions available,
    tuned session — ``engine.sql(...)`` is ``tEnv.sqlQuery(...)``.

    >>> eng = AnalyticsEngine(sf_dir="/root/testdata/sf0.001")
    >>> eng.sql("SELECT count(*) AS n FROM lineitem").collect()
    """

    def __init__(
        self, spark: SparkSession | None = None, sf_dir: str | None = None
    ) -> None:
        self.spark = spark or get_spark()
        register_scalar_functions(self.spark)
        self.tables: dict[str, DataFrame] = {}
        self._cte_cleanups: list = []
        if sf_dir:
            self.register(sf_dir)

    def register(self, sf_dir: str, names: list[str] | None = None) -> None:
        """Register the declared tables from a data directory as temp
        views (reference: TpcDsSchemaProvider registration loop)."""
        self.tables = register_tables(self.spark, sf_dir, names)

    def sql(self, query: str) -> DataFrame:
        """``tEnv.sqlQuery`` — parse/validate/plan via Catalyst."""
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        """``tEnv.from`` — a Table handle to start DataFrame-style
        composition (the reference's Table API entry, SURVEY §3)."""
        if name not in ALL_TABLES:
            raise KeyError(f"undeclared table {name!r}")
        return self.spark.table(name)

    def analyze_tables(self, names: list[str] | None = None) -> None:
        """Compute CBO statistics (ANALYZE TABLE ... FOR ALL COLUMNS)
        so join reorder has cardinalities — the reference enables join
        reorder in its benchmark posture (TpcDsBatchExecITCase:71-72);
        Spark's CBO needs stats to act on it.

        This is the "analyze once per data load" hook: run it after
        :meth:`register` on a fresh load, not per query. For the
        TPC-DS corpus the catalog-table variant
        (``tpcds.runner.register_catalog_tables``) is preferred — it
        avoids the temp-view CACHE requirement entirely."""
        for name in names or list(self.tables):
            # temp views must be cached before ANALYZE FOR COLUMNS
            # (UNSUPPORTED_FEATURE.ANALYZE_UNCACHED_TEMP_VIEW); on a
            # cluster deployment the tables would live in the catalog
            # (saveAsTable / external location) and skip the cache.
            self.spark.sql(f"CACHE TABLE {name}")
            self.spark.sql(
                f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS"
            )

    def sql_materialized(self, query: str) -> DataFrame:
        """``sql()`` with multi-referenced WITH bodies computed once —
        the reference's SubplanReuser (PlannerBase.scala:236), which
        Catalyst's inline-and-prune model lacks; see plans/cte.py.
        Call :meth:`release_materialized` after consuming results."""
        from .plans.cte import run_with_materialized_ctes

        df, cleanup = run_with_materialized_ctes(self.spark, query)
        self._cte_cleanups.append(cleanup)
        return df

    def release_materialized(self) -> None:
        """Unpersist CTE caches created by :meth:`sql_materialized`."""
        while self._cte_cleanups:
            self._cte_cleanups.pop()()

    def explain(self, query: str) -> str:
        """Formatted physical plan for a SQL query (plan checks live
        in plans/checks.py)."""
        from .plans import explain_text

        return explain_text(self.sql(query))
