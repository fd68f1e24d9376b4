"""Hive-metastore catalog support (the §2.1 Hive-connector row).

The reference reads Hive-cataloged tables through its catalog/
``TableFactory`` machinery (e.g. the connectors registered for its
TPC-DS runs); Spark's counterpart is the built-in
``HiveExternalCatalog``: set ``spark.sql.catalogImplementation=hive``
and every ``saveAsTable`` / ``CREATE TABLE`` / ``ANALYZE`` lands in a
real Hive metastore (embedded Derby here — the jars ship with
PySpark; no service needed).

``catalogImplementation`` is a *static* conf: it must be chosen
before the first ``SparkSession`` of the JVM, so the engine's normal
sessions can't switch to it mid-app. ``hive_session`` therefore
builds the hive-enabled session for fresh processes (tests drive it
in a subprocess; see tests/test_hive_metastore.py, which proves the
metastore SURVIVES a full SparkContext teardown: tables, partitions
and ANALYZE statistics re-resolve from Derby in a brand-new context).

What this buys at 100 TB: the metastore is where partition pruning
and CBO statistics live across jobs — a 1000-executor cluster
planning q72 against cataloged tables gets the same join order we
gate in bench_sf1.py without re-ANALYZE-ing per session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def hive_session(workdir: str, app_name: str = "hive-catalog") -> SparkSession:
    """A hive-catalog SparkSession with its Derby metastore and
    warehouse rooted under ``workdir`` (single-writer: embedded Derby
    allows one live connection — the same single-session ownership
    contract as the bucketed-posture warehouse).

    Raises if a SparkContext already exists with a non-hive catalog —
    the static conf would be silently ignored, which is exactly the
    failure mode worth failing loudly on.
    """
    from pyspark import SparkContext

    active = SparkContext._active_spark_context
    if active is not None:
        current = SparkSession.getActiveSession() or SparkSession(active)
        impl = current.conf.get("spark.sql.catalogImplementation", "in-memory")
        if impl != "hive":
            raise RuntimeError(
                "hive_session needs a fresh JVM: a SparkContext with "
                f"catalogImplementation={impl!r} is already running and "
                "the static conf cannot be changed. Run in a new process."
            )
    os.makedirs(workdir, exist_ok=True)
    db = os.path.join(workdir, "metastore_db")
    return (
        SparkSession.builder.master(
            os.environ.get("SPARK_GRAFT_HIVE_MASTER", "local[4]")
        )
        .appName(app_name)
        .config("spark.sql.catalogImplementation", "hive")
        .config("spark.sql.warehouse.dir", os.path.join(workdir, "warehouse"))
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={db};create=true",
        )
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )


def table_stats(spark: SparkSession, table: str) -> dict[str, int | None]:
    """(rowCount, sizeInBytes) as recorded in the catalog — None when
    the metastore holds no ANALYZE results for ``table``."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    stats = next(
        (r.data_type for r in rows if r.col_name == "Statistics"), None
    )
    out: dict[str, int | None] = {"row_count": None, "size_bytes": None}
    if stats:
        for part in stats.split(","):
            part = part.strip()
            if part.endswith("rows"):
                out["row_count"] = int(part.split()[0])
            elif part.endswith("bytes"):
                out["size_bytes"] = int(part.split()[0])
    return out


def partition_names(spark: SparkSession, table: str) -> list[str]:
    """Metastore-registered partitions of ``table``."""
    return [r.partition for r in spark.sql(f"SHOW PARTITIONS {table}").collect()]
