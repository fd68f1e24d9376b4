"""Catalog-table surface: partition pruning + catalog statistics for
the ``ops_catalog_table`` entry (the session-catalog half of the Hive
connector story; the Derby metastore half is test_hive_metastore)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tpcds_spark.queries.operators import ops_catalog_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_catalog_table_partition_prunes(spark, sf_dir):
    # building the entry registers the table and its stats
    ops_catalog_table(spark, sf_dir)
    tbl = next(
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("ops_catalog_orders_")
    )
    pruned = spark.table(tbl).filter(F.col("o_orderstatus") == "F")
    plan = _plan(pruned)
    assert "PartitionFilters:" in plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "o_orderstatus" in pf
    # catalog stats recorded by ANALYZE
    stats = (
        spark.table(tbl)._jdf.queryExecution().optimizedPlan().stats()
    )
    assert stats.rowCount().isDefined()
    n = spark.table(tbl).count()
    assert stats.rowCount().get() == n


def test_catalog_table_matches_direct_scan(spark, sf_dir):
    import os

    got = {
        (r.o_orderpriority, r.cnt)
        for r in ops_catalog_table(spark, sf_dir).collect()
    }
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    want = {
        (r.o_orderpriority, r.cnt)
        for r in o.filter("o_orderstatus = 'F'")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .collect()
    }
    assert got == want
