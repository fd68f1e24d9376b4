#!/usr/bin/env python
"""r13: interleaved A/B of the r12 h18 form (2 lineitem scans, semi
join, 5-col regroup) vs the r13 single-aggregation form. One warm
session, alternating arms, min-of-N."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")

from pyspark.sql import functions as F  # noqa: E402

from flink_tpcds_spark.functions.deterministic import dsum  # noqa: E402
from flink_tpcds_spark.queries import all_queries  # noqa: E402
from flink_tpcds_spark.schemas import load_table  # noqa: E402
from flink_tpcds_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def h18_old(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    l2 = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        l2.groupBy(l2.l_orderkey.alias("bo_key"))
        .agg(F.sum(l2.l_quantity.cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 250)
        .select("bo_key")
    )
    return (
        o.join(big_orders, o.o_orderkey == F.col("bo_key"), "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(l.l_quantity).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def main() -> None:
    spark = get_spark("probe-h18-ab")
    qs = all_queries()
    new = lambda: qs["h18_large_volume_customer"](spark, SF_DIR).collect()  # noqa: E731
    old = lambda: h18_old(spark, SF_DIR).collect()  # noqa: E731
    for _ in range(2):
        old()
        new()
    best = {"old": float("inf"), "new": float("inf")}
    for _ in range(6):
        for name, fn in (("old", old), ("new", new)):
            t0 = time.time()
            fn()
            best[name] = min(best[name], time.time() - t0)
    print({k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
