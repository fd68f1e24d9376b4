#!/usr/bin/env python
"""Attribute h01's ~2 s: scan floor vs decimal-agg cost vs alternatives.

Variants (noop sink, guide §1.4, min-of-3 after warm):
  scan7      — bare 7-column scan of lineitem (the single-row-group floor)
  h01        — query as declared (decimal-bridge sums)
  h01_long   — scaled-long sums: SUM(CAST(ROUND(x*1e6) AS BIGINT))/1e6
  h01_repart — repartition(32) between scan and agg (parallel agg)
  h01_double — raw double sums (NOT hash-stable; floor reference only)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")

from pyspark.sql import functions as F  # noqa: E402

from flink_tpcds_spark.queries import all_queries  # noqa: E402
from flink_tpcds_spark.schemas import load_table  # noqa: E402
from flink_tpcds_spark.session import get_spark  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def lsum(col, scale=6):
    return (F.sum(F.round(col * (10**scale)).cast("bigint")) / (10**scale)).cast(
        "double"
    )


def lavg(col, scale=6):
    return lsum(col, scale) / F.count(col)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-h01")
    qs = all_queries()
    l = load_table(spark, sf_dir, "lineitem")
    rev = l.l_extendedprice * (1 - l.l_discount)

    def agg_with(s, a):
        return (
            l.filter(l.l_shipdate <= F.lit("2000-12-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                s(l.l_quantity).alias("sum_qty"),
                s(l.l_extendedprice).alias("sum_base_price"),
                s(rev).alias("sum_disc_price"),
                s(rev * (1 + l.l_tax)).alias("sum_charge"),
                a(l.l_quantity).alias("avg_qty"),
                a(l.l_extendedprice).alias("avg_price"),
                a(l.l_discount).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    from flink_tpcds_spark.functions.deterministic import davg, dsum

    variants = {
        "scan7": l.select(
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ),
        "h01": qs["h01_pricing_summary"](spark, sf_dir),
        "h01_long": agg_with(lsum, lavg),
        "h01_repart": None,  # built below
        "h01_double": agg_with(
            lambda c: F.sum(c), lambda c: F.avg(c)
        ),
    }
    rep = (
        l.filter(l.l_shipdate <= F.lit("2000-12-01").cast("timestamp"))
        .repartition(32)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(l.l_quantity).alias("sum_qty"),
            dsum(l.l_extendedprice).alias("sum_base_price"),
            dsum(rev).alias("sum_disc_price"),
            dsum(rev * (1 + l.l_tax)).alias("sum_charge"),
            davg(l.l_quantity).alias("avg_qty"),
            davg(l.l_extendedprice).alias("avg_price"),
            davg(l.l_discount).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    variants["h01_repart"] = rep

    for name, df in variants.items():
        noop(df)  # warm codegen
        best = min(noop(df) for _ in range(3))
        print(f"{name:12s} {best:6.3f}s")


if __name__ == "__main__":
    main()
