#!/usr/bin/env python
"""Decade-up scaling for the JUDGED headline suite: replicate the
TPC-H-ish tables ×m by key-shifted copies and run the h* queries.

Copy k shifts every key column by k·KEY_OFF — foreign keys inside a
copy stay consistent, so each copy is a self-contained replica whose
per-query contribution equals the base result. nation/region are
shared dims (copied as-is; every copy's *_nationkey still joins
them). Closed-form invariant: h01's per-(returnflag, linestatus)
counts and sums are exactly m× the base and the averages are
IDENTICAL (same decimal bridge, m identical populations).

Usage: python scripts/bench_tpch_scale.py [--m 10]
Prints one JSON line with base vs scaled per-query seconds + the
h01 invariant verdict.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m")

from pyspark.sql import functions as F  # noqa: E402

from flink_tpcds_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/tpch_scale"
KEY_OFF = 100_000_000

KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}

HEADLINE = [
    "h01_pricing_summary",
    "h03_shipping_priority",
    "h05_local_supplier_volume",
    "h06_forecast_revenue",
    "h08_market_share",
    "h09_product_profit",
    "h13_customer_distribution",
    "h18_large_volume_customer",
    "h21_suppliers_waiting",
]


def build(spark, m: int) -> str:
    out = f"{WORK}/x{m}"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation"):
        shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    for t, keys in KEYS.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = []
        for k in range(m):
            cols = [
                (F.col(c) + k * KEY_OFF).alias(c) if c in keys else F.col(c)
                for c in df.columns
            ]
            parts.append(df.select(*cols))
        big = parts[0]
        for p in parts[1:]:
            big = big.unionAll(p)
        big.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    open(os.path.join(out, "_OK"), "w").write("ok\n")
    return out


def main() -> None:
    m = 10
    if "--m" in sys.argv:
        m = int(sys.argv[sys.argv.index("--m") + 1])
    spark = get_spark("tpch-scale")
    scaled = build(spark, m)

    from flink_tpcds_spark.queries.tpch import QUERIES

    def run(sf_dir: str) -> dict:
        QUERIES["h06_forecast_revenue"](spark, sf_dir).collect()  # warm
        times = {}
        for name in HEADLINE:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                QUERIES[name](spark, sf_dir).collect()
                best = min(best, time.time() - t0)
            times[name] = round(best, 2)
        return times

    base_t = run(BASE)
    big_t = run(scaled)

    # --bucketed (VERDICT r7 item 4): rerun the suite with lineitem +
    # orders bucketed on their order keys — the warehouse posture.
    # At ×100 every order-key join is a sort-merge from plain parquet;
    # the posture converts them to exchange-free bucketed joins.
    bucketed_t = None
    bucket_write = None
    if "--bucketed" in sys.argv:
        from flink_tpcds_spark.sources.bucketing import (
            install_bucketed_posture,
            uninstall_bucketed_posture,
        )

        try:
            t0 = time.time()
            install_bucketed_posture(spark, scaled)
            bucket_write = round(time.time() - t0, 1)
            bucketed_t = run(scaled)
        finally:
            uninstall_bucketed_posture()

    # h01 invariant: counts/sums ×m, averages identical
    b = {
        (r[0], r[1]): r.asDict()
        for r in QUERIES["h01_pricing_summary"](spark, BASE).collect()
    }
    g = {
        (r[0], r[1]): r.asDict()
        for r in QUERIES["h01_pricing_summary"](spark, scaled).collect()
    }
    # counts are integer-exact ×m; decimal sums are exact ×m but the
    # float render of 10·x differs in the last bit, and the averages
    # ((m·s)/(m·n) vs s/n) can differ by 1 ulp because decimal
    # division derives its result scale from operand precision —
    # compare at 1e-12 relative, far tighter than any real drift.
    import math

    def close(x, y):
        return math.isclose(x, y, rel_tol=1e-12)

    inv = set(b) == set(g) and all(
        g[k]["count_order"] == m * b[k]["count_order"]
        and close(g[k]["sum_qty"], m * b[k]["sum_qty"])
        and close(g[k]["sum_base_price"], m * b[k]["sum_base_price"])
        and close(g[k]["avg_qty"], b[k]["avg_qty"])
        and close(g[k]["avg_price"], b[k]["avg_price"])
        for k in b
    )
    print(
        json.dumps(
            {
                "metric": "tpch_scale",
                "m": m,
                "base_sec": base_t,
                "scaled_sec": big_t,
                "bucketed_sec": bucketed_t,
                "bucket_write_sec": bucket_write,
                "h01_invariant": inv,
            }
        )
    )


if __name__ == "__main__":
    main()
