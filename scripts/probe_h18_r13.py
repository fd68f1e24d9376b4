#!/usr/bin/env python
"""r13 item 1: adjudicate the h18 regression (VERDICT r12).

Interleaved A/B of spark.sql.adaptive.coalescePartitions.initialPartitionNum
in {8, 32, 64} on h18 (the regressed query) plus h21/h01 sanity siblings,
one warm session, min-of-N over interleaved rounds so host drift cannot
masquerade as a treatment effect (the r12 q14a lesson).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")

from flink_tpcds_spark.queries import all_queries  # noqa: E402
from flink_tpcds_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WIDTHS = [8, 32, 64]
QUERIES = ["h18_large_volume_customer", "h21_suppliers_waiting", "h01_pricing_summary"]
ROUNDS = 4
KEY = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"


def main() -> None:
    spark = get_spark("probe-h18")
    qs = all_queries()
    # codegen warm at every width so no arm pays compilation
    for w in WIDTHS:
        spark.conf.set(KEY, str(w))
        for q in QUERIES:
            qs[q](spark, SF_DIR).collect()
    best: dict[tuple[str, int], float] = {}
    for r in range(ROUNDS):
        for w in WIDTHS:
            spark.conf.set(KEY, str(w))
            for q in QUERIES:
                spark.sparkContext.setJobDescription(f"{q} width={w} round={r}")
                t0 = time.time()
                qs[q](spark, SF_DIR).collect()
                dt = time.time() - t0
                k = (q, w)
                best[k] = min(best.get(k, float("inf")), dt)
    print("query,width,min_sec")
    for (q, w), v in sorted(best.items()):
        print(f"{q},{w},{v:.3f}")


if __name__ == "__main__":
    main()
