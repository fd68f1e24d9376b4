#!/usr/bin/env python
"""r13 item 1 (part 2): h18 in the BENCH posture — fresh session, one
untimed warm pass, then min-of-2 — per initialPartitionNum width.
Usage: probe_h18_fresh.py <width>
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")
width = sys.argv[1]
os.environ["SPARK_GRAFT_INITIAL_PARTITIONS"] = width

from flink_tpcds_spark.queries import all_queries  # noqa: E402
from flink_tpcds_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SEQ = ["h13_customer_distribution", "h18_large_volume_customer", "h21_suppliers_waiting"]


def main() -> None:
    spark = get_spark("probe-h18-fresh")
    qs = all_queries()
    for q in SEQ:  # untimed pass (the bench's per-query codegen warmup)
        qs[q](spark, SF_DIR).collect()
    out = {}
    for q in SEQ:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[q](spark, SF_DIR).collect()
            best = min(best, time.time() - t0)
        out[q] = round(best, 3)
    print(f"width={width} " + " ".join(f"{q}={v}" for q, v in out.items()))


if __name__ == "__main__":
    main()
