#!/usr/bin/env python
"""Split each headline query's wall-clock into plan-construction
(driver-side: load_table footer reads + DataFrame build) vs execution
(collect), at the bench posture. Guide §1: attribute before optimizing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")

from flink_tpcds_spark.datapipe.dedup import release_caches  # noqa: E402
from flink_tpcds_spark.queries import all_queries  # noqa: E402
from flink_tpcds_spark.session import get_spark  # noqa: E402

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
    "ops_window_frames",
    "ev_session_window",
    "dp_neardup_minhash",
    "dp_knn_cosine",
    "dp_text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-overhead")
    qs = all_queries()
    # same warmup protocol as bench.py
    qs["h06_forecast_revenue"](spark, sf_dir).collect()
    qs["dp_neardup_minhash"](spark, "/root/testdata/sf0.01").collect()
    release_caches()
    for name in HEADLINE:
        qs[name](spark, sf_dir).collect()
    release_caches()

    print(f"{'query':28s} {'build':>7s} {'collect':>8s} {'total':>7s}")
    tot_b = tot_c = 0.0
    for name in HEADLINE:
        best_b = best_c = float("inf")
        for _ in range(2):
            release_caches()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.collect()
            t2 = time.time()
            best_b = min(best_b, t1 - t0)
            best_c = min(best_c, t2 - t1)
        tot_b += best_b
        tot_c += best_c
        print(f"{name:28s} {best_b:7.3f} {best_c:8.3f} {best_b + best_c:7.3f}")
    print(f"{'TOTAL':28s} {tot_b:7.3f} {tot_c:8.3f} {tot_b + tot_c:7.3f}")


if __name__ == "__main__":
    main()
