#!/usr/bin/env python
"""r13 item 1 (part 3): replicate bench.py's exact sequence up to h18's
timed slot, then watch h18 converge over 8 further runs. Attribution:
if the first runs read ~2.2 s and later runs fall to ~1.1 s, the bench
reading is warmup depth, not a plan/width problem.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HEADLINE = [
    "h01_pricing_summary", "h03_shipping_priority", "h05_local_supplier_volume",
    "h06_forecast_revenue", "h08_market_share", "h09_product_profit",
    "h13_customer_distribution", "h18_large_volume_customer",
    "h21_suppliers_waiting", "ops_window_frames", "ev_session_window",
    "dp_neardup_minhash", "dp_knn_cosine", "dp_text_quality",
]


def main() -> None:
    spark = get_spark("probe-h18-ctx")
    qs = all_queries()
    qs["h06_forecast_revenue"](spark, SF_DIR).collect()
    qs["dp_neardup_minhash"](spark, "/root/testdata/sf0.01").collect()
    release_caches()
    for name in HEADLINE:
        qs[name](spark, SF_DIR).collect()
    release_caches()
    # timed queries before h18, bench order, min-of-2 each
    for name in HEADLINE[: HEADLINE.index("h18_large_volume_customer")]:
        for _ in range(2):
            release_caches()
            qs[name](spark, SF_DIR).collect()
    # now h18: 10 timed runs, print each
    runs = []
    for i in range(10):
        release_caches()
        t0 = time.time()
        qs["h18_large_volume_customer"](spark, SF_DIR).collect()
        runs.append(round(time.time() - t0, 3))
    print("h18 runs in bench context:", runs)


if __name__ == "__main__":
    main()
