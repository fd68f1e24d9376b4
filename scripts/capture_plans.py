#!/usr/bin/env python
"""Capture .explain("formatted") for a set of registry queries.

Usage: python scripts/capture_plans.py <out_dir> <suffix> [name ...]

Writes <out_dir>/<name>_<suffix>.txt for each query (default: the
bench.py headline set). Plans are captured at the bench posture
(sf0.1 data dir, bench's maxPartitionBytes split) so Exchange counts
and join strategies match what the timed runs execute.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")

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
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        joins = [
            k
            for k in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if k in plan
        ]
        py = [
            k
            for k in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow")
            if k in plan
        ]
        print(f"{name}: Exchange={n_ex} joins={joins} python={py} -> {path}")


if __name__ == "__main__":
    main()
