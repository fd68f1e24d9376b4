#!/usr/bin/env python
"""Incremental join-view maintenance at volume (sources/ivm.py).

Maintains orders ⋈ lineitem over the cached structure-preserving
×m TPC-H corpus (bench_tpch_scale.py) through 4 both-side delta
batches — sides split on DIFFERENT keys so order rows and their line
rows arrive in every cross-batch combination. Reports per-batch
wall-clock (must stay delta-driven, flat as the state grows) and the
closed-form final invariant: view rows == lineitem rows (every line
joins its unique order).

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_tpcds_spark.session import get_spark  # noqa: E402


def main() -> None:
    m = 100
    for i, a in enumerate(sys.argv):
        if a == "--m":
            m = int(sys.argv[i + 1])
    spark = get_spark("ivm-scale")
    from pyspark.sql import functions as F

    from flink_tpcds_spark.sources.ivm import JoinViewState

    base = f"/tmp/tpch_scale/x{m}"
    if not os.path.isdir(base):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_tpch_scale import build  # type: ignore

        build(spark, m)

    o = spark.read.parquet(f"{base}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    l = spark.read.parquet(f"{base}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_linenumber"
    )
    n_l, n_o = l.count(), o.count()
    work = f"/tmp/ivm_scale_x{m}"
    shutil.rmtree(work, ignore_errors=True)
    st = JoinViewState(work, ["o_orderkey"])
    batch_secs = []
    for i in range(4):
        da = o.filter(F.pmod("o_orderkey", F.lit(4)) == i)
        db = l.filter(
            F.pmod(F.col("o_orderkey") + F.col("l_linenumber"), F.lit(4)) == i
        )
        t0 = time.time()
        st.update(spark, da, db, i)
        batch_secs.append(round(time.time() - t0, 1))
    n_v = st.view(spark).count()
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "ivm_join_view_scale",
                "m": m,
                "orders": n_o,
                "lineitem": n_l,
                "batch_secs": batch_secs,
                "view_rows": n_v,
                "view_equals_lineitem": bool(n_v == n_l),
            }
        )
    )


if __name__ == "__main__":
    main()
