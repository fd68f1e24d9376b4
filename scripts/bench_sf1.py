#!/usr/bin/env python
"""One-decade-up scale check (VERDICT r6 item 3): run the 103-query
TPC-DS corpus at dsdgen-SF1 volumes (the reference ITCase's actual
scale, TpcDsBatchExecITCase.scala:106) in both catalog postures, with
per-query wall-clock, and print ONE JSON line.

Usage:
    python scripts/bench_sf1.py [--data-dir DIR] [--scale sf1|sf10]

``--scale sf10`` runs the same sweep at dsdgen -SCALE 10 volumes
(SIZES_SF10: 28.8M store_sales / ~160M inventory — VERDICT r7
item 3, one more decade).

Data is generated once (cached by marker file) with
``datagen.generate(sizes=SIZES_SF1)`` — ~2.9M store_sales /
1.4M catalog_sales / 14M inventory rows. Results are meant to be
pasted into BENCH_NOTES.md next to the sf0.1 numbers so super-linear
queries stand out (sf0.1-equivalent micro data is ~48× smaller on the
fact side).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m")

from flink_tpcds_spark.session import get_spark  # noqa: E402
from flink_tpcds_spark.tpcds import runner  # noqa: E402
from flink_tpcds_spark.tpcds.datagen import SIZES_SF1, SIZES_SF10, generate  # noqa: E402


def main() -> None:
    scale = "sf1"
    if "--scale" in sys.argv:
        scale = sys.argv[sys.argv.index("--scale") + 1]
    sizes = {"sf1": SIZES_SF1, "sf10": SIZES_SF10}[scale]
    data_dir = f"/tmp/tpcds_{scale}"
    if "--data-dir" in sys.argv:
        data_dir = sys.argv[sys.argv.index("--data-dir") + 1]

    t0 = time.time()
    generate(data_dir, sizes=sizes)
    gen_sec = round(time.time() - t0, 1)

    spark = get_spark(f"bench-{scale}")
    names = runner.query_names()

    def corpus_pass() -> dict:
        runner.run_spark("q96", spark)  # warmup
        per_q: dict[str, float] = {}
        t0 = time.time()
        for name in names:
            q0 = time.time()
            runner.run_spark(name, spark)
            per_q[name] = round(time.time() - q0, 3)
        return {
            "queries": len(names),
            "total_sec": round(time.time() - t0, 3),
            "per_query": per_q,
        }

    runner.register_spark_views(spark, data_dir)
    views = corpus_pass()

    t0 = time.time()
    runner.register_catalog_tables(spark, data_dir, analyze=True)
    analyze_sec = round(time.time() - t0, 3)
    stats = corpus_pass()
    stats["analyze_sec"] = analyze_sec

    print(
        json.dumps(
            {
                "metric": f"tpcds_corpus_{scale}",
                "gen_sec": gen_sec,
                "data_dir": data_dir,
                "temp_views": views,
                "catalog_stats": stats,
            }
        )
    )


if __name__ == "__main__":
    main()
