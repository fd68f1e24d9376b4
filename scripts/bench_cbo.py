#!/usr/bin/env python
"""Measure whether CBO statistics move TPC-DS corpus plans/timings.

The reference's benchmark posture enables join reorder
(TpcDsBatchExecITCase.scala:71-72); Spark's CBO join-reorder only acts
when tables carry statistics. This experiment isolates the stats
effect: the 24 generated tables are registered as *catalog* tables
(external parquet, in-memory catalog) so ANALYZE TABLE works without
caching data, then the corpus is timed warm → baseline (no stats) →
after ANALYZE ... FOR ALL COLUMNS.

Usage: python scripts/bench_cbo.py [top_n]
Prints a before/after table for the slowest queries + suite totals.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")

from flink_tpcds_spark.session import session_builder  # noqa: E402
from flink_tpcds_spark.tpcds import datagen, runner  # noqa: E402
from flink_tpcds_spark.tpcds.schema import TPCDS_SCHEMAS  # noqa: E402


def sweep(spark, names) -> dict[str, float]:
    out = {}
    for name in names:
        t0 = time.time()
        runner.run_spark(name, spark)
        out[name] = time.time() - t0
    return out


def main() -> None:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    data_dir = datagen.generate()
    spark = (
        session_builder("bench-cbo")
        .config("spark.sql.warehouse.dir", "/tmp/spark_warehouse_cbo")
        .getOrCreate()
    )
    for t in TPCDS_SCHEMAS:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(
            f"CREATE TABLE {t} USING parquet "
            f"LOCATION '{os.path.join(data_dir, t + '.parquet')}'"
        )
    names = runner.query_names()

    sweep(spark, names)  # warm: JIT, codegen caches, page cache
    base = sweep(spark, names)

    t0 = time.time()
    for t in TPCDS_SCHEMAS:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
    analyze_s = time.time() - t0

    with_stats = sweep(spark, names)

    slowest = sorted(base, key=base.get, reverse=True)[:top_n]
    print(f"\nANALYZE (24 tables, all columns): {analyze_s:.1f}s")
    print(f"{'query':8s} {'base_s':>8s} {'stats_s':>8s} {'delta':>7s}")
    for n in slowest:
        d = with_stats[n] - base[n]
        print(f"{n:8s} {base[n]:8.2f} {with_stats[n]:8.2f} {d:+7.2f}")
    print(
        f"suite    {sum(base.values()):8.2f} "
        f"{sum(with_stats.values()):8.2f} "
        f"{sum(with_stats.values()) - sum(base.values()):+7.2f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
