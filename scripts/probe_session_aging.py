"""Probe the corpus-pass 'session aging' effect: run the 103-query
TPC-DS corpus repeatedly in ONE session and watch per-pass totals plus
JVM health (code cache, GC time, listener queue). If pass N keeps
inflating, the stats-posture bench number measures session age, not
query cost.

Usage: python scripts/probe_session_aging.py [n_passes] [--stats]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_tpcds_spark.session import get_spark  # noqa: E402
from flink_tpcds_spark.tpcds import datagen, runner  # noqa: E402


def jvm_health(spark):
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out = {}
    for pool in mf.getMemoryPoolMXBeans():
        name = pool.getName()
        if "CodeHeap" in name or "CodeCache" in name:
            u = pool.getUsage()
            out[name] = f"{u.getUsed() // (1 << 20)}/{u.getMax() // (1 << 20)}MB"
    gc_ms = sum(b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans())
    out["gc_total_ms"] = gc_ms
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    out["heap_used_mb"] = heap.getUsed() // (1 << 20)
    out["loaded_classes"] = mf.getClassLoadingMXBean().getLoadedClassCount()
    return out


def main():
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    stats = "--stats" in sys.argv
    spark = get_spark("probe-session-aging")
    data_dir = datagen.generate()
    if stats:
        runner.register_catalog_tables(spark, data_dir, analyze=True)
    else:
        runner.register_spark_views(spark, data_dir)
    names = runner.query_names()
    runner.run_spark("q96", spark)
    for p in range(n_passes):
        t0 = time.time()
        slow = {}
        for name in names:
            q0 = time.time()
            runner.run_spark(name, spark)
            slow[name] = time.time() - q0
        total = time.time() - t0
        top = sorted(slow.items(), key=lambda kv: -kv[1])[:5]
        h = jvm_health(spark)
        print(
            f"pass{p}: total={total:.1f}s top5="
            + ",".join(f"{k}={v:.2f}" for k, v in top)
            + f" | {h}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
