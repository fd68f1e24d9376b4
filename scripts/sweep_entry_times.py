"""Time every declared queries() entry at a given SF (min-of-2,
tuned session, collect) and print a sorted table — the outlier hunt
for the optimization round: entries whose cost is fixed overhead
rather than data volume show up at the top at small SF.

Usage: python scripts/sweep_entry_times.py [sf_dir] [name_filter]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_tpcds_spark.session import get_spark  # noqa: E402
from flink_tpcds_spark.queries import all_queries  # noqa: E402
from flink_tpcds_spark.datapipe.dedup import release_caches  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("sweep-entry-times")
    qs = all_queries()
    times: dict[str, float] = {}
    for name, fn in sorted(qs.items()):
        if name_filter and name_filter not in name:
            continue
        best = float("inf")
        try:
            for _ in range(2):
                release_caches()
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"sweep:{name}")
                t0 = time.time()
                fn(spark, sf_dir).collect()
                best = min(best, time.time() - t0)
            times[name] = best
            print(f"  {name:40s} {best:7.2f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:40s} ERROR {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    print("\n=== slowest 30 ===")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {name:40s} {t:7.2f}s")
    print(f"\ntotal (min-of-2 sums): {sum(times.values()):.1f}s "
          f"over {len(times)} entries")
    spark.stop()


if __name__ == "__main__":
    main()
