#!/usr/bin/env python
"""Dev loop: run every queries() entry against its DuckDB oracle.

Usage: python scripts/check_parity.py [sf_dir] [name_filter] [--pandas]

``--pandas`` compares under the pandas oracle fetch (``fetch_df``)
instead of native ``fetchall`` — the mode that exposes dtype-coercion
rendering gaps (HUGEINT→float64 etc., the round-4 driver reds).
Note: six long-driver-green suite queries (h03, h18,
ops_grouping_sets, ops_asof_join, ops_datetime_functions,
ds01_channel_rollup) fail ONLY under this emulation because their
DATE/decimal outputs coerce; the real driver demonstrably handles
those classes, so --pandas failures matter only for NEW queries.
"""

import sys
import time

sys.path.insert(0, ".")

from flink_tpcds_spark.oracle import compare, duckdb_connection
from flink_tpcds_spark.queries import all_oracles, all_queries
from flink_tpcds_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--pandas"]
    fetch = "pandas" if "--pandas" in sys.argv[1:] else "native"
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    name_filter = args[1] if len(args) > 1 else ""
    spark = get_spark("parity-check")
    con = duckdb_connection(sf_dir)
    queries, oracles = all_queries(), all_oracles()
    failed = []
    filters = [f for f in name_filter.split(",") if f] if name_filter else []
    for name, fn in sorted(queries.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  {name:36s} rows-only rows={n} ({time.time()-t0:.1f}s)")
                continue
            res = compare(name, df, con, oracles[name], fetch=fetch)
            status = "OK " if res.ok else "FAIL"
            print(
                f"  {name:36s} {status} rows={res.spark_rows}/{res.oracle_rows} "
                f"({time.time()-t0:.1f}s) {res.detail[:300]}"
            )
            if not res.ok:
                failed.append(name)
        except Exception as e:  # noqa: BLE001 — dev loop, show and continue
            print(f"  {name:36s} ERROR {type(e).__name__}: {str(e)[:2000]}")
            failed.append(name)
    print(f"\n{len(failed)} failures: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
