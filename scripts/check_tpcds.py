#!/usr/bin/env python
"""Sweep the TPC-DS corpus: Spark vs DuckDB over the generated data.

Usage: python scripts/check_tpcds.py [name_substring ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")

from flink_tpcds_spark.session import get_spark  # noqa: E402
from flink_tpcds_spark.tpcds import datagen, runner  # noqa: E402


def main() -> None:
    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    data_dir = datagen.generate()
    spark = get_spark("tpcds-check")
    runner.register_spark_views(spark, data_dir)
    con = runner.duckdb_conn(data_dir)
    names = runner.query_names()
    if filters:
        names = [n for n in names if any(f in n for f in filters)]
    failures, errors, empties = [], [], []
    for name in names:
        t0 = time.time()
        try:
            res = runner.run_one(name, spark, con)
        except Exception as e:
            errors.append(name)
            msg = str(e).split("\n")[0][:200]
            print(f"  {name:6s} ERROR {msg}")
            if "-v" in sys.argv:
                traceback.print_exc()
            continue
        dt = time.time() - t0
        status = "OK " if res.ok else "FAIL"
        if not res.ok:
            failures.append(name)
        if res.spark_rows == 0:
            empties.append(name)
        extra = f" {res.detail[:220]}" if res.detail else ""
        print(f"  {name:6s} {status} rows={res.spark_rows}/{res.duck_rows} ({dt:.1f}s){extra}")
    print(f"\n{len(failures)} failures: {failures}")
    print(f"{len(errors)} errors: {errors}")
    print(f"{len(empties)} empty-result queries: {empties}")


if __name__ == "__main__":
    main()
