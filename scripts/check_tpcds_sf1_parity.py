#!/usr/bin/env python
"""Decade-up CORRECTNESS check: every corpus query must still match
DuckDB on the SF1-volume data (scripts/bench_sf1.py timed it; this
verifies it). Same comparator as the sf-micro gate
(tests/test_tpcds.py) — value-canonicalized rows, subset check for
the reference's UNCERTAIN ties-in-LIMIT set.

Usage: python scripts/check_tpcds_sf1_parity.py [--data-dir DIR]
       [--scale sf1|sf10] [--queries q1,q2,...]

``--scale sf10`` checks at dsdgen -SCALE 10 volumes; ``--queries``
restricts to a comma-separated subset (the DuckDB side of a few
heavy queries dominates wall-clock at SF10 — the subset check is the
documented posture there).
Prints one line per failing query and a final verdict line.
"""

from __future__ import annotations

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
    generate(data_dir, sizes=sizes)

    names = runner.query_names()
    if "--queries" in sys.argv:
        want = sys.argv[sys.argv.index("--queries") + 1].split(",")
        names = [n for n in names if n in want]

    heavy = "--heavy-rewrites" in sys.argv

    spark = get_spark(f"{scale}-parity")
    runner.register_spark_views(spark, data_dir)
    con = runner.duckdb_conn(data_dir)
    # At SF10 the heaviest oracles (q64: 2.3M output rows through a
    # 20-way join) need out-of-core room and must not buffer results
    # in insertion order; with these set q64 completes in ~300 s
    # where the defaults died on temp-spill disk exhaustion.
    con.execute("SET temp_directory='/tmp/duck_tmp'")
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='90GB'")

    if "--certify-rewrites" in sys.argv:
        # Prove the heavy-oracle rewrites ARE the vendored queries:
        # run both forms in DuckDB itself at this scale and compare
        # with the same canonicalizer used for Spark-vs-DuckDB.
        for name, rewrite in runner.HEAVY_ORACLE_REWRITES.items():
            t0 = time.time()
            vend = con.execute(runner.query_text(name, "duckdb")).fetchall()
            rewr = con.execute(rewrite).fetchall()
            res = runner.compare_rows(name, rewr, vend)
            print(
                f"certify {name}: ok={res.ok} rows={res.spark_rows}/"
                f"{res.duck_rows} in {time.time() - t0:.0f}s",
                flush=True,
            )
            if not res.ok:
                print(f"  {res.detail}")
                sys.exit(1)
        sys.exit(0)

    t0 = time.time()
    bad: list[str] = []
    for name in names:
        res = runner.run_one(name, spark, con, heavy_rewrites=heavy)
        if not res.ok:
            bad.append(name)
            print(f"FAIL {name}: {res.detail}", flush=True)
    print(
        f"{len(bad)} failures of {len(names)} "
        f"in {time.time() - t0:.0f}s: {bad}"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
