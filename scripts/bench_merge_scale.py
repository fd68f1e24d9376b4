#!/usr/bin/env python
"""MERGE INTO at volume: the ×100 TPC-H orders table (15M rows).

Uses the cached structure-preserving ×100 corpus from
bench_tpch_scale.py (falls back to building it). Scenario: the nightly
upsert — 1 % of existing keys updated, 0.5 % new keys inserted, then a
0.2 % delete wave — with closed-form row-count invariants after each
merge (exact arithmetic over key ranges, no tolerance).

Prints one JSON line: rows before/after each step, wall-clock per
merge, and the invariant verdicts.
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
    spark = get_spark("merge-scale")
    from pyspark.sql import functions as F

    from flink_tpcds_spark.sources.merge import merge_into

    src_dir = f"/tmp/tpch_scale/x{m}/orders.parquet"
    if not os.path.isdir(src_dir) and not os.path.isfile(src_dir):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_tpch_scale import build  # type: ignore

        build(spark, m)

    work = f"/tmp/merge_scale_x{m}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    tgt = os.path.join(work, "orders")
    base = spark.read.parquet(src_dir).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,6)").alias("o_totalprice"),
        "o_orderstatus",
    )
    base.write.parquet(tgt)
    n0 = spark.read.parquet(tgt).count()
    out: dict = {"metric": "merge_into_scale", "m": m, "rows_before": n0}

    keys = spark.read.parquet(tgt).select("o_orderkey")
    max_key = keys.agg(F.max("o_orderkey")).first()[0]

    # update 1 % of existing keys + insert 0.5 % brand-new keys
    upd = (
        spark.read.parquet(tgt)
        .filter(F.col("o_orderkey") % 100 == 7)
        .withColumn("o_orderstatus", F.lit("M"))
    )
    n_upd = upd.count()
    ins = spark.range(1, n0 // 200 + 1).select(
        (F.col("id") + max_key).alias("o_orderkey"),
        F.lit(1).cast("bigint").alias("o_custkey"),
        F.lit(1.0).cast("decimal(18,6)").alias("o_totalprice"),
        F.lit("N").alias("o_orderstatus"),
    )
    n_ins = ins.count()
    t0 = time.time()
    merge_into(
        spark, tgt, upd.unionByName(ins), ["o_orderkey"], when_matched="update"
    )
    out["upsert_sec"] = round(time.time() - t0, 1)
    n1 = spark.read.parquet(tgt).count()
    n1_updated = (
        spark.read.parquet(tgt).filter(F.col("o_orderstatus") == "M").count()
    )
    out["rows_after_upsert"] = n1
    out["upsert_invariant"] = bool(
        n1 == n0 + n_ins and n1_updated == n_upd
    )

    # delete wave: every key % 500 == 3
    dels = spark.read.parquet(tgt).filter(
        F.col("o_orderkey") % 500 == 3
    ).select("o_orderkey")
    n_del = dels.count()
    t0 = time.time()
    merge_into(
        spark, tgt, dels, ["o_orderkey"], when_matched="delete",
        insert_not_matched=False,
    )
    out["delete_sec"] = round(time.time() - t0, 1)
    n2 = spark.read.parquet(tgt).count()
    out["rows_after_delete"] = n2
    out["delete_invariant"] = bool(n2 == n1 - n_del)

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
