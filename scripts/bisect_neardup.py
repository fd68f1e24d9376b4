#!/usr/bin/env python
"""Bisect the dp_neardup_minhash r12 regression: time the full
pipeline with each r12 change toggled back to its r11 form.

Variants:
  new        — code as committed (window guard + new jaccard)
  old_guard  — guard via groupBy agg + broadcast anti-join (r11 form)
  old_jac    — jaccard via array_union (r11 form)
  old_both   — both reverted
  few_parts  — as committed but AQE initialPartitionNum=8 (r11 value)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")

from pyspark.sql import functions as F  # noqa: E402

import flink_tpcds_spark.datapipe.dedup as dd  # noqa: E402
from flink_tpcds_spark.schemas import load_table  # noqa: E402
from flink_tpcds_spark.session import get_spark  # noqa: E402


def old_jaccard(a, b):
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def run(spark, sf_dir, label):
    docs = load_table(spark, sf_dir, "documents")
    dd.release_caches()
    t0 = time.time()
    out = dd.minhash_near_dup_pairs(docs)
    n = out.count()
    dt = time.time() - t0
    print(f"{label:12s} {dt:7.2f}s  rows={n}", flush=True)
    dd.release_caches()
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bisect-neardup")

    import inspect

    src = inspect.getsource(dd.minhash_near_dup_pairs)

    # old guard form, patched textually
    old_guard_src = src.replace(
        """        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "bucket")
        bands = (
            bands.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )""",
        """        over_cap = (
            bands.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") > max_bucket_size)
            .select("band", "bucket")
        )
        bands = bands.join(F.broadcast(over_cap), ["band", "bucket"], "left_anti")""",
    )
    assert old_guard_src != src

    ns = dict(vars(dd))
    exec(compile(old_guard_src, "<old_guard>", "exec"), ns)
    old_guard_fn = ns["minhash_near_dup_pairs"]

    new_fn = dd.minhash_near_dup_pairs
    new_jac = dd.jaccard

    # warmup
    run(spark, sf_dir, "warmup")

    run(spark, sf_dir, "new")

    dd.minhash_near_dup_pairs = old_guard_fn
    run(spark, sf_dir, "old_guard")
    dd.minhash_near_dup_pairs = new_fn

    dd.jaccard = old_jaccard
    ns2 = dict(vars(dd))
    exec(compile(src, "<old_jac>", "exec"), ns2)
    ns2["jaccard"] = old_jaccard
    exec(compile(src, "<old_jac>", "exec"), ns2)
    dd.minhash_near_dup_pairs = ns2["minhash_near_dup_pairs"]
    run(spark, sf_dir, "old_jac")
    dd.minhash_near_dup_pairs = new_fn
    dd.jaccard = new_jac

    ns3 = dict(vars(dd))
    ns3["jaccard"] = old_jaccard
    exec(compile(old_guard_src, "<old_both>", "exec"), ns3)
    dd.minhash_near_dup_pairs = ns3["minhash_near_dup_pairs"]
    run(spark, sf_dir, "old_both")
    dd.minhash_near_dup_pairs = new_fn

    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "8"
    )
    run(spark, sf_dir, "few_parts")
    spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    )


if __name__ == "__main__":
    main()
