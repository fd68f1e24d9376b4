#!/usr/bin/env python
"""Round-13 new-operator scale measurements: z-order clustering, MV
rewrite, count-min sketch, token-budget mix, streaming pivot — each
one to two decades above its driver-gate scale, with the invariant
that motivates it at 100 TB stated next to the reading.

Usage: python scripts/bench_r13_ops.py [sf_dir] [xfactor]
Prints one JSON line.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from flink_tpcds_spark.session import get_spark  # noqa: E402


def _replicate(df, m: int, key: str, offset: int):
    return df.sparkSession.range(m).crossJoin(df).withColumn(
        key, F.col(key) + F.col("id") * offset
    ).drop("id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    xf = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("bench-r13")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir, "xfactor": xf}
    work = tempfile.mkdtemp(prefix="bench_r13_")

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    big = _replicate(li, xf, "l_orderkey", 100_000_000).cache()
    n = big.count()
    out["lineitem_rows"] = n

    # -- z-order: write cost + pruning ratio + box-scan time ---------------
    from flink_tpcds_spark.sources.zorder import files_touched, write_zordered

    zdst = os.path.join(work, "li_z")
    ldst = os.path.join(work, "li_linear")
    n_files = 64
    t0 = time.time()
    write_zordered(big, zdst, ["l_partkey", "l_orderkey"], n_files=n_files)
    out["zorder_write_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    (
        big.repartitionByRange(n_files, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(ldst)
    )
    out["linear_write_sec"] = round(time.time() - t0, 3)
    b = big.agg(
        F.min("l_partkey").alias("lo"), F.max("l_partkey").alias("hi")
    ).collect()[0]
    box_hi = b.lo + max(1, (b.hi - b.lo) // 16)
    z_t, z_n = files_touched(zdst, "l_partkey", b.lo, box_hi)
    lin_t, _ = files_touched(ldst, "l_partkey", b.lo, box_hi)
    out["zorder_files_touched"] = f"{z_t}/{z_n}"
    out["linear_files_touched"] = f"{lin_t}/{z_n}"
    for tag, path in (("z", zdst), ("linear", ldst)):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            spark.read.parquet(path).filter(
                (F.col("l_partkey") >= b.lo) & (F.col("l_partkey") <= box_hi)
            ).agg(F.sum("l_quantity")).collect()
            best = min(best, time.time() - t0)
        out[f"box_scan_{tag}_sec"] = round(best, 3)

    # -- MV rewrite: amortization at scale ---------------------------------
    from flink_tpcds_spark.plans.mv import MvCatalog, create_mv

    mv_path = os.path.join(work, "mv")
    ldec = big.withColumn("qty_dec", F.col("l_quantity").cast("decimal(18,6)"))
    t0 = time.time()
    cat = MvCatalog()
    cat.register(
        create_mv(
            spark, "mv_big", "lineitem", ldec, mv_path,
            ["l_returnflag", "l_linestatus", "l_linenumber"],
            {"s": ("sum", "qty_dec"), "mn": ("min", "l_extendedprice"),
             "mx": ("max", "l_extendedprice")},
        )
    )
    out["mv_build_sec"] = round(time.time() - t0, 3)
    want = {"s": ("sum", "qty_dec"), "c": ("count", None)}
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        cat.try_rewrite(spark, "lineitem", ["l_returnflag"], want).collect()
        best = min(best, time.time() - t0)
    out["mv_query_sec"] = round(best, 3)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        ldec.groupBy("l_returnflag").agg(
            F.sum("qty_dec").alias("s"), F.count(F.lit(1)).alias("c")
        ).collect()
        best = min(best, time.time() - t0)
    out["mv_direct_sec"] = round(best, 3)
    big.unpersist()

    # -- count-min: build time + the O(1) sketch-size invariant ------------
    from flink_tpcds_spark.operators.sketch import count_min_build

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    dbig = _replicate(d, xf, "doc_id", 10_000_000).cache()
    out["documents_rows"] = dbig.count()
    toks = dbig.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("k")
    )
    t0 = time.time()
    sk = count_min_build(toks, "k")
    sk_rows = sk.count()
    out["cms_build_sec"] = round(time.time() - t0, 3)
    out["cms_sketch_rows"] = sk_rows  # <= depth*width regardless of corpus

    # -- token-budget mix ---------------------------------------------------
    from flink_tpcds_spark.datapipe.curate import token_budget_mix

    t0 = time.time()
    sel = token_budget_mix(dbig, budget_tokens=200_000 * xf, max_epochs=3)
    out["token_mix_rows"] = sel.count()
    out["token_mix_sec"] = round(time.time() - t0, 3)
    dbig.unpersist()

    # -- streaming pivot: 4 micro-batches at x10 events ---------------------
    from flink_tpcds_spark.streaming.pivot import streaming_pivot
    from flink_tpcds_spark.streaming.sinks import ParquetUpsertSink

    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "event_type", "value"
    )
    ebig = _replicate(e, xf, "event_id", 100_000_000)
    src = os.path.join(work, "pivot_in")
    os.makedirs(src)
    for i in range(4):
        ebig.filter(F.pmod("event_id", F.lit(4)) == i).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    t0 = time.time()
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .withColumn("cohort", F.pmod("user_id", F.lit(16)).cast("bigint"))
    )
    piv = streaming_pivot(
        stream, ["cohort"], "event_type",
        ["click", "error", "purchase", "signup", "view"], "value",
    )
    sink = ParquetUpsertSink(os.path.join(work, "pivot_log"), ["cohort"])
    (
        piv.writeStream.outputMode("update")
        .foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(work, "pivot_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    out["st_pivot_rows"] = sink.snapshot(spark).count()
    out["st_pivot_sec"] = round(time.time() - t0, 3)

    # -- gap fill + interpolation over the replicated hourly series ---------
    from flink_tpcds_spark.operators.gapfill import (
        gap_fill,
        linear_interpolate,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # xf copies of the key space -> xf * 5 series over the same range
    keyed = spark.range(xf).crossJoin(ev).select(
        F.concat_ws("_", "event_type", F.col("id").cast("string")).alias(
            "series"
        ),
        F.date_trunc("hour", "ts").alias("h"),
        "value",
    )
    obs = keyed.groupBy("series", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("value").alias("total"),
    )
    t0 = time.time()
    dense = gap_fill(
        obs, key_col="series", bucket_col="h",
        zero_fill={"cnt": F.lit(0).cast("bigint")}, locf_cols=["total"],
    )
    filled = linear_interpolate(dense, "series", "h", "total")
    out["gapfill_rows"] = filled.count()
    out["gapfill_sec"] = round(time.time() - t0, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
