#!/usr/bin/env python
"""Round-10 new-operator measurements: REST connector throughput and
StreamingMatchRecognize at x10 (sf0.1 events, 100k rows).

Usage: python scripts/bench_r10_ops.py [sf_dir]
Prints one JSON line.
"""

import datetime as dt
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from flink_tpcds_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-r10")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir}

    e = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("event_id", "event_type", "value")
    )
    rows = [
        {"event_id": r.event_id, "event_type": r.event_type, "value": r.value}
        for r in e.collect()
    ]
    out["n_rows"] = len(rows)

    from flink_tpcds_spark.sources import restds

    srv, url = restds.start_row_service(
        "event_id bigint, event_type string, value double", rows
    )
    restds.register(spark)

    # batch read throughput at 4 vs 16 partitions (min of 2 runs)
    for nparts in (4, 16):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            n = (
                spark.read.format("flinkrest")
                .option("url", url)
                .option("numpartitions", str(nparts))
                .load()
                .count()
            )
            best = min(best, time.time() - t0)
            assert n == len(rows)
        out[f"rest_read_p{nparts}_sec"] = round(best, 3)
        out[f"rest_read_p{nparts}_rows_per_sec"] = int(len(rows) / best)

    # pushed-filter read: server-side selection, exact count
    t0 = time.time()
    n_f = (
        spark.read.format("flinkrest")
        .option("url", url)
        .option("numpartitions", "8")
        .load()
        .filter(F.col("event_type") == "click")
        .count()
    )
    out["rest_read_pushed_sec"] = round(time.time() - t0, 3)
    out["rest_read_pushed_rows"] = n_f

    # 2PC write throughput (append all rows back, 8 tasks)
    sink_srv, sink_url = restds.start_row_service(
        "event_id bigint, event_type string, value double", []
    )
    df = spark.read.format("flinkrest").option("url", url).option(
        "numpartitions", "8"
    ).load()
    t0 = time.time()
    df.write.format("flinkrest").option("url", sink_url).mode(
        "append"
    ).save()
    w = time.time() - t0
    out["rest_write_2pc_sec"] = round(w, 3)
    out["rest_write_2pc_rows_per_sec"] = int(len(rows) / w)
    srv.shutdown()
    sink_srv.shutdown()

    # ---- StreamingMatchRecognize at x10 -----------------------------
    from flink_tpcds_spark.operators.match_recognize import match_v_shapes
    from flink_tpcds_spark.streaming.match import StreamingMatchRecognize

    ev = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "ts", "event_id", "value")
    )
    tq = (
        ev.withColumn("_us", F.unix_micros("ts"))
        .agg(*[
            F.expr(f"percentile(_us, {q})").alias(f"q{i}")
            for i, q in enumerate([0.25, 0.5, 0.75])
        ])
        .collect()[0]
    )

    def _ts(us):
        return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)

    bounds = [None, _ts(tq.q0), _ts(tq.q1), _ts(tq.q2), None]
    work = tempfile.mkdtemp(prefix="bench_match_")
    m = StreamingMatchRecognize(
        os.path.join(work, "state"), dt.timedelta(minutes=10)
    )
    batch_secs = []
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.filter(F.col("ts") >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            part = part.filter(F.col("ts") < F.lit(bounds[i + 1]))
        t0 = time.time()
        m.foreach_batch(part, i)
        batch_secs.append(round(time.time() - t0, 3))
    t0 = time.time()
    m.flush(spark)
    flush_sec = round(time.time() - t0, 3)
    n_matches = m.matches(spark).count()
    n_batch = match_v_shapes(
        ev, "user_id", ["ts", "event_id"], "value"
    ).count()
    out["match_batch_secs"] = batch_secs
    out["match_flush_sec"] = flush_sec
    out["match_rows_in"] = ev.count()
    out["match_n_matches"] = n_matches
    out["match_equals_batch"] = bool(n_matches == n_batch)

    # ---- generic-pattern StreamingCep at x10 -------------------------
    from flink_tpcds_spark.streaming.cep import StreamingCep

    cw = tempfile.mkdtemp(prefix="bench_cep_")
    cep = StreamingCep(
        os.path.join(cw, "state"), "D+ U+", dt.timedelta(minutes=10)
    )
    cep_secs = []
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.filter(F.col("ts") >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            part = part.filter(F.col("ts") < F.lit(bounds[i + 1]))
        t0 = time.time()
        cep.foreach_batch(part, i)
        cep_secs.append(round(time.time() - t0, 3))
    t0 = time.time()
    cep.flush(spark)
    out["cep_batch_secs"] = cep_secs
    out["cep_flush_sec"] = round(time.time() - t0, 3)
    out["cep_n_matches"] = cep.matches(spark).count()
    out["cep_equals_vshape"] = bool(out["cep_n_matches"] == n_matches)
    try:
        out["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
