"""StreamingQuantileSketch: exact-merge bottom-k sample over batches.

The merge law is a set identity, so the streaming state must equal
the whole-input batch sketch EXACTLY under any batch slicing, with
replays, and across a simulated crash-recovery."""

from __future__ import annotations

import random
import shutil
import tempfile

from pyspark.sql import functions as F

from flink_tpcds_spark.operators.sketch import quantile_sketch
from flink_tpcds_spark.streaming.quantile import StreamingQuantileSketch


def _rows(seed, n):
    rnd = random.Random(seed)
    return [(i, float(rnd.randint(0, 10_000))) for i in range(n)]


def test_streaming_equals_batch_any_slicing(spark):
    df = spark.createDataFrame(_rows(1, 500), "doc_id long, v double")
    want = sorted(
        map(tuple, quantile_sketch(df, "v", "doc_id", 32).collect())
    )
    for trial, nb in enumerate((2, 5)):
        work = tempfile.mkdtemp(prefix="st_q_")
        m = StreamingQuantileSketch(work + "/s", "v", "doc_id", 32)
        for i in range(nb):
            part = df.filter(F.pmod("doc_id", F.lit(nb)) == i)
            m.foreach_batch(part, i)
            if i == 0:  # replay — must be a no-op
                m.foreach_batch(part, i)
        got = sorted(map(tuple, m.result(spark).collect()))
        assert got == want, f"slicing {nb}"
        shutil.rmtree(work, ignore_errors=True)


def test_recovery_mid_swap(spark):
    df = spark.createDataFrame(_rows(2, 200), "doc_id long, v double")
    work = tempfile.mkdtemp(prefix="st_qr_")
    m = StreamingQuantileSketch(work + "/s", "v", "doc_id", 16)
    m.foreach_batch(df.filter("doc_id < 100"), 0)
    # simulate the crash window: state moved aside, promote not done
    shutil.move(work + "/s", work + "/s.old")
    m2 = StreamingQuantileSketch(work + "/s", "v", "doc_id", 16)
    m2.foreach_batch(df.filter("doc_id >= 100"), 1)
    want = sorted(
        map(tuple, quantile_sketch(df, "v", "doc_id", 16).collect())
    )
    assert sorted(map(tuple, m2.result(spark).collect())) == want
    shutil.rmtree(work, ignore_errors=True)
