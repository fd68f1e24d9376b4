"""Streaming layer tests: each unbounded pipeline, run to completion
with availableNow over the file-replayed events table, must agree with
its batch counterpart (which is itself oracle-checked in
queries/events.py) — the batch/stream unification contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_tpcds_spark.schemas import load_table
from flink_tpcds_spark.streaming import (
    event_stream,
    session_window_agg,
    sliding_window_counts,
    streaming_dedup,
    streaming_interval_join,
    tumbling_window_agg,
)


def _run_to_memory(spark, sdf, name: str, mode: str = "append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream_out = _run_to_memory(
        spark,
        tumbling_window_agg(event_stream(spark, sf_dir)),
        "t_tumble",
        mode="append",
    )
    batch = load_table(spark, sf_dir, "events")
    batch_out = tumbling_window_agg(batch)  # same code path, bounded input
    s = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch_out.collect()}
    # append mode emits only windows closed by the final watermark; all
    # emitted windows must match the batch result exactly, and most
    # windows must have been emitted.
    assert s <= b
    assert len(s) >= len(b) - 5
    assert len(s) > 0


def test_streaming_session_matches_batch(spark, sf_dir):
    stream_out = _run_to_memory(
        spark,
        session_window_agg(event_stream(spark, sf_dir)),
        "t_session",
        mode="append",
    )
    batch_out = session_window_agg(load_table(spark, sf_dir, "events"))
    s = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch_out.collect()}
    assert s <= b
    assert len(s) >= len(b) - 20  # sessions still open at EOS aren't emitted
    assert len(s) > 0


def test_streaming_sliding_runs(spark, sf_dir):
    out = _run_to_memory(
        spark,
        sliding_window_counts(event_stream(spark, sf_dir)),
        "t_slide",
        mode="append",
    )
    batch_cnt = (
        sliding_window_counts(load_table(spark, sf_dir, "events")).count()
    )
    assert 0 < out.count() <= batch_cnt


def test_streaming_dedup_counts(spark, sf_dir):
    out = _run_to_memory(
        spark,
        streaming_dedup(event_stream(spark, sf_dir)),
        "t_dedup",
        mode="append",
    )
    batch = load_table(spark, sf_dir, "events")
    expected = batch.select("user_id", "event_type").distinct().count()
    assert out.count() == expected


def test_streaming_interval_join_counts(spark, sf_dir):
    ev = event_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = _run_to_memory(
        spark,
        streaming_interval_join(clicks, purchases),
        "t_ijoin",
        mode="append",
    )
    b = load_table(spark, sf_dir, "events")
    bc = b.filter(F.col("event_type") == "click").alias("l")
    bp = b.filter(F.col("event_type") == "purchase").alias("r")
    expected = bc.join(
        bp,
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts "
            "AND r.ts <= l.ts + INTERVAL 600 SECONDS"
        ),
    ).count()
    assert out.count() == expected
