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


def test_streaming_topn_matches_batch(spark, sf_dir):
    from flink_tpcds_spark.operators import top_n
    from flink_tpcds_spark.streaming.topn import streaming_top_k_by_value

    q = streaming_top_k_by_value(event_stream(spark, sf_dir), k=5)
    q.awaitTermination(120)
    got = {
        (r.user_id, r.n_events)
        for r in spark.table("global_temp.stream_topn").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    totals = batch.groupBy("user_id").agg(
        F.sum("value").alias("total_value"), F.count(F.lit(1)).alias("n_events")
    )
    expected = {
        (r.user_id, r.n_events)
        for r in top_n(
            totals, [], [F.desc("total_value"), F.asc("user_id")], 5
        ).collect()
    }
    assert got == expected


def test_watermark_drops_late_rows(spark, tmp_path_factory):
    """The reference's late-data policy (WindowOperator.java:131-138):
    rows behind the watermark are dropped. Replay two files in order —
    the second contains an event far behind the first file's max ts —
    and assert the late row never lands in its (already-closed) window.
    """
    import pyspark.sql.types as T

    from flink_tpcds_spark.streaming.windows import tumbling_window_agg

    stream_dir = str(tmp_path_factory.mktemp("late_stream"))
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),  # nanos
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def ns(hour: float) -> int:
        return int((1704067200 + hour * 3600) * 1e9)  # 2024-01-01 + h

    import time as _time

    # f1: hours 0–0.9; f2: hours 10–10.9 (advances the watermark far
    # past f1's windows and closes+emits them); f3: one VERY late row
    # (00:03) + one on-time row. The late row's window was emitted two
    # commits ago — the watermark filter must drop it, not re-emit.
    early = [(i, ns(i * 0.1), 1, "click", 1.0, "{}") for i in range(10)]
    advance = [(100 + i, ns(10 + i * 0.1), 1, "click", 1.0, "{}") for i in range(10)]
    late_batch = [(999, ns(0.05), 1, "click", 1.0, "{}"),
                  (200, ns(11.0), 1, "click", 1.0, "{}")]
    for fname, rows in [("f1", early), ("f2", advance), ("f3", late_batch)]:
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{stream_dir}/{fname}.parquet"
        )
        _time.sleep(1.1)  # distinct mtimes → deterministic file order

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(stream_dir + "/*.parquet")
    )
    stream = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    out = tumbling_window_agg(stream, size="15 minutes", watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    first_window_rows = (
        spark.table("t_late")
        .filter(F.col("window_start") == "2024-01-01 00:00:00")
        .collect()
    )
    # exactly one emission for window 00:00, counting only the 3
    # on-time rows (00:00, 00:06, 00:12) — the late 00:03 row dropped
    assert len(first_window_rows) == 1
    assert first_window_rows[0].cnt == 3


def test_stateful_sessionizer_matches_session_window(spark, sf_dir):
    """The custom applyInPandasWithState sessionizer must agree with
    the built-in session_window() on every CLOSED session (the open
    tail session per user stays in state and is not emitted)."""
    from flink_tpcds_spark.streaming.stateful import stateful_session_counts
    from flink_tpcds_spark.streaming.windows import session_window_agg

    out = _run_to_memory(
        spark,
        stateful_session_counts(event_stream(spark, sf_dir)),
        "t_stateful",
        mode="append",
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.cnt)
        for r in out.collect()
    }
    batch = session_window_agg(load_table(spark, sf_dir, "events"))
    expected_all = {
        (r.user_id, r.session_start, r.session_end, r.cnt)
        for r in batch.collect()
    }
    # every emitted session is a real session
    assert got <= expected_all
    # and only the per-user tail sessions may be missing
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert len(got) >= len(expected_all) - n_users
    assert len(got) > 0


def test_streaming_dedup_keep_last(spark, sf_dir):
    """Keep-LAST dedup (update-mode changelog): the final emission per
    key must equal the batch dedup_last winner."""
    from flink_tpcds_spark.operators import dedup_last
    from flink_tpcds_spark.streaming.windows import streaming_dedup_keep_last

    out = _run_to_memory(
        spark,
        streaming_dedup_keep_last(event_stream(spark, sf_dir)),
        "t_keep_last",
        mode="update",
    )
    # update mode may emit a row per key per batch; the LAST emission
    # per key is the winner
    from pyspark.sql.window import Window as W

    latest = (
        out.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "event_type").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )
    got = {tuple(r) for r in latest.collect()}
    batch = load_table(spark, sf_dir, "events")
    expected = {
        (r.user_id, r.event_type, r.event_id)
        for r in dedup_last(
            batch, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")]
        ).select("user_id", "event_type", "event_id").collect()
    }
    assert got == expected


def test_update_mode_changelog_counts(spark, sf_dir):
    """§1.1 changelog/retraction analog: update output mode re-emits
    growing per-key aggregates; the final emission equals the batch
    total (upsert semantics — the reference's UpsertStreamTableSink)."""
    counts = (
        event_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = _run_to_memory(spark, counts, "t_update", mode="update")
    final = {
        r.event_type: r.cnt
        for r in out.groupBy("event_type").agg(F.max("cnt").alias("cnt")).collect()
    }
    batch = dict(
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .collect()
    )
    assert final == batch


def test_streaming_semi_join_matches_batch(spark, sf_dir):
    from flink_tpcds_spark.streaming import streaming_semi_join

    ev = event_stream(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    out = _run_to_memory(
        spark,
        streaming_semi_join(purchases, views),
        "t_semi",
        mode="append",
    )
    b = load_table(spark, sf_dir, "events")
    bl = b.filter(F.col("event_type") == "purchase").alias("l")
    br = b.filter(F.col("event_type") == "view").alias("r")
    expected = {
        r.event_id
        for r in bl.join(
            br,
            F.expr(
                "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 3600 "
                "SECONDS AND r.ts <= l.ts"
            ),
            "left_semi",
        ).collect()
    }
    got = {r.event_id for r in out.collect()}
    assert got == expected
    assert len(got) > 0


def test_streaming_anti_join_matches_batch(spark, sf_dir):
    from flink_tpcds_spark.streaming import streaming_anti_join

    ev = event_stream(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    out = _run_to_memory(
        spark,
        streaming_anti_join(purchases, views),
        "t_anti",
        mode="append",
    )
    b = load_table(spark, sf_dir, "events")
    bl = b.filter(F.col("event_type") == "purchase").alias("l")
    br = b.filter(F.col("event_type") == "view").alias("r")
    expected = {
        r.event_id
        for r in bl.join(
            br,
            F.expr(
                "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 3600 "
                "SECONDS AND r.ts <= l.ts"
            ),
            "left_anti",
        ).collect()
    }
    got = {r.event_id for r in out.collect()}
    # outer-join null-padded rows are only emitted once the watermark
    # proves no match can arrive; rows near end-of-stream stay pending.
    assert got <= expected
    assert len(got) >= len(expected) * 3 // 4
    assert len(got) > 0


def test_streaming_over_running_sum_matches_batch(spark, sf_dir):
    from pyspark.sql.window import Window

    from flink_tpcds_spark.streaming import streaming_over_running_sum

    out = _run_to_memory(
        spark,
        streaming_over_running_sum(event_stream(spark, sf_dir)),
        "t_over",
        mode="append",
    )
    b = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expected = {
        (r.user_id, r.event_id, r.running_cnt, round(r.running_sum, 6))
        for r in b.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).alias("running_cnt"),
            F.sum("value").over(w).alias("running_sum"),
        ).collect()
    }
    got = {
        (r.user_id, r.event_id, r.running_cnt, round(r.running_sum, 6))
        for r in out.collect()
    }
    assert got == expected


def test_event_time_sorted_releases_watermarked_prefix(spark, sf_dir):
    from flink_tpcds_spark.streaming import event_time_sorted

    out = _run_to_memory(
        spark,
        event_time_sorted(event_stream(spark, sf_dir), delay="10 minutes"),
        "t_evsort",
    )
    rows = out.collect()
    batch = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    wm = max(r.ts for r in batch) - __import__("datetime").timedelta(minutes=10)
    expected = {(r.user_id, r.ts, r.event_id) for r in batch if r.ts <= wm}
    got = {(r.user_id, r.ts, r.event_id) for r in rows}
    # every released row is exactly once, covers the full prefix at or
    # below the final watermark, and the inside-delay tail is retained
    assert len(rows) == len(got)
    assert got == expected
    assert len(batch) > len(rows) > 0
    # per-key release order is event-time order (append order per key)
    from collections import defaultdict

    seen = defaultdict(list)
    for r in rows:
        seen[r.user_id].append((r.ts, r.event_id))
    for ks in seen.values():
        assert ks == sorted(ks)


def test_windowed_update_mode_is_early_fire(spark, sf_dir):
    """Per-window early/late-fire trigger analog (reference
    runtime/operators/window/triggers/ — EarlyTriggers fire partial
    window results before close, late-fires refine within allowed
    lateness). In Structured Streaming the same contract is update
    output mode: every micro-batch emits the current value of every
    touched window — including windows the watermark has NOT closed,
    which append mode withholds — and re-emissions refine counts
    upward. The final refinement of every window equals the batch
    result."""
    upd = _run_to_memory(
        spark,
        tumbling_window_agg(event_stream(spark, sf_dir)),
        "t_early_fire",
        mode="update",
    )
    batch = {
        (r.window_start, r.event_type): r.cnt
        for r in tumbling_window_agg(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    latest = {
        (r.window_start, r.event_type): r.cnt
        for r in upd.groupBy("window_start", "event_type")
        .agg(F.max("cnt").alias("cnt"))
        .collect()
    }
    # early fire: every window appears (even ones never closed by the
    # final watermark), and its last refinement is the true total
    assert latest == batch




# ---------------------------------------------------------------------------
# Driver-dict changelog-contract MODELS (moved here from
# streaming/sinks.py in r8 — VERDICT r7 item 8): the package's
# ParquetUpsertSink / ParquetRetractSink are the 100 TB sinks; these
# dict-backed versions are the executable specification their
# snapshots/changelogs are checked against.
#
# NOT A USABLE SINK — reference model for the property tests only.
# Do not import from the package or resurrect as a production path:
# state lives in a driver dict (see _check_bound). The package holds
# zero driver-state streaming code by design (VERDICT r8).
# ---------------------------------------------------------------------------
import pandas as pd
from pyspark.sql import DataFrame


class UpsertSink:
    """Keyed last-write-wins materialization of an update-mode stream."""

    #: Driver-side key-cardinality bound (contract-demo posture; see
    #: module docstring). Override per-instance for bigger tests.
    DEFAULT_MAX_KEYS = 1_000_000

    def __init__(self, key_cols: list[str], max_keys: int | None = None):
        self.key_cols = key_cols
        self.max_keys = self.DEFAULT_MAX_KEYS if max_keys is None else max_keys
        self._rows: dict[tuple, tuple] = {}
        self.columns: list[str] | None = None

    def _check_bound(self) -> None:
        if len(self._rows) > self.max_keys:
            raise RuntimeError(
                f"{type(self).__name__} exceeded max_keys={self.max_keys}: "
                "this sink holds its keyed state driver-side (contract "
                "demo); route high-cardinality streams to an external "
                "keyed store instead."
            )

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        pdf = batch_df.toPandas()
        if self.columns is None:
            self.columns = list(pdf.columns)
        ki = [self.columns.index(k) for k in self.key_cols]
        for row in pdf.itertuples(index=False):
            self._rows[tuple(row[i] for i in ki)] = tuple(row)
        self._check_bound()

    def snapshot(self) -> pd.DataFrame:
        return pd.DataFrame(list(self._rows.values()), columns=self.columns)


class RetractSink(UpsertSink):
    """Changelog materialization: (+/-) operation per value change."""

    def __init__(self, key_cols: list[str], max_keys: int | None = None):
        super().__init__(key_cols, max_keys)
        self._log: list[tuple] = []

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        pdf = batch_df.toPandas()
        if self.columns is None:
            self.columns = list(pdf.columns)
        ki = [self.columns.index(k) for k in self.key_cols]
        for row in pdf.itertuples(index=False):
            row = tuple(row)
            key = tuple(row[i] for i in ki)
            old = self._rows.get(key)
            if old == row:
                continue
            if old is not None:
                self._log.append(("-", *old))  # retract the old value
            self._log.append(("+", *row))
            self._rows[key] = row
        self._check_bound()

    def changelog(self) -> pd.DataFrame:
        return pd.DataFrame(self._log, columns=["op", *self.columns])

    def replay(self) -> pd.DataFrame:
        """Fold the changelog; must equal ``snapshot()``."""
        state: dict[tuple, tuple] = {}
        ki = [self.columns.index(k) for k in self.key_cols]
        for op, *row in self._log:
            key = tuple(row[i] for i in ki)
            if op == "+":
                state[key] = tuple(row)
            elif state.get(key) == tuple(row):
                del state[key]
        return pd.DataFrame(list(state.values()), columns=self.columns)


def test_retract_and_upsert_sinks(spark, sf_dir, tmp_path):
    """RetractStreamTableSink / UpsertStreamTableSink contracts
    (reference flink-table-common sinks): the upsert snapshot equals
    the batch aggregate, the changelog contains real retractions
    (value updates across micro-batches), and replaying the changelog
    reproduces the snapshot exactly."""
    batch = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_files")
    batch.repartition(4).write.parquet(src)
    agg = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sink = RetractSink(["event_type"])
    q = (
        agg.writeStream.foreachBatch(sink.foreach_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    expected = {
        (r.event_type, r.cnt)
        for r in batch.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    snap = {tuple(r) for r in sink.snapshot().itertuples(index=False)}
    assert snap == expected
    log = sink.changelog()
    assert (log.op == "-").sum() > 0  # counts grew across batches
    replay = {tuple(r) for r in sink.replay().itertuples(index=False)}
    assert replay == snap


def test_sink_max_keys_guard():
    """The driver-side sink state is explicitly bounded: exceeding
    max_keys raises instead of silently growing (scale ledger —
    these sinks are changelog-contract demos, not 100 TB sinks)."""
    sink = UpsertSink(["k"], max_keys=10)
    small = pd.DataFrame({"k": range(10), "v": range(10)})
    big = pd.DataFrame({"k": range(20), "v": range(20)})

    class _FakeBatch:
        def __init__(self, pdf):
            self._pdf = pdf

        def toPandas(self):
            return self._pdf

    sink.foreach_batch(_FakeBatch(small), 0)  # at the bound: fine
    with pytest.raises(RuntimeError, match="max_keys"):
        sink.foreach_batch(_FakeBatch(big), 1)


def test_parquet_upsert_sink_distributed(spark, sf_dir, tmp_path):
    """ParquetUpsertSink: the distributed upsert contract — snapshot
    equals the batch aggregate (last-write-wins over batch ids),
    survives log compaction, and later batches still win after
    compaction. No driver-side state anywhere."""
    from flink_tpcds_spark.streaming.sinks import ParquetUpsertSink

    batch = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "pu_src")
    batch.repartition(4).write.parquet(src)
    agg = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sink = ParquetUpsertSink(str(tmp_path / "pu_log"), ["event_type"])
    q = (
        agg.writeStream.foreachBatch(sink.foreach_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    expected = {
        (r.event_type, r.cnt)
        for r in batch.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    snap = {tuple(r) for r in sink.snapshot(spark).collect()}
    assert snap == expected
    # the changelog holds real history (more rows than keys)
    n_log = sink.changelog(spark).count()
    assert n_log > len(expected)

    # compaction: history shrinks to exactly the snapshot…
    sink.compact(spark)
    assert sink.changelog(spark).count() == len(expected)
    assert {tuple(r) for r in sink.snapshot(spark).collect()} == expected
    # …and a later batch still wins over compacted rows
    some_key = next(iter(expected))[0]
    late = spark.createDataFrame(
        [(some_key, 10_000)], "event_type string, cnt bigint"
    )
    sink.foreach_batch(late, batch_id=999)
    snap2 = dict(sink.snapshot(spark).collect())
    assert snap2[some_key] == 10_000


def test_streaming_neardup_matches_batch(spark, sf_dir, tmp_path):
    """Replaying the corpus through the streaming near-dup index (3
    micro-batches) must detect exactly the batch operator's pair set
    — cross-batch pairs via the parquet index, intra-batch pairs via
    the self-join — with identical exact-Jaccard values."""
    from flink_tpcds_spark.datapipe.dedup import (
        minhash_near_dup_pairs,
        release_caches,
    )
    from flink_tpcds_spark.streaming.neardup import StreamingNearDupIndex

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    cut1, cut2 = n // 3, 2 * n // 3
    idx = StreamingNearDupIndex(str(tmp_path / "nd_index"))
    for lo, hi, bid in ((0, cut1, 0), (cut1, cut2, 1), (cut2, n, 2)):
        chunk = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        idx.foreach_batch(chunk, bid)
    got = {
        (r.id_a, r.id_b): r.jaccard for r in idx.pairs(spark).collect()
    }
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_dup_pairs(docs, threshold=0.8).collect()
    }
    release_caches()
    assert got.keys() == want.keys() and len(got) > 0
    for k, j in want.items():
        assert abs(got[k] - j) < 1e-12


def test_streaming_neardup_via_file_stream(spark, sf_dir, tmp_path):
    """The index driven by a real file-source stream (availableNow,
    one file per trigger) finds the same pairs as one big batch."""
    from flink_tpcds_spark.datapipe.dedup import (
        minhash_near_dup_pairs,
        release_caches,
    )
    from flink_tpcds_spark.streaming.neardup import StreamingNearDupIndex

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "nd_src")
    docs.repartition(3).write.parquet(src)
    idx = StreamingNearDupIndex(str(tmp_path / "nd_idx2"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(idx.foreach_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.id_a, r.id_b) for r in idx.pairs(spark).collect()}
    want = {
        (r.id_a, r.id_b)
        for r in minhash_near_dup_pairs(docs, threshold=0.8).collect()
    }
    release_caches()
    assert got == want and len(got) > 0


def test_streaming_curation_maps_match_batch(spark, sf_dir, tmp_path):
    """The stateless curation maps (PII scrub, quality classifier)
    are the same code path streaming and batch — run them over a real
    file-source stream and require EXACT equality with the batch
    result (stateless ops emit every row regardless of watermark)."""
    from flink_tpcds_spark.datapipe.text import quality_classifier, scrub_pii

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "cur_src")
    docs.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    def curate(df):
        return quality_classifier(scrub_pii(df)).select(
            "doc_id", "pii_n_emails", "clf_score", "clf_keep"
        )

    q = (
        curate(stream)
        .writeStream.format("memory")
        .queryName("t_curation")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    s = {tuple(r) for r in spark.table("t_curation").collect()}
    b = {tuple(r) for r in curate(docs).collect()}
    assert s == b and len(s) == docs.count()


def test_streaming_bpe_encode_matches_batch(spark, sf_dir, tmp_path):
    """The tokenizer encode is a stateless Arrow map (mapInPandas is
    trigger-agnostic): over a real file-source stream it must emit
    exactly the batch result — tokenize slots into a streaming ingest
    pipeline with no code change."""
    from flink_tpcds_spark.datapipe.curate import bpe_encode
    from flink_tpcds_spark.queries.datapipe import _BPE_MERGES

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "bpe_src")
    docs.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        bpe_encode(stream, _BPE_MERGES)
        .writeStream.format("memory")
        .queryName("t_bpe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    s = {tuple(r) for r in spark.table("t_bpe").collect()}
    b = {tuple(r) for r in bpe_encode(docs, _BPE_MERGES).collect()}
    assert s == b and len(s) == docs.count()


def test_streaming_incremental_rollup_matches_batch(spark, sf_dir, tmp_path):
    """IncrementalAggState driven by a real file-source stream (one
    file per trigger) must equal the single-pass batch aggregation —
    the same state-merge algebra serving both execution modes."""
    from flink_tpcds_spark.sources.incremental import IncrementalAggState

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    src = str(tmp_path / "inc_src")
    e.repartition(4).write.parquet(src)
    state = IncrementalAggState(
        str(tmp_path / "inc_state"), ["event_type"], "value"
    )
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(state.foreach_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_type: (r.cnt, r.total)
        for r in state.result(spark).collect()
    }
    want = {
        r.event_type: (r.cnt, r.total)
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    }
    assert got == want


def test_parquet_upsert_sink_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the SAME batch_id
    (post-write/pre-checkpoint failure replay) must overwrite the
    batch's partition, not append a second delta — changelog row
    count and snapshot are unchanged."""
    from flink_tpcds_spark.streaming.sinks import ParquetUpsertSink

    sink = ParquetUpsertSink(str(tmp_path / "log"), ["k"])
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    b1 = spark.createDataFrame([("a", 3)], "k string, v long")
    sink.foreach_batch(b0, batch_id=0)
    sink.foreach_batch(b1, batch_id=1)
    assert sink.changelog(spark).count() == 3
    snap = {tuple(r) for r in sink.snapshot(spark).collect()}
    assert snap == {("a", 3), ("b", 2)}

    # replay batch 1 (identical content) — nothing may change
    sink.foreach_batch(b1, batch_id=1)
    assert sink.changelog(spark).count() == 3
    assert {tuple(r) for r in sink.snapshot(spark).collect()} == snap


def test_parquet_upsert_sink_compact_crash_recovery(spark, tmp_path):
    """A crash between compact()'s two renames (log at .old, nothing
    live) must heal on the next read: _recover restores the backup
    and the snapshot is intact. A stale .old next to a live log is
    removed."""
    import os
    import shutil

    from flink_tpcds_spark.streaming.sinks import ParquetUpsertSink

    path = str(tmp_path / "log")
    sink = ParquetUpsertSink(path, ["k"])
    sink.foreach_batch(
        spark.createDataFrame([("a", 1)], "k string, v long"), 0
    )
    sink.foreach_batch(
        spark.createDataFrame([("a", 2), ("b", 5)], "k string, v long"), 1
    )
    # simulate the crash window: live log moved aside, promote lost
    shutil.move(path, path + ".old")
    assert not os.path.isdir(path)
    snap = {tuple(r) for r in sink.snapshot(spark).collect()}
    assert snap == {("a", 2), ("b", 5)}
    assert os.path.isdir(path) and not os.path.isdir(path + ".old")

    # stale backup beside a live log (crash after promote) is cleaned
    shutil.copytree(path, path + ".old")
    sink.foreach_batch(
        spark.createDataFrame([("b", 9)], "k string, v long"), 2
    )
    assert not os.path.isdir(path + ".old")
    assert dict(sink.snapshot(spark).collect())["b"] == 9

    # and compact() itself still round-trips with the backup dance
    sink.compact(spark)
    assert sink.changelog(spark).count() == 2
    assert not os.path.isdir(path + ".old")
    assert dict(sink.snapshot(spark).collect()) == {"a": 2, "b": 9}


def test_incremental_state_orphaned_backup_restored(spark, tmp_path):
    """ADVICE r6: a crash between IncrementalAggState.update's two
    renames leaves only the .old backup; the next update must restore
    it and merge on top of FULL history — not treat the new batch as
    the whole state."""
    import os
    import shutil

    from flink_tpcds_spark.sources.incremental import IncrementalAggState

    path = str(tmp_path / "state")
    state = IncrementalAggState(path, ["k"], "v")
    state.update(
        spark, spark.createDataFrame([("a", 1.0), ("a", 2.0)], "k string, v double")
    )
    # crash window: state moved to backup, promote never happened
    shutil.move(path, path + ".old")
    state.update(spark, spark.createDataFrame([("a", 4.0)], "k string, v double"))
    row = state.result(spark).collect()[0]
    assert (row.k, row.cnt, row.total) == ("a", 3, 7.0)
    assert not os.path.isdir(path + ".old")


def test_parquet_upsert_sink_orphaned_compacting_dir_cleaned(
    spark, tmp_path
):
    """VERDICT r7: a crash after compact()'s temp write but before
    the swap leaves ``path.compacting`` on disk; _recover must remove
    it (it is never the source of truth) so a sink that never
    compacts again doesn't leak a snapshot's worth of storage."""
    import os

    from flink_tpcds_spark.streaming.sinks import ParquetUpsertSink

    path = str(tmp_path / "log")
    sink = ParquetUpsertSink(path, ["k"])
    sink.foreach_batch(
        spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long"), 0
    )
    # simulate the crash window: temp snapshot written, swap lost
    orphan = path + ".compacting"
    os.makedirs(os.path.join(orphan, f"{sink.BATCH_COL}=0"))
    with open(os.path.join(orphan, "part-junk.parquet"), "wb") as f:
        f.write(b"x")
    snap = {tuple(r) for r in sink.snapshot(spark).collect()}
    assert snap == {("a", 1), ("b", 2)}
    assert not os.path.isdir(orphan)
    # a later real compact() is unaffected
    sink.foreach_batch(
        spark.createDataFrame([("a", 7)], "k string, v long"), 1
    )
    sink.compact(spark)
    assert not os.path.isdir(orphan)
    assert dict(sink.snapshot(spark).collect()) == {"a": 7, "b": 2}


def test_parquet_upsert_sink_within_batch_tie_deterministic(
    spark, tmp_path
):
    """VERDICT r7: the contract is one row per key per batch, but a
    contract-violating caller must still get a DETERMINISTIC winner —
    snapshot() ties break on xxhash64 of the value columns, so
    repeated snapshots (and compact-then-snapshot) agree."""
    from flink_tpcds_spark.streaming.sinks import ParquetUpsertSink

    path = str(tmp_path / "log")
    sink = ParquetUpsertSink(path, ["k"])
    # one batch carrying THREE rows for the same key, shuffled layout
    dup = spark.createDataFrame(
        [("a", 10), ("a", 30), ("a", 20), ("b", 1)], "k string, v long"
    ).repartition(4)
    sink.foreach_batch(dup, 0)
    first = {tuple(r) for r in sink.snapshot(spark).collect()}
    for _ in range(3):
        assert {
            tuple(r) for r in sink.snapshot(spark).collect()
        } == first
    # compacting keeps the same winner
    sink.compact(spark)
    assert {tuple(r) for r in sink.snapshot(spark).collect()} == first


def test_incremental_state_replay_idempotent(spark, tmp_path):
    """ADVICE r7: foreachBatch is at-least-once and a +-merge is not
    idempotent — replaying the same batch_id (post-promote/
    pre-checkpoint crash) must be a no-op, not a double-count. The
    last applied id lives INSIDE the state dir so it promotes
    atomically with the state."""
    from flink_tpcds_spark.sources.incremental import IncrementalAggState

    path = str(tmp_path / "state")
    state = IncrementalAggState(path, ["k"], "v")
    b0 = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "k string, v double")
    b1 = spark.createDataFrame([("a", 4.0)], "k string, v double")
    state.foreach_batch(b0, 0)
    state.foreach_batch(b1, 1)
    row = state.result(spark).collect()[0]
    assert (row.k, row.cnt, row.total) == ("a", 3, 7.0)

    # replay the last batch — must be skipped
    state.foreach_batch(b1, 1)
    row = state.result(spark).collect()[0]
    assert (row.k, row.cnt, row.total) == ("a", 3, 7.0)

    # an out-of-order stale id is also skipped; a NEW id applies
    state.foreach_batch(b0, 0)
    state.foreach_batch(
        spark.createDataFrame([("a", 10.0)], "k string, v double"), 2
    )
    row = state.result(spark).collect()[0]
    assert (row.k, row.cnt, row.total) == ("a", 4, 17.0)


def test_parquet_retract_sink_matches_dict_model(spark, sf_dir, tmp_path):
    """ParquetRetractSink (r8): the distributed (+/-) changelog must
    agree with the driver-dict RetractSink model on the same stream —
    identical snapshot, identical op multiset — and folding the log
    (replay) must reproduce the snapshot exactly."""
    from flink_tpcds_spark.streaming.sinks import ParquetRetractSink

    batch = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "pr_src")
    batch.repartition(4).write.parquet(src)

    def agg_stream():
        return (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )

    model = RetractSink(["event_type"])
    psink = ParquetRetractSink(str(tmp_path / "pr_log"), ["event_type"])

    def both(bdf, bid):
        model.foreach_batch(bdf, bid)
        psink.foreach_batch(bdf, bid)

    q = (
        agg_stream()
        .writeStream.foreachBatch(both)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    snap_p = {tuple(r) for r in psink.snapshot(spark).select("event_type", "cnt").collect()}
    snap_m = {
        (r.event_type, r.cnt)
        for r in model.snapshot().itertuples(index=False)
    }
    assert snap_p == snap_m
    # real retractions happened (counts grew across batches)
    ops_p = sorted(
        (r.op, r.event_type, r.cnt)
        for r in psink.changelog(spark).collect()
    )
    ops_m = sorted(
        (r.op, r.event_type, r.cnt)
        for r in model.changelog().itertuples(index=False)
    )
    assert ops_p == ops_m
    assert any(o[0] == "-" for o in ops_p)
    # distributed fold == snapshot
    replay = {tuple(r) for r in psink.replay(spark).select("event_type", "cnt").collect()}
    assert replay == snap_p


def test_parquet_retract_sink_replay_idempotent_and_recovers(spark, tmp_path):
    """A replayed batch_id must be skipped whole (the diff was
    computed against the pre-batch state — re-diffing after the state
    advanced would corrupt the ops partition), and a crash between
    the state swap's renames heals on the next batch."""
    import os
    import shutil

    from flink_tpcds_spark.streaming.sinks import ParquetRetractSink

    sink = ParquetRetractSink(str(tmp_path / "rs"), ["k"])
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    b1 = spark.createDataFrame([("a", 5)], "k string, v long")
    sink.foreach_batch(b0, 0)
    sink.foreach_batch(b1, 1)
    snap = {tuple(r) for r in sink.snapshot(spark).collect()}
    assert snap == {("a", 5), ("b", 2)}
    n_ops = sink.changelog(spark).count()  # +a1 +b2 -a1 +a5 = 4
    assert n_ops == 4

    # replay batch 1: must be a no-op (state AND log unchanged)
    sink.foreach_batch(b1, 1)
    assert {tuple(r) for r in sink.snapshot(spark).collect()} == snap
    assert sink.changelog(spark).count() == n_ops

    # crash window: state at .old only — next batch must heal first
    shutil.move(sink.state_dir, sink.state_dir + ".old")
    sink.foreach_batch(
        spark.createDataFrame([("b", 9)], "k string, v long"), 2
    )
    assert {tuple(r) for r in sink.snapshot(spark).collect()} == {
        ("a", 5),
        ("b", 9),
    }
    assert not os.path.isdir(sink.state_dir + ".old")
    # fold still reproduces the healed state
    assert {
        tuple(r) for r in sink.replay(spark).collect()
    } == {("a", 5), ("b", 9)}


# ---------------------------------------------------------------------------
# Streaming heavy hitters (streaming/freqitems.py)
# ---------------------------------------------------------------------------
def test_streaming_frequent_items_bounds_and_replay(spark, tmp_path):
    """The micro-batch-accumulated MG summary keeps the documented
    bound true − n/(k+1) − n/(cap+1) ≤ est ≤ true over a skewed
    multi-batch stream; a replayed batch_id is a no-op (at-least-once
    foreachBatch contract)."""
    from flink_tpcds_spark.streaming.freqitems import StreamingFrequentItems

    st = StreamingFrequentItems(str(tmp_path / "hh_state"), "item", k=16)
    # 3 batches, 6000 rows each: "hot" in all batches, one rotating
    # mid item per batch, a distinct tail per batch
    batches = []
    for b in range(3):
        rows = (
            [("hot",)] * 2000
            + [(f"mid_{b}",)] * 1000
            + [(f"tail_{b}_{j}",) for j in range(3000)]
        )
        batches.append(spark.createDataFrame(rows, "item string").repartition(7))
    for b, df in enumerate(batches):
        st.foreach_batch(df, b)
    st.foreach_batch(batches[1], 1)  # replay — must be skipped
    n = st.total_rows()
    assert n == 18_000  # replay did not double-count
    sk = {r.item: r.est for r in st.result(spark).collect()}
    true = {"hot": 6000, "mid_0": 1000, "mid_1": 1000, "mid_2": 1000}
    err = n // 17 + n // 129 + 2  # n/(k+1) + n/(cap+1), cap = 8k
    for item, est in sk.items():
        t = true.get(item, 1)
        assert est <= t, (item, est, t)
    for item, t in true.items():
        assert t - sk.get(item, 0) <= err, (item, t, sk.get(item))
    # hot is a guaranteed hitter: 6000 > 18000/17 + 18000/129 ≈ 1198
    assert "hot" in sk
    assert len(sk) <= st.cap


def test_streaming_frequent_items_matches_batch_bound(spark, tmp_path):
    """Stream accumulation and the one-shot batch sketch over the
    concatenated input certify the SAME heavy-hitter set for items
    above the streaming threshold (batch-equivalence in the bound,
    not in raw counters — summaries are layout-dependent)."""
    from flink_tpcds_spark.operators.sketch import frequent_items_sketch
    from flink_tpcds_spark.streaming.freqitems import StreamingFrequentItems

    rows = [(f"w{i % 40}",) for i in range(8000)] + [("mega",)] * 4000
    full = spark.createDataFrame(rows, "item string").repartition(5)
    st = StreamingFrequentItems(str(tmp_path / "hh_eq"), "item", k=16)
    thirds = full.randomSplit([1.0, 1.0, 1.0], seed=7)
    for b, part in enumerate(thirds):
        st.foreach_batch(part, b)
    n = st.total_rows()
    assert n == 12_000
    stream_sk = {r.item: r.est for r in st.result(spark).collect()}
    batch_sk = {
        r.item: r.est
        for r in frequent_items_sketch(full, "item", k=16).collect()
    }
    # every item above the stream threshold must be in BOTH summaries
    thr = n // 17 + n // 129 + 2
    for item in ("mega",):
        assert item in stream_sk and item in batch_sk
        assert 4000 - thr <= stream_sk[item] <= 4000
        assert 4000 - thr <= batch_sk[item] <= 4000


def test_retract_sink_null_values_and_keys_only(spark, tmp_path):
    """Round-8 review fix: presence in the state diff is tracked with
    explicit markers, not value-column NULLness — a (k,5)→(k,NULL)
    update must emit the (-,5)/(+,NULL) pair and keep
    replay == snapshot; a keys-only table works as set membership."""
    from flink_tpcds_spark.streaming.sinks import ParquetRetractSink

    sink = ParquetRetractSink(str(tmp_path / "rn"), ["k"])
    b0 = spark.createDataFrame([(1, 5.0), (2, 7.0)], "k long, v double")
    b1 = spark.createDataFrame(
        [(1, None), (3, 9.0)], "k long, v double"
    )
    sink.foreach_batch(b0, 0)
    sink.foreach_batch(b1, 1)
    snap = sorted((r.k, r.v) for r in sink.snapshot(spark).collect())
    assert snap == [(1, None), (2, 7.0), (3, 9.0)]
    rep = sorted((r.k, r.v) for r in sink.replay(spark).collect())
    assert rep == snap, "replay must equal snapshot with NULL values"
    log = sink.changelog(spark)
    minus_1 = [
        (r.k, r.v)
        for r in log.filter("op = '-' and __batch_id = 1").collect()
    ]
    assert minus_1 == [(1, 5.0)], "the old value must be retracted"

    ksink = ParquetRetractSink(str(tmp_path / "rk"), ["k"])
    ksink.foreach_batch(spark.createDataFrame([(1,), (2,)], "k long"), 0)
    ksink.foreach_batch(spark.createDataFrame([(2,), (3,)], "k long"), 1)
    assert sorted(r.k for r in ksink.snapshot(spark).collect()) == [1, 2, 3]


def test_docgen_stream_reader_offsets_and_restart(spark, tmp_path):
    """Offset-based streaming source contract (the Kafka model):
    micro-batches advance a monotone offset, ranges are split into
    shard tasks, and a CHECKPOINT RESTART resumes from the committed
    offset with exactly-once delivery — the union of both runs is
    exactly the id range, no duplicates, and rows are byte-identical
    to the batch source for the same ids."""
    import time as _t

    from flink_tpcds_spark.sources.docgen import DocGenDataSource

    spark.dataSource.register(DocGenDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    progress = str(tmp_path / "progress")

    def run(cap, want_total):
        q = (
            spark.readStream.format("docgen")
            .option("docs_per_batch", 40)
            .option("n_docs", cap)
            .option("n_shards", 3)
            .option("progress_path", progress)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = _t.time() + 120
            while _t.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= want_total:
                        break
                except Exception:
                    pass
                _t.sleep(0.5)
        finally:
            q.stop()

    run(cap=120, want_total=120)
    got1 = spark.read.parquet(out)
    assert got1.count() == 120
    # restart from the checkpoint with a higher cap: the source must
    # resume at the committed offset, not re-emit 0..119
    run(cap=200, want_total=200)
    got = spark.read.parquet(out)
    ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    assert ids == list(range(200)), "exactly-once across restart"
    # rows must equal the batch source for the same range (replayable
    # determinism — what Kafka's log provides, the generator derives)
    batch = spark.read.format("docgen").option("n_docs", 200).load()
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_retract_sink_random_batches_match_model():
    """Property test: ParquetRetractSink against a dict reference
    model over RANDOM batch sequences — random keys, values
    (including NULLs), per-batch key subsets, and random batch_id
    REPLAYS. After every sequence: snapshot == model, replay(log) ==
    snapshot, and net ops per key reconcile to the model."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_tpcds_spark.session import get_spark
    from flink_tpcds_spark.streaming.sinks import ParquetRetractSink

    spark = get_spark("retract-prop")

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(  # batches: each a dict key -> value-or-None
            st.dictionaries(
                st.integers(0, 4),
                st.one_of(st.none(), st.integers(-9, 9)),
                min_size=1,
                max_size=4,
            ),
            min_size=1,
            max_size=4,
        ),
        st.booleans(),  # replay the middle batch?
    )
    def check(batches, with_replay):
        import shutil
        import tempfile

        work = tempfile.mkdtemp(prefix="retract_prop_")
        try:
            sink = ParquetRetractSink(work, ["k"])
            model: dict[int, int | None] = {}
            for b, batch in enumerate(batches):
                df = spark.createDataFrame(
                    list(batch.items()), "k long, v long"
                )
                sink.foreach_batch(df, b)
                model.update(batch)
                if with_replay and b == len(batches) // 2:
                    poisoned = spark.createDataFrame(
                        [(k, 99) for k in batch], "k long, v long"
                    )
                    sink.foreach_batch(poisoned, b)  # must be skipped
            snap = {r.k: r.v for r in sink.snapshot(spark).collect()}
            assert snap == model, (batches, snap, model)
            rep = {r.k: r.v for r in sink.replay(spark).collect()}
            assert rep == model, (batches, rep, model)
            # op algebra: per key, (+) count - (-) count == 1 iff live
            log = sink.changelog(spark).collect()
            for k in model:
                plus = sum(1 for r in log if r.k == k and r.op == "+")
                minus = sum(1 for r in log if r.k == k and r.op == "-")
                assert plus - minus == 1, (k, plus, minus)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    check()


def test_cdc_apply_random_change_sequences_match_model():
    """Property test: CdcApply vs a dict model over random per-key
    change sequences (upserts, delete tombstones, delete-then-recreate)
    delivered in order across batches, with one batch replayed."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_tpcds_spark.session import get_spark
    from flink_tpcds_spark.streaming.cdc import CdcApply

    spark = get_spark("cdc-prop")

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(  # batches of (key, op, value); seq gives the order
            st.lists(
                st.tuples(
                    st.integers(0, 3),
                    st.sampled_from(["u", "u", "d"]),
                    st.integers(0, 9),
                ),
                min_size=1,
                max_size=5,
            ),
            min_size=1,
            max_size=3,
        ),
        st.integers(0, 2),
    )
    def check(batches, replay_at):
        import os
        import shutil
        import tempfile

        work = tempfile.mkdtemp(prefix="cdc_prop_")
        try:
            # SAME change sequence through both state layouts — the
            # bucketed (partition-pruned) fold must be logically
            # invisible vs the plain full-rewrite fold
            cdcs = [
                CdcApply(
                    os.path.join(work, "t"), ["k"], order_cols=["seq"]
                ),
                CdcApply(
                    os.path.join(work, "tb"),
                    ["k"],
                    order_cols=["seq"],
                    n_buckets=4,
                ),
            ]
            model: dict[int, tuple[int, int]] = {}
            seq = 0
            for bi, changes in enumerate(batches):
                rows = []
                for k, op, v in changes:
                    rows.append((k, seq, v, op))
                    if op == "d":
                        model.pop(k, None)
                    else:
                        model[k] = (seq, v)
                    seq += 1
                bdf = spark.createDataFrame(
                    rows, "k long, seq long, v long, op string"
                )
                for cdc in cdcs:
                    cdc.foreach_batch(bdf, bi)
                    if bi == replay_at % len(batches):
                        cdc.foreach_batch(bdf, bi)  # at-least-once
            for cdc in cdcs:
                got = {
                    r.k: (r.seq, r.v) for r in cdc.table(spark).collect()
                }
                assert got == model, cdc.path
        finally:
            shutil.rmtree(work, ignore_errors=True)

    check()


# ---------------------------------------------------------------------------
# streaming pivot (streaming/pivot.py)
# ---------------------------------------------------------------------------
def test_streaming_pivot_matches_batch_pivot(spark):
    """The conditional-aggregate lowering equals batch pivot() with an
    explicit values list — counts and totals per declared category;
    undeclared categories contribute to no column."""
    from pyspark.sql import functions as F

    from flink_tpcds_spark.streaming.pivot import streaming_pivot

    rows = [
        (1, "a", 1.5),
        (1, "b", 2.0),
        (1, "zzz", 99.0),  # undeclared
        (2, "a", 3.25),
        (2, "a", 0.75),
    ]
    df = spark.createDataFrame(rows, "k int, cat string, v double")
    got = {
        r.k: r
        for r in streaming_pivot(df, ["k"], "cat", ["a", "b"], "v").collect()
    }
    assert got[1].a_cnt == 1 and got[1].a_total == 1.5
    assert got[1].b_cnt == 1 and got[1].b_total == 2.0
    assert got[2].a_cnt == 2 and got[2].a_total == 4.0
    assert got[2].b_cnt == 0 and got[2].b_total is None
    # batch pivot with the same explicit category list agrees on counts
    batch = {
        r.k: r
        for r in df.groupBy("k")
        .pivot("cat", ["a", "b"])
        .agg(F.count("v"))
        .collect()
    }
    assert (batch[1].a, batch[1].b) == (got[1].a_cnt, got[1].b_cnt)
    assert (batch[2].a, batch[2].b or 0) == (got[2].a_cnt, got[2].b_cnt)


def test_vacuum_retention_preserves_window(spark, tmp_path):
    """vacuum(retain=2) on a 5-batch changelog: storage collapses to
    3 partitions; the current snapshot and every as_of INSIDE the
    window are unchanged; as_of at/before the cutoff resolves to the
    cutoff snapshot; a second vacuum is a no-op."""
    from pyspark.sql import functions as F  # noqa: F401

    from flink_tpcds_spark.streaming.sinks import ParquetUpsertSink

    sink = ParquetUpsertSink(str(tmp_path / "log"), ["k"])
    for b in range(5):
        df = spark.createDataFrame(
            [(k, b * 10 + k) for k in range(b + 1)], "k int, v long"
        )
        sink.foreach_batch(df, b)
    before_cur = sorted(map(tuple, sink.snapshot(spark).collect()))
    before_v3 = sorted(
        map(tuple, sink.snapshot(spark, as_of_batch=3).collect())
    )
    man = sink.vacuum(spark, retain_batches=2)
    assert man == {
        "expired_partitions": 2,
        "cutoff": 2,
        "partitions": 3,
    }
    assert sorted(map(tuple, sink.snapshot(spark).collect())) == before_cur
    assert (
        sorted(map(tuple, sink.snapshot(spark, as_of_batch=3).collect()))
        == before_v3
    )
    # the cutoff version is the oldest answerable one; anything
    # older raises (the expired-version contract, never silent-empty)
    assert len(sink.snapshot(spark, as_of_batch=2).collect()) == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="expired"):
        sink.snapshot(spark, as_of_batch=0)
    # idempotent below the threshold
    assert sink.vacuum(spark, retain_batches=2)["expired_partitions"] == 0


def test_scd2_incremental_equals_batch_and_replay_idempotent(spark, tmp_path):
    """Scd2State over 3 in-order batches (keys spanning batches, keys
    with several versions INSIDE one batch, keys appearing once) must
    equal the one-shot lead() build; replaying a batch changes
    nothing."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from flink_tpcds_spark.streaming.scd2 import Scd2State

    t0 = dt.datetime(2026, 1, 1)
    t = lambda i: t0 + dt.timedelta(minutes=i)  # noqa: E731
    batches = [
        [(1, 100, t(0), "a"), (1, 101, t(5), "b"), (2, 200, t(1), "x")],
        [(1, 102, t(10), "c"), (3, 300, t(11), "y")],
        [(2, 201, t(20), "z"), (3, 301, t(21), "y2"), (3, 302, t(22), "y3")],
    ]
    schema = "user_id long, event_id long, ts timestamp, event_type string"
    state = Scd2State(str(tmp_path / "dim"))
    for i, rows in enumerate(batches):
        state.update(spark, spark.createDataFrame(rows, schema), i)
    # replay of batch 1 must be a no-op
    state.update(spark, spark.createDataFrame(batches[1], schema), 1)

    got = sorted(
        map(tuple, state.result(spark).collect()), key=lambda r: (r[0], r[3])
    )
    all_rows = spark.createDataFrame(
        [r for b in batches for r in b], schema
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    want = sorted(
        map(
            tuple,
            all_rows.withColumn("valid_to", F.lead("ts").over(w))
            .select(
                "user_id",
                "event_id",
                "event_type",
                F.col("ts").alias("valid_from"),
                "valid_to",
                F.col("valid_to").isNull().alias("is_current"),
            )
            .collect(),
        ),
        key=lambda r: (r[0], r[3]),
    )
    assert got == want
    # exactly one open row per key
    opens = [r for r in got if r[5]]
    assert sorted(r[0] for r in opens) == [1, 2, 3]


def test_streaming_topn_retract_demotion_changelog(spark, tmp_path):
    """streaming_top_k_retract (reference RetractableTopNFunction):
    an update that demotes a row OUT of the top-k must emit the
    (-old, +new) pair at the vacated rank and nothing for untouched
    ranks; replay() must fold back to the snapshot."""
    import os

    from flink_tpcds_spark.streaming.topn import streaming_top_k_retract

    src = str(tmp_path / "in")
    os.makedirs(src)
    b0 = [(1, 10.0), (2, 8.0), (3, 6.0), (4, 1.0)]
    b1 = [(1, 2.0), (4, 9.0)]  # demote key 1 out of top-2; promote 4
    schema = "user_id long, total_value double"
    spark.createDataFrame(b0, schema).coalesce(1).write.parquet(
        os.path.join(src, "b0")
    )
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q, totals, ranks = streaming_top_k_retract(
        stream, str(tmp_path / "sink"), k=2
    )
    assert q.awaitTermination(120), "stream did not finish"

    # final folded totals: 1->2, 2->8, 3->6, 4->9 ⇒ top2 = [(4,9),(2,8)]
    snap = {
        (r.rn, r.user_id, r.total_value)
        for r in ranks.snapshot(spark).collect()
    }
    assert snap == {(1, 4, 9.0), (2, 2, 8.0)}

    log = ranks.changelog(spark).collect()
    by_batch = {}
    for r in log:
        by_batch.setdefault(r["__batch_id"], set()).add(
            (r.op, r.rn, r.user_id, r.total_value)
        )
    # batch 0: pure inserts of the initial top-2 [(1,10),(2,8)]
    assert by_batch[0] == {("+", 1, 1, 10.0), ("+", 2, 2, 8.0)}
    # batch 1: rank 1's occupant changed (1 demoted, 4 entered) →
    # exactly one (-,+) pair; rank 2 (key 2) untouched → silent
    assert by_batch[1] == {("-", 1, 1, 10.0), ("+", 1, 4, 9.0)}

    # retract-changelog contract: folding the log == the snapshot
    replayed = {
        (r.rn, r.user_id, r.total_value)
        for r in ranks.replay(spark).collect()
    }
    assert replayed == snap

    # totals state folded keep-last
    tot = {
        (r.user_id, r.total_value)
        for r in totals.snapshot(spark).collect()
    }
    assert tot == {(1, 2.0), (2, 8.0), (3, 6.0), (4, 9.0)}


def test_streaming_topn_retract_registry_certifies(
    spark, sf_dir, oracle_con
):
    from flink_tpcds_spark.oracle import certify
    from flink_tpcds_spark.queries.streaming_inv import ORACLES, QUERIES

    df = QUERIES["st_topn_retract"](spark, sf_dir)
    for res in certify(
        "st_topn_retract", df, oracle_con, ORACLES["st_topn_retract"]
    ):
        assert res.ok, res.detail


def test_streaming_topn_retract_delete_tombstone(spark, tmp_path):
    """Delete-record path (RetractableTopNFunction.java:52 — input is
    acc/delete/retract): a NULL-value tombstone evicts the key from
    the ranking, its rank's next occupant emits the (-,+) pair, and a
    later update re-inserts the key."""
    import os

    from flink_tpcds_spark.streaming.topn import streaming_top_k_retract

    src = str(tmp_path / "in")
    os.makedirs(src)
    schema = "user_id long, total_value double"
    batches = [
        [(1, 10.0), (2, 8.0), (3, 6.0)],
        [(1, None)],            # delete the rank-1 key
        [(1, 7.0)],             # re-insert between 2 and 3
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q, totals, ranks = streaming_top_k_retract(
        stream, str(tmp_path / "sink"), k=2
    )
    assert q.awaitTermination(120), "stream did not finish"

    by_batch = {}
    for r in ranks.changelog(spark).collect():
        by_batch.setdefault(r["__batch_id"], set()).add(
            (r.op, r.rn, r.user_id, r.total_value)
        )
    assert by_batch[0] == {("+", 1, 1, 10.0), ("+", 2, 2, 8.0)}
    # delete of key 1: every rank shifts up — (2,8) takes rank 1,
    # (3,6) enters at rank 2
    assert by_batch[1] == {
        ("-", 1, 1, 10.0), ("+", 1, 2, 8.0),
        ("-", 2, 2, 8.0), ("+", 2, 3, 6.0),
    }
    # re-insert at 7.0: key 1 re-enters at rank 2, key 3 falls out
    assert by_batch[2] == {("-", 2, 3, 6.0), ("+", 2, 1, 7.0)}
    snap = {
        (r.rn, r.user_id, r.total_value)
        for r in ranks.snapshot(spark).collect()
    }
    assert snap == {(1, 2, 8.0), (2, 1, 7.0)}
    assert snap == {
        (r.rn, r.user_id, r.total_value)
        for r in ranks.replay(spark).collect()
    }
