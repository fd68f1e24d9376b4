"""Driver-assertable STREAMING invariants (VERDICT r5 item 6).

The streaming layer (``streaming/``) was the largest local-only
verified surface: its equivalence suites run in pytest but never
produced a driver CORRECTNESS row. These entries promote the three
core streaming contracts into ``(spark, sf_dir) -> DataFrame``
queries with full-value DuckDB oracles — not literal-TRUE rows:

- ``st_upsert_keeplast`` — a REAL Structured Streaming update-mode
  aggregation (file source split into 4 micro-batches via
  ``maxFilesPerTrigger=1``) feeding ``ParquetUpsertSink``; the sink's
  keep-last snapshot must equal the batch aggregate over all events,
  value-hash-exact (the changelog/compaction contract the reference's
  UpsertStreamTableSink fronts — sinks/UpsertStreamTableSink.java).
- ``st_neardup_pairs`` — ``StreamingNearDupIndex`` replaying the
  document corpus in 4 per-batch admissions; the union of ingest-time
  detections must equal the EXACT all-pairs Jaccard set (the same
  oracle that gates the batch operator ``dp_neardup_minhash``).
- ``st_incremental_rollup`` — ``IncrementalAggState`` (parquet-state
  update-mode rollup) fed the events table in 4 batches; the
  maintained rollup must equal the single-pass aggregation exactly
  (decimal-bridged sums make the merge associative).
- ``st_freq_items`` — ``StreamingFrequentItems`` (micro-batch
  Misra-Gries accumulation with a mid-stream replay); every token
  above the accumulated-summary threshold must be present within the
  documented bound, in exact integer arithmetic.

Late round 8 extended the surface so EVERY §2 streaming row is
driver-gated: ``st_dedup_watermark`` (bounded-state keyed dedup under
at-least-once delivery), ``st_over_running_sum`` (stateful event-time
OVER, hash-exact vs the batch window function), ``st_stream_join`` /
``st_semi_join`` / ``st_anti_join`` (interval, EXISTS, and
sentinel-flushed NOT EXISTS — all complete results), ``st_late_drop``
(a replayed behind-watermark batch contributes nothing),
``st_topn`` (complete-mode totals + distributed TakeOrdered),
``st_event_sort`` (sentinel-drained temporal sort, batch-monotone
release), ``st_early_fire`` (changelog version counts pinned
per key), ``st_join_view`` (incremental join-view maintenance with a
poisoned replay), ``st_time_travel`` (VERSION AS OF over the upsert
changelog), and ``st_session_scale10`` (the ×10 decade-up session
invariant).

Each callable materializes its stream state under a temp work dir;
the returned DataFrame reads from that state, so the dir must outlive
the driver's ``collect()``. Because these queries do MINUTES of
side-effect work at DataFrame-construction time, results are
memoized per (query, Spark application, sf_dir) — a plan-only sweep
(e.g. the registered-query window gate) re-reads the cached state
instead of re-running the stream — and every work dir is removed at
interpreter exit instead of leaking until /tmp is cleared.

Batch splits use ``pmod(id, 4)`` — deterministic and
partition-independent — and every aggregate goes through the decimal
bridge (functions/deterministic.py), so the snapshot hash is
identical on any cluster.
"""

from __future__ import annotations

import atexit
import functools
import os
import shutil
import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryException
from pyspark.sql.window import Window

from ..functions.deterministic import dsum, dsum_sql
from ..schemas import load_table

QUERIES = {}
ORACLES = {}

_MEMO: dict[tuple[str, str, str], DataFrame] = {}
_WORKDIRS: list[str] = []


def _workdir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    _WORKDIRS.append(d)
    return d


@atexit.register
def _cleanup_workdirs() -> None:  # pragma: no cover - interpreter exit
    for d in _WORKDIRS:
        shutil.rmtree(d, ignore_errors=True)
    _WORKDIRS.clear()


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        @functools.wraps(fn)
        def memoized(spark: SparkSession, sf_dir: str) -> DataFrame:
            key = (name, spark.sparkContext.applicationId, sf_dir)
            if key not in _MEMO:
                _MEMO[key] = fn(spark, sf_dir)
            return _MEMO[key]

        QUERIES[name] = memoized
        if oracle is not None:
            ORACLES[name] = oracle
        return memoized

    return deco


@_q(
    "st_upsert_keeplast",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def st_upsert_keeplast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Structured Streaming upsert: update-mode groupBy
    aggregation over a 4-micro-batch file stream, each delta appended
    to ``ParquetUpsertSink``'s executor-written changelog; the
    distributed keep-last snapshot must equal the batch aggregate —
    streaming/sinks.py:ParquetUpsertSink."""
    from ..streaming.sinks import ParquetUpsertSink

    work = _workdir("st_upsert_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    # 4 deterministic source files -> 4 micro-batches
    for i in range(4):
        events.filter(F.pmod("event_id", F.lit(4)) == i).coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{i}"))

    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        dsum(F.col("value")).alias("total"),
    )
    sink = ParquetUpsertSink(os.path.join(work, "log"), ["event_type"])
    (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return sink.snapshot(spark).select(
        "event_type", "cnt", "total"
    ).orderBy("event_type")


# Same tokenization/oracle contract as dp_neardup_minhash
# (queries/datapipe.py) — the ingest-time index must reproduce the
# batch operator's exact pair set.
_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_JACCARD = (
    "len(list_intersect(a.shingles, b.shingles)) * 1.0"
    " / len(list_distinct(list_concat(a.shingles, b.shingles)))"
)


@_q(
    "st_neardup_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) AS shingles
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
      WHERE len(toks) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, {_JACCARD} AS jaccard
    FROM sh a JOIN sh b
      ON a.doc_id < b.doc_id
     AND len(a.shingles) * 1.0 >= len(b.shingles) * 0.8
     AND len(b.shingles) * 1.0 >= len(a.shingles) * 0.8
    WHERE {_JACCARD} >= 0.8
    ORDER BY id_a, id_b
    """,
)
def st_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time near-dup detection: the documents corpus admitted
    in 4 batches through ``StreamingNearDupIndex`` (executor-written
    parquet band index, no driver state); the union of per-batch
    detections must equal the exact all-pairs Jaccard oracle — the
    same gate the batch operator passes —
    streaming/neardup.py:StreamingNearDupIndex."""
    from ..streaming.neardup import StreamingNearDupIndex

    work = _workdir("st_neardup_")
    idx = StreamingNearDupIndex(os.path.join(work, "index"), threshold=0.8)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for i in range(4):
        idx.foreach_batch(
            docs.filter(F.pmod("doc_id", F.lit(4)) == i), i
        )
    return (
        idx.pairs(spark)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


@_q(
    "st_incremental_rollup",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total,
           min(value) AS min_value,
           max(value) AS max_value,
           {dsum_sql('value')} / count(*) AS avg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def st_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet-state incremental rollup: the events table fed in 4
    update batches; the maintained state must equal the single-pass
    aggregation EXACTLY (decimal-bridged sum → associative merge) —
    sources/incremental.py:IncrementalAggState."""
    from ..sources.incremental import IncrementalAggState

    work = _workdir("st_rollup_")
    events = load_table(spark, sf_dir, "events")
    state = IncrementalAggState(
        os.path.join(work, "state"), ["event_type"], "value"
    )
    for i in range(4):
        state.update(
            spark, events.filter(F.pmod("event_id", F.lit(4)) == i)
        )
    return state.result(spark).orderBy("event_type")


@_q(
    "st_session_scale10",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), base AS (
      SELECT CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM marked
    )
    SELECT t.copy_id, base.n_sessions, base.n_events
    FROM base, (SELECT CAST(g AS BIGINT) AS copy_id
                FROM generate_series(0, 9) s(g)) t
    ORDER BY copy_id
    """,
)
def st_session_scale10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decade-up STREAMING invariant (VERDICT r7 item 7): event-time
    sessionization over a ×10 corpus, run as a REAL Structured
    Streaming query in the documented production shape — append mode
    + 30-minute watermark over a time-ordered file stream.

    The ×10 corpus is 10 user-shifted copies of the events table
    (timestamps and values untouched), so every copy carries EXACTLY
    the base session structure and the closed-form oracle is the base
    gaps-and-islands session count repeated per copy — the driver
    checks 10 rows of (copy_id, n_sessions, n_events) against DuckDB
    computing the base counts once.

    Streaming mechanics: the corpus is split into 4 time-range
    batches (sessions spanning a boundary merge in the session-window
    state before the watermark passes them) plus one far-future
    sentinel event that advances the final watermark past every real
    session so append mode flushes them — the standard end-of-stream
    pattern for bounded replays of session streams. Scale shape: the
    session_window aggregation shuffles once on user_id; state is
    per-open-session, not per-history.

    Reference analog: SessionWindowAssigner.java:37 merging windows +
    the append-mode StreamTableSink contract.
    """
    work = _workdir("st_sess10_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    m, user_off, ev_off = 10, 1_000_000, 100_000_000
    copies = [
        e.select(
            (F.col("event_id") + k * ev_off).alias("event_id"),
            (F.col("user_id") + k * user_off).alias("user_id"),
            "ts",
            "value",
        )
        for k in range(m)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionAll(c)

    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 4
    bounds = [lo + span * i for i in range(1, 4)]
    cuts = [F.lit(b).cast("timestamp") for b in bounds]
    filters = [
        F.col("ts") < cuts[0],
        (F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1]),
        (F.col("ts") >= cuts[1]) & (F.col("ts") < cuts[2]),
        F.col("ts") >= cuts[2],
    ]
    for i, flt in enumerate(filters):
        # coalesce(1): same file-ordering hazard as
        # st_session_dynamic_gap (ADVICE r9) — with maxFilesPerTrigger
        # =1, two files per range only stay exact if the later-time
        # sibling is processed second, which file listing does not
        # guarantee under the session watermark.
        big.filter(flt).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    # watermark-advancing sentinel: one far-future event for a user
    # outside every copy's id range; its own (still-open) session is
    # the only one not flushed
    spark.createDataFrame(
        [(-1, -1, hi, 0.0)], "event_id long, user_id long, ts timestamp, value double"
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 HOURS")).coalesce(
        1
    ).write.parquet(os.path.join(src, "b4_sentinel"))

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    sessions = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "cnt"
        )
    )
    out_dir = os.path.join(work, "sessions")
    (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(out_dir)
        .filter(F.col("user_id") >= 0)
        .groupBy(
            F.floor(F.col("user_id") / user_off)
            .cast("bigint")
            .alias("copy_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("cnt").cast("bigint").alias("n_events"),
        )
        .orderBy("copy_id")
    )


def _time_range_filters(e: DataFrame, n: int) -> tuple[list, object, object]:
    """n disjoint event-time range filters covering ``e`` (ts column),
    plus (lo, hi). Same-ts rows never split across batches, so a
    time-ordered file stream of these ranges arrives in event-time
    order — the precondition the append-mode invariants rely on."""
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / n
    cuts = [F.lit(lo + span * i).cast("timestamp") for i in range(1, n)]
    filters = []
    for i in range(n):
        f = F.lit(True)
        if i > 0:
            f = f & (F.col("ts") >= cuts[i - 1])
        if i < n - 1:
            f = f & (F.col("ts") < cuts[i])
        filters.append(f)
    return filters, lo, hi


@_q(
    "st_over_running_sum",
    """
    SELECT user_id, event_id,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS running_cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             AS running_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)
    ORDER BY user_id, event_id
    """,
)
def st_over_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming event-time OVER aggregation (UNBOUNDED PRECEDING
    running count+sum per user) as a REAL stateful stream:
    ``streaming_over_running_sum`` (applyInPandasWithState, int64
    micro-unit state — the decimal bridge inside a stateful operator)
    fed a 4-batch time-ordered file stream. Arrival order equals
    (ts, event_id) order by construction, so EVERY emitted row must
    hash-match the batch window function exactly — the reference's
    RowTimeRangeUnboundedPrecedingFunction contract
    (StreamExecOverAggregate.scala:56) — streaming/joins.py."""
    from ..streaming.joins import streaming_over_running_sum

    work = _workdir("st_over_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    filters, _, _ = _time_range_filters(e, 4)
    for i, flt in enumerate(filters):
        e.filter(flt).coalesce(1).write.parquet(os.path.join(src, f"b{i}"))

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out_dir = os.path.join(work, "out")
    (
        streaming_over_running_sum(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(out_dir)
        .select("user_id", "event_id", "running_cnt", "running_sum")
        .orderBy("user_id", "event_id")
    )


@_q(
    "st_stream_join",
    """
    WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
         r AS (SELECT * FROM events WHERE event_type = 'purchase'),
         p AS (
           SELECT l.user_id, l.event_id AS lid, r.event_id AS rid
           FROM l JOIN r ON l.user_id = r.user_id
            AND r.ts >= l.ts
            AND r.ts <= l.ts + INTERVAL 600 SECONDS
         )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(lid) AS BIGINT) AS min_left_id,
           CAST(max(rid) AS BIGINT) AS max_right_id
    FROM p
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def st_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval equi-join as TWO real file streams:
    clicks and purchases (split from the events table into separate
    4-batch time-ordered sources) joined on user within [0, 600 s] —
    every qualifying pair must be emitted exactly once, including
    pairs whose sides arrive in different micro-batches (the left row
    is held in watermark-bounded join state until the right side's
    range passes). The oracle is the batch interval join aggregated
    per user. Reference: RowTimeBoundedStreamJoin — the same
    state-eviction contract — streaming/windows.py
    streaming_interval_join."""
    from ..streaming.windows import streaming_interval_join

    work = _workdir("st_ssjoin_")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value", "event_type"
    )
    srcs = {}
    for side, etype in (("l", "click"), ("r", "purchase")):
        src = os.path.join(work, f"in_{side}")
        os.makedirs(src)
        part = e.filter(F.col("event_type") == etype).drop("event_type")
        filters, _, _ = _time_range_filters(part, 4)
        for i, flt in enumerate(filters):
            part.filter(flt).coalesce(1).write.parquet(
                os.path.join(src, f"b{i}")
            )
        srcs[side] = src

    def _stream(path: str):
        return (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(path)
        )

    joined = streaming_interval_join(
        _stream(srcs["l"]), _stream(srcs["r"]), 0, 600
    )
    out_dir = os.path.join(work, "out")
    (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("left_id").cast("bigint").alias("min_left_id"),
            F.max("right_id").cast("bigint").alias("max_right_id"),
        )
        .orderBy("user_id")
    )


def _write_time_batches(
    df: DataFrame, src: str, n: int = 4, prefix: str = "b"
) -> None:
    filters, _, _ = _time_range_filters(df, n)
    for i, flt in enumerate(filters):
        df.filter(flt).coalesce(1).write.parquet(
            os.path.join(src, f"{prefix}{i}")
        )


def _sentinel_file(
    spark: SparkSession,
    src: str,
    hi,
    schema: str,
    row: tuple,
    name: str = "z_sentinel",
) -> None:
    """One far-future event (hi + 10 h) that advances the final
    watermark past every real row — the end-of-stream flush pattern
    for bounded replays of append-mode stateful queries."""
    spark.createDataFrame([row], schema).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 10 HOURS")
    ).coalesce(1).write.parquet(os.path.join(src, name))


@_q(
    "st_topn",
    """
    WITH t AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS total_value,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events
      GROUP BY user_id
    )
    SELECT user_id, total_value, n_events,
           CAST(ROW_NUMBER() OVER (ORDER BY total_value DESC, user_id)
                AS INTEGER) AS rn
    FROM t
    ORDER BY rn
    LIMIT 5
    """,
)
def st_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-n over maintained per-key totals: a complete-mode
    aggregation fed 4 micro-batches, each batch's full state ranked by
    distributed TakeOrdered (per-partition heaps, k-row driver
    transfer) into an upsert-style result view — the reference's
    updatable TopNBuffer at micro-batch granularity
    (AppendOnlyTopNFunction.java:46). The final view must equal the
    batch top-5 by decimal-bridged total, tie-broken by user_id —
    streaming/topn.py."""
    from ..streaming.topn import streaming_top_k_by_value

    work = _workdir("st_topn_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").cast("decimal(18,6)").alias("value"),
    )
    _write_time_batches(e, src, 4)
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value decimal(18,6)"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    streaming_top_k_by_value(
        stream, k=5, sink_table="st_topn_sink"
    ).awaitTermination()
    return (
        spark.table("global_temp.st_topn_sink")
        .select(
            "user_id",
            F.col("total_value").cast("double").alias("total_value"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("rn").cast("int").alias("rn"),
        )
        .orderBy("rn")
    )


@_q(
    "st_topn_retract",
    """
    WITH t1 AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS total_value
      FROM events WHERE event_id % 2 = 0
      GROUP BY user_id
    ),
    tall AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS total_value
      FROM events
      GROUP BY user_id
    ),
    top1 AS (
      SELECT * FROM (
        SELECT user_id, total_value,
               ROW_NUMBER() OVER (ORDER BY total_value DESC, user_id)
                 AS rn
        FROM t1) WHERE rn <= 5
    ),
    top2 AS (
      SELECT * FROM (
        SELECT user_id, total_value,
               ROW_NUMBER() OVER (ORDER BY total_value DESC, user_id)
                 AS rn
        FROM tall) WHERE rn <= 5
    ),
    ret AS (
      SELECT count(*) AS n
      FROM top1 JOIN top2 USING (rn)
      WHERE top1.user_id <> top2.user_id
         OR top1.total_value <> top2.total_value
    )
    SELECT CAST(top2.rn AS INTEGER) AS rn,
           top2.user_id,
           top2.total_value,
           CAST((SELECT n FROM ret) AS BIGINT) AS n_retract
    FROM top2
    ORDER BY rn
    """,
)
def st_topn_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-mode streaming top-N (the reference's
    RetractableTopNFunction.java semantics class, vs st_topn's
    append-only TopNBuffer): an UPDATING input — batch 0 carries
    per-user totals over the even-event half, batch 1 carries the
    users' REVISED cumulative totals once their odd events land — so
    rows already emitted into the top-5 can be demoted out of it.
    The operator (streaming/topn.py streaming_top_k_retract) folds
    the upsert stream keep-last, re-ranks the folded state per batch,
    and emits a rank-keyed (+/-) retraction changelog through
    ParquetRetractSink. Gated: the final rank snapshot must equal the
    batch top-5 of the fully-folded totals, ``n_retract`` counts the
    '-' ops batch 1 emitted (ranks whose occupant changed between the
    half-data and full-data rankings — the oracle recomputes both
    rankings and diffs them), and replay() must fold back to the
    snapshot (asserted in tests)."""
    from ..streaming.topn import streaming_top_k_retract

    work = _workdir("st_topn_retract_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    e = load_table(spark, sf_dir, "events")
    t1 = (
        e.filter(F.col("event_id") % 2 == 0)
        .groupBy("user_id")
        .agg(dsum(F.col("value")).alias("total_value"))
    )
    tall_u2 = (
        e.groupBy("user_id")
        .agg(dsum(F.col("value")).alias("total_value"))
        .join(
            e.filter(F.col("event_id") % 2 == 1)
            .select("user_id")
            .distinct(),
            "user_id",
            "left_semi",
        )
    )
    # sequential writes: the file source orders by modification time,
    # so b0 (half-data totals) is batch 0 and b1 (revisions) batch 1
    t1.coalesce(1).write.parquet(os.path.join(src, "b0"))
    tall_u2.coalesce(1).write.parquet(os.path.join(src, "b1"))
    stream = (
        spark.readStream.schema("user_id long, total_value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q, _totals, ranks = streaming_top_k_retract(
        stream, os.path.join(work, "sink"), k=5
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("st_topn_retract run exceeded 300 s")
    n_retract = (
        ranks.changelog(spark).filter(F.col("op") == "-").count()
    )
    return (
        ranks.snapshot(spark)
        .select(
            F.col("rn").cast("int").alias("rn"),
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("total_value").cast("double").alias("total_value"),
            F.lit(n_retract).cast("bigint").alias("n_retract"),
        )
        .orderBy("rn")
    )


@_q(
    "st_event_sort",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS monotone_ok
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def st_event_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming event-time sort (temporal sort): the stateful
    watermark-prefix release operator (streaming/sort.py
    event_time_sorted — the StreamExecTemporalSort analog) fed a
    4-batch stream plus a far-future sentinel that drains every
    buffered row through the event-time timeout. Each micro-batch's
    emission is captured with its batch id; the invariant is
    release-order monotonicity per user — max(ts) of every batch ≤
    min(ts) of every later batch — plus completeness: each input row
    emitted exactly once (per-user counts pinned by the oracle)."""
    from ..streaming.sort import event_time_sorted

    work = _workdir("st_evsort_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    _write_time_batches(e, src, 4)
    _, hi = e.agg(F.min("ts"), F.max("ts")).first()
    _sentinel_file(
        spark,
        src,
        hi,
        "event_id long, user_id long, ts timestamp, value double",
        (-1, -1, hi, 0.0),
    )
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out_dir = os.path.join(work, "out")

    def sink(bdf: DataFrame, bid: int) -> None:
        (
            bdf.withColumn("emit_batch", F.lit(bid))
            .write.mode("append")
            .parquet(out_dir)
        )

    (
        event_time_sorted(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    from pyspark.sql.window import Window

    rows = spark.read.parquet(out_dir).filter(F.col("user_id") >= 0)
    per_batch = rows.groupBy("user_id", "emit_batch").agg(
        F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
        F.count(F.lit(1)).alias("c"),
    )
    w = Window.partitionBy("user_id").orderBy("emit_batch")
    flags = per_batch.withColumn("prev_mx", F.lag("mx").over(w)).withColumn(
        "ok",
        F.col("prev_mx").isNull() | (F.col("prev_mx") <= F.col("mn")),
    )
    return (
        flags.groupBy("user_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.min("ok").alias("monotone_ok"),
        )
        .orderBy("user_id")
    )


@_q(
    "st_join_view",
    f"""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('l.l_quantity')} AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def st_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance (sources/ivm.py): the
    orders⋈lineitem view maintained through 4 batches of BOTH-side
    deltas via ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — order rows and their line
    rows arrive in different batches in every combination (sides are
    split on different keys), and batch 1 is applied TWICE (the
    at-least-once replay, a no-op by construction since ΔV is a pure
    function of state strictly before the batch). The maintained view
    must aggregate EXACTLY like the batch join — the same algebra the
    reference's StreamExecJoin state views emit per-row."""
    from ..sources.ivm import JoinViewState

    work = _workdir("st_jview_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_quantity",
        "l_linenumber",
    )
    st = JoinViewState(os.path.join(work, "state"), ["o_orderkey"])
    for i in range(4):
        da = o.filter(F.pmod("o_orderkey", F.lit(4)) == i)
        db = l.filter(
            F.pmod(F.col("o_orderkey") + F.col("l_linenumber"), F.lit(4))
            == i
        )
        st.update(spark, da, db, i)
        if i == 1:  # at-least-once replay — must be a no-op
            st.update(spark, da, db, i)
    return (
        st.view(spark)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


@_q(
    "st_semi_join",
    """
    WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
         r AS (SELECT * FROM events WHERE event_type = 'view')
    SELECT l.event_id, l.user_id, l.ts, l.value
    FROM l
    WHERE EXISTS (
      SELECT 1 FROM r
      WHERE r.user_id = l.user_id
        AND r.ts >= l.ts - INTERVAL 3600 SECONDS
        AND r.ts <= l.ts
    )
    ORDER BY l.event_id
    """,
)
def st_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXISTS (native stream-stream left-semi join):
    purchases with ≥1 view from the same user in the preceding hour,
    over two time-ordered file streams. Because the interval looks
    only BACKWARD (r.ts ≤ l.ts), every match's right side has already
    arrived when the left row does, so each qualifying left row is
    emitted exactly once during the data batches — no sentinel needed
    — and the result is the complete batch EXISTS, value-checked
    row-for-row (StreamingSemiAntiJoinOperator.java:35's IN/EXISTS
    half) — streaming/joins.py streaming_semi_join."""
    from ..streaming.joins import streaming_semi_join

    work = _workdir("st_semi_")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value", "event_type"
    )
    srcs = {}
    for side, etype in (("l", "purchase"), ("r", "view")):
        src = os.path.join(work, f"in_{side}")
        os.makedirs(src)
        part = e.filter(F.col("event_type") == etype).drop("event_type")
        _write_time_batches(part, src, 4)
        srcs[side] = src

    def _stream(path: str):
        return (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(path)
        )

    semi = streaming_semi_join(_stream(srcs["l"]), _stream(srcs["r"]))
    out_dir = os.path.join(work, "out")
    (
        semi.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(out_dir)
        .select("event_id", "user_id", "ts", "value")
        .orderBy("event_id")
    )


@_q(
    "st_cdc_apply",
    """
    WITH ranked AS (
      SELECT user_id, ts, event_id, value, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, ts, event_id, value
    FROM ranked
    WHERE rn = 1 AND event_type != 'error'
    ORDER BY user_id
    """,
)
def st_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply (the flink-cdc / Delta MERGE-per-micro-batch
    pattern): the events table as a row-level change stream — every
    event upserts its user's row, 'error' events are DELETE
    tombstones — folded into a keyed table through a real 4-batch
    file stream; each micro-batch reduces to its last op per key and
    applies as two MERGE INTO calls (upsert, then delete). The final
    table must hold exactly the users whose LAST change is not a
    delete, carrying that change's row — value-checked against the
    window-function oracle. The state uses the BUCKETED merge layout
    (n_buckets=16), so each batch's merges rewrite only the touched
    buckets — streaming/cdc.py CdcApply + sources/merge.py
    _merge_bucketed."""
    from ..streaming.cdc import CdcApply

    work = _workdir("st_cdc_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", "d")
        .otherwise("u")
        .alias("op"),
    )
    filters, _, _ = _time_range_filters(e, 4)
    for i, flt in enumerate(filters):
        e.filter(flt).coalesce(1).write.parquet(os.path.join(src, f"b{i}"))

    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, "
            "value double, op string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    # n_buckets: the state is the BUCKETED merge layout, so each
    # micro-batch rewrites only the buckets its delta keys hash into
    # (O(delta), not O(state) — sources/merge.py _merge_bucketed)
    cdc = CdcApply(
        os.path.join(work, "table"),
        ["user_id"],
        order_cols=["ts", "event_id"],
        n_buckets=16,
    )
    (
        stream.writeStream.outputMode("append")
        .foreachBatch(cdc.foreach_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        cdc.table(spark)
        .select("user_id", "ts", "event_id", "value")
        .orderBy("user_id")
    )


@_q(
    "st_time_travel",
    f"""
    SELECT CAST(1 AS INTEGER) AS as_of, event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total
    FROM events WHERE event_id % 4 <= 1
    GROUP BY event_type
    UNION ALL
    SELECT CAST(3 AS INTEGER), event_type,
           CAST(count(*) AS BIGINT),
           {dsum_sql('value')}
    FROM events
    GROUP BY event_type
    ORDER BY as_of, event_type
    """,
)
def st_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the upsert changelog (VERSION AS OF): an
    update-mode aggregation streamed through ``ParquetUpsertSink`` in
    4 micro-batches; ``snapshot(as_of_batch=1)`` must equal the batch
    aggregate over ONLY the first two batches' events, and the
    unbounded snapshot the full aggregate — both value-checked. The
    per-batch partition layout makes every historical version a
    partition-pruned scan (no version manifest needed) —
    streaming/sinks.py ParquetUpsertSink.snapshot."""
    from ..streaming.sinks import ParquetUpsertSink

    work = _workdir("st_ttravel_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    for i in range(4):
        events.filter(F.pmod("event_id", F.lit(4)) == i).coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{i}"))

    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        dsum(F.col("value")).alias("total"),
    )
    sink = ParquetUpsertSink(os.path.join(work, "log"), ["event_type"])
    (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    v1 = sink.snapshot(spark, as_of_batch=1).select(
        F.lit(1).cast("int").alias("as_of"), "event_type", "cnt", "total"
    )
    v3 = sink.snapshot(spark).select(
        F.lit(3).cast("int").alias("as_of"), "event_type", "cnt", "total"
    )
    return v1.unionByName(v3).orderBy("as_of", "event_type")


@_q(
    "st_early_fire",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total,
           CAST(count(DISTINCT event_id % 4) AS BIGINT) AS n_versions
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def st_early_fire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Early-fire / update-mode re-emission, value-checked: an
    update-mode aggregation over a 4-batch stream re-emits every
    touched key's CURRENT value each micro-batch (the reference's
    early-fire trigger contract, EventTimeTriggers.java); the upsert
    changelog therefore holds one version per (key, touching batch).
    The oracle pins BOTH the final value (batch aggregate) and the
    exact version count per key — count(DISTINCT event_id % 4), the
    number of micro-batches that contained the key — so under-firing
    (no early emission) and over-firing (emitting untouched keys)
    both hash-mismatch — streaming/sinks.py ParquetUpsertSink
    changelog."""
    from ..streaming.sinks import ParquetUpsertSink

    work = _workdir("st_early_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    for i in range(4):
        events.filter(F.pmod("event_id", F.lit(4)) == i).coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{i}"))

    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        dsum(F.col("value")).alias("total"),
    )
    sink = ParquetUpsertSink(os.path.join(work, "log"), ["event_type"])
    (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    versions = (
        sink.changelog(spark)
        .groupBy("event_type")
        .agg(
            F.count_distinct(F.col(ParquetUpsertSink.BATCH_COL))
            .cast("bigint")
            .alias("n_versions")
        )
    )
    return (
        sink.snapshot(spark)
        .select("event_type", "cnt", "total")
        .join(versions, "event_type")
        .orderBy("event_type")
    )


@_q(
    "st_anti_join",
    """
    WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
         r AS (SELECT * FROM events WHERE event_type = 'view')
    SELECT l.event_id, l.user_id, l.ts, l.value
    FROM l
    WHERE NOT EXISTS (
      SELECT 1 FROM r
      WHERE r.user_id = l.user_id
        AND r.ts >= l.ts - INTERVAL 3600 SECONDS
        AND r.ts <= l.ts
    )
    ORDER BY l.event_id
    """,
)
def st_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NOT EXISTS (anti join) complete and hash-exact:
    purchases with no view from the same user in the preceding hour,
    over TWO real file streams with far-future sentinels on BOTH
    sides so the final watermark proves no-match for every pending
    left row (Spark emits the null-padded outer rows only once a
    match is impossible — the StreamingSemiAntiJoinOperator.java:35
    semantic). Unlike the pytest equivalence (which tolerates an
    unflushed tail), this is the FULL anti-join result, value-checked
    row-for-row — streaming/joins.py streaming_anti_join."""
    from ..streaming.joins import streaming_anti_join

    work = _workdir("st_anti_")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value", "event_type"
    )
    hi = e.agg(F.max("ts")).first()[0]
    srcs = {}
    for side, etype, uid in (("l", "purchase", -1), ("r", "view", -2)):
        src = os.path.join(work, f"in_{side}")
        os.makedirs(src)
        part = e.filter(F.col("event_type") == etype).drop("event_type")
        _write_time_batches(part, src, 4)
        _sentinel_file(
            spark,
            src,
            hi,
            "event_id long, user_id long, ts timestamp, value double",
            (uid, uid, hi, 0.0),
        )
        srcs[side] = src

    def _stream(path: str):
        return (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(path)
        )

    anti = streaming_anti_join(_stream(srcs["l"]), _stream(srcs["r"]))
    out_dir = os.path.join(work, "out")
    (
        anti.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(out_dir)
        .filter(F.col("user_id") >= 0)
        .select("event_id", "user_id", "ts", "value")
        .orderBy("event_id")
    )


@_q(
    "st_late_drop",
    f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS cnt,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def st_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data drop, value-checked end-to-end: a tumbling
    1-hour windowed aggregation (append mode, 30-minute watermark)
    over a time-ordered 3-batch stream, followed by a LATE fourth
    file replaying the oldest third — every replayed row's window
    ended far behind the watermark by then, so ALL of them must be
    dropped (not double-counted), and a far-future sentinel flushes
    the final windows. The result must equal the batch tumbling
    aggregate over the original corpus, each row counted exactly
    once. Reference: WindowOperator's cleanup-time late-element drop
    path (WindowOperator.java isElementDropped) — streaming/source.py
    watermark contract."""
    work = _workdir("st_late_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    filters, _, hi = _time_range_filters(e, 3)
    for i, flt in enumerate(filters):
        e.filter(flt).coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
    # the late file: the oldest third again — behind the watermark
    e.filter(filters[0]).coalesce(1).write.parquet(
        os.path.join(src, "b3_late")
    )
    spark.createDataFrame(
        [(-1, "zz_sentinel", hi, 0.0)],
        "event_id long, event_type string, ts timestamp, value double",
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 HOURS")).coalesce(
        1
    ).write.parquet(os.path.join(src, "b4_sentinel"))

    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    out_dir = os.path.join(work, "out")
    (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(out_dir)
        .filter(F.col("event_type") != "zz_sentinel")
        .orderBy("window_start", "event_type")
    )


@_q(
    "st_dedup_watermark",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def st_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keyed deduplication with bounded state:
    ``dropDuplicatesWithinWatermark("event_id")`` over a time-ordered
    4-batch file stream where EVERY row arrives at least twice (each
    batch file is its time-range unioned with itself, and the final
    range is replayed once more as a fifth file — the at-least-once
    delivery shape). The 30-minute watermark bounds the dedup state:
    keys older than the watermark are evicted, which is the only way
    this operator survives an unbounded stream (plain
    ``dropDuplicates`` on a stream retains every key forever). The
    surviving rows must be EXACTLY the distinct events — the oracle is
    the batch aggregate over the raw table. Replayed rows land either
    inside the watermark (deduped by state) or behind it (dropped as
    late) — both paths preserve the invariant, and both are exercised.
    Reference analog: Blink's Deduplicate/keep-first stream operator
    (DeduplicateKeepFirstRowFunction.java) with state TTL.
    """
    work = _workdir("st_dedupw_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 4
    cuts = [
        F.lit(lo + span * i).cast("timestamp") for i in range(1, 4)
    ]
    filters = [
        F.col("ts") < cuts[0],
        (F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1]),
        (F.col("ts") >= cuts[1]) & (F.col("ts") < cuts[2]),
        F.col("ts") >= cuts[2],
    ]
    for i, flt in enumerate(filters):
        part = e.filter(flt)
        part.unionAll(part).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    # fifth file: the last range replayed once more (cross-batch dups)
    e.filter(filters[3]).coalesce(1).write.parquet(
        os.path.join(src, "b4_replay")
    )

    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    deduped = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out_dir = os.path.join(work, "out")
    (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            dsum(F.col("value")).alias("total"),
        )
        .orderBy("event_type")
    )


@_q(
    "st_freq_items",
    """
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS item
      FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT item, CAST(count(*) AS BIGINT) AS true_cnt,
           TRUE AS bounds_ok
    FROM tok, tot
    GROUP BY item, n
    HAVING count(*) * 33345 > n * 578
    ORDER BY item
    """,
)
def st_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters: document tokens fed to
    ``StreamingFrequentItems`` (k=64, cap=512) in 4 replay-idempotent
    micro-batches (batch 1 applied twice — the at-least-once
    ``foreachBatch`` contract). Hard-gate invariant: every token with
    true count > n/(k+1) + n/(cap+1) — the accumulated-summary
    guarantee threshold, evaluated in exact integer arithmetic
    (·33345 = 65·513, ·578 = 513 + 65) — is PRESENT in the final
    summary with 0 ≤ true − est ≤ n/65 + n/513, and the replay did
    not double-count (n marker == exact token count). The oracle pins
    the heavy-hitter set and true counts — streaming/freqitems.py."""
    from ..streaming.freqitems import StreamingFrequentItems

    work = _workdir("st_freq_")
    docs = load_table(spark, sf_dir, "documents")
    from ..datapipe.text import tokens as _tokens

    toks = docs.select(
        F.col("doc_id"), F.explode(_tokens(F.col("text"))).alias("item")
    )
    st = StreamingFrequentItems(
        os.path.join(work, "state"), "item", k=64, cap=512
    )
    for i in range(4):
        st.foreach_batch(toks.filter(F.pmod("doc_id", F.lit(4)) == i), i)
        if i == 1:  # at-least-once replay — must be a no-op
            st.foreach_batch(
                toks.filter(F.pmod("doc_id", F.lit(4)) == i), i
            )
    sk = st.result(spark)
    n = st.total_rows()
    exact = toks.groupBy("item").agg(F.count(F.lit(1)).alias("true_cnt"))
    n_exact = toks.count()
    hh = exact.filter(F.col("true_cnt") * 33345 > F.lit(n_exact) * 578)
    return (
        hh.join(sk, "item", "left")
        .select(
            "item",
            "true_cnt",
            (
                F.lit(n == n_exact)
                & F.col("est").isNotNull()
                & (F.col("est") <= F.col("true_cnt"))
                & (
                    (F.col("true_cnt") - F.col("est")) * 33345
                    <= F.lit(n_exact) * 578
                )
            ).alias("bounds_ok"),
        )
        .orderBy("item")
    )


_REST_SERVERS: list = []  # row services kept alive for the app lifetime


@_q(
    "st_rest_stream",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total
    FROM events
    WHERE event_type IN ('click', 'error')
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def st_rest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end service-connector stream (sources/restds.py): the
    click+error slice of events is served by an HTTP row service in
    two appends; a Structured Streaming query reads it through the
    ``flinkrest`` source in SCALABLE mode (executor-side range
    partitions — the Kafka-partition model) and writes through the
    epoch-deduped two-phase-commit REST sink. Two availableNow runs
    over one checkpoint prove the offset contract: run 2 reads only
    the delta, and a manually replayed epoch-0 commit is a
    server-side no-op. The sink service's final contents, read back
    through the batch connector, must aggregate value-exactly like
    the batch slice — exactly-once, no gaps, no double-writes."""
    from ..sources import restds

    import atexit as _atexit
    import tempfile as _tempfile

    ddl = "event_id bigint, event_type string, value double"
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    rows = [
        {
            "event_id": r.event_id,
            "event_type": r.event_type,
            "value": r.value,
        }
        for r in e.filter(
            F.col("event_type").isin("click", "error")
        ).collect()
    ]
    half = len(rows) // 2
    src_srv, src_url = restds.start_row_service(ddl, rows[:half])
    sink_srv, sink_url = restds.start_row_service(ddl, [])
    for s in (src_srv, sink_srv):
        _REST_SERVERS.append(s)
        _atexit.register(s.shutdown)
    restds.register(spark)

    ckpt = _tempfile.mkdtemp(prefix="st_rest_ckpt_", dir=_workdir("st_rest_"))

    def run_once() -> None:
        q = (
            spark.readStream.format("flinkrest")
            .option("url", src_url)
            .option("mode", "scalable")
            .option("numpartitions", "4")
            .load()
            .writeStream.format("flinkrest")
            .option("url", sink_url)
            .option("queryname", "st_rest_stream")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            # a still-running query would collide with the next run's
            # checkpoint and the sink would be read mid-write — loud
            # timeout beats a silent partial result
            q.stop()
            raise TimeoutError("st_rest_stream run exceeded 300 s")

    run_once()
    restds._post(src_url + "/append", ndjson=rows[half:])
    run_once()
    # at-least-once delivery upstream: replay epoch 0's commit — the
    # service must recognize <queryname>-0 as already committed
    replay = restds._post(
        sink_url + "/commit?epoch=st_rest_stream-0", obj={"ids": []}
    )
    assert replay.get("dedup") is True, "epoch replay was not deduped"

    back = (
        spark.read.format("flinkrest")
        .option("url", sink_url)
        .option("numpartitions", "4")
        .load()
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            dsum(F.col("value")).alias("total"),
        )
        .orderBy("event_type")
    )


@_q(
    "st_match_recognize",
    """
    WITH c AS (
      SELECT user_id, ts, value,
             row_number() OVER w AS pos,
             CASE WHEN value < lag(value) OVER w THEN 'D'
                  WHEN value > lag(value) OVER w THEN 'U'
                  ELSE 'F' END AS dir
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT *, CASE WHEN lag(dir) OVER w2 IS NULL
                       OR lag(dir) OVER w2 <> dir
                     THEN 1 ELSE 0 END AS chg
      FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY pos)
    ), r AS (
      SELECT *, SUM(chg) OVER w2 AS run
      FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY pos)
    ), runs AS (
      SELECT user_id, run, min(dir) AS dir, min(pos) AS run_pos,
             arg_min(ts, pos) AS lo_o, arg_min(value, pos) AS lo_v,
             arg_max(ts, pos) AS hi_o, arg_max(value, pos) AS hi_v,
             count(*) AS n
      FROM r GROUP BY 1, 2
    ), paired AS (
      SELECT user_id, dir, lead(dir) OVER w3 AS ndir,
             lo_o, lo_v, hi_o, hi_v, n,
             lead(hi_o) OVER w3 AS nhi_o, lead(hi_v) OVER w3 AS nhi_v,
             lead(n) OVER w3 AS nn
      FROM runs WINDOW w3 AS (PARTITION BY user_id ORDER BY run_pos)
    )
    SELECT user_id, lo_o AS start_ts, hi_o AS bottom_ts, nhi_o AS end_ts,
           lo_v AS start_value, hi_v AS bottom_value, nhi_v AS end_value,
           n AS down_rows, nn AS up_rows
    FROM paired WHERE dir = 'D' AND ndir = 'U'
    ORDER BY user_id, start_ts
    """,
)
def st_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MATCH_RECOGNIZE (streaming/match.py): the events
    table fed in 4 event-time-ordered micro-batches (batch 1 replayed
    — the at-least-once foreachBatch contract) through the
    watermark-driven V-shape CEP operator with 10-minute lateness;
    after the final flush the emitted matches must equal the batch
    MATCH_RECOGNIZE oracle EXACTLY — same run algebra, same SKIP PAST
    LAST ROW pairing, now with per-batch closed-run emission and
    O(open-pattern + lateness-window) keyed state. Reference:
    StreamExecMatch.scala's keyed event-time NFA contract."""
    import datetime as _dt

    from ..streaming.match import StreamingMatchRecognize

    work = _workdir("st_match_")
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    # ts-ordered batches come from ts quantiles so no on-time row is
    # ever late (percentile needs a numeric: micros since epoch)
    tq = (
        e.withColumn("_us", F.unix_micros("ts"))
        .agg(
            F.expr("percentile(_us, 0.25)").alias("a"),
            F.expr("percentile(_us, 0.5)").alias("b"),
            F.expr("percentile(_us, 0.75)").alias("c"),
        )
        .collect()[0]
    )
    import datetime as _dt2

    def _ts(us: float) -> _dt.datetime:
        return _dt2.datetime(1970, 1, 1) + _dt2.timedelta(microseconds=us)

    bounds = [None, _ts(tq.a), _ts(tq.b), _ts(tq.c), None]
    m = StreamingMatchRecognize(
        os.path.join(work, "state"), _dt.timedelta(minutes=10)
    )
    for i in range(4):
        lo, hi = bounds[i], bounds[i + 1]
        part = e
        if lo is not None:
            part = part.filter(F.col("ts") >= F.lit(lo))
        if hi is not None:
            part = part.filter(F.col("ts") < F.lit(hi))
        m.foreach_batch(part, i)
        if i == 1:  # at-least-once replay — must be a no-op
            m.foreach_batch(part, i)
    m.flush(spark)
    assert m.late_dropped() == 0
    return m.matches(spark).orderBy("user_id", "start_ts")


@_q(
    "st_cep_generic",
    """
    WITH c AS (
      SELECT user_id, ts, value,
             row_number() OVER w AS pos,
             CASE WHEN value < lag(value) OVER w THEN 'D'
                  WHEN value > lag(value) OVER w THEN 'U'
                  ELSE 'F' END AS dir
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT *, CASE WHEN lag(dir) OVER w2 IS NULL
                       OR lag(dir) OVER w2 <> dir
                     THEN 1 ELSE 0 END AS chg
      FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY pos)
    ), r AS (
      SELECT *, SUM(chg) OVER w2 AS run
      FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY pos)
    ), runs AS (
      SELECT user_id, run, min(dir) AS dir, min(pos) AS run_pos,
             arg_min(ts, pos) AS lo_o,
             arg_max(ts, pos) AS hi_o,
             count(*) AS n
      FROM r GROUP BY 1, 2
    ), paired AS (
      SELECT user_id, dir, lead(dir) OVER w3 AS ndir,
             lo_o, hi_o, n,
             lead(hi_o) OVER w3 AS nhi_o, lead(n) OVER w3 AS nn
      FROM runs WINDOW w3 AS (PARTITION BY user_id ORDER BY run_pos)
    )
    SELECT user_id,
           lo_o AS start_ts,
           nhi_o AS end_ts,
           CAST(n + nn AS BIGINT) AS n_rows,
           repeat('D', CAST(n AS INTEGER))
             || repeat('U', CAST(nn AS INTEGER)) AS symbols
    FROM paired WHERE dir = 'D' AND ndir = 'U'
    ORDER BY user_id, start_ts
    """,
)
def st_cep_generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic-pattern streaming CEP (streaming/cep.py): the
    quantified-symbol-chain NFA core of StreamExecMatch, instantiated
    with ``"D+ U+"`` over the events table — 4 event-time-ordered
    micro-batches (batch 1 replayed) through the per-key greedy
    scanner that consumes only the watermark-frozen prefix and HOLDS
    in-progress matches at the freeze boundary; after flush the
    emitted (span, symbol-string) set must equal the run-length SQL
    oracle EXACTLY. The scanner itself is property-tested against
    Python re's greedy finditer on random pattern×string cases; keyed
    state is the in-progress suffix + anchor + lateness window only."""
    import datetime as _dt

    from ..streaming.cep import StreamingCep

    work = _workdir("st_cep_")
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    tq = (
        e.withColumn("_us", F.unix_micros("ts"))
        .agg(
            F.expr("percentile(_us, 0.25)").alias("a"),
            F.expr("percentile(_us, 0.5)").alias("b"),
            F.expr("percentile(_us, 0.75)").alias("c"),
        )
        .collect()[0]
    )

    def _ts(us: float) -> _dt.datetime:
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)

    bounds = [None, _ts(tq.a), _ts(tq.b), _ts(tq.c), None]
    m = StreamingCep(
        os.path.join(work, "state"), "D+ U+", _dt.timedelta(minutes=10)
    )
    for i in range(4):
        part = e
        if bounds[i] is not None:
            part = part.filter(F.col("ts") >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            part = part.filter(F.col("ts") < F.lit(bounds[i + 1]))
        m.foreach_batch(part, i)
        if i == 1:  # at-least-once replay — must be a no-op
            m.foreach_batch(part, i)
    m.flush(spark)
    assert m.late_dropped() == 0
    return m.matches(spark).orderBy("user_id", "start_ts")


@_q(
    "st_cep_flatbottom",
    """
    WITH c AS (
      SELECT user_id, ts, value,
             row_number() OVER w AS pos,
             CASE WHEN value < lag(value) OVER w THEN 'D'
                  WHEN value > lag(value) OVER w THEN 'U'
                  ELSE 'F' END AS dir
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT *, CASE WHEN lag(dir) OVER w2 IS NULL
                       OR lag(dir) OVER w2 <> dir
                     THEN 1 ELSE 0 END AS chg
      FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY pos)
    ), r AS (
      SELECT *, SUM(chg) OVER w2 AS run
      FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY pos)
    ), runs AS (
      SELECT user_id, run, min(dir) AS dir, min(pos) AS run_pos,
             arg_min(ts, pos) AS lo_o,
             arg_max(ts, pos) AS hi_o,
             count(*) AS n
      FROM r GROUP BY 1, 2
    ), seq AS (
      SELECT user_id, dir, lo_o, hi_o, n,
             lead(dir)  OVER w3 AS d1, lead(hi_o) OVER w3 AS h1,
             lead(n)    OVER w3 AS n1,
             lead(dir, 2) OVER w3 AS d2, lead(hi_o, 2) OVER w3 AS h2,
             lead(n, 2)   OVER w3 AS n2
      FROM runs WINDOW w3 AS (PARTITION BY user_id ORDER BY run_pos)
    )
    SELECT user_id,
           lo_o AS start_ts,
           CASE WHEN d1 = 'U' THEN h1 ELSE h2 END AS end_ts,
           CAST(n + CASE WHEN d1 = 'U' THEN n1 ELSE n1 + n2 END
                AS BIGINT) AS n_rows,
           repeat('D', CAST(n AS INTEGER))
             || CASE WHEN d1 = 'U' THEN ''
                     ELSE repeat('F', CAST(n1 AS INTEGER)) END
             || repeat('U', CAST(CASE WHEN d1 = 'U' THEN n1 ELSE n2 END
                               AS INTEGER)) AS symbols
    FROM seq
    WHERE dir = 'D'
      AND (d1 = 'U' OR (d1 = 'F' AND d2 = 'U'))
    ORDER BY user_id, start_ts
    """,
)
def st_cep_flatbottom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-bottom V-shapes — ``D+ F* U+`` — a pattern the run-pair
    V-algebra CANNOT express (the descent may sit on a flat ledge of
    any width before rising): the generic StreamingCep instantiated
    beyond its V-shape anchor case. Same 4-micro-batch + replay +
    flush drive as st_cep_generic; the oracle extends the run CTE
    with two-run lookahead (D followed by U, or by exactly one
    maximal F run then U — maximal runs make SKIP PAST LAST ROW
    disjointness structural, so no recursion is needed)."""
    import datetime as _dt

    from ..streaming.cep import StreamingCep

    work = _workdir("st_cepfb_")
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    tq = (
        e.withColumn("_us", F.unix_micros("ts"))
        .agg(
            F.expr("percentile(_us, 0.25)").alias("a"),
            F.expr("percentile(_us, 0.5)").alias("b"),
            F.expr("percentile(_us, 0.75)").alias("c"),
        )
        .collect()[0]
    )

    def _ts(us: float) -> _dt.datetime:
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)

    bounds = [None, _ts(tq.a), _ts(tq.b), _ts(tq.c), None]
    m = StreamingCep(
        os.path.join(work, "state"), "D+ F* U+", _dt.timedelta(minutes=10)
    )
    for i in range(4):
        part = e
        if bounds[i] is not None:
            part = part.filter(F.col("ts") >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            part = part.filter(F.col("ts") < F.lit(bounds[i + 1]))
        m.foreach_batch(part, i)
    m.flush(spark)
    assert m.late_dropped() == 0
    return m.matches(spark).orderBy("user_id", "start_ts")


@_q(
    "st_cep_spikes",
    """
    WITH c AS (
      SELECT user_id, ts, (value > 75.0) AS hi,
             row_number() OVER w AS pos
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), r AS (
      SELECT *, pos - row_number()
                  OVER (PARTITION BY user_id, hi ORDER BY pos) AS grp
      FROM c
    )
    SELECT user_id,
           min(ts) AS start_ts,
           max(ts) AS end_ts,
           CAST(count(*) AS BIGINT) AS n_rows,
           repeat('H', CAST(count(*) AS INTEGER)) AS symbols
    FROM r WHERE hi
    GROUP BY user_id, grp
    ORDER BY user_id, start_ts
    """,
)
def st_cep_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spike-episode detection: the generic CEP with its SECOND
    registered classifier (magnitude threshold H/L instead of the
    up-down derivative) and pattern ``H+`` — maximal runs of
    value > 75 per user, streamed in 4 event-time batches and
    flushed. Proves the classifier surface is pluggable end to end;
    the oracle is plain gaps-and-islands on the same threshold."""
    import datetime as _dt

    from ..streaming.cep import StreamingCep

    work = _workdir("st_spike_")
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    tq = (
        e.withColumn("_us", F.unix_micros("ts"))
        .agg(
            F.expr("percentile(_us, 0.25)").alias("a"),
            F.expr("percentile(_us, 0.5)").alias("b"),
            F.expr("percentile(_us, 0.75)").alias("c"),
        )
        .collect()[0]
    )

    def _ts(us: float) -> _dt.datetime:
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)

    bounds = [None, _ts(tq.a), _ts(tq.b), _ts(tq.c), None]
    m = StreamingCep(
        os.path.join(work, "state"),
        "H+",
        _dt.timedelta(minutes=10),
        classify="threshold75",
    )
    for i in range(4):
        part = e
        if bounds[i] is not None:
            part = part.filter(F.col("ts") >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            part = part.filter(F.col("ts") < F.lit(bounds[i + 1]))
        m.foreach_batch(part, i)
    m.flush(spark)
    assert m.late_dropped() == 0
    return m.matches(spark).orderBy("user_id", "start_ts")


@_q(
    "st_cep_wshape",
    """
    WITH c AS (
      SELECT user_id, ts, value,
             row_number() OVER w AS pos,
             CASE WHEN value < lag(value) OVER w THEN 'D'
                  WHEN value > lag(value) OVER w THEN 'U'
                  ELSE 'F' END AS dir
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT *, CASE WHEN lag(dir) OVER w2 IS NULL
                       OR lag(dir) OVER w2 <> dir
                     THEN 1 ELSE 0 END AS chg
      FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY pos)
    ), r AS (
      SELECT *, SUM(chg) OVER w2 AS run
      FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY pos)
    ), runs AS (
      SELECT user_id, run, min(dir) AS dir, min(pos) AS run_pos,
             arg_min(ts, pos) AS lo_o, arg_max(ts, pos) AS hi_o,
             count(*) AS n
      FROM r GROUP BY 1, 2
    ),
    -- F-free islands: runs alternate D/U strictly inside an island,
    -- so greedy D+ U+ D+ U+ packing = quadruples counted from the
    -- island's first D run (SKIP PAST LAST ROW resumes exactly at
    -- the next D) — no recursion needed
    isl AS (
      SELECT *, SUM(CASE WHEN dir = 'F' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY run_pos) AS island
      FROM runs
    ), du AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, island
                                   ORDER BY run_pos) AS rix,
             min(CASE WHEN dir = 'D' THEN run_pos END)
               OVER (PARTITION BY user_id, island) AS first_d_pos
      FROM isl WHERE dir <> 'F'
    ), dx AS (
      SELECT *, rix - min(CASE WHEN run_pos = first_d_pos
                               THEN rix END)
                      OVER (PARTITION BY user_id, island) AS di
      FROM du
    ), quads AS (
      SELECT user_id, island, CAST(di // 4 AS INTEGER) AS qid,
             count(*) AS nrun,
             min(lo_o) AS start_ts,
             arg_max(hi_o, di) AS end_ts,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             string_agg(repeat(dir, CAST(n AS INTEGER)), ''
                        ORDER BY di) AS symbols
      FROM dx WHERE di >= 0
      GROUP BY user_id, island, CAST(di // 4 AS INTEGER)
    )
    SELECT user_id, start_ts, end_ts, n_rows, symbols
    FROM quads WHERE nrun = 4
    ORDER BY user_id, start_ts
    """,
)
def st_cep_wshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-shapes — ``D+ U+ D+ U+`` — a FOUR-element chain through the
    generic streaming CEP (4 event-time batches + flush). The oracle
    expresses the scanner's greedy SKIP PAST LAST ROW packing without
    recursion: inside an F-free island runs alternate strictly, so
    consecutive quadruples counted from the island's first D run ARE
    the greedy matches (the scanner resumes exactly at the next D)."""
    import datetime as _dt

    from ..streaming.cep import StreamingCep

    work = _workdir("st_cepw_")
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    tq = (
        e.withColumn("_us", F.unix_micros("ts"))
        .agg(
            F.expr("percentile(_us, 0.25)").alias("a"),
            F.expr("percentile(_us, 0.5)").alias("b"),
            F.expr("percentile(_us, 0.75)").alias("c"),
        )
        .collect()[0]
    )

    def _ts(us: float) -> _dt.datetime:
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)

    bounds = [None, _ts(tq.a), _ts(tq.b), _ts(tq.c), None]
    m = StreamingCep(
        os.path.join(work, "state"),
        "D+ U+ D+ U+",
        _dt.timedelta(minutes=10),
    )
    for i in range(4):
        part = e
        if bounds[i] is not None:
            part = part.filter(F.col("ts") >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            part = part.filter(F.col("ts") < F.lit(bounds[i + 1]))
        m.foreach_batch(part, i)
    m.flush(spark)
    assert m.late_dropped() == 0
    return m.matches(spark).orderBy("user_id", "start_ts")


@_q(
    "st_cep_timeout",
    """
    SELECT e.user_id, e.event_id, e.ts AS a_ts
    FROM events e
    WHERE e.event_type = 'view'
      AND NOT EXISTS (
        SELECT 1 FROM events b
        WHERE b.user_id = e.user_id
          AND b.event_type = 'purchase'
          AND b.ts > e.ts
          AND b.ts <= e.ts + INTERVAL 48 HOUR)
    ORDER BY user_id, a_ts
    """,
)
def st_cep_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming absence/timeout CEP (streaming/timeout.py): every
    `view` NOT followed by a `purchase` from the same user within 48
    hours — Flink CEP's ``notFollowedBy().within()`` (the NOT-state
    the quantified-chain matchers cannot express; reference surface:
    StreamExecMatch.scala over flink-cep's NFACompiler). The events
    table streams in 4 event-time-ordered micro-batches (batch 1
    replayed — at-least-once), each A decided exactly when the
    watermark passes its deadline; after flush the emitted set must
    equal the batch NOT EXISTS oracle EXACTLY. The whole per-batch
    transition is JVM DataFrame algebra (keyed anti-join + range
    predicates — zero Python in the row path); keyed state is
    O(events in a (T + lateness) window)."""
    import datetime as _dt

    from ..streaming.timeout import StreamingTimeout

    work = _workdir("st_timeout_")
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    tq = (
        e.withColumn("_us", F.unix_micros("ts"))
        .agg(
            F.expr("percentile(_us, 0.25)").alias("a"),
            F.expr("percentile(_us, 0.5)").alias("b"),
            F.expr("percentile(_us, 0.75)").alias("c"),
        )
        .collect()[0]
    )

    def _ts(us: float) -> _dt.datetime:
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)

    bounds = [None, _ts(tq.a), _ts(tq.b), _ts(tq.c), None]
    m = StreamingTimeout(
        os.path.join(work, "state"),
        "view",
        "purchase",
        _dt.timedelta(hours=48),
        _dt.timedelta(minutes=10),
    )
    for i in range(4):
        part = e
        if bounds[i] is not None:
            part = part.filter(F.col("ts") >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            part = part.filter(F.col("ts") < F.lit(bounds[i + 1]))
        m.foreach_batch(part, i)
        if i == 1:  # at-least-once replay — must be a no-op
            m.foreach_batch(part, i)
    m.flush(spark)
    assert m.late_dropped() == 0
    return m.matches(spark).orderBy("user_id", "a_ts")


@_q(
    "st_session_dynamic_gap",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN INTERVAL 45 MINUTE
                  ELSE INTERVAL 15 MINUTE END AS gap
      FROM events
    ), m AS (
      SELECT user_id, ts,
             CASE WHEN MAX(ts + gap) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  >= ts
                  THEN 0 ELSE 1 END AS new_session
      FROM g
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM m GROUP BY user_id ORDER BY user_id
    """,
)
def st_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows as a REAL Structured Streaming
    query: the per-row gap is an expression of the row (purchases
    keep the session alive 45 minutes, everything else 15), so the
    session an event opens is ``[ts, ts + gap(row))`` and overlapping
    windows merge — the reference's SessionWindowAssigner with
    per-element extraction (SessionWindowAssigner.java's
    mergeWindows over assigner-provided spans). Append mode +
    30-minute watermark over a time-ordered 4-file stream; one
    far-future sentinel flushes every real session; the per-user
    (n_sessions, n_events) must equal the generalized
    gaps-and-islands oracle (new session iff ts exceeds the running
    max of predecessors' ts+gap) exactly."""
    work = _workdir("st_dyngap_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    filters, lo, hi = _time_range_filters(e, 4)
    for i, flt in enumerate(filters):
        # coalesce(1), not (2): with maxFilesPerTrigger=1 the two
        # sibling files of a range would be separate micro-batches
        # whose processing order is a file-listing artifact — if the
        # later-time file lands first, the sibling's on-time rows are
        # silently dropped as late under the 30-minute watermark
        # (ADVICE r9). One file per time range removes the ordering
        # assumption entirely.
        e.filter(flt).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    spark.createDataFrame(
        [(-1, -1, hi, "view")],
        "event_id long, user_id long, ts timestamp, event_type string",
    ).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 10 HOURS")
    ).coalesce(1).write.parquet(os.path.join(src, "b4_sentinel"))

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, "
            "event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("45 minutes")
    ).otherwise(F.lit("15 minutes"))
    sessions = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select("user_id", F.col("w.start").alias("s"), "cnt")
    )
    out_dir = os.path.join(work, "sessions")
    (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(out_dir)
        .filter(F.col("user_id") >= 0)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("cnt").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


@_q(
    "st_quantile_sketch",
    """
    WITH ranked AS (
      SELECT CAST(n_chars AS DOUBLE) AS v,
             md5(CAST(doc_id AS VARCHAR)) AS rk
      FROM documents
    )
    SELECT v, rk FROM ranked ORDER BY rk, v LIMIT 64
    """,
)
def st_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mergeable quantile sketch
    (streaming/quantile.py): the documents table fed in 4
    micro-batches (batch 1 replayed — at-least-once) through the
    bottom-64-by-md5 sample accumulator; because the merge law is a
    set identity, the final state must equal the whole-corpus batch
    sketch ROW FOR ROW — a full-value 64-row oracle, no tolerance.
    Per batch: one distributed TakeOrdered + an O(k) merge; state is
    exactly 64 rows forever."""
    from ..streaming.quantile import StreamingQuantileSketch

    work = _workdir("st_qsk_")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    m = StreamingQuantileSketch(
        os.path.join(work, "state"), "n_chars", "doc_id", 64
    )
    for i in range(4):
        part = docs.filter(F.pmod("doc_id", F.lit(4)) == i)
        m.foreach_batch(part, i)
        if i == 1:  # at-least-once replay — must be a no-op
            m.foreach_batch(part, i)
    return m.result(spark)


@_q(
    "st_count_window",
    """
    WITH x AS (
      SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) - 1 AS pos
      FROM events
    )
    SELECT user_id, CAST(pos // 5 AS BIGINT) AS win,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
           min(ts) AS start_ts, max(ts) AS end_ts
    FROM x
    GROUP BY 1, 2
    HAVING count(*) = 5
    ORDER BY user_id, win
    """,
)
def st_count_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING count windows (streaming/countwin.py — the
    CountTumblingWindowAssigner surface, until now batch-only via
    ops_count_window): tumbling windows of 5 rows per user in
    event-time order, fed 4 event-time micro-batches (batch 1
    replayed), each window firing exactly when its 5th row freezes
    below the watermark; partials never fire (the CountWindow
    contract — the oracle's HAVING count(*) = 5). Per-key state is
    one partial-aggregate row + the mutable lateness region; sums
    ride the int64 micro-unit decimal bridge so the totals are
    bit-identical to the oracle's DECIMAL(18,6) sums."""
    import datetime as _dt

    from ..streaming.countwin import StreamingCountWindows

    work = _workdir("st_cntw_")
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    filters, _, _ = _time_range_filters(e, 4)
    m = StreamingCountWindows(
        os.path.join(work, "state"), 5, _dt.timedelta(minutes=10)
    )
    for i, flt in enumerate(filters):
        part = e.filter(flt)
        m.foreach_batch(part, i)
        if i == 1:  # at-least-once replay — must be a no-op
            m.foreach_batch(part, i)
    m.flush(spark)
    assert m.late_dropped() == 0
    return m.windows(spark).orderBy("user_id", "win")


@_q(
    "st_count_sliding",
    """
    WITH x AS (
      SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) - 1 AS pos
      FROM events
    ), starts AS (
      SELECT user_id, CAST(pos // 2 AS BIGINT) AS win,
             pos AS start_pos
      FROM x WHERE pos % 2 = 0
    )
    SELECT s.user_id, s.win,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(r.value AS DECIMAL(18,6))) AS DOUBLE) AS total,
           min(r.ts) AS start_ts, max(r.ts) AS end_ts
    FROM starts s
    JOIN x r ON r.user_id = s.user_id
            AND r.pos >= s.start_pos AND r.pos < s.start_pos + 5
    GROUP BY 1, 2
    HAVING count(*) = 5
    ORDER BY 1, 2
    """,
)
def st_count_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SLIDING count windows (CountSlidingWindowAssigner):
    a 5-row window starts every 2 rows per user, so each row feeds up
    to 3 concurrent partials; a window fires exactly when its 5th row
    freezes. Same positional determinism, micro-unit sums, and
    partial-never-fires contract as st_count_window — the oracle
    assigns windows by row_number and keeps only full ones."""
    import datetime as _dt

    from ..streaming.countwin import StreamingCountWindows

    work = _workdir("st_cnts_")
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    filters, _, _ = _time_range_filters(e, 4)
    m = StreamingCountWindows(
        os.path.join(work, "state"), 5, _dt.timedelta(minutes=10), slide=2
    )
    for i, flt in enumerate(filters):
        part = e.filter(flt)
        m.foreach_batch(part, i)
        if i == 2:  # at-least-once replay — must be a no-op
            m.foreach_batch(part, i)
    m.flush(spark)
    assert m.late_dropped() == 0
    return m.windows(spark).orderBy("user_id", "win")


# ---------------------------------------------------------------------------
# Streaming PIVOT (streaming/pivot.py): fixed-category pivot as
# update-mode conditional aggregates — the only sound streaming-pivot
# semantics (the category scan batch pivot performs is impossible on
# an unbounded input). 4 micro-batches through the upsert sink; the
# keep-last snapshot must equal the batch pivot bit-for-bit
# (decimal-bridged totals).
# ---------------------------------------------------------------------------
_PIVOT_CATS = ["click", "error", "purchase", "signup", "view"]


def _pivot_oracle() -> str:
    cols = []
    for c in _PIVOT_CATS:
        case1 = f"CASE WHEN event_type = '{c}' THEN 1 END"
        casev = f"CASE WHEN event_type = '{c}' THEN value END"
        cols.append(f"CAST(count({case1}) AS BIGINT) AS {c}_cnt")
        cols.append(f"{dsum_sql(casev)} AS {c}_total")
    sel = ",\n           ".join(cols)
    return f"""
    SELECT CAST(user_id % 16 AS BIGINT) AS cohort,
           {sel}
    FROM events
    GROUP BY cohort
    ORDER BY cohort
    """


@_q("st_pivot", _pivot_oracle())
def st_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming pivot on event_type over 16 user cohorts: declared
    category list lowered to FILTER-ed aggregate pairs (the Blink
    streaming-agg spelling), update mode, upsert keep-last sink."""
    from ..streaming.pivot import streaming_pivot
    from ..streaming.sinks import ParquetUpsertSink

    work = _workdir("st_pivot_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    for i in range(4):
        events.filter(F.pmod("event_id", F.lit(4)) == i).coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{i}"))

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
        stream, ["cohort"], "event_type", _PIVOT_CATS, "value"
    )
    sink = ParquetUpsertSink(os.path.join(work, "log"), ["cohort"])
    (
        piv.writeStream.outputMode("update")
        .foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    out_cols = ["cohort"] + [
        f"{c}_{m}" for c in _PIVOT_CATS for m in ("cnt", "total")
    ]
    return sink.snapshot(spark).select(*out_cols).orderBy("cohort")


# ---------------------------------------------------------------------------
# Streaming HLL distinct-count rollup: hll_sketch_agg as the
# STREAMING aggregate (the state store holds one sketch buffer per
# group — bounded state for distinct-count over an unbounded stream),
# upsert keep-last snapshot, then hll_union_agg rolls the per-source
# sketches into the corpus sketch — the partial/merge topology every
# 1000-executor distinct-count runs. Same hard gate as the batch
# entry (ops_hll_mergeable): every estimate within 5 % of the exact
# count computed batch-side in the same job; the oracle pins the
# group list.
# ---------------------------------------------------------------------------
@_q(
    "st_hll_rollup",
    """
    SELECT source, TRUE AS within_tolerance
    FROM (SELECT DISTINCT source FROM documents
          UNION ALL SELECT '__all__')
    ORDER BY source
    """,
)
def st_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct document-content counting over a 4-micro-batch
    stream: HLL sketch state per source, merged corpus-wide after the
    stream drains."""
    from ..streaming.sinks import ParquetUpsertSink

    work = _workdir("st_hll_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("h")
    )
    for i in range(4):
        d.filter(F.pmod("doc_id", F.lit(4)) == i).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    stream = (
        spark.readStream.schema("doc_id long, source string, h string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = stream.groupBy("source").agg(F.hll_sketch_agg("h").alias("sk"))
    sink = ParquetUpsertSink(os.path.join(work, "log"), ["source"])
    (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    snap = sink.snapshot(spark)
    per = snap.select(
        "source", F.hll_sketch_estimate("sk").alias("est")
    )
    merged = snap.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).select(F.lit("__all__").alias("source"), "est")
    exact = d.groupBy("source").agg(F.count_distinct("h").alias("exact"))
    exact_all = d.agg(F.count_distinct("h").alias("exact")).select(
        F.lit("__all__").alias("source"), "exact"
    )
    est = per.unionByName(merged)
    ex = exact.unionByName(exact_all)
    return (
        est.join(ex, "source")
        .select(
            "source",
            (
                F.abs(F.col("est") - F.col("exact"))
                <= 0.05 * F.col("exact")
            ).alias("within_tolerance"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Retention-bounded snapshot expiry (streaming/sinks.py vacuum): the
# third table-maintenance operator next to compaction
# (ops_compact_table) and clustering (ops_zorder_cluster). Six
# micro-batches, vacuum retaining 2: the entry asserts IN-ENTRY that
# storage collapsed to exactly 3 changelog partitions, then
# value-checks BOTH surviving views — time travel to the newest
# retained version (as_of 4, still exact after expiry) and the
# current snapshot — against prefix/full oracles on the raw events.
# ---------------------------------------------------------------------------
@_q(
    "st_vacuum_retention",
    f"""
    SELECT CAST(4 AS INTEGER) AS as_of, event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total
    FROM events WHERE event_id % 6 <= 4
    GROUP BY event_type
    UNION ALL
    SELECT CAST(5 AS INTEGER), event_type,
           CAST(count(*) AS BIGINT),
           {dsum_sql('value')}
    FROM events
    GROUP BY event_type
    ORDER BY as_of, event_type
    """,
)
def st_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM with a 2-version retention window over the upsert
    changelog: bounded storage, exact time travel inside the window."""
    from ..streaming.sinks import ParquetUpsertSink

    work = _workdir("st_vacuum_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    for i in range(6):
        events.filter(F.pmod("event_id", F.lit(6)) == i).coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{i}"))

    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        dsum(F.col("value")).alias("total"),
    )
    sink = ParquetUpsertSink(os.path.join(work, "log"), ["event_type"])
    (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    manifest = sink.vacuum(spark, retain_batches=2)
    if manifest["partitions"] != 3 or manifest["cutoff"] != 3:
        raise AssertionError(f"vacuum retention broke: {manifest}")
    n_parts = len(
        [d for d in os.listdir(sink.path) if d.startswith("__batch_id=")]
    )
    if n_parts != 3:
        raise AssertionError(f"changelog kept {n_parts} partitions")
    v4 = sink.snapshot(spark, as_of_batch=4).select(
        F.lit(4).cast("int").alias("as_of"), "event_type", "cnt", "total"
    )
    cur = sink.snapshot(spark).select(
        F.lit(5).cast("int").alias("as_of"), "event_type", "cnt", "total"
    )
    return v4.unionByName(cur).orderBy("as_of", "event_type")


# ---------------------------------------------------------------------------
# Broadcast-state / side-input refresh (the Flink
# BroadcastProcessFunction pattern — a slowly-changing rules stream
# joined against the event stream, each event matched by the rules
# IN FORCE at its arrival batch, not today's). The rules table is
# re-read INSIDE foreachBatch and filtered to rule_batch <= batch_id,
# then broadcast-joined — per batch the rules side is tiny by
# contract, so no shuffle ever touches the event side. The oracle
# replays the as-of-batch rule resolution in closed form.
# ---------------------------------------------------------------------------
@_q(
    "st_broadcast_rules",
    """
    WITH rules AS (
      SELECT t.event_type, b.rule_batch,
             CAST((b.rule_batch + 1) * (10 + length(t.event_type))
                  AS DOUBLE) AS threshold
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT CAST(g AS INTEGER) AS rule_batch
            FROM generate_series(0, 3) s(g)) b
    ),
    ev AS (
      SELECT event_id, event_type, value,
             CAST(event_id % 4 AS INTEGER) AS batch
      FROM events
    ),
    applied AS (
      SELECT ev.event_id, ev.event_type, ev.batch,
             max(rules.rule_batch) AS rule_in_force
      FROM ev JOIN rules
        ON rules.event_type = ev.event_type
       AND rules.rule_batch <= ev.batch
      GROUP BY ev.event_id, ev.event_type, ev.batch
    )
    SELECT a.event_id, a.event_type,
           CAST(a.batch AS INTEGER) AS batch,
           CAST(a.rule_in_force AS INTEGER) AS rule_in_force,
           CAST(ev.value > (a.rule_in_force + 1)
                           * (10 + length(a.event_type))
                AS BOOLEAN) AS flagged
    FROM applied a JOIN ev ON ev.event_id = a.event_id
    ORDER BY a.event_id
    """,
)
def st_broadcast_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events flow in 4 micro-batches; a versioned rules table is
    reloaded per batch and applied AS OF that batch (rule_batch <=
    batch_id, latest wins). Results accumulate in an append log —
    re-matching an old event under newer rules would be wrong and
    cannot happen because matching occurs inside the batch."""
    work = _workdir("st_bcast_")
    src = os.path.join(work, "in")
    out_dir = os.path.join(work, "out")
    os.makedirs(src)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    for i in range(4):
        events.filter(F.pmod("event_id", F.lit(4)) == i).coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{i}"))
    # the versioned rules table: one version per batch, all visible
    # on disk — VISIBILITY is governed by rule_batch <= batch_id
    # inside the handler (the as-of contract)
    rules_path = os.path.join(work, "rules")
    types = [r[0] for r in events.select("event_type").distinct().collect()]
    spark.createDataFrame(
        [
            (t, b, float((b + 1) * (10 + len(t))))
            for t in types
            for b in range(4)
        ],
        "event_type string, rule_batch int, threshold double",
    ).write.parquet(rules_path)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        rules = (
            sp.read.parquet(rules_path)
            .filter(F.col("rule_batch") <= int(batch_id))
        )
        r = rules.alias("r")
        latest = (
            rules.groupBy("event_type")
            .agg(F.max("rule_batch").alias("rule_in_force"))
            .alias("l")
        )
        in_force = r.join(
            latest,
            (F.col("r.event_type") == F.col("l.event_type"))
            & (F.col("r.rule_batch") == F.col("l.rule_in_force")),
        ).select(
            F.col("r.event_type").alias("event_type"),
            F.col("l.rule_in_force").alias("rule_in_force"),
            F.col("r.threshold").alias("threshold"),
        )
        matched = batch_df.join(
            F.broadcast(in_force), "event_type"
        ).select(
            "event_id",
            "event_type",
            F.lit(int(batch_id)).cast("int").alias("batch"),
            F.col("rule_in_force").cast("int"),
            (F.col("value") > F.col("threshold")).alias("flagged"),
        )
        matched.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"__batch_id={int(batch_id)}")
        )

    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    (
        stream.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(out_dir)
        .select("event_id", "event_type", "batch", "rule_in_force", "flagged")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Multi-source stream UNION (the Flink multi-input union topology):
# two independent file streams — different directories, different
# batch cadence (1 vs 2 files per trigger), one source missing the
# value column (NULL-filled via unionByName) — merged into ONE
# update-mode aggregation. The oracle is the same aggregate over the
# batch union; totals ride the decimal bridge so merge order across
# sources cannot move a bit.
# ---------------------------------------------------------------------------
@_q(
    "st_union_streams",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(count(value) AS BIGINT) AS cnt_valued,
           {dsum_sql('value')} AS total
    FROM (
      SELECT event_type, value FROM events WHERE event_id % 2 = 0
      UNION ALL
      SELECT event_type, NULL AS value FROM events WHERE event_id % 2 = 1
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def st_union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two schemas, two cadences, one streaming aggregate."""
    from ..streaming.sinks import ParquetUpsertSink

    work = _workdir("st_union_")
    src_a = os.path.join(work, "in_a")
    src_b = os.path.join(work, "in_b")
    os.makedirs(src_a)
    os.makedirs(src_b)
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.pmod("event_id", F.lit(2)) == 0).select(
        "event_id", "event_type", "value"
    )
    b = events.filter(F.pmod("event_id", F.lit(2)) == 1).select(
        "event_id", "event_type"
    )
    for i in range(4):
        a.filter(F.pmod("event_id", F.lit(8)) == 2 * i).coalesce(
            1
        ).write.parquet(os.path.join(src_a, f"b{i}"))
        b.filter(
            F.pmod("event_id", F.lit(8)) == 2 * i + 1
        ).coalesce(1).write.parquet(os.path.join(src_b, f"b{i}"))

    sa = (
        spark.readStream.schema(
            "event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_a)
    )
    sb = (
        spark.readStream.schema("event_id long, event_type string")
        .option("maxFilesPerTrigger", 2)
        .option("recursiveFileLookup", "true")
        .parquet(src_b)
    )
    unioned = sa.unionByName(sb, allowMissingColumns=True)
    agg = unioned.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.count("value").cast("bigint").alias("cnt_valued"),
        dsum(F.col("value")).alias("total"),
    )
    sink = ParquetUpsertSink(os.path.join(work, "log"), ["event_type"])
    (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        sink.snapshot(spark)
        .select("event_type", "cnt", "cnt_valued", "total")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Streaming SCD Type-2 maintenance (streaming/scd2.py): the dimension
# is built INCREMENTALLY — each arriving version closes its
# predecessor (valid_to = successor ts) and becomes the open row;
# per batch only touched keys move (join + anti-join on the key),
# closed history lives in immutable per-batch partitions. The final
# (closed ∪ open) table must hash-match the one-shot batch SCD2
# build over the full history (the ops_scd2_dimension oracle).
# Batches are time-range splits (the CDC in-order-per-key contract).
# ---------------------------------------------------------------------------
@_q(
    "st_scd2",
    """
    WITH versions AS (
      SELECT user_id, event_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM events
    )
    SELECT user_id, event_id, event_type, valid_from, valid_to,
           CAST(valid_to IS NULL AS BOOLEAN) AS is_current
    FROM versions
    WHERE user_id % 10 = 0
    ORDER BY user_id, valid_from, event_id
    """,
)
def st_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four time-range micro-batches maintain the versioned dimension
    incrementally; the maintained table equals the batch build."""
    from ..streaming.scd2 import Scd2State

    work = _workdir("st_scd2_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    # percentile_disc rejects timestamps; rank cuts via ntile over
    # the small distinct-ts set instead (deterministic, type-safe)
    cuts_rows = (
        events.select("ts")
        .distinct()
        .select(
            "ts",
            F.ntile(4).over(Window.orderBy("ts")).alias("q"),
        )
        .groupBy("q")
        .agg(F.max("ts").alias("cut"))
        .orderBy("q")
        .collect()
    )
    c = [r.cut for r in cuts_rows]
    cuts = type("C", (), {"c1": c[0], "c2": c[1], "c3": c[2]})()
    ranges = [
        F.col("ts") <= cuts.c1,
        (F.col("ts") > cuts.c1) & (F.col("ts") <= cuts.c2),
        (F.col("ts") > cuts.c2) & (F.col("ts") <= cuts.c3),
        F.col("ts") > cuts.c3,
    ]
    for i, flt in enumerate(ranges):
        events.filter(flt).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    state = Scd2State(os.path.join(work, "dim"))
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    (
        stream.writeStream.outputMode("append")
        .foreachBatch(state.foreach_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        state.result(spark)
        .filter(F.col("user_id") % 10 == 0)
        .select(
            "user_id",
            "event_id",
            "event_type",
            "valid_from",
            "valid_to",
            "is_current",
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


@_q(
    "st_async_enrich",
    f"""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('o_totalprice')} AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def st_async_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING async lookup enrichment — the shape the reference's
    AsyncLookupJoinRunner.java actually runs in (StreamExecLookupJoin
    with an AsyncTableFunction): an unbounded order stream is
    enriched per micro-batch against the customer dimension service
    with capacity-bounded in-flight lookups (operators/async_lookup.py
    inside foreachBatch — the probe rows never leave the executors),
    landing in per-batch overwrite directories so a replayed batch is
    idempotent. Two availableNow runs over one checkpoint (second
    half of the stream appended between runs) prove the enrichment
    composes with offset-contract resume; the enriched landing zone
    must aggregate value-exactly like the batch equi-join."""
    from ..operators.async_lookup import async_lookup_join
    from ..sources import restds

    ddl = "o_custkey bigint, o_totalprice double"
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey", "o_totalprice")
    )
    rows = [
        {"o_custkey": r.o_custkey, "o_totalprice": r.o_totalprice}
        for r in o.collect()
    ]
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    dim_rows = [
        {"c_custkey": r.c_custkey, "c_mktsegment": r.c_mktsegment}
        for r in c.collect()
    ]
    half = len(rows) // 2
    src_srv, src_url = restds.start_row_service(ddl, rows[:half])
    dim_srv, dim_url = restds.start_row_service(
        "c_custkey bigint, c_mktsegment string", dim_rows
    )
    for s in (src_srv, dim_srv):
        _REST_SERVERS.append(s)
        atexit.register(s.shutdown)
    restds.register(spark)

    work = _workdir("st_async_enrich_")
    ckpt = os.path.join(work, "ckpt")
    out = os.path.join(work, "out")

    def enrich(bdf: DataFrame, batch_id: int) -> None:
        enriched = async_lookup_join(
            bdf,
            dim_url,
            "o_custkey",
            "c_custkey",
            "c_custkey bigint, c_mktsegment string",
            right_cols=["c_mktsegment"],
            how="inner",
            capacity=8,
            batch_keys=64,
        )
        # per-batch overwrite directory: a retried/replayed batch id
        # lands in the same path — exactly-once in effect
        enriched.write.mode("overwrite").parquet(
            os.path.join(out, f"batch_{batch_id}")
        )

    def run_once(retries: int = 1) -> None:
        try:
            q = (
                spark.readStream.format("flinkrest")
                .option("url", src_url)
                .option("mode", "scalable")
                .option("numpartitions", "4")
                .load()
                .writeStream.foreachBatch(enrich)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                # still running after the timeout: stop it — a live
                # query on this checkpoint would collide with the next
                # run and the landing zone would be read mid-write
                q.stop()
                raise TimeoutError("st_async_enrich run exceeded 300 s")
        except (TimeoutError, StreamingQueryException) as e:
            # The whole pipeline is built to survive exactly this:
            # offsets resume from the checkpoint and a replayed batch
            # overwrites its own directory, so a restart after a
            # transient failure (e.g. a Python worker lost under host
            # load) is the Flink/Spark recovery contract, not a retry
            # hack. ONLY the transient classes retry — an
            # assertion-class bug propagates on first occurrence — and
            # the swallowed first failure is logged so it is never
            # invisible. One restart; a second failure propagates.
            if retries <= 0:
                raise
            print(
                "st_async_enrich: restarting from checkpoint after "
                f"{type(e).__name__}: {e}",
                file=sys.stderr,
            )
            run_once(retries - 1)

    run_once()
    restds._post(src_url + "/append", ndjson=rows[half:])
    run_once()

    back = spark.read.parquet(os.path.join(out, "batch_*"))
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
        .orderBy("c_mktsegment")
    )
