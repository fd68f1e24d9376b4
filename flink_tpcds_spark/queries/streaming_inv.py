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
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
        big.filter(flt).coalesce(2).write.parquet(
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
