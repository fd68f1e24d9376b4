"""Streaming top-n (reference StreamExecRank / AppendOnlyTopNFunction —
SURVEY §2.7: "no streaming top-n primitive" in Spark).

Idiomatic Spark form: a streaming aggregation maintains the per-key
totals (update/complete mode state), and ``foreachBatch`` takes the
global top-k of each micro-batch's full state via distributed
TakeOrdered (per-partition heaps + k-row merge — never a
single-partition ranking window) — the rank-over-state computation
the reference's TopNBuffer does incrementally. For bounded-state
totals this matches the reference's updatable top-n variant
semantics at micro-batch granularity; the only driver transfer is
the k-row result itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_top_k_by_value(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    k: int = 5,
    sink_table: str = "stream_topn",
):
    """Maintain the top-k keys by summed value over an event stream.

    Returns the started StreamingQuery; results land in the global temp
    view ``sink_table`` (overwritten per micro-batch — an upsert sink).
    """
    totals = events.groupBy(key_col).agg(
        F.sum(F.col(value_col)).alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        # Distributed TakeOrdered over the full aggregate state
        # (per-partition heaps + k-row merge), NOT a global
        # single-partition ranking window; row_number then ranks only
        # the k surviving rows.
        order = [F.desc("total_value"), F.asc(key_col)]
        topk = batch_df.orderBy(*order).limit(k)
        ranked = topk.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        )
        # foreachBatch must CONSUME the micro-batch — materialize the
        # k rows (bounded driver transfer by construction), then
        # publish them as the upsert-style result view.
        rows = ranked.collect()
        ranked.sparkSession.createDataFrame(
            rows, ranked.schema
        ).createOrReplaceGlobalTempView(sink_table)

    return (
        totals.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )


def streaming_top_k_retract(
    updates: DataFrame,
    path: str,
    key_col: str = "user_id",
    value_col: str = "total_value",
    k: int = 5,
):
    """Retraction-mode streaming top-N (reference
    RetractableTopNFunction.java — the StreamExecRank variant for an
    UPDATING input whose rows can be demoted out of the top-k, unlike
    AppendOnlyTopNFunction's insert-only contract).

    ``updates`` is an upsert changelog stream: each micro-batch
    carries ``(key, value)`` rows giving changed keys' NEW values
    (update-mode aggregation output — at most one row per key per
    batch). A NULL value is a DELETE tombstone — the reference's
    input contract is "acc, delete or retract records"
    (RetractableTopNFunction.java:52): the key leaves the ranking
    entirely (its rank's next occupant emits the (-,+) pair), and a
    later non-NULL update re-inserts it. Per micro-batch:

    1. fold the batch into the keyed totals state
       (:class:`~.sinks.ParquetUpsertSink` keep-last — the
       reference's dataState map);
    2. rank the folded snapshot's top-k by distributed TakeOrdered
       (per-partition heaps + k-row merge; the row_number window runs
       over the k survivors only — the treeMap analog);
    3. feed the rank-keyed top-k table to a
       :class:`~.sinks.ParquetRetractSink`: ranks whose occupant
       (key, value) changed emit ``(-old, +new)`` pairs — exactly the
       retract/emit stream RetractableTopNFunction produces when an
       update pushes a row into, out of, or around the top-k.

    Both sinks are replay-idempotent (upsert overwrites its batch
    partition; retract skips already-applied batch ids), so the
    composition inherits exactly-once effect under foreachBatch's
    at-least-once replay. Returns ``(query, totals_sink, rank_sink)``
    — final answer is ``rank_sink.snapshot()``; the changelog's
    ``'-'`` ops are the retractions; ``rank_sink.replay()`` must fold
    back to the snapshot (the retract-changelog contract).

    Scale shape: the state fold and the diff are keyed joins on the
    executors; the only driver transfer is the k-row top-k itself.
    """
    import os

    from .sinks import ParquetRetractSink, ParquetUpsertSink

    totals = ParquetUpsertSink(os.path.join(path, "totals"), [key_col])
    ranks = ParquetRetractSink(os.path.join(path, "topk"), ["rn"])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        totals.foreach_batch(batch_df, batch_id)
        # tombstones stay in the keep-last state (so a delete beats
        # an older value and a later update beats the delete) but are
        # excluded from the ranking — the delete-record path
        snap = totals.snapshot(batch_df.sparkSession).filter(
            F.col(value_col).isNotNull()
        )
        order = [F.desc(value_col), F.asc(key_col)]
        topk = snap.orderBy(*order).limit(k)
        ranked = topk.select(
            F.row_number().over(Window.orderBy(*order)).alias("rn"),
            key_col,
            value_col,
        )
        ranks.foreach_batch(ranked, batch_id)

    q = (
        updates.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    return q, totals, ranks
