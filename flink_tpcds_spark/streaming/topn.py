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
