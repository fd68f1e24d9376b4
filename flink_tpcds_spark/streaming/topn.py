"""Streaming top-n (reference StreamExecRank / AppendOnlyTopNFunction —
SURVEY §2.7: "no streaming top-n primitive" in Spark).

Idiomatic Spark form: a streaming aggregation maintains the per-key
totals (update/complete mode state), and ``foreachBatch`` applies the
batch ``top_n`` operator to each micro-batch's full result — the
rank-over-state computation the reference's TopNBuffer does
incrementally. For bounded-state totals this matches the reference's
updatable top-n variant semantics at micro-batch granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import top_n


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
        ranked = top_n(
            batch_df,
            [],
            [F.desc("total_value"), F.asc(key_col)],
            k,
            rank_col="rn",
        )
        # foreachBatch must CONSUME the micro-batch — materialize the
        # k rows, then publish them as the upsert-style result view.
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
