"""Streaming heavy hitters: a Misra-Gries summary maintained across
micro-batches with parquet state.

The streaming counterpart of ``operators/sketch.py``
``frequent_items_sketch`` — the reference's closest surface is the
retract-mode top-n operator (`runtime/.../rank/`), which keeps EXACT
per-key counts in keyed state: at an unbounded key domain (tokens,
URLs) that state grows with the domain. The MG summary keeps at most
``cap`` counters total, ever, and the mergeable-summaries property
(Agarwal et al. 2012) makes the micro-batch accumulation sound: a
merge tree of summaries is itself a summary, so after any number of
batches

    true(x) − n/(k+1) − n/(cap+1)  ≤  est(x)  ≤  true(x)

where n is the total rows processed: the per-batch sketches discharge
≥ (k+1)·t of processed mass per internal trim (Σ ≤ n/(k+1)), and
every state-level trim to ``cap`` survivors discharges ≥ (cap+1)·t
(Σ ≤ n/(cap+1)). With the default cap = 8·k the combined error stays
under 1.15·n/(k+1).

State layout and crash story are shared with
``sources/incremental.py`` (``CrashSafeParquetState``): atomic
dir-swap promotion, ``_LAST_BATCH`` replay-idempotency marker, and an
``_N_ROWS`` marker carrying the processed-mass total the bound needs
— all promoted atomically with the state they describe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import frequent_items_sketch
from ..sources.incremental import CrashSafeParquetState


class StreamingFrequentItems(CrashSafeParquetState):
    """Maintains a corpus-wide heavy-hitter summary of ``item_col``
    over an append-only micro-batch stream. ``result()`` returns
    ``(item, est)``; ``total_rows()`` the processed mass n (for the
    caller's n/(k+1) threshold)."""

    N_MARKER = "_N_ROWS"

    def __init__(self, path: str, item_col: str, k: int = 64, cap: int | None = None):
        super().__init__(path)
        self.item_col = item_col
        self.k = k
        self.cap = cap if cap is not None else 8 * k

    def total_rows(self) -> int:
        self._recover()
        v = self._marker(self.N_MARKER)
        return int(v) if v is not None else 0

    def update(
        self, spark, batch_df: DataFrame, batch_id: int | None = None
    ) -> None:
        """Sketch ONE batch (distributed, O(parts × k) partials) and
        merge into the state; the state-level trim keeps ≤ cap
        counters by subtracting the (cap+1)-th largest — a valid
        mergeable-summary operation, accounted in the bound above."""
        self._recover()
        n_batch = batch_df.filter(F.col(self.item_col).isNotNull()).count()
        part = frequent_items_sketch(batch_df, self.item_col, k=self.k)
        if os.path.isdir(self.path):
            state = spark.read.parquet(self.path)
            merged = (
                state.unionByName(part)
                .groupBy("item")
                .agg(F.sum("est").alias("est"))
            )
        else:
            merged = part
        # Summary-level trim, fully distributed: only the scalar
        # threshold crosses the driver. The summary is ≤ cap +
        # parts×k rows by construction, so these are tiny jobs.
        # Materialize once: count + trim + state write would otherwise
        # each re-run the batch sketch (mapInPandas) from scratch.
        merged = merged.localCheckpoint(eager=True)
        if merged.count() > self.cap:
            t = (
                merged.select("est")
                .orderBy(F.desc("est"))
                .limit(self.cap + 1)
                .agg(F.min("est"))
                .collect()[0][0]
            )
            merged = merged.filter(F.col("est") > t).withColumn(
                "est", F.col("est") - F.lit(t)
            )
        self._swap_in(
            merged,
            batch_id,
            markers={self.N_MARKER: str(self.total_rows() + n_batch)},
        )

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """``writeStream.foreachBatch`` adapter; at-least-once replays
        of the same ``batch_id`` are skipped (the marker promotes
        atomically with the state, same contract as
        ``IncrementalAggState.foreach_batch``)."""
        self._recover()
        if batch_id <= self._last_batch():
            return
        self.update(batch_df.sparkSession, batch_df, batch_id=batch_id)

    def result(self, spark) -> DataFrame:
        self._recover()
        return spark.read.parquet(self.path)
