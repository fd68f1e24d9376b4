"""Batch-incremental aggregate maintenance (materialized rollup).

The warehouse "incremental model" pattern: a grouped rollup over an
append-only fact stream is maintained by merging each new batch's
PARTIAL aggregates into a persisted state table, instead of
re-scanning history — the batch counterpart of Structured
Streaming's update-mode aggregation (same algebra, state in parquet
instead of the state store), and of the reference's retract-stream
accumulators.

Only algebraically mergeable aggregates participate: COUNT and SUM
merge by +, MIN/MAX by least/greatest. AVG is derived (sum/count) at
read time — storing it directly would be unmergeable. This is the
same partial/final split Catalyst plans inside a single query,
lifted across job boundaries.

Scale shape: each update aggregates ONLY the new batch (map-side
combine, one shuffle on the group key), then merges with the state
table via a keyed outer join — state-sized, not history-sized. The
state rewrite goes to a fresh directory with a local-rename swap;
a cluster deployment swaps via its object-store commit protocol.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CrashSafeParquetState:
    """Shared machinery for parquet-backed incremental state with a
    crash-safe directory swap and replay-idempotent batch tracking.
    Subclasses call ``_swap_in(merged, batch_id, markers)``; markers
    are small text files written INSIDE the candidate dir so they
    promote atomically with the state they describe (underscore
    prefix → invisible to Spark's parquet reader)."""

    def __init__(self, path: str):
        self.path = path

    def _recover(self) -> None:
        """Heal the one non-atomic crash window of the swap below: a
        crash between ``move(path, .old)`` and ``move(.updating,
        path)`` leaves only the backup — without this, the next
        ``update`` would treat its single batch as the FULL state and
        then delete the backup, silently discarding all history. A
        backup alongside a live state dir (crash after promote,
        before cleanup) is stale and removed."""
        backup = self.path + ".old"
        if os.path.isdir(backup):
            if not os.path.isdir(self.path):
                shutil.move(backup, self.path)
            else:
                shutil.rmtree(backup)
        # a crash between the tmp write and the swap leaves a
        # state-sized orphan; the next write would overwrite it, but a
        # state that is never written again would leak it forever
        updating = self.path + ".updating"
        if os.path.isdir(updating):
            shutil.rmtree(updating)

    #: filename of the last-applied-batch marker INSIDE the state dir
    #: (underscore prefix → invisible to Spark's parquet reader, and
    #: promoted atomically with the state it describes)
    BATCH_MARKER = "_LAST_BATCH"

    def _last_batch(self) -> int:
        """Last batch id merged into the live state (−1 if none /
        batch tracking unused). Reading after ``_recover`` means the
        marker always describes the state that is actually live."""
        p = os.path.join(self.path, self.BATCH_MARKER)
        if os.path.isfile(p):
            with open(p) as f:
                return int(f.read().strip())
        return -1

    def _marker(self, name: str) -> str | None:
        """Read an auxiliary marker from the live state dir."""
        p = os.path.join(self.path, name)
        if os.path.isfile(p):
            with open(p) as f:
                return f.read().strip()
        return None

    def _swap_in(
        self,
        merged: DataFrame,
        batch_id: int | None = None,
        markers: dict[str, str] | None = None,
    ) -> None:
        tmp = self.path + ".updating"
        merged.write.mode("overwrite").parquet(tmp)
        if batch_id is not None:
            # written into the candidate dir BEFORE the swap, so the
            # marker and the state it describes promote atomically —
            # no window where the state is new but the marker is old
            with open(os.path.join(tmp, self.BATCH_MARKER), "w") as f:
                f.write(f"{int(batch_id)}\n")
        for name, val in (markers or {}).items():
            with open(os.path.join(tmp, name), "w") as f:
                f.write(f"{val}\n")
        # Crash-safe swap: move the live state aside before promoting
        # the new one, so a crash at any point leaves either the old
        # state (at .old, recoverable) or the new state in place —
        # never a window with no state at all.
        backup = self.path + ".old"
        if os.path.isdir(backup):
            shutil.rmtree(backup)
        if os.path.isdir(self.path):
            shutil.move(self.path, backup)
        shutil.move(tmp, self.path)
        if os.path.isdir(backup):
            shutil.rmtree(backup)


class IncrementalAggState(CrashSafeParquetState):
    """Maintains ``groupBy(keys).agg(count, sum(v), min(v), max(v))``
    over an append-only stream of batches, with state persisted at
    ``path``. ``result()`` exposes the rollup including the derived
    average.
    """

    def __init__(self, path: str, key_cols: list[str], value_col: str):
        super().__init__(path)
        self.key_cols = list(key_cols)
        self.value_col = value_col

    def _partial(self, df: DataFrame) -> DataFrame:
        v = F.col(self.value_col)
        return df.groupBy(*self.key_cols).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            # decimal-bridged sum: merging must be associative across
            # any batch arrival order, like every float agg here
            F.sum(v.cast("decimal(18,6)")).alias("s"),
            F.min(v).alias("mn"),
            F.max(v).alias("mx"),
        )

    def update(
        self, spark, batch_df: DataFrame, batch_id: int | None = None
    ) -> None:
        """Merge one new batch into the state (one batch-sized agg +
        one state-sized keyed merge; history is never re-read)."""
        self._recover()
        part = self._partial(batch_df)
        if os.path.isdir(self.path):
            state = spark.read.parquet(self.path)
            merged = (
                state.selectExpr(
                    *self.key_cols,
                    "n as n_a",
                    "s as s_a",
                    "mn as mn_a",
                    "mx as mx_a",
                )
                .join(
                    part.selectExpr(
                        *self.key_cols,
                        "n as n_b",
                        "s as s_b",
                        "mn as mn_b",
                        "mx as mx_b",
                    ),
                    self.key_cols,
                    "full_outer",
                )
                .select(
                    *self.key_cols,
                    (
                        F.coalesce("n_a", F.lit(0))
                        + F.coalesce("n_b", F.lit(0))
                    ).cast("bigint").alias("n"),
                    (
                        F.coalesce(F.col("s_a"), F.lit(0).cast("decimal(18,6)"))
                        + F.coalesce(F.col("s_b"), F.lit(0).cast("decimal(18,6)"))
                    ).cast("decimal(18,6)").alias("s"),
                    F.least(
                        F.coalesce("mn_a", "mn_b"), F.coalesce("mn_b", "mn_a")
                    ).alias("mn"),
                    F.greatest(
                        F.coalesce("mx_a", "mx_b"), F.coalesce("mx_b", "mx_a")
                    ).alias("mx"),
                )
            )
        else:
            merged = part
        self._swap_in(merged, batch_id)

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """``writeStream.foreachBatch`` adapter: the same merge serves
        a Structured Streaming micro-batch pipeline — batch and
        stream maintain identical state (update-mode aggregation with
        parquet state instead of the state store).

        Replay-idempotent (ADVICE r7): ``foreachBatch`` is
        at-least-once, and a +-merge is NOT naturally idempotent — a
        post-promote/pre-checkpoint crash replays the same
        ``batch_id`` and would double-count it. The last applied id
        is persisted inside the state dir (promoted atomically with
        the state) and replayed batches are skipped."""
        self._recover()
        if batch_id <= self._last_batch():
            return
        self.update(batch_df.sparkSession, batch_df, batch_id=batch_id)

    def result(self, spark) -> DataFrame:
        """The maintained rollup: count, sum, min, max + derived avg."""
        self._recover()
        state = spark.read.parquet(self.path)
        return state.select(
            *self.key_cols,
            F.col("n").alias("cnt"),
            F.col("s").cast("double").alias("total"),
            F.col("mn").alias("min_value"),
            F.col("mx").alias("max_value"),
            (F.col("s").cast("double") / F.col("n")).alias("avg_value"),
        )
