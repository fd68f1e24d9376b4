"""Incremental view maintenance for an inner equi-join (ΔV algebra).

The materialized-view counterpart of `IncrementalAggState`: a join
view V = A ⋈ B is maintained under append-only deltas on BOTH sides
with the classic change-propagation identity

    ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

so each batch touches delta-sized frames against state-sized sides —
never a recomputation of the whole join. This is exactly the algebra
the reference's retract-stream machinery exists to serve
(StreamExecJoin's state views emit the same three terms per arriving
row; here the unit is a micro-batch and the state is parquet).

Storage layout (the `ParquetUpsertSink` idiom): each side and the
view are hive-partitioned by the applying batch —

    <root>/a/__batch_id=N/   ΔA of batch N
    <root>/b/__batch_id=N/   ΔB of batch N
    <root>/v/__batch_id=N/   ΔV of batch N (computed vs batches < N)

Replay idempotency falls out of the layout instead of a marker: the
delta of batch N is a pure function of (input deltas, state strictly
before N), and a replayed batch OVERWRITES its three partitions with
the identical rows. A crash mid-update is healed by the at-least-once
redelivery of the same batch (the standard foreachBatch contract):
writes go a → b → v, and every read filters __batch_id < N, so a
half-written batch N never pollutes its own recomputation.

Scale shape: the three ΔV joins shuffle (or broadcast — deltas are
small, Catalyst picks) on the join keys only; appends are new
partition directories (no state rewrite at all, unlike the rollup
state's swap); `view()` is a plain partitioned scan.

Constraints (standard for join IVM): append-only sides (retractions
would need the (-old,+new) op algebra of `ParquetRetractSink`), and
non-key columns disjoint between A and B.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_COL = "__batch_id"


class JoinViewState:
    """Maintain the inner equi-join view of two append-only sides."""

    def __init__(self, path: str, keys: list[str]):
        self.path = path
        self.keys = list(keys)

    def _sub(self, side: str) -> str:
        return os.path.join(self.path, side)

    def _read_before(
        self, spark: SparkSession, side: str, batch_id: int, like: DataFrame
    ) -> DataFrame:
        """All rows of ``side`` from batches strictly before
        ``batch_id`` (empty frame with the delta's schema if none)."""
        root = self._sub(side)
        if not os.path.isdir(root):
            return spark.createDataFrame([], like.schema)
        return (
            spark.read.option("basePath", root)
            .parquet(root)
            .filter(F.col(BATCH_COL) < batch_id)
            .drop(BATCH_COL)
        )

    def _write(self, df: DataFrame, side: str, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(self._sub(side), f"{BATCH_COL}={int(batch_id)}")
        )

    def update(
        self,
        spark: SparkSession,
        delta_a: DataFrame,
        delta_b: DataFrame,
        batch_id: int,
    ) -> None:
        """Apply one batch of deltas. Deterministic and idempotent:
        replaying a batch overwrites its partitions with identical
        rows because ΔV is computed against batches < batch_id only."""
        overlap = (set(delta_a.columns) & set(delta_b.columns)) - set(
            self.keys
        )
        if overlap:
            raise ValueError(
                f"non-key columns must be disjoint, both sides have: "
                f"{sorted(overlap)}"
            )
        a_old = self._read_before(spark, "a", batch_id, delta_a)
        b_old = self._read_before(spark, "b", batch_id, delta_b)
        dv = (
            delta_a.join(b_old, self.keys)
            .unionByName(a_old.join(delta_b, self.keys))
            .unionByName(delta_a.join(delta_b, self.keys))
        )
        self._write(delta_a, "a", batch_id)
        self._write(delta_b, "b", batch_id)
        self._write(dv, "v", batch_id)

    def view(self, spark: SparkSession) -> DataFrame:
        """The maintained join view (all applied batches)."""
        root = self._sub("v")
        return spark.read.option("basePath", root).parquet(root).drop(
            BATCH_COL
        )

    def side(self, spark: SparkSession, side: str) -> DataFrame:
        root = self._sub(side)
        return spark.read.option("basePath", root).parquet(root).drop(
            BATCH_COL
        )
