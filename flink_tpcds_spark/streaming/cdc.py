"""CDC apply: materialize a change stream into a keyed table.

The reference ecosystem's flink-cdc pattern (and Delta's
``MERGE``-per-micro-batch idiom): a stream of row-level change events
— upserts and deletes, ordered per key — is folded into the current
table state. Each micro-batch reduces to its LAST operation per key
(row_number over the in-batch change order), then applies as ONE
:func:`sources.merge.apply_changeset` call — upserts replace/insert,
tombstone keys are removed, in a single rewrite (upsert and delete
key sets are disjoint after the reduce, which is exactly the
changeset contract; two separate merge_into calls would rewrite the
heavily-overlapping touched-bucket sets twice).

Replay idempotency: the changeset is idempotent for a fixed batch
(re-applying the same after-images and re-deleting absent keys are
no-ops), so the at-least-once ``foreachBatch`` contract needs no
batch marker here — the same property Delta relies on for
MERGE-based CDC apply. Cross-batch ordering holds when batches are
delivered in change order (the CDC log's own guarantee).

Scale shape: per batch, one in-batch reduce (shuffle on the key over
DELTA rows only) plus one delta-sized anti join against the state —
never a history rescan. With ``n_buckets`` set (the default
posture for any non-toy state), the state is laid out as
``bucket=H(keys)%N`` hive partitions (sources/merge.py bucketed
layout) and the apply reads and rewrites ONLY the buckets the
delta's keys hash into — per-batch write cost is
O(delta ∪ touched-buckets), not O(state); untouched buckets are
physically untouched. Without it the apply is plain copy-on-write:
the whole state re-written per batch — acceptable only for small
reference tables.

Reference analog: the retract-stream consumers behind
UpsertStreamTableSink (op algebra identical: last-op-wins upsert,
delete tombstones).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class CdcApply:
    """Fold a change stream into a keyed parquet table.

    ``ops_col`` holds the operation: ``"d"`` deletes the key, any
    other value upserts the row (``c``/``u`` both carry the full
    after-image, the debezium convention). ``order_cols`` define the
    per-key change order WITHIN a batch (last one wins) and must be
    unique per key — CDC logs carry a per-key total order (offset /
    LSN) by construction; a tie would make last-op-wins
    nondeterministic. They are REQUIRED: without them there is no
    change order at all, and any fallback (e.g. ordering by the op
    string) silently decides "last op" lexicographically — an upsert
    would always beat a later delete.

    ``n_buckets`` takes effect when THIS instance creates the state
    table (first batch against a missing path); an existing
    plain-layout state keeps its layout — migrate it explicitly with
    :func:`sources.merge.convert_to_bucketed` (the layout marker on
    disk, not this argument, is what each merge obeys).
    """

    def __init__(
        self,
        path: str,
        keys: list[str],
        op_col: str = "op",
        order_cols: list[str] | None = None,
        n_buckets: int | None = None,
    ):
        if not order_cols:
            raise ValueError(
                "CdcApply: order_cols is required — it must name the "
                "CDC log's per-key total order (offset/LSN/ts). An "
                "empty order would resolve last-op-wins arbitrarily."
            )
        self.path = path
        self.keys = list(keys)
        self.op_col = op_col
        self.order_cols = list(order_cols)
        self.n_buckets = n_buckets

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..sources.merge import apply_changeset

        spark = batch_df.sparkSession
        order = [F.desc(c) for c in self.order_cols]
        w = Window.partitionBy(*self.keys).orderBy(*order)
        last = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        value_cols = [
            c for c in batch_df.columns if c != self.op_col
        ]
        ups = last.filter(F.col(self.op_col) != "d").select(*value_cols)
        dels = last.filter(F.col(self.op_col) == "d").select(*self.keys)
        if not os.path.isdir(self.path):
            if self.n_buckets:
                from ..sources.merge import create_bucketed_table

                create_bucketed_table(
                    spark, self.path, ups.schema, self.keys, self.n_buckets
                )
            else:
                spark.createDataFrame([], ups.schema).write.parquet(self.path)
        if not last.isEmpty():
            # one rewrite for BOTH op types — the reduce guarantees
            # upsert/delete key disjointness (changeset contract)
            apply_changeset(spark, self.path, ups, dels, self.keys)

    def table(self, spark: SparkSession) -> DataFrame:
        """The materialized current state (layout-agnostic: the
        physical bucket column of a bucketed state is not exposed)."""
        from ..sources.merge import read_merge_table

        return read_merge_table(spark, self.path)
