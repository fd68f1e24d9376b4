"""Append / retract / upsert stream sinks (reference
flink-table-common sinks/{Append,Retract,Upsert}StreamTableSink.java —
SURVEY §2.1).

Flink models a continuously-updated table as a changelog the sink
consumes: appends only (AppendStreamTableSink), (+/-) retraction pairs
(RetractStreamTableSink), or keyed upserts (UpsertStreamTableSink).
Structured Streaming's native analog is output mode (append/update/
complete); these helpers materialize the two non-trivial contracts on
top of ``foreachBatch``:

- ``UpsertSink`` — keyed last-write-wins table: each update-mode
  micro-batch merges into the maintained state; ``snapshot()`` is the
  current table (what a Kafka-compacted-topic or JDBC-upsert sink
  would hold).
- ``RetractSink`` — a true changelog: each micro-batch diffs against
  the previous state and appends (-old, +new) operations;
  ``changelog()`` is the full (+/-) history and replaying it yields
  exactly the upsert snapshot.

Both run their merge logic inside ``foreachBatch`` on small *deltas*
(update mode emits only changed keys per batch), the same incremental
contract the reference's sinks receive.

**Scale ledger.** ``UpsertSink``/``RetractSink`` keep state
driver-side as a Python dict: the right shape for validating the
changelog contract (what these classes exist for, and what the tests
replay/diff against) but a driver OOM at high key cardinality. A
production deployment keeps the same ``foreachBatch`` skeleton and
swaps the dict for the external keyed store (JDBC/HBase/ES — exactly
the stores the reference's sink interfaces front). ``max_keys``
enforces the boundary: exceeding it raises instead of silently
eating driver memory. ``ParquetUpsertSink`` (round 5) IS the scale
path: the changelog lives in the filesystem, every write and the
snapshot/compaction reads are executor-side, and nothing scales with
key cardinality on the driver.
"""

from __future__ import annotations

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


class ParquetUpsertSink:
    """Distributed keyed-upsert sink — the 100 TB shape of
    :class:`UpsertSink` (no driver-side state at all).

    Each update-mode micro-batch APPENDS its delta, stamped with the
    micro-batch id, to a parquet changelog directory: the write is
    executor-side and the driver never materializes a row — the
    compacted-Kafka-topic / CDC-table layout the reference's
    UpsertStreamTableSink fronts (UpsertStreamTableSink.java:
    setKeyFields/setIsAppendOnly contract).

    ``snapshot(spark)`` reconstructs the current table distributedly:
    keep-last-per-key over batch id (one hash shuffle on the key,
    rank-1 window per key group — the same WindowGroupLimit shape as
    batch dedup-keep-last). ``compact(spark)`` rewrites history down
    to the snapshot, bounding storage exactly like topic compaction.

    Contract requirement: within one micro-batch a key appears at
    most once (true for update-mode aggregation output, which emits
    each changed key's final value once per batch).

    **Replay idempotency.** ``foreachBatch`` is at-least-once: after
    a post-write/pre-checkpoint failure Structured Streaming re-runs
    the same ``batch_id``. Each batch therefore owns the hive-style
    partition directory ``__batch_id=N`` and a replay OVERWRITES it
    instead of appending a second copy of the delta — the changelog
    never double-counts. Partition discovery on the root recovers
    ``__batch_id`` as a column, so readers are unchanged.

    The directory swap in ``compact`` uses local-filesystem renames
    with a ``.old`` backup (crash at any point leaves either the old
    or the new changelog, never neither); a cluster deployment would
    swap via its object-store commit protocol (or write a manifest)
    — the read/merge topology is unchanged.
    """

    BATCH_COL = "__batch_id"

    def __init__(self, path: str, key_cols: list[str]):
        self.path = path
        self.key_cols = key_cols

    def _recover(self) -> None:
        """Heal a crash mid-``compact``: backup-only → restore it;
        backup alongside a live log (crash after promote) → stale,
        remove it. An orphaned ``.compacting`` temp dir (crash after
        the temp write but before the swap) is also removed — it is
        never the source of truth, and a sink that never compacts
        again would otherwise leak a full snapshot's storage."""
        import os
        import shutil

        backup = self.path + ".old"
        if os.path.isdir(backup):
            if not os.path.isdir(self.path):
                shutil.move(backup, self.path)
            else:
                shutil.rmtree(backup)
        compacting = self.path + ".compacting"
        if os.path.isdir(compacting):
            shutil.rmtree(compacting)

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        import os

        self._recover()
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(self.path, f"{self.BATCH_COL}={int(batch_id)}")
            )
        )

    def changelog(self, spark) -> DataFrame:
        self._recover()
        return spark.read.parquet(self.path)

    def _keep_last(self, log: DataFrame) -> DataFrame:
        """Rank-1-per-key over batch id, with a deterministic
        within-batch tie-break.

        The sink's contract is one row per key per micro-batch (true
        for update-mode aggregation output). If a caller violates it
        (``foreachBatch`` on a non-aggregated stream), ties inside a
        batch break on ``xxhash64`` of the value columns — arbitrary
        but STABLE, so snapshot/replay/compact all pick the same row
        instead of a partition-order-dependent one."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        value_cols = [
            c
            for c in log.columns
            if c not in self.key_cols and c != self.BATCH_COL
        ]
        order = [F.desc(self.BATCH_COL)]
        if value_cols:
            order.append(F.desc(F.xxhash64(*value_cols)))
        w = Window.partitionBy(*self.key_cols).orderBy(*order)
        return (
            log.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def snapshot(self, spark) -> DataFrame:
        return self._keep_last(self.changelog(spark)).drop(
            self.BATCH_COL
        )

    def compact(self, spark) -> None:
        """Rewrite the changelog to its snapshot (log compaction).
        Keeps each surviving row's original batch stamp so later
        batches still win after compaction."""
        import os
        import shutil

        latest = self._keep_last(self.changelog(spark))
        tmp = self.path + ".compacting"
        latest.write.partitionBy(self.BATCH_COL).mode("overwrite").parquet(
            tmp
        )
        # Same .old-backup swap as IncrementalAggState.update
        # (sources/incremental.py): a crash at any point leaves either
        # the full pre-compaction log (restored by _recover) or the
        # compacted one — never an empty window.
        backup = self.path + ".old"
        if os.path.isdir(backup):
            shutil.rmtree(backup)
        shutil.move(self.path, backup)
        shutil.move(tmp, self.path)
        shutil.rmtree(backup)
