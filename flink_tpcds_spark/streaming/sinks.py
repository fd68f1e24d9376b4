"""Append / retract / upsert stream sinks (reference
flink-table-common sinks/{Append,Retract,Upsert}StreamTableSink.java —
SURVEY §2.1).

Flink models a continuously-updated table as a changelog the sink
consumes: appends only (AppendStreamTableSink), (+/-) retraction pairs
(RetractStreamTableSink), or keyed upserts (UpsertStreamTableSink).
Structured Streaming's native analog is output mode (append/update/
complete); append is native (``writeStream.format(...)``), and the
two non-trivial contracts are materialized here ON TOP of
``foreachBatch`` in their 100 TB shapes:

- :class:`ParquetUpsertSink` — keyed last-write-wins table as an
  executor-written parquet changelog (compacted-Kafka-topic / CDC
  layout): replay-idempotent appends, distributed keep-last
  snapshot, crash-safe log compaction.
- :class:`ParquetRetractSink` — a true (+/-) retraction changelog:
  each micro-batch diffs against the maintained state with a keyed
  outer join, appends (-old, +new) ops, and swaps the state
  crash-safely; folding the log distributedly reproduces the
  snapshot exactly.

Neither holds a row on the driver — every write, diff, and read is
executor-side, so key cardinality scales with the cluster, not the
driver (the r2-era driver-dict contract demos now live in
tests/test_streaming.py as the oracle models these sinks are
checked against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.incremental import CrashSafeParquetState


class ParquetUpsertSink:
    """Distributed keyed-upsert sink — the 100 TB shape of
    :class:`UpsertStreamTableSink` contract (no driver-side state at
    all; the dict-backed contract model lives in tests).

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

    def snapshot(self, spark, as_of_batch: int | None = None) -> DataFrame:
        """Current table — or, with ``as_of_batch``, the TIME-TRAVEL
        snapshot as of that micro-batch (keep-last over the changelog
        prefix ``__batch_id ≤ as_of_batch``): the per-batch partition
        layout makes every historical version a partition-pruned scan,
        the same read path Delta/Iceberg expose as VERSION AS OF.
        Note ``compact`` keeps only each key's LATEST stamp, so time
        travel reaches back to the last compaction, like any
        log-compacted store."""
        log = self.changelog(spark)
        if as_of_batch is not None:
            # An as_of older than the oldest retained stamp would
            # silently return an EMPTY table after a vacuum — raise
            # instead, the Delta/Iceberg expired-version contract.
            # The check is a driver-side directory listing, no job.
            import os

            stamps = [
                int(d.split("=", 1)[1])
                for d in os.listdir(self.path)
                if d.startswith(self.BATCH_COL + "=")
            ]
            if stamps and int(as_of_batch) < min(stamps):
                raise ValueError(
                    f"version {as_of_batch} expired: oldest retained "
                    f"batch is {min(stamps)} (vacuum retention)"
                )
            log = log.filter(F.col(self.BATCH_COL) <= int(as_of_batch))
        return self._keep_last(log).drop(self.BATCH_COL)

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

    def vacuum(self, spark, retain_batches: int) -> dict:
        """Retention-bounded snapshot expiry (Delta VACUUM / Iceberg
        expire_snapshots): fold every partition older than the last
        ``retain_batches`` into ONE base partition — the keep-last
        snapshot of the expired prefix, stamped with the cutoff batch
        id — and keep the younger partitions' rows unchanged. Time
        travel stays EXACT for every ``as_of_batch > cutoff`` (later
        stamps still win over the base); older versions are EXPIRED —
        ``snapshot(as_of_batch < cutoff)`` raises, the same contract
        a retention-bounded lakehouse gives (as_of == cutoff is the
        oldest answerable version). Storage is bounded at retain_batches + 1
        partitions no matter how long the stream runs — ``compact``
        is the retain_batches=0 degenerate case that forfeits time
        travel entirely.

        Crash-safe via the same .old-backup swap as ``compact``. A
        cluster deployment would rewrite only the expired partitions
        and commit via its object store's protocol; the local swap
        keeps the whole changelog atomic instead."""
        import os
        import shutil

        from pyspark.sql import functions as F

        log = self.changelog(spark)
        ids = sorted(
            r[0] for r in log.select(self.BATCH_COL).distinct().collect()
        )
        if len(ids) <= retain_batches + 1:
            return {
                "expired_partitions": 0,
                "cutoff": None,
                "partitions": len(ids),
            }
        cutoff = ids[-(retain_batches + 1)]
        base = (
            self._keep_last(log.filter(F.col(self.BATCH_COL) <= cutoff))
            .withColumn(self.BATCH_COL, F.lit(int(cutoff)))
        )
        young = log.filter(F.col(self.BATCH_COL) > cutoff)
        tmp = self.path + ".compacting"
        base.unionByName(young).write.partitionBy(self.BATCH_COL).mode(
            "overwrite"
        ).parquet(tmp)
        backup = self.path + ".old"
        if os.path.isdir(backup):
            shutil.rmtree(backup)
        shutil.move(self.path, backup)
        shutil.move(tmp, self.path)
        shutil.rmtree(backup)
        return {
            "expired_partitions": len(ids) - retain_batches - 1,
            "cutoff": int(cutoff),
            "partitions": retain_batches + 1,
        }


class ParquetRetractSink(CrashSafeParquetState):
    """Distributed retract-changelog sink — the 100 TB shape of
    :class:`RetractSink` (reference RetractStreamTableSink.java: a
    (+/-) operation pair per value change), with no driver-side state.

    Layout under ``path``:

    - ``state/``  — the current keyed table (parquet, swapped
      crash-safely like :class:`~..sources.incremental.IncrementalAggState`);
    - ``log/__batch_id=N/`` — the (+/-) ops each micro-batch emitted,
      one hive-partition dir per batch.

    Per batch (update-mode deltas, one row per key per batch): the
    delta full-outer-joins the current state on the key — changed
    keys emit ``(-old, +new)``, new keys emit ``(+new)``, unchanged
    keys emit nothing — then the state is upserted and swapped. Both
    the diff and the state rewrite are state-sized keyed joins on the
    executors; the driver never holds a row.

    **Replay idempotency** differs from :class:`ParquetUpsertSink`:
    a retraction diff is computed AGAINST the pre-batch state, so a
    replayed batch cannot simply overwrite its partition (the state
    has already advanced and the re-diff would be empty). Instead the
    last applied batch id is persisted INSIDE the state dir (promoted
    atomically with the state, same marker pattern as
    ``IncrementalAggState``) and replayed batches are skipped whole.

    ``replay(spark)`` folds the changelog distributedly (keep the
    last op per key, ``+`` outranking ``-`` within a batch) and must
    equal ``snapshot(spark)`` — the contract the driver-dict
    reference model (tests) pins.
    """

    BATCH_COL = "__batch_id"

    def __init__(self, path: str, key_cols: list[str]):
        import os

        # state-dir swap / .old recovery / batch marker all come from
        # the shared crash-safe base (sources/incremental.py)
        super().__init__(os.path.join(path, "state"))
        self.key_cols = list(key_cols)
        self.state_dir = self.path
        self.log_dir = os.path.join(path, "log")

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        import os

        from pyspark.sql import functions as F

        self._recover()
        if batch_id <= self._last_batch():
            return  # at-least-once replay: already applied
        spark = batch_df.sparkSession
        cols = batch_df.columns
        value_cols = [c for c in cols if c not in self.key_cols]
        has_state = os.path.isdir(self.state_dir)
        new = batch_df
        if has_state:
            old = spark.read.parquet(self.state_dir)
            # explicit presence markers: inferring side-presence from a
            # value column's NULLness corrupts the diff when values are
            # legitimately NULL (a (k, 5)→(k, NULL) update would emit
            # no retraction), and crashes on keys-only rows
            j = old.select(
                *[F.col(k) for k in self.key_cols],
                F.lit(True).alias("__in_old"),
                *[F.col(c).alias(f"__old_{c}") for c in value_cols],
            ).join(
                new.withColumn("__in_new", F.lit(True)),
                self.key_cols,
                "full_outer",
            )
            if value_cols:
                changed = (
                    F.struct(*[F.col(f"__old_{c}") for c in value_cols])
                    != F.struct(*[F.col(c) for c in value_cols])
                )
            else:
                changed = F.lit(False)  # keys-only table: membership
            in_old = F.col("__in_old").isNotNull()
            in_new = F.col("__in_new").isNotNull()
            minus = (
                j.filter(in_old & in_new & changed)
                .select(
                    F.lit("-").alias("op"),
                    *self.key_cols,
                    *[
                        F.col(f"__old_{c}").alias(c)
                        for c in value_cols
                    ],
                )
            )
            plus = (
                j.filter(in_new & (~in_old | changed))
                .select(F.lit("+").alias("op"), *cols)
            )
            ops = minus.unionByName(plus)
            next_state = (
                old.join(new.select(*self.key_cols), self.key_cols, "left_anti")
                .unionByName(new)
            )
        else:
            ops = new.select(F.lit("+").alias("op"), *cols)
            next_state = new
        (
            ops.write.mode("overwrite").parquet(
                os.path.join(self.log_dir, f"{self.BATCH_COL}={int(batch_id)}")
            )
        )
        self._swap_in(next_state, batch_id)

    def snapshot(self, spark) -> DataFrame:
        self._recover()
        return spark.read.parquet(self.state_dir)

    def changelog(self, spark) -> DataFrame:
        return spark.read.parquet(self.log_dir)

    def replay(self, spark) -> DataFrame:
        """Fold the (+/-) log to the live table: last op per key in
        (batch, '+'>'-') order; a key whose final op is '+' is live.
        Must equal ``snapshot`` — the retract-changelog contract."""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        log = self.changelog(spark)
        rank = F.when(F.col("op") == "+", 1).otherwise(0)
        w = Window.partitionBy(*self.key_cols).orderBy(
            F.desc(self.BATCH_COL), rank.desc()
        )
        return (
            log.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (F.col("op") == "+"))
            .drop("__rn", "op", self.BATCH_COL)
        )
