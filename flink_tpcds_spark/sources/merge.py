"""MERGE INTO for parquet tables (the lakehouse upsert primitive).

The reference's retract/upsert sinks maintain keyed state inside a
streaming job; the batch-side counterpart every warehouse user runs is
``MERGE INTO target USING source ON keys`` — update/delete matched
rows, insert unmatched ones. Plain-parquet Spark has no MERGE (that is
Delta/Iceberg territory), so this implements the standard subset as
join algebra plus an atomic directory swap.

Semantics (Delta's deterministic subset):
- ``when_matched="update"``: a matched target row is REPLACED by its
  source row (whole-row update).
- ``when_matched="delete"``: a matched target row is removed.
- ``insert_not_matched=True``: source rows with no target match are
  appended.
- Target rows with no source match are always kept.
- The source must be key-unique (the same precondition Delta enforces
  — a multiply-matched target row makes MERGE nondeterministic).
  ``validate=True`` asserts it with one aggregate pass.

Scale shape: the kept side is ONE left-anti join target⟕source on the
merge keys (shuffle or broadcast — Catalyst picks from source size);
update+insert needs no second join at all because matched-replacement
∪ unmatched-insert is simply "all of source". The rewrite streams to a
fresh directory and swaps in two renames (target → .old, tmp →
target), so concurrent readers see the old or the new table, never a
mix; a crash between the renames is recoverable from the ``.old``
backup and the completed tmp dir.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _recover(target_path: str) -> None:
    """Heal a crash window of the swap (same contract as the
    crash-safe sinks): a ``.old`` backup with NO live table (crash
    between the two renames) is restored — the interrupted merge is
    simply lost and replays; a backup ALONGSIDE a live table (crash
    after promote, before cleanup) is stale and removed; orphaned
    ``.merge-*`` temp dirs are deleted (never the source of truth)."""
    old = target_path + ".old"
    if os.path.isdir(old):
        if not os.path.isdir(target_path):
            os.rename(old, target_path)
        else:
            shutil.rmtree(old)
    parent = os.path.dirname(target_path) or "."
    base = os.path.basename(target_path) + ".merge-"
    for d in os.listdir(parent):
        if d.startswith(base):
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    when_matched: str = "update",
    insert_not_matched: bool = True,
    validate: bool = False,
) -> dict:
    """Merge ``source`` into the parquet table at ``target_path``.

    Returns a manifest dict with the row counts of the merge branches.
    """
    _recover(target_path)
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    if when_matched == "delete" and not insert_not_matched:
        extra = set(source.columns) - set(keys)
        if extra:
            source = source.select(*keys)
    if validate:
        dup = (
            source.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"merge_into: source is not key-unique on {keys}: {dup[0]}"
            )

    target = spark.read.parquet(target_path)
    if when_matched == "update" and set(source.columns) != set(target.columns):
        raise ValueError(
            "merge_into update: source/target schemas differ: "
            f"{sorted(source.columns)} vs {sorted(target.columns)}"
        )

    kept = target.join(source.select(*keys), on=keys, how="left_anti")
    if when_matched == "update":
        # matched-replacement ∪ unmatched-insert == all of source
        incoming = (
            source
            if insert_not_matched
            else source.join(target.select(*keys), on=keys, how="left_semi")
        )
    else:  # delete
        incoming = (
            source.join(target.select(*keys), on=keys, how="left_anti")
            if insert_not_matched
            else None
        )
    merged = (
        kept.select(*target.columns).unionByName(
            incoming.select(*target.columns)
        )
        if incoming is not None
        else kept
    )

    tmp = f"{target_path}.merge-{uuid.uuid4().hex[:8]}"
    merged.write.parquet(tmp)
    n_after = spark.read.parquet(tmp).count()
    old = target_path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old, ignore_errors=True)
    return {"rows_after": n_after, "keys": list(keys), "mode": when_matched}
