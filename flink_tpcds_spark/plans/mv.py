"""Materialized-view definition + automatic aggregate query rewrite.

The warehouse feature behind the reference's Calcite heritage
(Calcite's ``MaterializedViewAggregateRule`` family, which the Blink
planner inherits): a query that groups a base table on a SUBSET of an
MV's grouping columns and asks only for re-aggregable measures should
never touch the base table — it re-aggregates the (usually orders of
magnitude smaller) MV. At 100 TB this turns a full fact scan into a
scan of a few thousand rollup rows; it composes with the engine's IVM
surface (``sources/ivm.py``, ``st_incremental_rollup``), which keeps
the MV itself fresh under a changelog.

Re-aggregation algebra (the standard decomposable-aggregate laws):

========  =========================================
query     from the MV
========  =========================================
SUM(x)    SUM(mv.sum_x)
COUNT(*)  SUM(mv.cnt)
COUNT(x)  SUM(mv.cnt_x)
MIN(x)    MIN(mv.min_x)
MAX(x)    MAX(mv.max_x)
AVG(x)    SUM(mv.sum_x) / SUM(mv.cnt_x)  (sum/count split)
========  =========================================

Non-decomposable measures (MEDIAN, COUNT(DISTINCT ...)) are rejected
— ``try_rewrite`` returns None and the caller falls back to the base
table; a silent wrong rewrite is the one unforgivable MV bug.
"""

from __future__ import annotations

import os as _os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: measure functions an MV can store and a query can re-aggregate
_DECOMPOSABLE = {"sum", "count", "min", "max"}


def _recover(path: str) -> None:
    """Heal a crash mid-``apply_insert_delta`` (same protocol as the
    streaming sink's compact, streaming/sinks.py): backup-only →
    restore it; backup alongside a live MV (crash after promote) →
    stale, remove; an orphaned temp dir is never the source of truth."""
    import shutil

    backup = path + ".old"
    if _os.path.isdir(backup):
        if not _os.path.isdir(path):
            shutil.move(backup, path)
        else:
            shutil.rmtree(backup)
    tmp = path + ".delta_tmp"
    if _os.path.isdir(tmp):
        shutil.rmtree(tmp)


@dataclass
class MaterializedView:
    """A parquet-backed rollup of ``base`` grouped by ``group_cols``.

    ``measures`` maps the MV's stored column name to ``(fn, src_col)``
    with ``fn`` in sum/count/min/max; ``count`` with ``src_col=None``
    is COUNT(*). The row-count measure is mandatory (created
    automatically) — AVG and COUNT re-aggregation need it.
    """

    name: str
    base: str
    path: str
    group_cols: list[str]
    measures: dict[str, tuple[str, str | None]] = field(default_factory=dict)


def create_mv(
    spark: SparkSession,
    name: str,
    base_name: str,
    base_df: DataFrame,
    path: str,
    group_cols: list[str],
    measures: dict[str, tuple[str, str | None]],
) -> MaterializedView:
    """Materialize the rollup at ``path``. One shuffle on the grouping
    key — the same cost as running the coarsest query once; every
    subsequent matching query amortizes it."""
    aggs = []
    for out, (fn, col) in measures.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"non-decomposable measure {fn}({col})")
        if fn == "count" and col is None:
            aggs.append(F.count(F.lit(1)).alias(out))
        else:
            aggs.append(getattr(F, fn)(F.col(col)).alias(out))
    if "__cnt" not in measures:
        aggs.append(F.count(F.lit(1)).alias("__cnt"))
        measures = dict(measures) | {"__cnt": ("count", None)}
    base_df.groupBy(*group_cols).agg(*aggs).write.mode(
        "overwrite"
    ).parquet(path)
    return MaterializedView(name, base_name, path, list(group_cols), measures)


class MvCatalog:
    """Registry + matcher: ``try_rewrite`` answers an aggregate query
    spec from the freshest matching MV, or returns None (caller runs
    on the base table). Deliberately spec-level, not plan-level: the
    engine's query layer builds aggregates from (table, group-by set,
    measure list) specs, which is exactly the information Calcite's
    rule extracts back out of the logical plan."""

    def __init__(self) -> None:
        self._views: list[MaterializedView] = []

    def register(self, mv: MaterializedView) -> None:
        self._views.append(mv)

    def try_rewrite(
        self,
        spark: SparkSession,
        base: str,
        group_cols: list[str],
        want: dict[str, tuple[str, str | None]],
    ) -> DataFrame | None:
        """want: output column -> (fn, src_col); fn additionally
        allows 'avg'. Returns the re-aggregated DataFrame reading ONLY
        the MV parquet, or None if no registered view covers the
        query."""
        for mv in self._views:
            if mv.base != base or not set(group_cols) <= set(mv.group_cols):
                continue
            stored = {
                (fn, col): out for out, (fn, col) in mv.measures.items()
            }
            aggs = []
            ok = True
            for out, (fn, col) in want.items():
                if fn == "sum" and ("sum", col) in stored:
                    aggs.append(F.sum(stored[("sum", col)]).alias(out))
                elif fn == "count" and ("count", col) in stored:
                    aggs.append(
                        F.sum(stored[("count", col)]).cast("bigint").alias(out)
                    )
                elif fn == "min" and ("min", col) in stored:
                    aggs.append(F.min(stored[("min", col)]).alias(out))
                elif fn == "max" and ("max", col) in stored:
                    aggs.append(F.max(stored[("max", col)]).alias(out))
                elif (
                    fn == "avg"
                    and ("sum", col) in stored
                    and ("count", col) in stored
                ):
                    # AVG divides by the NON-NULL count of the column,
                    # so only a stored count(col) qualifies — falling
                    # back to the row count would silently inflate the
                    # denominator for null-bearing columns (the
                    # "unforgivable MV bug" class this matcher exists
                    # to refuse).
                    aggs.append(
                        (
                            F.sum(stored[("sum", col)])
                            / F.sum(stored[("count", col)]).cast("double")
                        ).alias(out)
                    )
                else:
                    ok = False
                    break
            if not ok:
                continue
            _recover(mv.path)
            mv_df = spark.read.parquet(mv.path)
            if not group_cols:
                return mv_df.agg(*aggs)
            return mv_df.groupBy(*group_cols).agg(*aggs)
        return None


def apply_insert_delta(
    spark: SparkSession, mv: MaterializedView, delta_df: DataFrame
) -> None:
    """Fold an INSERT-ONLY delta into the MV without rescanning the
    base: aggregate the delta with the MV's own measure definitions
    (a delta-sized job), full-outer-merge with the stored rollup by
    the decomposable-aggregate laws (sum/count add, min/max combine),
    atomically replace the MV parquet. Cost is O(delta + groups) —
    the MV is rollup-sized, orders of magnitude under the base.

    Insert-only is the honest boundary for min/max: a DELETE could
    retract the current extremum, which is not recoverable from the
    rollup alone — updates/deletes route through the engine's CDC /
    MERGE surface and a rebuild of the touched groups instead.
    """
    import shutil

    _recover(mv.path)
    aggs = []
    for out, (fn, col) in mv.measures.items():
        if fn == "count" and col is None:
            aggs.append(F.count(F.lit(1)).alias(out))
        else:
            aggs.append(getattr(F, fn)(F.col(col)).alias(out))
    d = delta_df.groupBy(*mv.group_cols).agg(*aggs)
    cur = spark.read.parquet(mv.path)
    combined = []
    for out, (fn, _col) in mv.measures.items():
        a, b = F.col(f"cur.{out}"), F.col(f"d.{out}")
        if fn == "count":
            # COUNT is never NULL on a present side; absent side = 0.
            merged = F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
        elif fn == "sum":
            # SUM over an all-NULL group is stored as NULL; folding it
            # through coalesce(x, 0) would resurrect it as 0, which the
            # base-table aggregate would never return. NULL+NULL stays
            # NULL; one-sided NULL contributes nothing (SQL SUM ignores
            # NULLs).
            merged = F.when(a.isNull() & b.isNull(), F.lit(None)).otherwise(
                F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
            )
        elif fn == "min":
            merged = F.least(F.coalesce(a, b), F.coalesce(b, a))
        else:  # max
            merged = F.greatest(F.coalesce(a, b), F.coalesce(b, a))
        combined.append(merged.alias(out))
    merged_df = (
        cur.alias("cur")
        .join(d.alias("d"), mv.group_cols, "full_outer")
        .select(*mv.group_cols, *combined)
    )
    # Crash-safe promote — the same .old-backup swap as the streaming
    # sink compact/vacuum (streaming/sinks.py) and
    # IncrementalAggState.update: the temp dir is written NEXT TO the
    # MV (same filesystem, so the moves are renames, never copies),
    # and a crash at any point leaves either the old rollup (restored
    # by _recover) or the new one — never neither.
    tmp = mv.path + ".delta_tmp"
    merged_df.write.mode("overwrite").parquet(tmp)
    backup = mv.path + ".old"
    shutil.move(mv.path, backup)
    shutil.move(tmp, mv.path)
    shutil.rmtree(backup)
