"""Join operators Spark lacks as single primitives.

- **As-of (temporal) join** — reference TemporalRowTimeJoinOperator.java:71
  / StreamExecTemporalJoin.scala:51: join each left row to the version
  of the right table valid at the row's time. Spark has no built-in
  as-of join (SURVEY §2.3); we implement the *union + windowed
  last-value fill* strategy: one shuffle + one sort, no row explosion,
  scales linearly — the plan a 100 TB as-of join wants (vs. the naive
  inequality join which is O(n·m) per key).
- **Interval (time-bounded) join** — reference TimeBoundedStreamJoin.java:
  equi-join + time-range predicate; Spark's SMJ handles this directly.
- **Lookup join** — reference LookupJoinRunner.java: probe an external
  keyed table. Batch analog: broadcast hash join against the fetched
  dimension snapshot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType
from pyspark.sql.window import Window


def _seconds(col: Column, dtype) -> Column:
    """Numeric-seconds view of a time column. TIMESTAMP_NTZ has no
    direct double cast (Spark 4 / ANSI); route it through the session
    timezone (pinned UTC in session.py) first."""
    if isinstance(dtype, TimestampNTZType):
        col = col.cast("timestamp_ltz")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_time <= left.left_time`` (backward as-of, the
    default), or — ``direction="forward"`` — the EARLIEST right row
    with ``right.right_time >= left.left_time`` (the pandas
    merge_asof direction=forward contract; both bounds inclusive),
    per key.

    Strategy: tag and union both sides, then a single
    ``last(..., ignorenulls=True)`` window ordered by (time, side)
    fills each left row with the most recent right payload. One
    shuffle on the key, one sort — the same state-ordered scan the
    reference's TemporalRowTimeJoinOperator performs with its sorted
    right-state view.

    If several right rows share (key, time), the one that sorts last
    wins; pre-deduplicate with ``dedup_last`` for full determinism.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    fwd = direction == "forward"
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_time
    ]

    l_tagged = left.withColumn(
        "__side", F.lit(0 if fwd else 1)
    ).withColumn(
        "__t", F.col(left_time)
    )
    for c in right_cols:
        l_tagged = l_tagged.withColumn(prefix + c, F.lit(None).cast(right.schema[c].dataType))
    l_tagged = l_tagged.withColumn(
        prefix + "__matched_t", F.lit(None).cast(right.schema[right_time].dataType)
    )

    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(1 if fwd else 0).alias("__side"),
        *[F.col(c).alias(prefix + c) for c in right_cols],
        F.col(right_time).alias(prefix + "__matched_t"),
    )
    for c in left.columns:
        if c not in keys and c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    # The side tag makes the bound inclusive in BOTH directions: at
    # equal time, backward sorts right rows (0) before left (1) so
    # the running last() sees them; forward sorts left rows (0)
    # before right (1) so the running first() over the FOLLOWING
    # frame sees them.
    order = [F.col("__t"), F.col("__side")]
    if fwd:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    filled = unioned
    for c in [*[prefix + c for c in right_cols], prefix + "__matched_t"]:
        filled = filled.withColumn(c, fill(c))

    out = filled.filter(F.col("__side") == (0 if fwd else 1)).drop(
        "__side", "__t"
    )
    if tolerance_seconds is not None:
        age = _seconds(
            F.col(left_time), left.schema[left_time].dataType
        ) - _seconds(
            F.col(prefix + "__matched_t"), right.schema[right_time].dataType
        )
        if fwd:
            age = -age
        keep = age <= F.lit(float(tolerance_seconds))
        for c in right_cols:
            out = out.withColumn(
                prefix + c, F.when(keep, F.col(prefix + c))
            )
    return out.drop(prefix + "__matched_t")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_time: Column,
    right_time: Column,
    lower_seconds: float,
    upper_seconds: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose times satisfy
    ``left_time + lower <= right_time <= left_time + upper``
    (reference TimeBoundedStreamJoin semantics, batch form).

    Expressed as equi-join + range predicate so Catalyst plans the
    equi-part as a hash/SMJ join and evaluates the range as a join
    filter — no cartesian blowup.
    """
    cond = (
        on
        & (right_time >= left_time + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (right_time <= left_time + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return left.join(right, cond, how)


def lookup_join(
    stream: DataFrame,
    lookup: DataFrame,
    on: str | list[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Probe-side join against an external keyed snapshot: always
    broadcast the lookup side (a point-lookup table is small by
    contract), keeping the probe side shuffle-free — which is the
    whole point of the reference's LookupJoin at scale."""
    return stream.join(F.broadcast(lookup), on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: explode hot keys across ``salt``
    buckets so no single reducer owns a whole hot key.

    The left (large, skewed) side gets a uniform random-free salt
    derived from a row hash; the right side is replicated ``salt``
    times with every salt value, and the join key becomes
    (keys..., salt). Result rows are identical to the unsalted join —
    only the partitioning changes: a key holding 30 % of the rows now
    spreads over ``salt`` reducers.

    When to use: AQE's skew-join handling (on session-wide) already
    splits oversized *partitions* at runtime, which covers most skew;
    explicit salting remains the tool when a single KEY (not
    partition) exceeds executor memory in a sort-merge join, or when
    AQE is unavailable (streaming joins). The salt column derives
    from ``xxhash64`` of the whole left row — deterministic, no RNG
    state, reproducible across retries (a ``rand()`` salt breaks
    task-retry idempotence).

    Cost: right side is replicated ``salt``× — use for fact⋈fact
    skew where the right side is far smaller than the hot key's row
    count but too big to broadcast outright.
    """
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).cast("int")
    lhs = left.withColumn("__salt", salt_col)
    rhs = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt)]))
    )
    return lhs.join(rhs, [*on, "__salt"], how).drop("__salt")
