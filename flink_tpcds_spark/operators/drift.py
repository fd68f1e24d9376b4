"""Distribution-drift detection: exact two-sample Kolmogorov-Smirnov
statistic, computed distributed.

The data-quality gate between corpus versions or pipeline stages:
``D = max_v |ECDF_a(v) − ECDF_b(v)|`` says how far two samples'
distributions diverge, independent of scale or binning choices.

The textbook computation sorts the combined sample globally — a
single-partition window that dies at scale. Here the prefix sum is
decomposed: per-value counts aggregate first (one shuffle), values
hash into quantile buckets whose per-bucket totals are tiny, the
driver turns those totals into bucket offsets (B numbers, not data),
and each bucket computes its local cumulative independently with the
offset added back. Exact result, no global sort, largest window is
one bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chi2_statistic(
    old: DataFrame,
    new: DataFrame,
    cat_col: str,
) -> DataFrame:
    """Categorical drift: Pearson's chi-squared statistic over the
    two samples' category frequencies (the contingency-table
    homogeneity test — KS's companion for discrete columns).
    One row: ``(n_old, n_new, n_categories, chi2)``, chi2 rounded to
    4 digits. Categories absent from one side contribute with
    observed 0 against their pooled expectation.

    Cross-engine bridge note: unlike ``psi_statistic`` (which
    pre-rounds each term to 8 digits before the decimal cast), the
    per-category terms here feed the decimal sum unrounded — the
    certified DuckDB oracle mirrors exactly this arithmetic, so the
    two must change together.

    Scale shape: one groupBy per side to category granularity, one
    category-keyed outer join, one final aggregate — category-sized
    throughout, never row-sized after the first aggregation.
    """
    oa = old.groupBy(F.col(cat_col).alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("ca")
    )
    ob = new.groupBy(F.col(cat_col).alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cb")
    )
    j = (
        oa.join(ob, "c", "full_outer")
        .select(
            "c",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    tot = j.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    with_tot = j.crossJoin(F.broadcast(tot))
    # expected counts under homogeneity: row_total * side_total / N
    n = F.col("na") + F.col("nb")
    ea = (F.col("ca") + F.col("cb")) * F.col("na") / n
    eb = (F.col("ca") + F.col("cb")) * F.col("nb") / n
    term = (F.col("ca") - ea) ** 2 / ea + (F.col("cb") - eb) ** 2 / eb
    return with_tot.agg(
        F.max("na").cast("bigint").alias("n_old"),
        F.max("nb").cast("bigint").alias("n_new"),
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
        F.round(F.sum(term.cast("decimal(18,6)")).cast("double"), 4).alias(
            "chi2"
        ),
    )


def psi_statistic(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index — the monitoring-dashboard drift
    score (<0.1 stable, >0.25 shifted): ``Σ (p_old−p_new)·ln(p_old/
    p_new)`` over equal-width bins spanning the OLD side's exact
    [min, max] (new-side outliers clamp into the edge bins, which is
    where a range shift should land). Equal-width from exact MIN/MAX
    — not quantiles — because discrete-quantile index semantics
    differ across engines while min/max and the binning arithmetic
    are IEEE-identical everywhere. Laplace smoothing (+0.5 per bin)
    keeps empty bins finite.

    Scale shape: one MIN/MAX aggregate broadcast back, one
    bin-granular count per side, a ``n_bins``-row spine join —
    nothing row-sized after the first aggregation.
    """
    # The 1-row range and the n_bins-row joined counts are each read
    # by 2+ downstream subtrees (both binned() sides read rng; the
    # final agg reads j once for the totals and once for the terms) —
    # un-materialized, every read re-scanned the corpus-sized inputs
    # (measured 6+ scans of `old` where 3 passes is the floor). Eager
    # barriers on the two tiny frames pin the scan count at the floor.
    rng = old.agg(
        F.min(value_col).alias("mn"), F.max(value_col).alias("mx")
    ).localCheckpoint(eager=True)

    def binned(df: DataFrame, name: str) -> DataFrame:
        width = F.col("mx") - F.col("mn")
        idx = F.when(width <= 0, F.lit(0)).otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(value_col) - F.col("mn"))
                        * n_bins
                        / width
                    ).cast("int"),
                ),
            )
        )
        return (
            df.crossJoin(F.broadcast(rng))
            .select(idx.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    spine = old.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    j = (
        spine.join(binned(old, "ca"), "bin", "left")
        .join(binned(new, "cb"), "bin", "left")
        .select(
            "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .localCheckpoint(eager=True)
    )
    tot = j.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    half = F.lit(0.5)
    pa = (F.col("ca") + half) / (F.col("na") + half * n_bins)
    pb = (F.col("cb") + half) / (F.col("nb") + half * n_bins)
    term = (pa - pb) * F.log(pa / pb)
    return (
        j.crossJoin(F.broadcast(tot))
        .agg(
            F.max("na").cast("bigint").alias("n_old"),
            F.max("nb").cast("bigint").alias("n_new"),
            F.round(
                F.sum(F.round(term, 8).cast("decimal(18,8)")).cast("double"),
                4,
            ).alias("psi"),
        )
    )


def ks_statistic(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """One-row result: ``(n_old, n_new, ks_d)`` with the EXACT
    two-sample KS statistic (rounded to 6 digits for cross-engine
    rendering).

    NULLs in ``value_col`` are dropped up front (an ECDF is defined
    over observed values; a null group would otherwise land in bucket
    0 and corrupt the prefix sums). Raises ``ValueError`` if either
    side is empty after the null filter — a 0-denominator ECDF has no
    meaningful statistic and silently returning null would hide a
    broken upstream feed.
    """
    a = (
        old.select(F.col(value_col).alias("v"))
        .where(F.col("v").isNotNull())
        .withColumn("__a", F.lit(1))
    )
    b = (
        new.select(F.col(value_col).alias("v"))
        .where(F.col("v").isNotNull())
        .withColumn("__a", F.lit(0))
    )
    # Three actions read this distinct-value-sized aggregate (the
    # approxQuantile, the per-bucket totals collect, and the caller's
    # final action) — materialize it once instead of re-scanning both
    # corpus-sized inputs per action.
    per_value = (
        a.unionAll(b)
        .groupBy("v")
        .agg(
            F.sum("__a").cast("bigint").alias("ca"),
            F.sum(F.lit(1) - F.col("__a")).cast("bigint").alias("cb"),
        )
        .localCheckpoint(eager=True)
    )
    # quantile buckets over the distinct values: boundaries are B-1
    # numbers on the driver; per-bucket totals are B rows
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = per_value.approxQuantile("v", qs, 0.001)
    barr = F.array(*[F.lit(float(x)) for x in bounds])
    bucketed = per_value.withColumn(
        "__bkt", F.size(F.filter(barr, lambda x: x < F.col("v")))
    )
    totals = (
        bucketed.groupBy("__bkt")
        .agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
        .collect()
    )
    per_bucket = {r["__bkt"]: (r["ta"], r["tb"]) for r in totals}
    offs = {}
    run_a = run_b = 0
    for k in sorted(per_bucket):
        offs[k] = (run_a, run_b)
        run_a += per_bucket[k][0]
        run_b += per_bucket[k][1]
    n_a, n_b = run_a, run_b
    if n_a == 0 or n_b == 0:
        raise ValueError(
            f"ks_statistic: empty sample after null filter "
            f"(n_old={n_a}, n_new={n_b}) — ECDF undefined"
        )
    off_rows = [(k, oa, ob) for k, (oa, ob) in offs.items()]
    spark = old.sparkSession
    off_df = spark.createDataFrame(
        off_rows, "__bkt int, off_a long, off_b long"
    )
    w = Window.partitionBy("__bkt").orderBy("v")
    cum = (
        bucketed.join(F.broadcast(off_df), "__bkt")
        .withColumn("cum_a", F.sum("ca").over(w) + F.col("off_a"))
        .withColumn("cum_b", F.sum("cb").over(w) + F.col("off_b"))
    )
    d = F.abs(
        F.col("cum_a") / F.lit(float(n_a))
        - F.col("cum_b") / F.lit(float(n_b))
    )
    return cum.agg(
        F.lit(n_a).cast("bigint").alias("n_old"),
        F.lit(n_b).cast("bigint").alias("n_new"),
        F.round(F.max(d), 6).alias("ks_d"),
    )
