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


def ks_statistic(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """One-row result: ``(n_old, n_new, ks_d)`` with the EXACT
    two-sample KS statistic (rounded to 6 digits for cross-engine
    rendering)."""
    a = old.select(F.col(value_col).alias("v")).withColumn("__a", F.lit(1))
    b = new.select(F.col(value_col).alias("v")).withColumn("__a", F.lit(0))
    per_value = (
        a.unionAll(b)
        .groupBy("v")
        .agg(
            F.sum("__a").cast("bigint").alias("ca"),
            F.sum(F.lit(1) - F.col("__a")).cast("bigint").alias("cb"),
        )
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
