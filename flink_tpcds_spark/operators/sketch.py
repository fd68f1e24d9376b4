"""Mergeable frequent-items (heavy-hitter) sketch: distributed
Misra-Gries summaries.

Reference anchor: the reference's aggregate surface stops at exact
counts and HLL++ distinct estimation (planner
`FlinkRelMdColumnUniqueness` / runtime approx-distinct aggregates);
it ships no heavy-hitter sketch. At 100 TB an exact top-k over an
unbounded key domain (tokens, URLs, user-ids) must shuffle EVERY
distinct key; a Misra-Gries summary ships at most ``k`` counters per
partition instead — shuffle volume O(partitions × k), independent of
both row count and domain size.

Guarantees (Misra-Gries '82; merge soundness per Agarwal et al. 2012,
"Mergeable Summaries", PODS): with summary size ``k`` over ``n``
rows,

    true(x) − n/(k+1)  ≤  est(x)  ≤  true(x)

for EVERY item x (est = 0 when absent), so every item with
true(x) > n/(k+1) — there are at most k of them — appears with a
positive estimate. Each trim subtracts some t from all counters while
at least k+1 of them are positive, discharging ≥ (k+1)·t of processed
mass, so the total subtracted from any single item is ≤ n/(k+1); the
bound telescopes across batches within a partition and ADDS across
partitions (Σ nᵖ/(k+1) = n/(k+1)), which is why summing the
per-partition summaries point-wise is itself a valid summary of the
whole input.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_items_sketch(
    df: DataFrame, item_col: str, k: int = 64
) -> DataFrame:
    """Heavy-hitter summary of ``item_col``: returns ``(item, est)``
    with the Misra-Gries bounds above. Output has at most
    ``partitions × k`` rows (each positive-estimate item of some
    partition summary), NOT trimmed to k — trimming is the caller's
    call because a final decrement would discard the soundness the
    gate asserts; at most k items can exceed the n/(k+1) threshold
    anyway, so filtering ``est·(k+1) > n`` yields ≤ k rows.

    Stage 1 is an Arrow-batched ``mapInPandas``: per-batch
    ``value_counts`` (vectorized) merged into a per-partition Series,
    trimmed to k survivors whenever it overflows. Stage 2 is a plain
    ``groupBy(item).sum`` over the tiny partial summaries — the only
    shuffle, O(partitions × k) rows.
    """
    if k < 1:
        raise ValueError("k must be ≥ 1")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf["item"].dropna().value_counts()
            s = s.add(vc, fill_value=0).astype("int64")
            if len(s) > k:
                # subtract the (k+1)-th largest counter, keep positives
                t = np.partition(s.to_numpy(), len(s) - k - 1)[len(s) - k - 1]
                s = s[s > t] - t
        if len(s):
            yield pd.DataFrame({"item": s.index.astype(str), "est": s.values})

    partials = df.select(
        F.col(item_col).cast("string").alias("item")
    ).mapInPandas(summarize, "item string, est long")
    return partials.groupBy("item").agg(F.sum("est").alias("est"))


def quantile_sketch(
    df: DataFrame, value_col: str, key_col: str, size: int = 256
) -> DataFrame:
    """Mergeable quantile sketch: the deterministic bottom-``size``
    rows by ``md5(key)`` rank — a fixed-hash bottom-k sample
    (Cohen & Kaplan's bottom-k sketches), i.e. a uniform sample
    whose membership is a pure function of the keys. Returns
    ``(v, rk)``.

    Why this shape: Spark's ``percentile_approx`` is mergeable only
    INSIDE one aggregation — there is no sketch-valued surface to
    store per-shard and roll up later (the HLL sketch column has
    ``hll_sketch_agg``/``hll_union_agg``; quantiles have nothing).
    The bottom-k sample closes that gap with an EXACT merge law:

        sketch(A ∪ B) = bottom_k(sketch(A) ∪ sketch(B))

    — set identity, not an approximation — because the k smallest
    hash ranks of a union are among the k smallest of each side. So
    per-shard/per-day sketches of k rows each roll up to the exact
    corpus-wide sketch without rescanning, and any quantile of the
    merged sample estimates the population quantile with the usual
    uniform-sample error O(sqrt(q(1-q)/k)).

    Execution: ``orderBy(rk, v).limit(k)`` is TakeOrdered — each
    partition ships only its local bottom-k, the driver keeps k rows.
    Determinism (same keys → same sample → same estimates on any
    cluster) is what makes the driver gate a full-value oracle, not a
    tolerance check; the secondary ``v`` sort makes the bottom-k
    well-defined even when DUPLICATE keys tie on rank (lexicographic
    (rk, v) is a total order on the multiset, under which the merge
    law holds for any slicing).
    """
    return (
        df.select(
            F.col(value_col).alias("v"),
            F.md5(F.col(key_col).cast("string")).alias("rk"),
        )
        .orderBy("rk", "v")
        .limit(size)
    )


def merge_quantile_sketches(sketches: list[DataFrame], size: int) -> DataFrame:
    """Union per-slice sketches and keep the global bottom-k — by the
    merge law above this equals the sketch of the concatenated
    input EXACTLY."""
    import functools

    merged = functools.reduce(lambda a, b: a.unionByName(b), sketches)
    return merged.orderBy("rk", "v").limit(size)


def _cms_bucket(key: Column, row: int, width: int) -> Column:
    """Row ``row``'s bucket for ``key``: md5 of the salted key, first
    8 hex digits as an integer, mod width — the engine-portable hash
    family (same ``concat('0x', substr(md5(...)))`` bridge the
    sampling operators use, so a SQL oracle replays it exactly)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), key)), 1, 8), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(width))


def count_min_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch (Cormode-Muthukrishnan) as a depth x width
    counter table: rows (row, bucket, cnt). Point-frequency estimates
    are biased UP only (collisions add, never subtract): with width w
    and total weight N, est - true <= 2N/w with prob >= 1 - 2^-depth.

    Mergeability — the property that matters at 100 TB — is plain
    ``UNION ALL + groupBy(row, bucket).sum``: per-shard sketches roll
    up without rescanning, exactly like the HLL/quantile sketches in
    this module. Build cost: keys are pre-aggregated to (key, weight)
    BEFORE hashing (one map-side-combined shuffle), so the d hash
    evaluations run once per DISTINCT key, not once per row; the
    sketch itself is O(depth * width) rows regardless of input size.
    """
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    per_key = (
        df.select(F.col(key_col).alias("k"), w.alias("w"))
        .groupBy("k")
        .agg(F.sum("w").alias("w"))
    )
    # One explode over an array of (row, bucket) structs instead of a
    # depth-way unionAll: the union's branches each re-evaluated the
    # per-key aggregate (depth corpus scans); the explode derives all
    # depth rows from ONE evaluation.
    rb = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _cms_bucket(F.col("k"), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    out = per_key.select(F.explode(rb).alias("rb"), "w").select(
        F.col("rb.row").alias("row"),
        F.col("rb.bucket").alias("bucket"),
        "w",
    )
    return (
        out.groupBy("row", "bucket")
        .agg(F.sum("w").cast("bigint").alias("cnt"))
    )


def count_min_query(
    sketch: DataFrame,
    keys: list[str],
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for ``keys``: min over the sketch's
    depth rows of the counter at each key's bucket (absent bucket =
    0). The keys list is a literal VALUES relation broadcast against
    the O(depth*width) sketch — no scan of the original data."""
    spark = sketch.sparkSession
    kdf = spark.createDataFrame([(k,) for k in keys], "k string")
    probes = None
    for r in range(depth):
        p = kdf.select(
            "k",
            F.lit(r).alias("row"),
            _cms_bucket(F.col("k"), r, width).alias("bucket"),
        )
        probes = p if probes is None else probes.unionAll(p)
    est = (
        probes.join(sketch, ["row", "bucket"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy("k")
        .agg(F.min("cnt").cast("bigint").alias("cms_estimate"))
    )
    return est
