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
