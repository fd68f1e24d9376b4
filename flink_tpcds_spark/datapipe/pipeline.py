"""End-to-end corpus curation pipeline: the staged dedup/filter chain
an LLM training-data run executes, composed from the individually
oracle-checked operators in this package and emitting a per-document
audit ledger.

Stage order (each document gets exactly ONE status — its first
failing stage — so the ledger is deterministic and value-checkable):

1. ``holdout``       — the held-out eval split (never trains)
2. ``low_quality``   — fails the Gopher/C4-style quality gate
                       (text.add_quality_columns:is_quality)
3. ``exact_dup``     — identical text (md5) to a lower-id survivor
4. ``near_dup``      — non-canonical member of a MinHash near-dup
                       cluster (dedup.minhash_near_dup_pairs →
                       dedup.near_dup_clusters) among stage-3
                       survivors
5. ``contaminated``  — shares ≥ ``min_shared`` k-gram shingles with
                       the held-out split (curate.decontaminate)
6. ``kept``          — enters the training corpus

Scale shape: every stage is one of the already-audited topologies —
map-only quality gate, one md5-keyed window (WindowGroupLimit-style
rank), banded LSH join (never all-pairs), O(diameter) label
propagation, and a broadcast held-out vocabulary join. Statuses are
assembled with left joins on the document id; nothing collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .curate import decontaminate
from .dedup import minhash_near_dup_pairs, near_dup_clusters
from .text import add_quality_columns


def curation_ledger(
    df: DataFrame,
    holdout: Column,
    min_shared: int = 1,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the full curation pipeline and return the audit ledger
    ``(id, status)`` with one row per input document (status as in
    the module docstring).

    ``holdout`` is a boolean Column over ``df`` marking the held-out
    split; ``min_shared`` is the contamination threshold in shared
    k-gram shingles (k=3, the decontaminate default).
    """
    base = add_quality_columns(df, text_col).select(
        F.col(id_col),
        F.col(text_col),
        F.col("is_quality"),
        holdout.alias("__holdout"),
        F.md5(F.col(text_col)).alias("__md5"),
    )
    # 2→3: quality gate, then exact dedup among quality survivors.
    # rank 1 per md5 group survives; the window shuffles only the
    # train-quality slice, keyed on the 16-byte hash.
    w = Window.partitionBy("__md5").orderBy(id_col)
    trainq = (
        base.filter(~F.col("__holdout") & F.col("is_quality"))
        .withColumn("__rk", F.row_number().over(w))
    )
    # Stage barriers: each stage output below is consumed by 2-3
    # downstream sub-DAGs (exact_kept by the pair miner, the anti-join
    # and the decontamination union; near_dropped/contaminated by the
    # survivors chain and the final ledger joins), and the near-dup
    # stage additionally runs its own internal actions (bucket guard,
    # label-propagation rounds). Un-materialized, every consumer
    # re-executes the whole upstream chain — measured 31 s at sf0.01
    # vs 9.4 s with eager stage materialization (scale-invariant fixed
    # overhead, so the win holds at every SF). localCheckpoint also
    # truncates the lineage so each stage's plan stays stage-sized.
    # Everything checkpointed except exact_kept is an id-list — tiny
    # at any scale; exact_kept carries the surviving text (read 3x,
    # so one store+3 reads beats 3 recomputes of the quality+window
    # chain; storage is MEMORY_AND_DISK, spilling not failing).
    exact_kept = (
        trainq.filter(F.col("__rk") == 1)
        .select(id_col, text_col)
        .localCheckpoint(eager=True)
    )
    # 4: near-dup cluster election among exact survivors (the pair
    # list itself is checkpointed inside near_dup_clusters)
    pairs = minhash_near_dup_pairs(
        exact_kept, id_col=id_col, text_col=text_col,
        threshold=jaccard_threshold,
    ).select("id_a", "id_b")
    near_dropped = (
        near_dup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select(F.col("doc_id").alias(id_col))
        .withColumn("__near_dup", F.lit(True))
        .localCheckpoint(eager=True)
    )
    # 5: contamination of the remaining survivors vs the held-out
    # split (holdout docs regardless of their quality — eval text is
    # eval text). decontaminate() reduces the held-out side to its
    # distinct shingle vocabulary before the join.
    survivors = exact_kept.join(near_dropped.select(id_col), id_col, "left_anti")
    union = survivors.withColumn("__h", F.lit(False)).unionByName(
        base.filter(F.col("__holdout")).select(id_col, text_col).withColumn(
            "__h", F.lit(True)
        )
    )
    contaminated = (
        decontaminate(union, F.col("__h"), id_col=id_col, text_col=text_col)
        .filter(F.col("n_shared_shingles") >= min_shared)
        .select(id_col)
        .withColumn("__contaminated", F.lit(True))
        .localCheckpoint(eager=True)
    )
    ledger = (
        base.join(trainq.select(id_col, "__rk"), id_col, "left")
        .join(near_dropped, id_col, "left")
        .join(contaminated, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("__holdout"), F.lit("holdout"))
            .when(~F.col("is_quality"), F.lit("low_quality"))
            .when(F.col("__rk") > 1, F.lit("exact_dup"))
            .when(F.col("__near_dup"), F.lit("near_dup"))
            .when(F.col("__contaminated"), F.lit("contaminated"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )
    return ledger


def curation_report(ledger: DataFrame) -> DataFrame:
    """Stage-level summary of a ledger: (status, n_docs), the
    one-screen corpus-prep report. Map-side-combined groupBy on a
    6-value key — negligible at any scale."""
    return (
        ledger.groupBy("status")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("status")
    )
