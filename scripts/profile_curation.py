"""Profile dp_curation_pipeline materialization variants.

The ledger DAG consumes exact_kept three times (minhash pairs, the
anti-join survivors, the decontamination union) and trainq/base twice
more; un-materialized, every consumer recomputes the quality+window
chain and the minhash internals race on an uncached derived input.
Measures: baseline vs localCheckpoint/cache on exact_kept.

Usage: python scripts/profile_curation.py [sf_dir] [variant ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_tpcds_spark.session import get_spark  # noqa: E402
from flink_tpcds_spark.schemas import load_table  # noqa: E402
from flink_tpcds_spark.datapipe import pipeline as plmod  # noqa: E402
from flink_tpcds_spark.datapipe.dedup import release_caches  # noqa: E402


def run_ledger(spark, sf_dir, materialize):
    d = load_table(spark, sf_dir, "documents")
    # Re-create curation_ledger with a pluggable materialization knob by
    # monkeypatching the module-level hook (added for this experiment if
    # absent; otherwise exercise the committed knob).
    if hasattr(plmod, "_MATERIALIZE"):
        plmod._MATERIALIZE = materialize
        ledger = plmod.curation_ledger(
            d, F.col("source").isin("src0", "src1")
        ).orderBy("doc_id")
    else:
        ledger = _ledger_variant(d, materialize)
    n = len(ledger.collect())
    return n


def _ledger_variant(df, materialize):
    from pyspark.sql.window import Window
    from flink_tpcds_spark.datapipe.curate import decontaminate
    from flink_tpcds_spark.datapipe.dedup import (
        minhash_near_dup_pairs,
        near_dup_clusters,
        _register_cache,
    )
    from flink_tpcds_spark.datapipe.text import add_quality_columns

    id_col, text_col = "doc_id", "text"
    holdout = F.col("source").isin("src0", "src1")
    base = add_quality_columns(df, text_col).select(
        F.col(id_col), F.col(text_col), F.col("is_quality"),
        holdout.alias("__holdout"), F.md5(F.col(text_col)).alias("__md5"),
    )
    w = Window.partitionBy("__md5").orderBy(id_col)
    trainq = (
        base.filter(~F.col("__holdout") & F.col("is_quality"))
        .withColumn("__rk", F.row_number().over(w))
    )
    exact_kept = trainq.filter(F.col("__rk") == 1).select(id_col, text_col)
    if materialize == "ck_exact":
        exact_kept = exact_kept.localCheckpoint(eager=True)
    elif materialize == "cache_exact":
        exact_kept = _register_cache(exact_kept)
    elif materialize == "ck_exact_trainq":
        trainq = trainq.localCheckpoint(eager=True)
        exact_kept = trainq.filter(F.col("__rk") == 1).select(id_col, text_col)
        exact_kept = exact_kept.localCheckpoint(eager=True)
    pairs = minhash_near_dup_pairs(
        exact_kept, id_col=id_col, text_col=text_col, threshold=0.8,
    ).select("id_a", "id_b")
    near_dropped = (
        near_dup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select(F.col("doc_id").alias(id_col))
        .withColumn("__near_dup", F.lit(True))
    )
    survivors = exact_kept.join(near_dropped.select(id_col), id_col, "left_anti")
    union = survivors.withColumn("__h", F.lit(False)).unionByName(
        base.filter(F.col("__holdout")).select(id_col, text_col).withColumn(
            "__h", F.lit(True)
        )
    )
    contaminated = (
        decontaminate(union, F.col("__h"), id_col=id_col, text_col=text_col)
        .filter(F.col("n_shared_shingles") >= 1)
        .select(id_col)
        .withColumn("__contaminated", F.lit(True))
    )
    return (
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
        .orderBy("doc_id")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    variants = sys.argv[2:] or ["baseline", "ck_exact", "cache_exact",
                                "ck_exact_trainq"]
    spark = get_spark("profile-curation")
    # warm the JVM/session once
    spark.range(1000).agg(F.sum("id")).collect()
    for v in variants:
        for rep in range(2):
            release_caches()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"curation:{v}:rep{rep}")
            t0 = time.time()
            d = load_table(spark, sf_dir, "documents")
            out = _ledger_variant(d, v)
            n = len(out.collect())
            dt = time.time() - t0
            print(f"{v} rep{rep}: {dt:.2f} s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
