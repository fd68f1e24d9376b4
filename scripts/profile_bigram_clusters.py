"""Measure double-evaluation waste in bigram_lm_scores (inst consumed
by both the count path and the scoring join -> two tokenize+explode
passes) and near_dup_clusters (edges = pairs UNION swap(pairs) ->
verify-join subtree evaluated twice before the persist materializes).

Usage: python scripts/profile_bigram_clusters.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_tpcds_spark.session import get_spark  # noqa: E402
from flink_tpcds_spark.schemas import load_table  # noqa: E402
from flink_tpcds_spark.datapipe.dedup import (  # noqa: E402
    minhash_near_dup_pairs,
    near_dup_clusters,
    release_caches,
)
from flink_tpcds_spark.datapipe.text import tokens  # noqa: E402
from flink_tpcds_spark.functions.deterministic import dsum  # noqa: E402


def bigram(df, ck_inst):
    id_col = "doc_id"
    toks = tokens(F.col("text"))
    base = df.select(F.col(id_col), toks.alias("__t")).filter(F.size("__t") >= 2)
    pairs = F.expr(
        "transform(sequence(1, size(__t) - 1), "
        "i -> struct(__t[i - 1] as w1, __t[i] as w2))"
    )
    inst = base.select(id_col, F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    if ck_inst:
        inst = inst.localCheckpoint(eager=True)
    c2 = inst.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    vocab = base.select(F.explode("__t").alias("u")).agg(
        F.count_distinct("u").alias("v")
    )
    a = F.lit(0.5)
    logp_table = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1", "w2",
            F.round(
                F.log((F.col("n2") + a) / (F.col("n1") + a * F.col("v"))), 6
            ).alias("__logp"),
        )
    )
    scored = inst.join(logp_table, ["w1", "w2"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(dsum(F.col("__logp")) / F.count(F.lit(1)), 4).alias("avg_logp"),
    ).orderBy(id_col)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("profile-bigram-clusters")
    spark.range(1000).agg(F.sum("id")).collect()
    d = load_table(spark, sf_dir, "documents")

    for label, ck in (("bigram_base", False), ("bigram_ck_inst", True)):
        for rep in range(2):
            release_caches(); spark.catalog.clearCache()
            t0 = time.time()
            n = len(bigram(d, ck).collect())
            print(f"{label} rep{rep}: {time.time()-t0:.2f}s rows={n}",
                  flush=True)

    for label, ck in (("clusters_base", False), ("clusters_ck_pairs", True)):
        for rep in range(2):
            release_caches(); spark.catalog.clearCache()
            t0 = time.time()
            p = minhash_near_dup_pairs(d, threshold=0.8).select("id_a", "id_b")
            if ck:
                p = p.localCheckpoint(eager=True)
            n = len(near_dup_clusters(p).orderBy("doc_id").collect())
            print(f"{label} rep{rep}: {time.time()-t0:.2f}s rows={n}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
