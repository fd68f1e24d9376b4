"""Stage attribution for dp_curation_pipeline with exact_kept
checkpointed: times each sub-DAG cumulatively to find where the fixed
overhead lives."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from flink_tpcds_spark.session import get_spark  # noqa: E402
from flink_tpcds_spark.schemas import load_table  # noqa: E402
from flink_tpcds_spark.datapipe.curate import decontaminate  # noqa: E402
from flink_tpcds_spark.datapipe.dedup import (  # noqa: E402
    minhash_near_dup_pairs,
    near_dup_clusters,
    release_caches,
)
from flink_tpcds_spark.datapipe.text import add_quality_columns  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("profile-curation-stages")
    spark.range(1000).agg(F.sum("id")).collect()
    id_col, text_col = "doc_id", "text"

    for rep in range(2):
        release_caches()
        spark.catalog.clearCache()
        marks = [("start", time.time())]

        d = load_table(spark, sf_dir, "documents")
        holdout = F.col("source").isin("src0", "src1")
        base = add_quality_columns(d, text_col).select(
            F.col(id_col), F.col(text_col), F.col("is_quality"),
            holdout.alias("__holdout"), F.md5(F.col(text_col)).alias("__md5"),
        )
        w = Window.partitionBy("__md5").orderBy(id_col)
        trainq = (
            base.filter(~F.col("__holdout") & F.col("is_quality"))
            .withColumn("__rk", F.row_number().over(w))
        )
        exact_kept = trainq.filter(F.col("__rk") == 1).select(id_col, text_col)
        exact_kept = exact_kept.localCheckpoint(eager=True)
        marks.append(("ck_exact_kept", time.time()))

        pairs = minhash_near_dup_pairs(
            exact_kept, id_col=id_col, text_col=text_col, threshold=0.8,
        ).select("id_a", "id_b").localCheckpoint(eager=True)
        marks.append(("pairs", time.time()))

        near_dropped = (
            near_dup_clusters(pairs)
            .filter(~F.col("is_canonical"))
            .select(F.col("doc_id").alias(id_col))
            .withColumn("__near_dup", F.lit(True))
        ).localCheckpoint(eager=True)
        marks.append(("clusters", time.time()))

        survivors = exact_kept.join(
            near_dropped.select(id_col), id_col, "left_anti"
        )
        union = survivors.withColumn("__h", F.lit(False)).unionByName(
            base.filter(F.col("__holdout")).select(id_col, text_col)
            .withColumn("__h", F.lit(True))
        )
        contaminated = (
            decontaminate(union, F.col("__h"), id_col=id_col, text_col=text_col)
            .filter(F.col("n_shared_shingles") >= 1)
            .select(id_col)
            .withColumn("__contaminated", F.lit(True))
        ).localCheckpoint(eager=True)
        marks.append(("decontaminate", time.time()))

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
            ).orderBy("doc_id")
        )
        n = len(ledger.collect())
        marks.append(("ledger_collect", time.time()))

        total = marks[-1][1] - marks[0][1]
        deltas = [
            f"{name}={marks[i+1][1]-marks[i][1]:.2f}"
            for i, (name, _) in enumerate(marks[1:])
        ]
        print(f"rep{rep} rows={n} total={total:.2f}s  " + "  ".join(deltas),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
