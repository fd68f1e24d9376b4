#!/usr/bin/env python
"""Stage-attributed timing of dp_neardup_minhash's pipeline pieces.

Times each building block in isolation with the noop sink (guide
§1.4) so the 4.7 s headline number can be attributed: tokenize+shingle
materialization, signature UDF, band explosion, bucket guard,
candidate self-join, verify joins.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")

from pyspark.sql import functions as F  # noqa: E402

from flink_tpcds_spark.datapipe.dedup import (  # noqa: E402
    _band_keys,
    hashed_shingles,
    minhash_near_dup_pairs,
    minhash_signature_udf,
    release_caches,
    shingles_of_tokens,
)
from flink_tpcds_spark.datapipe.text import tokens  # noqa: E402
from flink_tpcds_spark.schemas import load_table  # noqa: E402
from flink_tpcds_spark.session import get_spark  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-neardup")
    sc = spark.sparkContext
    d = load_table(spark, sf_dir, "documents")

    # warmup full query once (codegen + python workers)
    minhash_near_dup_pairs(d, threshold=0.8).collect()
    release_caches()

    base = d.select(F.col("doc_id").alias("id"), F.col("text").alias("t")).filter(
        F.size(tokens(F.col("t"))) >= 3
    )
    toks_df = base.select("id", tokens(F.col("t")).alias("toks"))
    sh_df = toks_df.select("id", shingles_of_tokens(F.col("toks")).alias("sh"))
    hashed_df = sh_df.withColumn("hashed", hashed_shingles(F.col("sh"))).select(
        "id", "hashed"
    )
    sig_udf = minhash_signature_udf()
    sig_df = hashed_df.withColumn("sig", sig_udf(F.col("hashed"))).select("id", "sig")
    bands_df = sig_df.select(
        "id", F.explode(_band_keys(F.col("sig"))).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))

    pieces = [
        ("tokenize", toks_df),
        ("tokenize+shingle", sh_df),
        ("tokenize+shingle+basehash", hashed_df),
        ("...+signature_udf", sig_df),
        ("...+bands_explode", bands_df),
    ]
    for name, df in pieces:
        best = min(noop(df) for _ in range(2))
        print(f"{name:32s} {best:6.3f}s")

    sc.setJobDescription("full minhash_near_dup_pairs")
    for _ in range(2):
        release_caches()
        t0 = time.time()
        minhash_near_dup_pairs(d, threshold=0.8).collect()
        print(f"{'full pipeline (collect)':32s} {time.time() - t0:6.3f}s")
    release_caches()


if __name__ == "__main__":
    main()
