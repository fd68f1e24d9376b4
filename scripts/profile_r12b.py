"""A/B profiling for the r12 continuation session (guide §1: measure
before shipping).

Candidates:
1. simhash_fingerprints: explode + groupBy(id) with 64 conditional
   sums (one shuffle) vs a zero-shuffle per-row form — JVM xxhash64
   over the token array + one vectorized numpy pandas UDF
   (bit-identical math; verified in-script).
2. ev_session_window: the final global ORDER BY's range partitioner
   runs a sampling pass that re-executes the session-merge aggregate;
   a localCheckpoint between agg and sort materializes the (small)
   session table once.

Usage: python scripts/profile_r12b.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

from flink_tpcds_spark.datapipe.dedup import simhash_fingerprints  # noqa: E402
from flink_tpcds_spark.datapipe.text import tokens  # noqa: E402
from flink_tpcds_spark.schemas import load_table  # noqa: E402
from flink_tpcds_spark.session import get_spark  # noqa: E402


def timeit(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"  {label:55s} {best:7.3f}s", flush=True)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def simhash_fingerprints_udf(df, id_col="doc_id", text_col="text"):
    """Zero-shuffle variant: per-row token hashes (JVM) + numpy votes."""
    hashed = F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t))
    base = df.select(F.col(id_col).alias("__id"), hashed.alias("__hs")).filter(
        F.size("__hs") >= 1
    )

    @pandas_udf("bigint")
    def fp(hs: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        one = np.uint64(1)
        out = np.empty(len(hs), dtype=np.int64)
        for i, h in enumerate(hs):
            a = np.asarray(h, dtype=np.int64).view(np.uint64)
            bits = (a[:, None] >> shifts) & one
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            word = (((votes > 0).astype(np.uint64)) << shifts).sum(
                dtype=np.uint64
            )
            out[i] = np.uint64(word).view(np.int64)
        return pd.Series(out)

    return base.select(
        F.col("__id").alias(id_col), fp("__hs").alias("simhash")
    )


def minhash_pairs_eager(df, threshold=0.8, max_bucket_size=5000):
    """minhash_near_dup_pairs with eager localCheckpoint barriers in
    place of the lazy .cache() on sh_table and bands — tests whether
    the 3 concurrent consumers of the lazy cache race its population
    (the dp_boilerplate pathology) or overlap productively."""
    from flink_tpcds_spark.datapipe.dedup import (
        _band_keys,
        hashed_shingles,
        jaccard,
        minhash_signature_udf,
        shingles_of_tokens,
    )

    sh_table = (
        df.select(F.col("doc_id").alias("id"), F.col("text").alias("t"))
        .filter(F.size(tokens(F.col("t"))) >= 3)
        .select("id", tokens(F.col("t")).alias("toks"))
        .select("id", shingles_of_tokens(F.col("toks")).alias("sh"))
        .localCheckpoint(eager=True)
    )
    sig_udf = minhash_signature_udf()
    bands = (
        sh_table.withColumn("hashed", hashed_shingles(F.col("sh")))
        .withColumn("sig", sig_udf(F.col("hashed")))
        .select("id", F.explode(_band_keys(F.col("sig"))).alias("bk"))
        .select(
            "id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
        )
        .localCheckpoint(eager=True)
    )
    over_cap = (
        bands.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") > max_bucket_size)
        .select("band", "bucket")
    )
    bands = bands.join(F.broadcast(over_cap), ["band", "bucket"], "left_anti")
    candidates = (
        bands.alias("x").hint("merge")
        .join(bands.alias("y").hint("merge"), ["band", "bucket"])
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    verified = (
        candidates.join(
            sh_table.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")).hint("merge"),
            "id_a",
        )
        .join(
            sh_table.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")).hint("merge"),
            "id_b",
        )
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-r12b")
    d = load_table(spark, sf_dir, "documents")

    # --- 1. simhash fingerprints: verify bit-identical, then time ---
    spark.sparkContext.setJobDescription("simhash: verify parity")
    cur = {r.doc_id: r.simhash for r in simhash_fingerprints(d).collect()}
    new = {r.doc_id: r.simhash for r in simhash_fingerprints_udf(d).collect()}
    assert cur == new, (
        f"MISMATCH: {len(cur)} vs {len(new)} rows; "
        f"first diff: {next(((k, cur.get(k), new.get(k)) for k in cur if cur.get(k) != new.get(k)), None)}"
    )
    print(f"simhash parity OK ({len(cur)} docs)")

    spark.sparkContext.setJobDescription("simhash: explode+groupBy (current)")
    timeit("simhash current (explode+64-sum groupBy)", lambda: noop(simhash_fingerprints(d)))
    spark.sparkContext.setJobDescription("simhash: zero-shuffle UDF")
    timeit("simhash zero-shuffle numpy UDF", lambda: noop(simhash_fingerprints_udf(d)))

    # --- 2. ev_session_window: sort sampling re-execution ---
    e = load_table(spark, sf_dir, "events")

    def session_agg():
        return (
            e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "cnt",
            )
        )

    spark.sparkContext.setJobDescription("ev_session: agg only")
    timeit("session agg, no sort (noop)", lambda: noop(session_agg()))
    spark.sparkContext.setJobDescription("ev_session: agg + orderBy")
    timeit(
        "session agg + ORDER BY (noop)",
        lambda: noop(session_agg().orderBy("user_id", "session_start")),
    )
    spark.sparkContext.setJobDescription("ev_session: agg ckpt + orderBy")
    timeit(
        "session agg localCheckpoint + ORDER BY (noop)",
        lambda: noop(
            session_agg()
            .localCheckpoint(eager=True)
            .orderBy("user_id", "session_start")
        ),
    )

    # --- 3. minhash pairs: lazy-cache (current) vs eager barriers ---
    from flink_tpcds_spark.datapipe.dedup import (
        minhash_near_dup_pairs,
        release_caches,
    )

    # parity first
    cur_pairs = sorted(
        (r.id_a, r.id_b) for r in minhash_near_dup_pairs(d).collect()
    )
    release_caches()
    new_pairs = sorted((r.id_a, r.id_b) for r in minhash_pairs_eager(d).collect())
    assert cur_pairs == new_pairs, "minhash eager variant pair mismatch"
    print(f"minhash parity OK ({len(cur_pairs)} pairs)")

    def run_current():
        release_caches()
        minhash_near_dup_pairs(d).collect()
        release_caches()

    spark.sparkContext.setJobDescription("minhash: lazy cache (current)")
    timeit("minhash pairs, lazy cache (current)", run_current)
    spark.sparkContext.setJobDescription("minhash: eager barriers")
    timeit("minhash pairs, eager localCheckpoint", lambda: minhash_pairs_eager(d).collect())
    spark.stop()


if __name__ == "__main__":
    main()
