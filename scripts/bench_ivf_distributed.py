#!/usr/bin/env python
"""Distributed vs driver-side IVF centroid training at corpus scale.

VERDICT r7 item 1: the last driver-bound stage of the ANN stack was
`_ivf_centroids`'s 8·C-row sample collect (~800k embeddings on the
driver at C = 10⁵). `_ivf_centroids_distributed` keeps the sample on
the cluster and reduces per-cell partial sums; this script MEASURES
the swap at the FAISS posture the verdict asked for:

    ≥10M vectors, C ≈ 4×10⁴ cells (≈250 vectors/cell)

on a cluster-structured corpus (vectors = unit-norm parents + noise,
so recall against brute force is meaningful), reporting:

- train wall-clock, distributed vs driver-side (budget raised to
  force the old path on the same data);
- max driver-side collect size on each path (the point of the swap);
- recall@10 of `knn_ivf` with each centroid set against
  `knn_bruteforce` ground truth on the same query sample.

Usage: python scripts/bench_ivf_distributed.py [--n 10_000_000]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from flink_tpcds_spark.session import get_spark  # noqa: E402

WORK = "/tmp/ivf_distributed"
DIM = 32
PARENTS = 50_000  # true cluster centers — ~same order as C (default)
NOISE = 0.35
CHUNK = 250_000


def build(n: int, parents: int = PARENTS) -> str:
    path = os.path.join(
        WORK, f"emb_{n}" if parents == PARENTS else f"emb_{n}_p{parents}"
    )
    marker = os.path.join(path, "_DONE")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(0xD15C)
    parents_m = rng.randn(parents, DIM).astype(np.float64)
    parents_m /= np.linalg.norm(parents_m, axis=1, keepdims=True)
    for c in range(0, n, CHUNK):
        m = min(CHUNK, n - c)
        crng = np.random.RandomState(0xD15C ^ (c + 1))
        pid = crng.randint(0, parents, m)
        vec = parents_m[pid] + NOISE * crng.randn(m, DIM)
        t = pa.table(
            {
                "vec_id": pa.array(
                    np.arange(c, c + m, dtype=np.int64), pa.int64()
                ),
                "embedding": pa.array(
                    list(vec.astype(np.float32)),
                    pa.list_(pa.float32()),
                ),
            }
        )
        pq.write_table(t, os.path.join(path, f"part-{c:09d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return path


def main() -> None:
    n = 10_000_000
    C = 40_000
    skip_driver = "--skip-driver" in sys.argv
    nprobe = 16
    parents = PARENTS
    for i, a in enumerate(sys.argv):
        if a == "--n":
            n = int(sys.argv[i + 1].replace("_", ""))
        if a == "--cells":
            C = int(sys.argv[i + 1].replace("_", ""))
        if a == "--nprobe":
            nprobe = int(sys.argv[i + 1])
        if a == "--parents":
            parents = int(sys.argv[i + 1].replace("_", ""))
    out: dict = {
        "metric": "ivf_distributed_train",
        "n": n,
        "cells": C,
        "dim": DIM,
        "nprobe": nprobe,
    }

    out["parents"] = parents
    t0 = time.time()
    data = build(n, parents)
    out["datagen_sec"] = round(time.time() - t0, 1)

    spark = get_spark()
    from pyspark.sql import functions as F

    from flink_tpcds_spark.datapipe import similarity as S

    emb = spark.read.parquet(data)

    # --auto (VERDICT r8 item 3): the recall-TARGET serving posture at
    # scale — calibrate nprobe to a 0.8 recall@10 floor on a held-out
    # sample, serve at the chosen setting, then verify the floor on a
    # LARGER disjoint-by-construction query set vs brute force.
    if "--auto" in sys.argv:
        floor = 0.8
        qf = F.col("vec_id") % (n // 200) == 0  # ~200 queries
        t0 = time.time()
        approx_df, cal = S.knn_ivf_auto(
            emb,
            qf,
            k=10,
            n_clusters=C,
            recall_floor=floor,
            sample_queries=64,
        )
        got = {
            (r.query_id, r.neighbor_id) for r in approx_df.collect()
        }
        out["auto_total_sec"] = round(time.time() - t0, 1)
        out["auto_nprobe"] = cal["nprobe"]
        out["auto_recall_est"] = round(cal["recall_est"], 3)
        out["auto_floor_met"] = cal["floor_met"]
        out["auto_curve"] = {
            str(p): round(v, 3) for p, v in cal["recall_curve"].items()
        }
        t0 = time.time()
        bf = {
            (r.query_id, r.neighbor_id)
            for r in S.knn_bruteforce(emb, qf, k=10).collect()
        }
        out["bruteforce_sec"] = round(time.time() - t0, 1)
        out["auto_recall_actual"] = round(len(bf & got) / len(bf), 3)
        out["auto_floor"] = floor
        print(json.dumps(out))
        return

    df_cls = type(emb)
    real_collect = df_cls.collect
    sizes: list[int] = []

    def counting_collect(self):
        rows = real_collect(self)
        sizes.append(len(rows))
        return rows

    df_cls.collect = counting_collect
    try:
        # --- distributed path (the default at 8·C = 320k > budget)
        sizes.clear()
        t0 = time.time()
        cents_dist = S._ivf_centroids(emb, C, "vec_id", "embedding")
        out["train_distributed_sec"] = round(time.time() - t0, 1)
        out["train_distributed_cells"] = len(cents_dist)
        out["train_distributed_max_collect_rows"] = max(sizes)

        # --- driver-side path (force by raising the budget)
        cents_drv = None
        if not skip_driver:
            budget = S._DRIVER_TRAIN_BUDGET
            S._DRIVER_TRAIN_BUDGET = 10**9
            sizes.clear()
            t0 = time.time()
            cents_drv = S._ivf_centroids(emb, C, "vec_id", "embedding")
            out["train_driver_sec"] = round(time.time() - t0, 1)
            out["train_driver_cells"] = len(cents_drv)
            out["train_driver_max_collect_rows"] = max(sizes)
            S._DRIVER_TRAIN_BUDGET = budget
    finally:
        df_cls.collect = real_collect

    # --- recall A/B on the same query sample vs brute force
    qf = F.col("vec_id") % (n // 200) == 0  # ~200 queries
    t0 = time.time()
    bf = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_bruteforce(emb, qf, k=10).collect()
    }
    out["bruteforce_sec"] = round(time.time() - t0, 1)
    pairs = [("distributed", cents_dist)]
    if cents_drv is not None:
        pairs.append(("driver", cents_drv))
    for tag, cents in pairs:
        t0 = time.time()
        got = {
            (r.query_id, r.neighbor_id)
            for r in S.knn_ivf(
                emb, qf, k=10, n_clusters=C, nprobe=nprobe, centroids=cents
            ).collect()
        }
        out[f"search_{tag}_sec"] = round(time.time() - t0, 1)
        out[f"recall_{tag}"] = round(len(bf & got) / len(bf), 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
