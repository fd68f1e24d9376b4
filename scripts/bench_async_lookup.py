"""Async-lookup capacity sweep — the measured reading behind
ops_async_lookup_join (reference AsyncLookupJoinRunner.java's whole
reason to exist: wall-clock of an external-latency-bound lookup stage
scales with the in-flight capacity, not with the row count).

Serves a 10k-row dimension with 10 ms simulated per-request latency,
probes 200k rows / 5k distinct keys across 4 partitions, and times
the join at capacity 1 / 4 / 16 (fresh service per run so the
server-side max_inflight high-water mark is per-capacity). Expected
shape: near-linear speedup until capacity saturates the per-partition
request count.

    python scripts/bench_async_lookup.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    from flink_tpcds_spark.operators.async_lookup import async_lookup_join
    from flink_tpcds_spark.session import get_spark
    from flink_tpcds_spark.sources import restds

    spark = get_spark()
    dim = [{"k": i, "v": float(i)} for i in range(10_000)]
    probe = (
        spark.range(0, 200_000)
        .selectExpr("CAST(id % 5000 AS BIGINT) AS k")
        .coalesce(4)
        .cache()
    )
    probe.count()  # materialize once; the sweep times only the lookup

    out: dict = {"probe_rows": 200_000, "distinct_keys": 5000,
                 "partitions": 4, "sleep_ms": 10, "batch_keys": 32}
    runs: dict = {}
    for capacity in (1, 4, 16):
        srv, url = restds.start_row_service("k bigint, v double", dim)
        t0 = time.time()
        n = async_lookup_join(
            probe, url, "k", "k", "k bigint, v double",
            right_cols=["v"], capacity=capacity, batch_keys=32,
            sleep_ms=10,
        ).count()
        sec = round(time.time() - t0, 3)
        meta = restds._get(url + "/meta")
        runs[f"capacity_{capacity}"] = {
            "sec": sec,
            "rows": n,
            "server_max_inflight": meta["max_inflight"],
        }
        srv.shutdown()
    out["runs"] = runs
    c1 = runs["capacity_1"]["sec"]
    out["speedup_capacity_16_vs_1"] = round(
        c1 / runs["capacity_16"]["sec"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
