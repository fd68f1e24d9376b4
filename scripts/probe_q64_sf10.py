"""SF10 q64 regression probe (VERDICT r10 item 4).

BENCH_r10 read q64 at 60.50 s vs r9's 51.79 s (+17 %) at equal host
anchor — the only decade-up regression of the round. This probe
re-reads it: SF10 stats posture, q72/q64/q14a x3 each (min-of-3
separates plan change from host noise), then a stage-level breakdown
of the LAST q64 run via the local Spark status REST API, naming the
stages by executor run time so a grown stage is attributable before
any plan is touched.

Writes JSON to stdout (last line) — run:
    python scripts/probe_q64_sf10.py > /tmp/q64_probe.json
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    from flink_tpcds_spark.session import session_builder
    from flink_tpcds_spark.tpcds import datagen, runner
    from flink_tpcds_spark.tpcds.datagen import SIZES_SF10

    sf10_dir = "/tmp/tpcds_sf10"
    out: dict = {}
    # the tuned session disables the UI; the stage breakdown needs the
    # status REST API, so re-enable it for the probe only
    spark = (
        session_builder("q64-probe")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    t0 = time.time()
    datagen.generate(sf10_dir, sizes=SIZES_SF10)
    out["gen_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    runner.register_catalog_tables(spark, sf10_dir, analyze=True)
    out["analyze_sec"] = round(time.time() - t0, 1)
    runner.run_spark("q96", spark)  # warmup, same as bench.py

    def completed_stages() -> list[dict]:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete",
            timeout=10,
        ) as r:
            return json.loads(r.read())

    times: dict[str, list[float]] = {}
    for name in ("q72", "q64", "q14a"):
        times[name] = []
        for _ in range(3):
            q0 = time.time()
            runner.run_spark(name, spark)
            times[name].append(round(time.time() - q0, 2))
    out["stats_runs"] = times
    out["min"] = {k: min(v) for k, v in times.items()}

    # Stage breakdown of ONE further q64 run, attributed by diffing the
    # completed-stage set before/after so other queries' stages are out.
    try:
        before = {s["stageId"] for s in completed_stages()}
        q0 = time.time()
        runner.run_spark("q64", spark)
        out["q64_attributed_run_sec"] = round(time.time() - q0, 2)
        new = [
            s for s in completed_stages() if s["stageId"] not in before
        ]
        top = sorted(new, key=lambda s: -s.get("executorRunTime", 0))[:12]
        out["q64_top_stages_by_executor_run_time"] = [
            {
                "stageId": s["stageId"],
                "name": s.get("name", "")[:70],
                "executorRunTime_ms": s.get("executorRunTime"),
                "shuffleReadBytes": s.get("shuffleReadBytes"),
                "shuffleWriteBytes": s.get("shuffleWriteBytes"),
                "inputBytes": s.get("inputBytes"),
                "numTasks": s.get("numTasks"),
            }
            for s in top
        ]
        out["q64_stage_count"] = len(new)
        out["q64_executor_run_time_total_ms"] = sum(
            s.get("executorRunTime", 0) for s in new
        )
    except Exception as e:  # noqa: BLE001 — probe stays best-effort
        out["stage_probe_err"] = str(e)[:200]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
