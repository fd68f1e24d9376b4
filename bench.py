#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock of the headline suite (sum of per-query times,
after a warmup run of h06 to absorb JVM/session startup).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Local-bench posture: split the small single-file testdata parquet at
# row-group boundaries so all 32 cores scan in parallel (the session
# default stays at the cluster-safe 128m).
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")

from flink_tpcds_spark.queries import all_queries  # noqa: E402
from flink_tpcds_spark.session import get_spark  # noqa: E402

# Headline set: spans scan-agg, multi-join, semi/anti, window frames,
# top-k, event-time windows, and the LLM-pipeline ops (dedup + ANN).
HEADLINE = [
    "h01_pricing_summary",
    "h03_shipping_priority",
    "h05_local_supplier_volume",
    "h06_forecast_revenue",
    "h08_market_share",
    "h09_product_profit",
    "h13_customer_distribution",
    "h18_large_volume_customer",
    "h21_suppliers_waiting",
    "ops_window_frames",
    "ev_session_window",
    "dp_neardup_minhash",
    "dp_knn_cosine",
    "dp_text_quality",
]

# Fixed SF1 regression subset: union of the sf0.1 top-10-slowest in
# both postures (BENCH_r07) + the decade-up CBO canaries (q72's 3.6×
# stats win and q64's stats-posture tail exist only at SF1). Fixed so
# the per-round numbers are comparable round over round.
SF1_SUBSET = [
    "q2", "q4", "q5", "q14a", "q14b", "q23a", "q23b",
    "q47", "q58", "q64", "q72", "q77",
]


def main() -> None:
    # Load gate (VERDICT r8 item 2): BENCH_r08's 16.95 s headline was
    # taken at loadavg 16 and over-read the suite by ~22 % — a
    # contended run must never again be the artifact of record. If the
    # 1-minute load is above the threshold, WAIT for it to drain
    # (up to SPARK_GRAFT_LOAD_WAIT_SEC, default 600 s) before starting;
    # if it never drains, run anyway (the bench contract must not
    # break) but stamp the artifact load_contended=true so the reading
    # is self-adjudicating.
    load_gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))
    wait_budget = int(os.environ.get("SPARK_GRAFT_LOAD_WAIT_SEC", "600"))
    waited = 0
    while os.getloadavg()[0] > load_gate and waited < wait_budget:
        time.sleep(30)
        waited += 30
    load_1m = round(os.getloadavg()[0], 2)
    load_contended = load_1m > load_gate
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0  # unknown scale tag; the dir is still used as-is
    spark = get_spark("bench")
    qs = all_queries()

    # Warmup: absorb JVM/codegen startup AND Python-worker spin-up
    # (pandas UDF paths) so per-query numbers reflect steady state.
    from flink_tpcds_spark.datapipe.dedup import release_caches

    qs["h06_forecast_revenue"](spark, sf_dir).collect()
    qs["dp_neardup_minhash"](spark, "/root/testdata/sf0.01").collect()
    release_caches()  # don't let the warmup's shingle cache ride along

    # Per-query codegen warmup: every headline query compiles its own
    # whole-stage-codegen classes, and on a host with slow C2 JIT the
    # first timed run measures compilation, not the query (observed
    # after the r8 mid-round VM restart: min-of-2 h01 read 2.4-2.7 s
    # while a deeply warmed run converges to 1.86 s — BENCH_NOTES
    # "Round 8: host profile shift"). One untimed suite pass pins the
    # timed runs to steady state on any host; the timed protocol
    # (min-of-2 per query) is unchanged.
    for name in HEADLINE:
        qs[name](spark, sf_dir).collect()
    release_caches()

    # Transient-settle gate (r12 continuation, declared in
    # OPTIMIZATION_r12.md): a DECAYING background transient (kernel
    # writeback of a just-finished data generation, a sibling JVM
    # teardown) can pass the loadavg gate at start yet inflate the
    # first timed minutes 2-3x and be gone by the calibration block —
    # observed on an idle box: headline 31.1 s whose per-query
    # inflation decayed monotonically through the loop while the
    # fixed anchor minutes later read normal. Absorb it: re-run the
    # cheapest headline query until two consecutive readings agree
    # within 20 % (max 8 runs — if it never settles, the loadavg/
    # anchor stamps still adjudicate), and stamp the trace so the
    # artifact shows what was absorbed.
    settle_trace: list[float] = []
    prev = None
    for _ in range(8):
        t0 = time.time()
        qs["h06_forecast_revenue"](spark, sf_dir).collect()
        cur = time.time() - t0
        settle_trace.append(round(cur, 3))
        if prev is not None and abs(cur - prev) <= 0.2 * max(cur, prev):
            break
        prev = cur

    # Steady-state timing: two measured runs per query, min reported.
    # A single sample conflates the query with whatever transient the
    # shared machine has at that second (GC, page cache, a sibling
    # process); min-of-2 is the standard steady-state posture and
    # BENCH_r03 showed exactly that failure mode (every query in an
    # unchanged suite uniformly 2-3x slower than r02).
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            release_caches()  # no cross-run reuse of operator caches
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)

    release_caches()  # evict shingle caches pinned by the near-dup ops

    # Host calibration anchor (VERDICT r9 item 3): the shared machine's
    # profile has shifted three rounds running (deep-warm h01
    # 1.59/1.86/2.03 s across the hosts seen), making round-over-round
    # comparisons an archaeology exercise. Record the anchor IN the
    # artifact and report the headline both raw and anchor-normalized
    # against the r8 host's 1.86 s reference. Normalization is only
    # meaningful at the standard sf0.1 posture on the standard suite.
    #
    # Measurement-bug fix (r12, declared in OPTIMIZATION_r12.md): the
    # anchor used to be the DECLARED h01 — but an anchor must be a
    # FIXED computation, or optimizing the query silently re-scales
    # host_factor (r12's scaled-long dsum made declared h01 ~2.6×
    # faster, which would have read as "the host got 2.6× faster" and
    # inflated every normalized number by the same factor). The anchor
    # is now the r1–r11 decimal-bridge form of h01, built inline here
    # so no future engine change can perturb it; it is the exact
    # computation the 1.86 s r8 reference was measured on. The
    # declared-h01 deep-warm reading is kept alongside for continuity
    # with r8–r11 artifacts.
    from pyspark.sql import functions as F

    from flink_tpcds_spark.schemas import load_table

    def _anchor_df():
        # h01 as benched r1–r11: decimal(18,6)-bridge sums/avgs.
        li = load_table(spark, sf_dir, "lineitem")

        def dsum_dec(c):
            return F.sum(c.cast("decimal(18,6)")).cast("double")

        rev = li.l_extendedprice * (1 - li.l_discount)
        return (
            li.filter(
                li.l_shipdate <= F.lit("2000-12-01").cast("timestamp")
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                dsum_dec(li.l_quantity).alias("sum_qty"),
                dsum_dec(li.l_extendedprice).alias("sum_base_price"),
                dsum_dec(rev).alias("sum_disc_price"),
                dsum_dec(rev * (1 + li.l_tax)).alias("sum_charge"),
                (dsum_dec(li.l_quantity) / F.count(li.l_quantity)).alias(
                    "avg_qty"
                ),
                (
                    dsum_dec(li.l_extendedprice)
                    / F.count(li.l_extendedprice)
                ).alias("avg_price"),
                (dsum_dec(li.l_discount) / F.count(li.l_discount)).alias(
                    "avg_disc"
                ),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    _anchor_df().collect()  # codegen warm for the anchor's own classes
    anchor_runs = []
    declared_runs = []
    for _ in range(5):
        t0 = time.time()
        _anchor_df().collect()
        anchor_runs.append(time.time() - t0)
        t0 = time.time()
        qs["h01_pricing_summary"](spark, sf_dir).collect()
        declared_runs.append(time.time() - t0)
    fixed_anchor = round(min(anchor_runs), 3)
    h01_anchor = round(min(declared_runs), 3)
    anchor_ref = 1.86  # r8 host deep-warm h01 (BENCH_NOTES "Round 8")
    host_factor = round(fixed_anchor / anchor_ref, 3)
    calibration = {
        "h01_deepwarm_min5": h01_anchor,
        "anchor_fixed_decimal_h01_min5": fixed_anchor,
        "anchor_ref_sec": anchor_ref,
        "host_factor": host_factor,
        "anchor_valid_for_sf": sf == 0.1,
    }

    # TPC-DS corpus wall-clock (the reference's own implicit metric is
    # its ITCase's JUnit wall-clock over the same 103 queries). Timing
    # only — correctness is tests/test_tpcds.py's DuckDB parity gate.
    #
    # Measured in BOTH catalog postures per round (VERDICT r5 item 5):
    # 1. temp views, no stats — the driver-gate default;
    # 2. catalog tables + once-per-load ANALYZE FOR ALL COLUMNS — the
    #    cluster posture (CBO join-reorder with real cardinalities,
    #    mirroring the reference's join-reorder-ON config,
    #    TpcDsBatchExecITCase.scala:71-72). The one-time ANALYZE cost
    #    is reported separately (at 100 TB it amortizes per load).
    # `--stats` runs ONLY posture 2 (quick CBO experiments);
    # SPARK_GRAFT_SKIP_STATS=1 runs only posture 1.
    stats_only = "--stats" in sys.argv
    skip_stats = os.environ.get("SPARK_GRAFT_SKIP_STATS") == "1"
    tpcds: dict | None = None
    tpcds_stats: dict | None = None
    if os.environ.get("SPARK_GRAFT_SKIP_TPCDS") != "1":
        try:
            from flink_tpcds_spark.tpcds import datagen, runner

            data_dir = datagen.generate()
            names = runner.query_names()

            def corpus_pass(calibrate: bool = False) -> dict:
                # Per-query wall-clock (VERDICT r6 item 4): the
                # reference's implicit metric is per-case JUnit time
                # (TpcDsBatchExecITCase.scala:96-99); without it,
                # suite-level drift cannot be attributed to a query.
                #
                # calibrate=True (views posture only) records corpus
                # q1 cold (first run in this posture — codegen compile
                # included, the slow-C2-JIT host signature) vs warm
                # (re-run after the full timed pass). Side effect on
                # comparability: per_q["q1"] in the timed loop is then
                # one run warmer than in r1-r9 readings; q1 reads
                # ~0.3 s warm, so the suite total shift is noise-band,
                # and the cold/warm pair is what adjudicates host
                # drift (VERDICT r9 item 3).
                cold = warm = None
                if calibrate:
                    q0 = time.time()
                    runner.run_spark("q1", spark)
                    cold = round(time.time() - q0, 3)
                runner.run_spark("q96", spark)  # warmup
                # SPARK_GRAFT_CORPUS_WARMUP=1: untimed full pre-pass
                # (per-query codegen warm, like the headline's) —
                # opt-in so the default posture stays comparable to
                # r6/r7 single-pass readings; use on slow-JIT hosts
                # (BENCH_NOTES "Round 8: host profile shift")
                if os.environ.get("SPARK_GRAFT_CORPUS_WARMUP") == "1":
                    for name in names:
                        runner.run_spark(name, spark)
                per_q: dict[str, float] = {}
                t0 = time.time()
                for name in names:
                    q0 = time.time()
                    runner.run_spark(name, spark)
                    per_q[name] = round(time.time() - q0, 3)
                total_sec = round(time.time() - t0, 3)
                if calibrate:
                    q0 = time.time()
                    runner.run_spark("q1", spark)
                    warm = round(time.time() - q0, 3)
                slowest = dict(
                    sorted(per_q.items(), key=lambda kv: -kv[1])[:10]
                )
                out = {
                    "queries": len(names),
                    "total_sec": total_sec,
                    "top10_slowest": slowest,
                }
                if calibrate:
                    out["q1_cold_sec"] = cold
                    out["q1_warm_sec"] = warm
                return out

            if not stats_only:
                runner.register_spark_views(spark, data_dir)
                tpcds = corpus_pass(calibrate=True)
            if not skip_stats:
                t0 = time.time()
                runner.register_catalog_tables(
                    spark, data_dir, analyze=True
                )
                analyze_sec = round(time.time() - t0, 3)
                tpcds_stats = corpus_pass()
                tpcds_stats["analyze_sec"] = analyze_sec
        except Exception:  # noqa: BLE001 — never break the bench contract
            pass

    # Bucketed posture (VERDICT r7 item 4): lineitem+orders bucketed
    # on their order keys, every registry query inheriting the
    # shuffle-free fact⋈fact join via the load_table redirect. At
    # sf0.1 the session broadcasts everything, so BOTH variants are
    # timed in the forced sort-merge regime (autoBroadcastJoinThreshold
    # -1) — the plan shape that exists at corpus scale, where the ×100
    # h21 core measured 22.3 s → 4.9 s (BENCH_NOTES r7). The per-round
    # signal is the plain-SMJ vs bucketed-SMJ delta on the
    # order-key-join subset.
    bucketed: dict | None = None
    if os.environ.get("SPARK_GRAFT_SKIP_BUCKETED") != "1":
        try:
            from flink_tpcds_spark.sources.bucketing import (
                install_bucketed_posture,
                uninstall_bucketed_posture,
            )

            subset = [
                "h03_shipping_priority",
                "h18_large_volume_customer",
                "h21_suppliers_waiting",
            ]
            confs = (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold",
            )
            prev = {k: spark.conf.get(k, None) for k in confs}

            def smj_pass() -> dict[str, float]:
                per_q = {}
                for name in subset:
                    best = float("inf")
                    for _ in range(2):
                        t0 = time.time()
                        qs[name](spark, sf_dir).collect()
                        best = min(best, time.time() - t0)
                    per_q[name] = round(best, 3)
                return per_q

            try:
                for k in confs:
                    spark.conf.set(k, "-1")
                plain_smj = smj_pass()
                t0 = time.time()
                write_info = install_bucketed_posture(spark, sf_dir)
                bucket_sec = round(time.time() - t0, 3)
                bkt_smj = smj_pass()
            finally:
                uninstall_bucketed_posture()
                for k, v in prev.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
            bucketed = {
                "plain_smj": plain_smj,
                "bucketed_smj": bkt_smj,
                "bucket_write_sec": bucket_sec,
                "cached": all(v == 0.0 for v in write_info.values()),
            }
        except Exception:  # noqa: BLE001 — never break the bench contract
            pass

    # One-decade-up regression canary (VERDICT r7 item 3 of "What's
    # missing"): the q72 CBO join-order win (9.96 s views → 2.78 s
    # stats at SF1) exists ONLY at SF1 volumes — the sf0.1 corpus pass
    # above cannot see a join-order regression (q72 reads ~1 s in both
    # postures at micro scale). Every round therefore re-times a fixed
    # 12-query SF1 subset (the sf0.1 top-10-slowest union + q72/q64 —
    # the decade-up tails) in both postures. Data is generated once
    # and cached by size-fingerprint marker. SPARK_GRAFT_SKIP_SF1=1
    # skips (e.g. when iterating on the headline suite locally).
    sf1: dict | None = None
    if (
        os.environ.get("SPARK_GRAFT_SKIP_SF1") != "1"
        and os.environ.get("SPARK_GRAFT_SKIP_TPCDS") != "1"
        and not stats_only
    ):
        try:
            from flink_tpcds_spark.tpcds import datagen, runner
            from flink_tpcds_spark.tpcds.datagen import SIZES_SF1

            sf1_dir = os.environ.get(
                "SPARK_GRAFT_SF1_DIR", "/tmp/tpcds_sf1"
            )
            t0 = time.time()
            datagen.generate(sf1_dir, sizes=SIZES_SF1)
            gen_sec = round(time.time() - t0, 1)

            def sf1_pass() -> dict[str, float]:
                per_q: dict[str, float] = {}
                for name in SF1_SUBSET:
                    q0 = time.time()
                    runner.run_spark(name, spark)
                    per_q[name] = round(time.time() - q0, 3)
                return per_q

            runner.register_spark_views(spark, sf1_dir)
            runner.run_spark("q96", spark)  # warmup at SF1 volumes
            t0 = time.time()
            v = sf1_pass()
            v_sec = round(time.time() - t0, 3)
            t0 = time.time()
            runner.register_catalog_tables(spark, sf1_dir, analyze=True)
            analyze_sec = round(time.time() - t0, 3)
            t0 = time.time()
            s = sf1_pass()
            s_sec = round(time.time() - t0, 3)
            sf1 = {
                "subset": len(SF1_SUBSET),
                "gen_sec": gen_sec,
                "views": v,
                "views_total_sec": v_sec,
                "stats": s,
                "stats_total_sec": s_sec,
                "analyze_sec": analyze_sec,
            }
            # Returns-pair bucketed posture (VERDICT r8 item 6): the
            # q24-class store_sales⋈store_returns join on (ticket,
            # item) with both facts bucketed — the shuffle-free plan
            # the SF10 sweep measured at 2.5× over stats-SMJ
            # (BENCH_NOTES "Round 8: SF10"). Standing SF1 reading:
            # q24a/q24b stats-SMJ vs bucketed, per round.
            try:
                from flink_tpcds_spark.sources.bucketing import (
                    TPCDS_RETURNS_BUCKET_SPEC,
                    install_bucketed_corpus_views,
                )

                rb: dict = {}
                for name in ("q24a", "q24b"):
                    q0 = time.time()
                    runner.run_spark(name, spark)
                    rb[f"{name}_stats"] = round(time.time() - q0, 3)
                t0 = time.time()
                w = install_bucketed_corpus_views(
                    spark,
                    sf1_dir,
                    TPCDS_RETURNS_BUCKET_SPEC,
                    analyze=True,
                )
                rb["bucket_write_sec"] = round(time.time() - t0, 3)
                rb["cached"] = all(v == 0.0 for v in w.values())
                for name in ("q24a", "q24b"):
                    q0 = time.time()
                    runner.run_spark(name, spark)
                    rb[f"{name}_bucketed"] = round(time.time() - q0, 3)
                sf1["returns_bucketed"] = rb
            finally:
                # the temp views SHADOW the catalog tables — dropping
                # them restores the plain stats posture untouched
                for t in ("store_sales", "store_returns"):
                    spark.catalog.dropTempView(t)
        except Exception:  # noqa: BLE001 — never break the bench contract
            pass

    # Two-decades-up standing canary (VERDICT r8 item 4): SF10 ran
    # once by script in r8; keep the cheapest useful slice per-round —
    # q72 (the CBO join-order canary: 71.5 s views → ~19 s stats at
    # SF10, invisible at micro scale), q64 (the 2.3M-row output tail),
    # q14a (the cross-channel INTERSECT rollup) — STATS posture only,
    # since the views posture of these is the known-slow plan, not a
    # regression signal. Data generation is fingerprint-cached by
    # datagen.generate's marker (932 s / 3.3 GB when cold).
    # SPARK_GRAFT_SKIP_SF10=1 skips.
    sf10: dict | None = None
    if (
        os.environ.get("SPARK_GRAFT_SKIP_SF10") != "1"
        and os.environ.get("SPARK_GRAFT_SKIP_TPCDS") != "1"
        and not stats_only
    ):
        try:
            from flink_tpcds_spark.tpcds import datagen, runner
            from flink_tpcds_spark.tpcds.datagen import SIZES_SF10

            sf10_dir = os.environ.get(
                "SPARK_GRAFT_SF10_DIR", "/tmp/tpcds_sf10"
            )
            t0 = time.time()
            datagen.generate(sf10_dir, sizes=SIZES_SF10)
            gen_sec = round(time.time() - t0, 1)
            t0 = time.time()
            runner.register_catalog_tables(spark, sf10_dir, analyze=True)
            analyze_sec = round(time.time() - t0, 3)
            runner.run_spark("q96", spark)  # warmup at SF10 volumes
            # min-of-2 with BOTH readings recorded (VERDICT r11 items
            # 1-2): a single SF10 shot cannot distinguish a decade-up
            # regression from scheduler noise (the committed q64 probe
            # showed consecutive identical runs swinging ±40 % on one
            # process). Two runs per query = the canary carries its
            # own variance evidence in the artifact.
            per_q: dict[str, float] = {}
            sf10_runs: dict[str, list[float]] = {}
            for name in ("q72", "q64", "q14a"):
                reads = []
                for _ in range(2):
                    q0 = time.time()
                    runner.run_spark(name, spark)
                    reads.append(round(time.time() - q0, 3))
                sf10_runs[name] = reads
                per_q[name] = min(reads)
            sf10 = {
                "gen_sec": gen_sec,
                "analyze_sec": analyze_sec,
                "stats": per_q,
                "stats_runs": sf10_runs,
            }
        except Exception:  # noqa: BLE001 — never break the bench contract
            pass

    total = round(sum(times.values()), 3)
    calibration["headline_raw_sec"] = total
    calibration["headline_anchor_normalized_sec"] = round(
        total / host_factor, 3
    )
    out = {
        "metric": "headline_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "runs_per_query": 2,  # min-of-2 steady state
        "loadavg_1m_at_start": load_1m,
        "load_gate_wait_sec": waited,
        "load_contended": load_contended,
        "settle_trace": settle_trace,
        "calibration": calibration,
    }
    if tpcds is not None:
        tpcds["total_sec_anchor_normalized"] = round(
            tpcds["total_sec"] / host_factor, 3
        )
        out["tpcds_corpus"] = tpcds
    if tpcds_stats is not None:
        tpcds_stats["total_sec_anchor_normalized"] = round(
            tpcds_stats["total_sec"] / host_factor, 3
        )
        out["tpcds_corpus_stats"] = tpcds_stats
    if bucketed is not None:
        out["bucketed_posture"] = bucketed
    if sf1 is not None:
        out["sf1"] = sf1
    if sf10 is not None:
        out["sf10"] = sf10
    # Two-line emission (VERDICT r10 item 5, closing the r9 ask): the
    # driver archives only the TAIL of stdout (~2 KB), and the full
    # detail object is longer than that — r10's artifact opens
    # mid-queries-map. Line 1 = the full detail object (complete for
    # local readers). The LAST line = a compact but complete metric
    # object (headline value + full per-query map + calibration +
    # block TOTALS only) sized well under the tail window, so the
    # archived artifact always parses from its last newline.
    print(json.dumps(out))
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "runs_per_query": out["runs_per_query"],
        # load stamps (VERDICT r11 item 1): without these on the
        # archived line, a contended-host headline (r11's 24.5 s vs
        # the quiet-host 18.1 s) cannot self-adjudicate
        "loadavg_1m_at_start": load_1m,
        "load_gate_wait_sec": waited,
        "load_contended": load_contended,
        "settle_trace": settle_trace,
        "queries": times,
        "calibration": calibration,
    }
    for block in ("tpcds_corpus", "tpcds_corpus_stats"):
        if block in out:
            compact[block] = {
                k: v
                for k, v in out[block].items()
                if k != "top10_slowest"
            }
    if sf10 is not None:
        # both runs per query on the archived line — the variance
        # evidence IS the canary's noise adjudication
        compact["sf10"] = sf10["stats_runs"]
    if sf1 is not None:
        compact["sf1"] = {
            k: sf1[k]
            for k in ("views_total_sec", "stats_total_sec")
            if k in sf1
        }
        if "returns_bucketed" in sf1:
            compact["sf1"]["returns_bucketed"] = sf1["returns_bucketed"]
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
