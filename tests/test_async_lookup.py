"""Async lookup join (reference AsyncLookupJoinRunner.java:60,
AsyncTableFunction.java:66): result parity with the definitional
join, left/inner semantics, the in-flight capacity contract proved
SERVER-side (the service's max_inflight high-water mark), and the
partition-local cache."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_tpcds_spark.operators.async_lookup import async_lookup_join
from flink_tpcds_spark.schemas import load_table
from flink_tpcds_spark.sources import restds


def _meta(url: str) -> dict:
    return restds._get(url + "/meta")


@pytest.fixture()
def nation_service(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    rows = [
        {"n_nationkey": r.n_nationkey, "n_name": r.n_name}
        for r in n.collect()
    ]
    srv, url = restds.start_row_service(
        "n_nationkey int, n_name string", rows
    )
    yield url
    srv.shutdown()


def test_matches_definitional_join(spark, sf_dir, nation_service):
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    got = async_lookup_join(
        c,
        nation_service,
        "c_nationkey",
        "n_nationkey",
        "n_nationkey int, n_name string",
        right_cols=["n_name"],
        how="inner",
        capacity=4,
        batch_keys=8,
    )
    want = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner"
    ).select("c_custkey", "c_nationkey", "n_name")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_left_semantics_null_fill(spark, nation_service):
    # keys 200+ don't exist in nation (0..24): left keeps them, NULL fill
    probe = spark.range(0, 30).selectExpr(
        "CAST(CASE WHEN id < 10 THEN id ELSE id + 200 END AS INT) AS k",
        "id AS rid",
    )
    out = async_lookup_join(
        probe,
        nation_service,
        "k",
        "n_nationkey",
        "n_nationkey int, n_name string",
        right_cols=["n_name"],
        how="left",
    )
    rows = {r.rid: r.n_name for r in out.collect()}
    assert len(rows) == 30
    assert all(rows[i] is not None for i in range(10))
    assert all(rows[i] is None for i in range(10, 30))


def test_capacity_bound_and_overlap(spark):
    # single probe partition → exactly one client; the service's
    # high-water mark IS the client's in-flight count. capacity=1
    # must serialize; capacity=6 with per-request latency must overlap.
    dim = [{"k": i, "v": i * 2} for i in range(64)]
    probe = spark.range(0, 64).selectExpr("CAST(id AS BIGINT) AS k")

    srv1, url1 = restds.start_row_service("k bigint, v bigint", dim)
    async_lookup_join(
        probe.coalesce(1), url1, "k", "k", "k bigint, v bigint",
        right_cols=["v"], capacity=1, batch_keys=4, sleep_ms=10,
    ).collect()
    assert _meta(url1)["max_inflight"] == 1
    srv1.shutdown()

    srv2, url2 = restds.start_row_service("k bigint, v bigint", dim)
    async_lookup_join(
        probe.coalesce(1), url2, "k", "k", "k bigint, v bigint",
        right_cols=["v"], capacity=6, batch_keys=4, sleep_ms=40,
    ).collect()
    assert _meta(url2)["max_inflight"] >= 3
    srv2.shutdown()


def test_partition_cache_dedups_requests(spark):
    # 1000 probe rows over 8 distinct keys, one partition, batch_keys=2
    # → at most ceil(8/2)=4 wire requests despite 1000 rows: the
    # partition cache (LookupJoinCachingRunner analog) absorbs repeats.
    dim = [{"k": i, "v": i} for i in range(8)]
    srv, url = restds.start_row_service("k bigint, v bigint", dim)
    probe = spark.range(0, 1000).selectExpr("CAST(id % 8 AS BIGINT) AS k")
    out = async_lookup_join(
        probe.coalesce(1), url, "k", "k", "k bigint, v bigint",
        right_cols=["v"], capacity=4, batch_keys=2,
    )
    assert out.count() == 1000
    assert _meta(url)["pushed_filter_hits"] <= 4
    srv.shutdown()


def test_registry_entry_certifies(spark, sf_dir, oracle_con):
    from flink_tpcds_spark.oracle import certify
    from flink_tpcds_spark.queries.operators import ORACLES, QUERIES

    df = QUERIES["ops_async_lookup_join"](spark, sf_dir)
    for res in certify(
        "ops_async_lookup_join", df, oracle_con,
        ORACLES["ops_async_lookup_join"],
    ):
        assert res.ok, res.detail


def test_cache_bound_evicts_but_stays_correct(spark):
    # cache_max_keys=3 with 10 distinct keys across repeated batches:
    # eviction forces re-fetches (more wire requests than the
    # unbounded ceil(10/2)=5) yet the result is identical.
    dim = [{"k": i, "v": i * 10} for i in range(10)]
    srv, url = restds.start_row_service("k bigint, v bigint", dim)
    probe = spark.range(0, 200).selectExpr("CAST(id % 10 AS BIGINT) AS k")
    rows = async_lookup_join(
        probe.coalesce(1), url, "k", "k", "k bigint, v bigint",
        right_cols=["v"], capacity=4, batch_keys=2, cache_max_keys=3,
    ).collect()
    assert len(rows) == 200
    assert all(r.v == r.k * 10 for r in rows)
    srv.shutdown()


def test_null_int_keys_restore_exact_ints(spark):
    # a NULL anywhere in a bigint key column makes Arrow hand the
    # worker float64; the operator must restore exact ints (so cache
    # and wire predicates probe 3, not 3.0-rounded) and NULL-fill the
    # null-key rows under "left"
    dim = [{"k": i, "v": i * 7} for i in range(20)]
    srv, url = restds.start_row_service("k bigint, v bigint", dim)
    probe = spark.range(0, 40).selectExpr(
        "CASE WHEN id % 4 = 0 THEN CAST(NULL AS BIGINT) "
        "ELSE CAST(id % 20 AS BIGINT) END AS k",
        "id AS rid",
    )
    rows = {r.rid: (r.k, r.v) for r in async_lookup_join(
        probe, url, "k", "k", "k bigint, v bigint",
        right_cols=["v"], how="left", batch_keys=8,
    ).collect()}
    assert len(rows) == 40
    for rid, (k, v) in rows.items():
        if rid % 4 == 0:
            assert k is None and v is None
        else:
            assert v == k * 7
    srv.shutdown()


def test_request_timeout_fails_loud_on_hung_service(spark):
    # sleep_ms makes every request outlast the client timeout: the
    # task must fail with the descriptive TimeoutError, not stall
    # (reference async-I/O carries an explicit lookup timeout —
    # AsyncWaitOperator's timer; ADVICE r11)
    dim = [{"k": i, "v": i} for i in range(4)]
    srv, url = restds.start_row_service("k bigint, v bigint", dim)
    probe = spark.range(0, 4).selectExpr("CAST(id AS BIGINT) AS k")
    with pytest.raises(Exception, match="exceeded 0.3 s"):
        async_lookup_join(
            probe.coalesce(1), url, "k", "k", "k bigint, v bigint",
            right_cols=["v"], sleep_ms=2000, request_timeout=0.3,
        ).collect()
    srv.shutdown()


def test_conflicting_duplicate_key_rows_fail_loud(spark):
    # two service rows share k=2 with different values: the unique-key
    # (primary-key) contract is violated and the operator must raise
    # instead of silently collapsing to one row (ADVICE r11 — the
    # reference's LookupJoinRunner emits every matching right row)
    dim = [{"k": i, "v": i} for i in range(4)] + [{"k": 2, "v": 99}]
    srv, url = restds.start_row_service("k bigint, v bigint", dim)
    probe = spark.range(0, 4).selectExpr("CAST(id AS BIGINT) AS k")
    with pytest.raises(Exception, match="unique-keyed"):
        async_lookup_join(
            probe.coalesce(1), url, "k", "k", "k bigint, v bigint",
            right_cols=["v"], batch_keys=8,
        ).collect()
    srv.shutdown()


def test_left_fill_preserves_big_ints_exactly(spark):
    # right-side bigint values >= 2^53 through a how='left' fill with
    # unmatched rows: a float64-inferred fill column would round them
    # on the Arrow trip back to int64; the object-dtype fill must keep
    # them exact (ADVICE r11 medium)
    big = (1 << 53) + 1  # not representable in float64
    dim = [{"k": 1, "v": big}, {"k": 2, "v": big + 2}]
    srv, url = restds.start_row_service("k bigint, v bigint", dim)
    probe = spark.range(0, 4).selectExpr("CAST(id AS BIGINT) AS k")
    rows = {r.k: r.v for r in async_lookup_join(
        probe, url, "k", "k", "k bigint, v bigint",
        right_cols=["v"], how="left", batch_keys=8,
    ).collect()}
    assert rows[1] == big and rows[2] == big + 2
    assert rows[0] is None and rows[3] is None
    srv.shutdown()


def test_max_qps_paces_request_starts(spark):
    # 12 requests at max_qps=20 cannot start in less than 11/20 s —
    # a deterministic LOWER bound (the pacer sleeps), robust to host
    # speed in a way an upper-bound assertion would not be.
    import time

    dim = [{"k": i, "v": i} for i in range(12)]
    srv, url = restds.start_row_service("k bigint, v bigint", dim)
    probe = spark.range(0, 12).selectExpr("CAST(id AS BIGINT) AS k")
    t0 = time.time()
    n = async_lookup_join(
        probe.coalesce(1), url, "k", "k", "k bigint, v bigint",
        right_cols=["v"], capacity=8, batch_keys=1, max_qps=20,
    ).count()
    elapsed = time.time() - t0
    assert n == 12
    assert elapsed >= 11 / 20, f"pacer ran too fast: {elapsed:.3f}s"
    srv.shutdown()
