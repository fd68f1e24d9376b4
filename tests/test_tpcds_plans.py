"""Plan-property assertions over the real TPC-DS corpus — the
100 TB-relevant translation of the reference's golden-plan XML tests,
applied to the exact SQL its ITCase runs.

Each test pins a property that must survive a 1000-executor scale-up:
dimension filters reach the parquet scan, small dims broadcast instead
of shuffling the fact table, WITH-heavy queries reuse repeated
subtrees (the reference's SubplanReuser — Spark's ReuseExchange /
ReusedSubquery), and scans prune to the referenced columns.
"""

from __future__ import annotations

import re

import pytest

from flink_tpcds_spark.plans.checks import (
    explain_text,
    has_broadcast_join,
    has_pushed_filters,
    scan_read_columns,
)
from flink_tpcds_spark.tpcds import datagen, runner


@pytest.fixture(scope="session")
def tpcds_views(spark):
    runner.register_spark_views(spark, datagen.generate())
    return spark


def _df(spark, name):
    return spark.sql(runner.query_text(name, "spark"))


def test_q3_pushes_dim_filters_and_broadcasts(tpcds_views):
    # q3: store_sales ⋈ date_dim(d_moy=11) ⋈ item(manufact=128)
    df = _df(tpcds_views, "q3")
    assert has_pushed_filters(df, "d_moy")
    assert has_pushed_filters(df, "i_manufact_id")
    assert has_broadcast_join(df)


def test_q7_broadcasts_all_four_dims(tpcds_views):
    # q7: fact ⋈ cd ⋈ date_dim ⋈ item ⋈ promotion — every dim must
    # broadcast; the fact table must never be exchange-partitioned for
    # the joins themselves.
    plan = explain_text(_df(tpcds_views, "q7"))
    assert plan.count("BroadcastHashJoin") >= 4


def test_q23a_materializer_reuses_repeated_ctes(tpcds_views):
    # q23's WITH frequent_ss_items/best_ss_customer are referenced
    # twice (catalog + web branch). Catalyst inlines each reference
    # and per-branch pruning makes the physical subtrees non-identical,
    # so ReuseExchange finds nothing (verified: zero reuse nodes in the
    # inline plan). The CTE materializer (plans/cte.py — the
    # reference's SubplanReuser, PlannerBase.scala:236) restores
    # compute-once: the outer plan must probe InMemoryRelation scans
    # instead of re-aggregating the fact table per reference.
    from flink_tpcds_spark.plans.cte import run_with_materialized_ctes

    inline = explain_text(_df(tpcds_views, "q23a"))
    assert "ReusedExchange" not in inline  # documents WHY cte.py exists
    df, cleanup = run_with_materialized_ctes(
        tpcds_views, runner.query_text("q23a", "spark")
    )
    try:
        assert "InMemoryTableScan" in explain_text(df)
    finally:
        cleanup()


def test_q95_materializer_reuses_self_joined_subquery(tpcds_views):
    # q95's ws_wh CTE (a fact self-join) appears three times — join +
    # two EXISTS. Materialized: computed once, probed three times.
    from flink_tpcds_spark.plans.cte import run_with_materialized_ctes

    df, cleanup = run_with_materialized_ctes(
        tpcds_views, runner.query_text("q95", "spark")
    )
    try:
        assert explain_text(df).count("InMemoryTableScan") >= 2
    finally:
        cleanup()


def test_q42_prunes_fact_scan_columns(tpcds_views):
    # q42 reads 3 of store_sales' 23 columns; the scan must prune.
    for cols in scan_read_columns(_df(tpcds_views, "q42")):
        if any(c.startswith("ss_") for c in cols):
            assert len(cols) <= 4, cols


def test_q1_single_aggregate_exchange_per_cte_instance(tpcds_views):
    # ctr CTE: group by (customer, store). Partial aggregation must
    # happen map-side (two-phase agg): every HashAggregate pair
    # brackets one Exchange, never an Exchange feeding a single-phase
    # aggregate of raw fact rows.
    plan = explain_text(_df(tpcds_views, "q1"))
    n_agg = len(re.findall(r"HashAggregate", plan))
    n_exch = len(re.findall(r"Exchange", plan))
    assert n_agg >= 2 * len(re.findall(r"Exchange hashpartitioning", plan)) - 2
    assert n_exch > 0
