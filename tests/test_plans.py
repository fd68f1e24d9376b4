"""Plan-property tests (translation of the reference's golden-plan
suite): pushdown, pruning, broadcast choice, codegen coverage on the
actual query corpus. These are the properties that decide whether a
plan survives a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tpcds_spark.plans import (
    explain_text,
    has_broadcast_join,
    has_pushed_filters,
    scan_read_columns,
    whole_stage_codegen_ops,
)
from flink_tpcds_spark.queries.tpch import QUERIES
from flink_tpcds_spark.schemas import load_table


def test_h06_filters_reach_scan(spark, sf_dir):
    df = QUERIES["h06_forecast_revenue"](spark, sf_dir)
    # all four predicates must be pushed into the parquet scan
    assert has_pushed_filters(df, "l_shipdate")
    assert has_pushed_filters(df, "l_discount")
    assert has_pushed_filters(df, "l_quantity")


def test_h06_column_pruning(spark, sf_dir):
    df = QUERIES["h06_forecast_revenue"](spark, sf_dir)
    for cols in scan_read_columns(df):
        # a 4-predicate 2-column aggregate must not read all 11 columns
        assert len(cols) <= 4, f"scan reads too many columns: {cols}"


def test_h03_broadcasts_dimension(spark, sf_dir):
    df = QUERIES["h03_shipping_priority"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert has_pushed_filters(df, "c_mktsegment")


def test_h05_join_pipeline_codegen(spark, sf_dir):
    df = QUERIES["h05_local_supplier_volume"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert whole_stage_codegen_ops(df) >= 1


def test_projection_pruning_simple(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    df = l.select("l_orderkey", "l_quantity")
    cols = scan_read_columns(df)
    assert cols and all(set(c) <= {"l_orderkey", "l_quantity"} for c in cols)


def test_semi_join_planned_for_exists(spark, sf_dir):
    df = QUERIES["h04_order_priority"](spark, sf_dir)
    text = explain_text(df)
    assert "LeftSemi" in text


def test_anti_join_planned_for_not_exists(spark, sf_dir):
    df = QUERIES["h21_suppliers_waiting"](spark, sf_dir)
    text = explain_text(df)
    assert "LeftAnti" in text


def test_topn_uses_take_ordered(spark, sf_dir):
    df = QUERIES["h03_shipping_priority"](spark, sf_dir)
    assert "TakeOrderedAndProject" in explain_text(df)


def test_window_group_limit_pushdown(spark, sf_dir):
    """Spark ≥3.5 plans rank-filter as WindowGroupLimit — the
    reference's TopNBuffer behavior (SURVEY §2.7)."""
    from flink_tpcds_spark.operators import top_n

    c = load_table(spark, sf_dir, "customer")
    df = top_n(c, ["c_mktsegment"], [F.desc("c_acctbal"), F.asc("c_custkey")], 3)
    assert "WindowGroupLimit" in explain_text(df)


def test_nested_field_projection_pruning(spark, sf_dir, tmp_path_factory):
    """§2.1 NestedFieldsProjectableTableSource: selecting one field of
    a struct column must prune the scan to that subfield."""
    import os

    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("nested")) + "/t"
    src = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.struct("o_totalprice", "o_orderstatus", "o_orderpriority").alias(
                "info"
            ),
        )
    )
    src.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path).select("o_orderkey", "info.o_orderstatus")
    cols = scan_read_columns(back)
    # the ReadSchema must contain only the selected subfield, not the
    # whole struct
    flat = ",".join(",".join(c) for c in cols)
    assert "o_totalprice" not in flat
    assert back.count() > 0


def test_split_ctes_parses_corpus_shapes():
    from flink_tpcds_spark.plans.cte import split_ctes

    ctes, rest = split_ctes(
        "with a as (select 1 x), b as (select x from a where x in "
        "(select x from a)) select * from b"
    )
    assert [n for n, _ in ctes] == ["a", "b"]
    assert "select x from a" in ctes[1][1]
    assert rest.strip() == "select * from b"
    # no top-level WITH → untouched
    assert split_ctes("select 1") == ([], "select 1")


def test_materialized_ctes_match_inline(spark, sf_dir):
    from flink_tpcds_spark.plans.cte import run_with_materialized_ctes

    sql = """
    with big as (select o_custkey, count(*) cnt from orders group by o_custkey)
    select count(*) n, sum(cnt) s
    from (select * from big where cnt > 1 union all select * from big)
    """
    from flink_tpcds_spark.schemas import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    df, cleanup = run_with_materialized_ctes(spark, sql)
    try:
        got = df.collect()
    finally:
        cleanup()
    expect = spark.sql(sql).collect()
    assert got == expect
    # temp view cleaned up: the name no longer resolves
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.table("big")


def test_cte_ref_counting_ignores_strings_and_qualified_cols():
    from flink_tpcds_spark.plans.cte import count_refs

    texts = [
        "select * from wss join x on x.wss = 1",  # x.wss is a column
        "select 'wss is not a ref', wss.a from wss",  # literal + real refs
    ]
    # real references: "from wss" (t1), "wss.a" + "from wss" (t2)
    assert count_refs("wss", texts) == 3
    assert count_refs("wss", ["select 1"]) == 0


def test_stratified_sample_is_shuffle_free(spark, sf_dir):
    """The md5-prefix sample must stay a pure scan→filter map — zero
    exchanges at any corpus size."""
    from flink_tpcds_spark.datapipe.curate import stratified_sample

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(stratified_sample(d, {"en": "1"}, "3"))
    assert "Exchange" not in text
    assert "PushedFilters" in text  # scan survives as a real file scan


def test_sequence_pack_single_shard_exchange(spark, sf_dir):
    """Packing is shard-local: exactly one hash exchange (on the
    shard key) and no global single-partition window."""
    from flink_tpcds_spark.datapipe.curate import sequence_pack

    import re

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(sequence_pack(d, budget=256))
    # formatted mode lists nodes as "(N) Exchange" with the
    # hashpartitioning arguments on a separate line
    assert len(re.findall(r"\(\d+\) Exchange", text)) == 1
    assert "hashpartitioning(source" in text
    assert "SinglePartition" not in text


def test_decontaminate_dedups_holdout_before_join(spark, sf_dir):
    """The held-out side must reach the shingle join as a distinct
    vocabulary (aggregate below the join), not a raw exploded corpus."""
    from flink_tpcds_spark.datapipe.curate import decontaminate

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(
        decontaminate(d, F.col("source").isin("src0", "src1"))
    )
    # partial + final HashAggregate pairs for the distinct and the
    # count-distinct, and an equi-join on the shingle key
    assert "HashAggregate" in text
    assert "SortMergeJoin" in text or "BroadcastHashJoin" in text or "ShuffledHashJoin" in text


def test_pii_scrub_is_shuffle_free(spark, sf_dir):
    """PII redaction is a pure per-row regexp map — zero exchanges,
    codegen'd, at any corpus size."""
    from flink_tpcds_spark.datapipe.text import scrub_pii

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(scrub_pii(d))
    assert "Exchange" not in text
    assert "codegen id" in text


def test_domain_mix_broadcasts_total(spark, sf_dir):
    """The normalizing total must reach the per-domain rows as a
    broadcast of a 1-row aggregate — no global window, no driver
    collect, and only domain-key hash exchanges."""
    from flink_tpcds_spark.datapipe.curate import domain_mix_weights

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(domain_mix_weights(d))
    assert "BroadcastNestedLoopJoin" in text or "BroadcastExchange" in text
    assert "Window" not in text
    assert "hashpartitioning(domain" in text or "hashpartitioning(source" in text


def test_vocab_topk_uses_take_ordered(spark, sf_dir):
    """Global top-k must be Spark's distributed TakeOrdered (per-
    partition heaps + k-row merge), never a full global sort of the
    vocabulary."""
    from flink_tpcds_spark.datapipe.curate import vocab_top_k

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(vocab_top_k(d, k=25))
    assert "TakeOrderedAndProject" in text
    # the only Sort allowed is inside the 25-row window ranking
    assert "rangepartitioning" not in text


def test_rep_ngram_partial_aggregation(spark, sf_dir):
    """Both aggregation levels (doc×gram, then doc) must carry
    map-side partial aggregates so the explode never shuffles raw."""
    from flink_tpcds_spark.datapipe.text import repetition_stats

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(repetition_stats(d))
    assert text.count("partial_count") >= 1
    assert "Generate" in text  # the explode is JVM-side, not a UDF


def test_chunk_documents_is_shuffle_free(spark, sf_dir):
    """Chunking is tokenize → arithmetic → explode: a pure map-side
    pipeline with zero exchanges at any corpus size."""
    from flink_tpcds_spark.datapipe.curate import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(chunk_documents(d, 64, 8))
    assert "Exchange" not in text
    assert "Generate" in text  # the explode


def test_reservoir_per_group_uses_window_group_limit(spark, sf_dir):
    """rank ≤ k must run as WindowGroupLimit (per-task k-row heaps),
    not a full per-group sort followed by a filter."""
    from flink_tpcds_spark.datapipe.curate import reservoir_per_group

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(reservoir_per_group(d, 10))
    assert "WindowGroupLimit" in text
    assert "SinglePartition" not in text


def test_shard_assignments_shuffle_free_and_manifest_one_exchange(
    spark, sf_dir
):
    """Assignment is a pure map; the manifest aggregate adds exactly
    one hash exchange on the shard key (map-side combined)."""
    import re

    from flink_tpcds_spark.datapipe.curate import shard_assignments

    d = load_table(spark, sf_dir, "documents")
    assign = shard_assignments(d, 16)
    assert "Exchange" not in explain_text(assign)
    manifest = (
        assign.groupBy("shard").count()
    )
    text = explain_text(manifest)
    assert len(re.findall(r"\(\d+\) Exchange", text)) == 1
    assert "partial_count" in text or "HashAggregate" in text


def test_boilerplate_blocklist_broadcasts(spark, sf_dir):
    """The ≥min_docs gram vocabulary must come back onto the
    positional gram stream as a broadcast, and the gram count must be
    map-side combined (partial aggregate below its exchange)."""
    from flink_tpcds_spark.datapipe.dedup import remove_boilerplate_ngrams

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(remove_boilerplate_ngrams(d, 3, 5))
    assert "BroadcastHashJoin" in text
    assert "partial_count" in text


def test_no_cartesian_product_in_any_datapipe_query(spark, sf_dir):
    """Scale tripwire: no dp_* query may plan a CartesianProduct —
    every pair-producing operator must go through banding/blocking/
    broadcast, never an all-pairs shuffle product. (1-row broadcast
    cross joins — BroadcastNestedLoopJoin — are fine and expected.)"""
    from flink_tpcds_spark.queries import datapipe as dpq

    for name, fn in sorted(dpq.QUERIES.items()):
        df = fn(spark, sf_dir)
        text = explain_text(df)
        assert "CartesianProduct" not in text, f"{name} plans a cartesian"


def test_global_shuffle_no_global_sort(spark, sf_dir):
    """The epoch shuffle must NOT range-partition the corpus (that is
    a global sort); ordering is per-shard — exactly one hash exchange
    on the shard key feeding the window."""
    import re

    from flink_tpcds_spark.datapipe.curate import global_shuffle

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(global_shuffle(d, "epoch0"))
    assert "rangepartitioning" not in text
    assert "SinglePartition" not in text
    assert len(re.findall(r"\(\d+\) Exchange", text)) == 1


def test_quality_classifier_shuffle_free(spark, sf_dir):
    """Classifier scoring is a map-only expression chain — zero
    exchanges, fully codegen'd."""
    from flink_tpcds_spark.datapipe.text import quality_classifier

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(quality_classifier(d))
    assert "Exchange" not in text
    assert "codegen id" in text


def test_contamination_fraction_vocab_below_join(spark, sf_dir):
    """Like decontaminate: the held-out side must be reduced to its
    distinct shingle vocabulary before the equi-join."""
    from flink_tpcds_spark.datapipe.curate import contamination_fraction

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(
        contamination_fraction(d, F.col("source").isin("src0", "src1"))
    )
    assert "HashAggregate" in text
    assert (
        "SortMergeJoin" in text
        or "BroadcastHashJoin" in text
        or "ShuffledHashJoin" in text
    )


def test_semantic_dedup_anti_join_shape(spark, sf_dir):
    """Removal is a LEFT ANTI join against the (small, distinct)
    drop-set — broadcastable, never a corpus-sized shuffle."""
    from flink_tpcds_spark.datapipe.similarity import semantic_dedup

    e = load_table(spark, sf_dir, "embeddings")
    text = explain_text(semantic_dedup(e, threshold=0.4))
    assert "LeftAnti" in text


def test_dynamic_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """Scale posture pin: a dim-filtered join against a partitioned
    fact must inject a dynamic partition pruning subquery (only the
    surviving partitions' files are listed/scanned — at 100 TB the
    difference between reading one event type and all of them).
    Also pins that runtime bloom-filter join pruning stays enabled."""
    from flink_tpcds_spark.sources.sinks import write_partitioned

    assert (
        spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
        == "true"
    )
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    e = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_part")
    write_partitioned(e, path, ["event_type"])
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("purchase", 1), ("click", 2), ("view", 3), ("error", 4)],
        "event_type string, type_group int",
    )
    q = (
        fact.join(dim.filter(F.col("type_group") == 1), "event_type")
        .groupBy("event_type")
        .count()
    )
    assert "dynamicpruning" in explain_text(q).lower()


def test_no_unpartitioned_window_in_any_registered_query(spark, sf_dir):
    """Standing invariant (VERDICT r5 item 4): no registered
    NON-CORPUS query may plan a partition-less Window over an
    unbounded input — the single-partition shape that serializes the
    dataset through one task at 100 TB.

    Whitelist (bounded by construction — the window runs over ≤ k
    rows surviving a distributed TakeOrdered limit, so the "global"
    window touches a constant-size set):
    - dp_vocab_topk: rank over the k=25 rows of a vocab head
      (curate.py:vocab_top_k — top.crossJoin after .limit(k));
    - dp_bpe_merges: rank over top_n=50 pair rows
      (curate.py:bpe_merge_candidates — same post-limit shape).

    Vendored TPC-DS corpus queries are exempt: global
    ``rank() OVER (ORDER BY …)`` is inherent to the benchmark text
    (the reference degenerates to singleton distribution there too).
    """
    from flink_tpcds_spark.plans import unpartitioned_windows
    from flink_tpcds_spark.queries import _modules

    BOUNDED_POST_LIMIT = {"dp_vocab_topk", "dp_bpe_merges"}
    offenders: dict[str, list[str]] = {}
    for mod in _modules():
        mod_name = mod.__name__.rsplit(".", 1)[-1]
        if mod_name == "corpus":
            continue
        for name, fn in mod.QUERIES.items():
            if name in BOUNDED_POST_LIMIT:
                continue
            bad = unpartitioned_windows(fn(spark, sf_dir))
            if bad:
                offenders[name] = bad
    assert offenders == {}, f"unpartitioned windows: {offenders}"


def test_unpartitioned_window_detector(spark):
    """The detector itself: flags global windows, passes partitioned
    ones and WindowGroupLimit with a partition spec."""
    from pyspark.sql.window import Window

    from flink_tpcds_spark.plans import unpartitioned_windows

    df = spark.range(100).withColumn("g", F.col("id") % 5)
    w_part = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert unpartitioned_windows(w_part) == []
    w_glob = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    bad = unpartitioned_windows(w_glob)
    assert len(bad) == 1 and "Window" in bad[0]
    ranked = w_part.filter(F.col("rn") <= 3)
    assert unpartitioned_windows(ranked) == []


def test_unpartitioned_rank_filter_is_flagged(spark):
    """ADVICE r6: the WindowGroupLimit floor (2 bracket groups) is
    untested for the unpartitioned case. Empirically Spark 4 does NOT
    insert WindowGroupLimit for an empty partition spec — the global
    rank-filter plans a bare Window node, which the gate flags — so
    the detector cannot be bypassed through that node. This test pins
    both facts; if a Spark upgrade starts emitting an unpartitioned
    WindowGroupLimit, the node-count assertion fails and the floor
    logic gets exercised for real."""
    from flink_tpcds_spark.plans import explain_text, unpartitioned_windows
    from pyspark.sql.window import Window

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    glob_ranked = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("v")))
    ).filter(F.col("rn") <= 5)
    text = explain_text(glob_ranked)
    assert "WindowGroupLimit" not in text, (
        "Spark now emits WindowGroupLimit for empty partition specs — "
        "verify plans/checks.py renders/flags it correctly"
    )
    bad = unpartitioned_windows(glob_ranked)
    assert len(bad) == 1 and "Window" in bad[0]
    # the partitioned twin emits WindowGroupLimit nodes and passes
    part_ranked = df.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(F.col("id") % 3).orderBy(F.desc("v"))
        ),
    ).filter(F.col("rn") <= 5)
    assert "WindowGroupLimit" in explain_text(part_ranked)
    assert unpartitioned_windows(part_ranked) == []


def test_neardup_plans_never_broadcast_corpus_sized_sides(spark, sf_dir):
    """Round-7 scale fix, pinned: in minhash_near_dup_pairs and
    ngram_jaccard_pairs_exact, every corpus-proportional join side
    (shingle arrays, band postings, prefix postings) carries a merge
    hint — the ONLY broadcast allowed in either plan is minhash's
    over-cap bucket guard (a LeftAnti join against a tiny outlier
    set). Both failure modes were measured at 500k docs before the
    fix: an AQE broadcast OOM on the fat-array verify side, and an
    unspillable shuffled-hash build dying under CC-loop memory
    pressure."""
    import re

    from flink_tpcds_spark.datapipe.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs_exact,
        release_caches,
    )
    from flink_tpcds_spark.plans import explain_text
    from flink_tpcds_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    try:
        for name, q, allowed_bhj in (
            # the over-cap anti guard materializes once per self-join
            # side of the cached bands table → up to 2 LeftAnti BHJs
            ("minhash", minhash_near_dup_pairs(docs), 2),
            ("jaccard", ngram_jaccard_pairs_exact(docs), 0),
        ):
            text = explain_text(q)
            blocks = re.split(r"\n\n", text)
            bhj = [
                b
                for b in blocks
                if re.match(r"\(\d+\) BroadcastHashJoin", b.strip())
            ]
            assert len(bhj) <= allowed_bhj, (
                f"{name}: {len(bhj)} BroadcastHashJoin nodes "
                f"(allowed {allowed_bhj}):\n" + "\n---\n".join(bhj)
            )
            for b in bhj:
                assert "LeftAnti" in b, f"{name}: non-guard broadcast:\n{b}"
            # and no broadcast exchange may carry an array column
            for b in blocks:
                if "BroadcastExchange" in b.split("\n")[0]:
                    assert "sh_a" not in b and "sh_b" not in b and (
                        "shingles" not in b
                    ), f"{name}: array-carrying broadcast:\n{b}"
    finally:
        release_caches()


def test_ops_bucketed_join_has_no_exchange_on_bucket_key(spark, sf_dir):
    """The driver-gated bucketed fact⋈fact query must read both sides
    bucket-aligned: the only hash exchange allowed is the one feeding
    the final groupBy(o_orderpriority) — never on the join key."""
    from flink_tpcds_spark.queries.operators import ops_bucketed_join

    text = explain_text(ops_bucketed_join(spark, sf_dir))
    assert "hashpartitioning(o_orderkey" not in text
    assert "SortMergeJoin" in text or "ShuffledHashJoin" in text or (
        "BroadcastHashJoin" in text
    )


def test_ops_skew_join_plan_shape(spark, sf_dir):
    """The salted join must stay an equi hash/merge join on
    (key, salt) — no cartesian, no broadcast-nested-loop — and the
    salt column must not leak into the result schema."""
    from flink_tpcds_spark.queries.operators import ops_skew_join

    df = ops_skew_join(spark, sf_dir)
    text = explain_text(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    assert "__salt" not in df.columns


def test_r9_entries_have_scale_safe_plans(spark, sf_dir):
    """Standing plan audit for the round-9 SQL-surface entries: no
    CartesianProduct, no BroadcastNestedLoopJoin, no row-at-a-time
    Python eval anywhere — and the LATERAL top-k must decorrelate to
    WindowGroupLimit (the explicit-window plan, written declaratively)."""
    from flink_tpcds_spark.queries import all_queries

    qs = all_queries()
    names = [
        "ops_lateral_topk",
        "ops_pivot",
        "ops_unpivot",
        "ops_posexplode",
        "ops_window_distribution",
        "ops_array_higher_order",
        "ops_try_arithmetic",
        "ops_map_higher_order",
    ]
    for name in names:
        plan = qs[name](spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                    "BatchEvalPython"):
            assert bad not in plan, f"{name}: {bad} in plan"
        if name == "ops_lateral_topk":
            assert "WindowGroupLimit" in plan, (
                "lateral top-k must decorrelate to WindowGroupLimit"
            )


def test_r10_entries_have_scale_safe_plans(spark, sf_dir):
    """Round-10 SQL surfaces: SQL UDFs must INLINE (no Python eval of
    any kind — the body is a catalog expression, not a UDF boundary),
    and none of the new entries may plan a cartesian/BNLJ. The XML and
    catalog entries are scan-side, checked by their own modules."""
    from flink_tpcds_spark.queries import all_queries

    qs = all_queries()
    for name in ("ops_sql_udf", "ops_sql_table_function"):
        plan = qs[name](spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                    "BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
            assert bad not in plan, f"{name}: {bad} in plan"
        # the function NAME must be gone from the physical plan — the
        # body inlined into plain expressions (AQE hides codegen spans
        # pre-execution, so inlining is the observable contract)
        assert "charge(" not in plan and "buckets(" not in plan, name


def test_r13_entries_have_scale_safe_plans(spark, sf_dir):
    """Round-13 batch surfaces: no cartesian, no broadcast-nested-loop,
    no row-at-a-time Python in any plan. The z-order/MV entries are
    construction-time operators — their SELECT side is checked here,
    their write-side properties in their own modules. The token mix
    must plan its domain-target join as a broadcast (the targets side
    is domain-granular by construction)."""
    from flink_tpcds_spark.queries import all_queries

    qs = all_queries()
    # dp_token_budget_mix inherits domain_mix_weights' crossJoin of
    # the ONE-ROW broadcast normalization total — that plans as a
    # BroadcastNestedLoopJoin by definition (no join key exists) and
    # is the legitimate BNLJ shape: the inner side is exactly one
    # aggregate row at any corpus size.
    allowed_bnlj = {"dp_token_budget_mix"}
    for name in (
        "ops_listagg",
        "ops_ordered_set_aggs",
        "ops_countmin_sketch",
        "ops_time_type",
        "dp_token_budget_mix",
        "dp_knn_filtered",
    ):
        plan = (
            qs[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        bads = ["CartesianProduct", "BatchEvalPython"]
        if name not in allowed_bnlj:
            bads.append("BroadcastNestedLoopJoin")
        for bad in bads:
            assert bad not in plan, f"{name}: {bad} in plan"
    mix_plan = (
        qs["dp_token_budget_mix"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in mix_plan, (
        "domain targets must broadcast, not shuffle"
    )


def test_r14_async_lookup_plan_shape(spark, sf_dir):
    """The async lookup must be shuffle-free on the probe side: the
    pruned 2-column scan feeds MapInPandas DIRECTLY (no Exchange
    between — the lookup adds zero repartitioning), and the aggregate
    above it keeps its map-side partial (the single Exchange in the
    plan belongs to the groupBy, not the lookup)."""
    from flink_tpcds_spark.queries.operators import QUERIES

    plan = (
        QUERIES["ops_async_lookup_join"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    # rindex: after execution AQE prints "== Final Plan ==" then
    # "== Initial Plan ==" — the LAST MapInPandas is the one whose
    # subtree (everything below it in the dump) is the probe side
    scan_to_map = plan[plan.rindex("MapInPandas"):]
    assert "Exchange" not in scan_to_map, (
        "no shuffle may sit between the scan and the lookup stage"
    )
    assert "partial_count" in plan and "partial_sum" in plan
    assert "ReadSchema: struct<o_custkey:bigint,o_totalprice:double>" in plan
