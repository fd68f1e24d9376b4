"""Operator-level unit tests (the translation of the reference's 73
operator test classes — SURVEY §5): behavioral checks on the reusable
operators beyond what the oracle-checked queries cover."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_tpcds_spark.operators import (
    asof_join,
    dedup_first,
    dedup_last,
    top_n,
)
from flink_tpcds_spark.operators.skew import salted_join
from flink_tpcds_spark.schemas import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = o.join(c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    salted = salted_join(
        o, c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    assert {tuple(r) for r in salted.collect()} == {
        tuple(r) for r in plain.collect()
    }


def test_top_n_rank_keeps_ties(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    ranked = top_n(
        li, ["l_returnflag"], [F.desc("l_quantity")], 1, rank_fn="rank"
    )
    # quantity is integer-valued → the max is shared by many rows; RANK
    # keeps all of them (BatchExecRank semantics), ROW_NUMBER keeps one
    rn = top_n(
        li,
        ["l_returnflag"],
        [F.desc("l_quantity")],
        1,
        rank_fn="row_number",
    )
    assert ranked.count() > rn.count()
    assert rn.count() == 3  # one per returnflag


def test_top_n_rejects_bad_rank_fn(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        top_n(li, ["l_returnflag"], [F.desc("l_quantity")], 1, rank_fn="nope")


def test_dedup_first_vs_last(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    first = dedup_first(e, ["user_id"], [F.col("ts"), F.col("event_id")])
    last = dedup_last(e, ["user_id"], [F.col("ts"), F.col("event_id")])
    n_users = e.select("user_id").distinct().count()
    assert first.count() == last.count() == n_users
    f0 = {r.user_id: r.event_id for r in first.collect()}
    l0 = {r.user_id: r.event_id for r in last.collect()}
    # first/last pick different rows for any user with >1 event
    assert any(f0[u] != l0[u] for u in f0)


def test_asof_join_tolerance(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    logins = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("login_id")
    )
    def matched(tolerance):
        out = asof_join(
            purchases,
            logins,
            on="user_id",
            right_cols=["login_id"],
            tolerance_seconds=tolerance,
        )
        return out.filter(F.col("r_login_id").isNotNull()).count()

    n_loose = (
        asof_join(purchases, logins, on="user_id", right_cols=["login_id"])
        .filter(F.col("r_login_id").isNotNull())
        .count()
    )
    n_week, n_10min = matched(7 * 86400.0), matched(600.0)
    # events are ~10h apart per user at this SF: a week keeps most
    # matches, 10 minutes nulls most of them out
    assert 0 < n_week <= n_loose
    assert n_10min < n_week


def test_match_v_shapes_known_series(spark):
    # user 1: 5 4 3 6 7 2 1 9 → two V matches: (5..3, 3..7) and (7..1, 1..9)
    # user 2: monotonically rising → no D run → no match
    rows = [(1, i, v) for i, v in enumerate([5.0, 4.0, 3.0, 6.0, 7.0, 2.0, 1.0, 9.0])]
    rows += [(2, i, float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "user_id int, ts int, value double")
    from flink_tpcds_spark.operators import match_v_shapes

    out = {
        (r.user_id, r.start_ts, r.bottom_ts, r.end_ts, r.down_rows, r.up_rows)
        for r in match_v_shapes(df, "user_id", ["ts"], "value").collect()
    }
    assert out == {(1, 1, 2, 4, 2, 2), (1, 5, 6, 7, 2, 1)}


def test_match_recognize_generic_equals_composed(spark):
    # The generic regex matcher (D+U+) must find exactly the composed
    # form's matches (same spans, same row counts) on a random series.
    import random

    rnd = random.Random(7)
    rows = [
        (u, i, float(rnd.randint(0, 9)))
        for u in range(5)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "user_id int, ts int, value double")
    from flink_tpcds_spark.operators import match_recognize, match_v_shapes
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("value").over(w)
    generic = match_recognize(
        df.withColumn("_p", prev),
        "user_id",
        ["ts"],
        define={
            "D": F.col("value") < F.col("_p"),
            "U": F.col("value") > F.col("_p"),
        },
        pattern="D+U+",
    )
    g = {
        (r.user_id, r.start_ts, r.end_ts, r.match_rows)
        for r in generic.collect()
    }
    composed = {
        # composed spans exclude nothing: D rows + U rows = match rows
        (r.user_id, r.start_ts, r.end_ts, r.down_rows + r.up_rows)
        for r in match_v_shapes(df, "user_id", ["ts"], "value").collect()
    }
    assert g == composed


def test_match_recognize_rejects_multichar_symbol(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], "user_id int, ts int, value double")
    from flink_tpcds_spark.operators import match_recognize
    from pyspark.sql import functions as F

    with pytest.raises(ValueError):
        match_recognize(
            df, "user_id", ["ts"], define={"DOWN": F.lit(True)}, pattern="D+"
        )


def test_salted_join_equals_plain_join(spark):
    """salted_join must be result-identical to the plain equi-join on
    a pathologically skewed key (one key = 90% of rows), while
    spreading that key across salt buckets."""
    import pyspark.sql.functions as F

    from flink_tpcds_spark.operators.joins import salted_join

    left = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(1, "hot"), (1801, "a"), (1802, "b"), (99999, "absent")],
        "k long, name string",
    )
    plain = left.join(right, ["k"]).select("k", "v", "name")
    salted = salted_join(left, right, ["k"], salt=8).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # left_outer preserves unmatched left rows exactly once
    plain_lo = left.join(right, ["k"], "left").select("k", "v", "name")
    salted_lo = salted_join(left, right, ["k"], salt=8, how="left").select(
        "k", "v", "name"
    )
    assert sorted(map(tuple, salted_lo.collect()), key=str) == sorted(
        map(tuple, plain_lo.collect()), key=str
    )
    # the hot key really is spread across multiple salt buckets
    n_buckets = (
        left.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)),
        )
        .filter(F.col("k") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_buckets == 8


def test_match_recognize_bounded_equals_unbounded(spark):
    """The bounded-memory matcher must produce byte-identical matches
    to the whole-partition matcher on a random series — including
    with tiny Arrow batches forcing many carry-buffer flushes."""
    import random

    from flink_tpcds_spark.operators.match_recognize import (
        match_recognize,
        match_recognize_bounded,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rnd = random.Random(11)
    rows = [
        (u, i, float(rnd.randint(0, 9)))
        for u in range(5)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "user_id int, ts int, value double")
    w = Window.partitionBy("user_id").orderBy("ts")
    src = df.withColumn("_p", F.lag("value").over(w))
    define = {
        "D": F.col("value") < F.col("_p"),
        "U": F.col("value") > F.col("_p"),
    }
    want = {
        tuple(r)
        for r in match_recognize(
            src, "user_id", ["ts"], define, "D+U+"
        ).collect()
    }
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
        got = {
            tuple(r)
            for r in match_recognize_bounded(
                src, "user_id", ["ts"], define, "D+U+", max_match_rows=16
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == want and len(got) > 0


def test_match_recognize_bounded_cap_raises(spark):
    """A match that reaches max_match_rows must fail loudly, not
    silently truncate."""
    import pytest as _pytest

    from flink_tpcds_spark.operators.match_recognize import (
        match_recognize_bounded,
    )
    from pyspark.sql import functions as F

    rows = [(1, i, 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, "user_id int, ts int, value double")
    bounded = match_recognize_bounded(
        df, "user_id", ["ts"],
        define={"A": F.lit(True)}, pattern="A+", max_match_rows=8,
    )
    with _pytest.raises(Exception, match="max_match_rows"):
        bounded.collect()


def test_profile_table_planted_stats(spark):
    from flink_tpcds_spark.operators.profile import profile_table

    rows = [
        (1, "a", None),
        (2, "b", 5.0),
        (2, "b", 7.5),
        (None, "c", 7.5),
    ]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    got = {r.col_name: r for r in profile_table(df).collect()}
    assert set(got) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in got.values())
    assert got["id"].n_nulls == 1 and got["id"].n_distinct == 2
    assert got["s"].n_nulls == 0 and got["s"].n_distinct == 3
    assert got["v"].n_nulls == 1 and got["v"].n_distinct == 2
    assert got["s"].min_value == "a" and got["s"].max_value == "c"
    # min/max are lexicographic over the STRING cast by contract
    assert got["id"].min_value == "1" and got["id"].max_value == "2"


def test_profile_table_single_scan(spark, sf_dir):
    """All columns must be profiled in ONE pass: a single parquet
    scan feeding an Expand for the distinct aggregates — never one
    scan per column."""
    from flink_tpcds_spark.operators.profile import profile_table
    from flink_tpcds_spark.plans import explain_text
    from flink_tpcds_spark.schemas import load_table

    import re

    d = load_table(spark, sf_dir, "documents")
    text = explain_text(profile_table(d, ["doc_id", "lang", "source"]))
    # the formatted detail section numbers each physical node once
    assert len(re.findall(r"\(\d+\) Scan parquet", text)) == 1
    assert "Expand" in text


def test_funnel_strict_ordering(spark):
    from flink_tpcds_spark.queries.events import QUERIES
    import datetime as dt

    # user 1: view(1) click(2) purchase(3)  → reaches stage 3
    # user 2: click(1) view(2)              → stage 1 only (click
    #   precedes first view, so no click-after-view)
    # user 3: view(1) click(2)              → stage 2
    # user 4: purchase(1) view(2)           → stage 1 (purchase too early)
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, t(1), 1, "view", 0.0, ""), (2, t(2), 1, "click", 0.0, ""),
        (3, t(3), 1, "purchase", 0.0, ""),
        (4, t(1), 2, "click", 0.0, ""), (5, t(2), 2, "view", 0.0, ""),
        (6, t(1), 3, "view", 0.0, ""), (7, t(2), 3, "click", 0.0, ""),
        (8, t(1), 4, "purchase", 0.0, ""), (9, t(2), 4, "view", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.createOrReplaceTempView("__funnel_events")
    import tempfile, os
    path = tempfile.mkdtemp() + "/events.parquet"
    df.write.mode("overwrite").parquet(path)
    sf_dir = os.path.dirname(path)
    got = {r.stage: r.n_users for r in QUERIES["ev_funnel"](spark, sf_dir).collect()}
    assert got == {1: 4, 2: 2, 3: 1}


def test_cohort_retention_planted(spark):
    from flink_tpcds_spark.queries.events import QUERIES
    import datetime as dt
    import os
    import tempfile

    # user 1 first seen day0, active day0+day2; user 2 first seen
    # day0, active day0; user 3 first seen day2, active day2
    d = lambda day, h=0: dt.datetime(2024, 1, 1 + day, h)
    rows = [
        (1, d(0), 1, "view", 0.0, ""), (2, d(2), 1, "view", 0.0, ""),
        (3, d(0, 5), 2, "view", 0.0, ""),
        (4, d(2), 3, "view", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = tempfile.mkdtemp() + "/events.parquet"
    df.write.mode("overwrite").parquet(path)
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in QUERIES["ev_cohort_retention"](
            spark, os.path.dirname(path)
        ).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-03", 0): 1,
    }


def test_profile_table_random_frames_match_pandas():
    """Property test: profile_table agrees with a pandas-computed
    reference on random frames (nulls, dupes, negatives)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_tpcds_spark.operators.profile import profile_table
    from flink_tpcds_spark.session import get_spark

    spark = get_spark("profile-prop")

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(-99, 99)),
                st.one_of(st.none(), st.sampled_from(["a", "b", "xy"])),
            ),
            min_size=1,
            max_size=30,
        )
    )
    def check(rows):
        df = spark.createDataFrame(rows, "i long, s string")
        got = {r.col_name: r for r in profile_table(df).collect()}
        for col, vals in (("i", [r[0] for r in rows]), ("s", [r[1] for r in rows])):
            nn = [v for v in vals if v is not None]
            assert got[col].n_rows == len(rows)
            assert got[col].n_nulls == len(vals) - len(nn)
            assert got[col].n_distinct == len(set(nn))
            want_min = min((str(v) for v in nn), default=None)
            want_max = max((str(v) for v in nn), default=None)
            assert got[col].min_value == want_min
            assert got[col].max_value == want_max

    check()


def test_hll_sketch_merge_matches_single_pass(spark, sf_dir):
    """Mergeability contract: the union of per-group sketches must
    estimate (to within the sketch's own error bound) the same
    cardinality as one sketch built over the whole corpus — the
    property that lets per-shard rollups answer global questions
    without a re-scan. Union is not bit-identical to single-pass
    (sparse→dense promotion happens at different points), so the
    check is band-based, not exact."""
    from flink_tpcds_spark.schemas import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "source", F.md5("text").alias("h")
    )
    merged = (
        d.groupBy("source")
        .agg(F.hll_sketch_agg("h").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    single = (
        d.agg(F.hll_sketch_estimate(F.hll_sketch_agg("h")).alias("est"))
        .collect()[0]
        .est
    )
    exact = d.select("h").distinct().count()
    assert abs(merged - single) / exact <= 0.02
    assert abs(merged - exact) / exact <= 0.05
    assert abs(single - exact) / exact <= 0.05


def test_ks_statistic_matches_python_reference(spark, sf_dir):
    from flink_tpcds_spark.operators.drift import ks_statistic
    from flink_tpcds_spark.schemas import load_table

    e = load_table(spark, sf_dir, "events")
    old = e.filter(F.col("user_id") % 2 == 0)
    new = e.filter(F.col("user_id") % 2 == 1)
    row = ks_statistic(old, new, "value").collect()[0]

    xs = sorted(r.value for r in old.select("value").collect())
    ys = sorted(r.value for r in new.select("value").collect())

    def ecdf(sorted_vals, v):
        import bisect

        return bisect.bisect_right(sorted_vals, v) / len(sorted_vals)

    d_ref = max(
        abs(ecdf(xs, v) - ecdf(ys, v)) for v in set(xs) | set(ys)
    )
    assert row.n_old == len(xs) and row.n_new == len(ys)
    assert abs(row.ks_d - d_ref) < 1e-6
    # identical samples → zero drift
    z = ks_statistic(old, old, "value").collect()[0]
    assert z.ks_d == 0.0
    # disjoint supports → maximal drift
    lo = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    hi = spark.createDataFrame(
        [(float(i + 1000),) for i in range(50)], "v double"
    )
    m = ks_statistic(lo, hi, "v").collect()[0]
    assert m.ks_d == 1.0


def test_ks_statistic_null_and_empty_guards(spark):
    """NULLs are dropped before the ECDF; an empty side raises
    instead of emitting a null statistic."""
    import pytest

    from flink_tpcds_spark.operators.drift import ks_statistic

    with_nulls = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (None,)], "v double"
    )
    clean = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    row = ks_statistic(with_nulls, clean, "v").collect()[0]
    assert row.n_old == 2 and row.n_new == 2 and row.ks_d == 0.0

    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="empty sample"):
        ks_statistic(empty, clean, "v")
    with pytest.raises(ValueError, match="empty sample"):
        ks_statistic(clean, empty, "v")


def test_hll_overlap_estimate_close_to_exact(spark):
    """Inclusion-exclusion over HLL sketches recovers a planted
    overlap without joining the sides."""
    a = spark.range(0, 3000).select(
        F.md5(F.col("id").cast("string")).alias("h")
    )
    b = spark.range(2000, 5000).select(
        F.md5(F.col("id").cast("string")).alias("h")
    )
    est = (
        a.agg(F.hll_sketch_agg("h").alias("sa"))
        .crossJoin(b.agg(F.hll_sketch_agg("h").alias("sb")))
        .crossJoin(a.unionAll(b).agg(F.hll_sketch_agg("h").alias("su")))
        .select(
            (
                F.hll_sketch_estimate("sa")
                + F.hll_sketch_estimate("sb")
                - F.hll_sketch_estimate("su")
            ).alias("est")
        )
        .collect()[0]
        .est
    )
    # exact overlap is 1000; three sketches each carry ~1-2% error
    assert abs(est - 1000) < 200


def test_chi2_statistic_matches_python_reference(spark, sf_dir):
    from flink_tpcds_spark.operators.drift import chi2_statistic
    from flink_tpcds_spark.schemas import load_table

    e = load_table(spark, sf_dir, "events")
    old = e.filter(F.col("user_id") % 2 == 0)
    new = e.filter(F.col("user_id") % 2 == 1)
    row = chi2_statistic(old, new, "event_type").collect()[0]

    ca = {r.event_type: r.n for r in old.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    cb = {r.event_type: r.n for r in new.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    cats = set(ca) | set(cb)
    na, nb = sum(ca.values()), sum(cb.values())
    chi2 = 0.0
    for c in cats:
        a, b = ca.get(c, 0), cb.get(c, 0)
        ea = (a + b) * na / (na + nb)
        eb = (a + b) * nb / (na + nb)
        chi2 += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
    assert row.n_old == na and row.n_new == nb
    assert row.n_categories == len(cats)
    assert abs(row.chi2 - chi2) < 1e-3
    # identical frequency profiles → chi2 == 0
    z = chi2_statistic(old, old, "event_type").collect()[0]
    assert z.chi2 == 0.0


def test_psi_statistic_semantics(spark, sf_dir):
    from flink_tpcds_spark.operators.drift import psi_statistic
    from flink_tpcds_spark.schemas import load_table

    e = load_table(spark, sf_dir, "events")
    old = e.filter(F.col("user_id") % 2 == 0)
    new = e.filter(F.col("user_id") % 2 == 1)
    # same-generator halves: stable population
    row = psi_statistic(old, new, "value").collect()[0]
    assert 0.0 <= row.psi < 0.1
    # identical samples → psi exactly 0
    z = psi_statistic(old, old, "value").collect()[0]
    assert z.psi == 0.0
    # a strong location shift → alarm-range psi, outliers clamped
    # into the edge bin rather than dropped
    shifted = old.withColumn("value", F.col("value") + 1000.0)
    s = psi_statistic(old, shifted, "value").collect()[0]
    assert s.psi > 0.25
    assert s.n_new == row.n_old


def test_tpch_scale_invariant_m3(spark, sf_dir, tmp_path):
    """Key-shifted ×3 replication of lineitem: h01's per-group counts
    and decimal sums are exactly ×3 with identical averages (to 1 ulp
    — decimal division derives its result scale from operand
    precision). Pins the closed-form invariant behind
    scripts/bench_tpch_scale.py."""
    import math

    from flink_tpcds_spark.queries.tpch import QUERIES

    li = load_table(spark, sf_dir, "lineitem")
    OFF = 100_000_000
    parts = [
        li.select(
            *[
                (F.col(c) + k * OFF).alias(c)
                if c in ("l_orderkey", "l_partkey", "l_suppkey")
                else F.col(c)
                for c in li.columns
            ]
        )
        for k in range(3)
    ]
    big = parts[0].unionAll(parts[1]).unionAll(parts[2])
    big.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    b = {
        (r[0], r[1]): r.asDict()
        for r in QUERIES["h01_pricing_summary"](spark, sf_dir).collect()
    }
    g = {
        (r[0], r[1]): r.asDict()
        for r in QUERIES["h01_pricing_summary"](spark, str(tmp_path)).collect()
    }
    assert set(b) == set(g)
    for k in b:
        assert g[k]["count_order"] == 3 * b[k]["count_order"]
        assert math.isclose(g[k]["sum_qty"], 3 * b[k]["sum_qty"], rel_tol=1e-12)
        assert math.isclose(g[k]["avg_qty"], b[k]["avg_qty"], rel_tol=1e-12)
        assert math.isclose(g[k]["avg_price"], b[k]["avg_price"], rel_tol=1e-12)


def test_session_window_scale_invariant_m3(spark, sf_dir, tmp_path):
    """User-shifted ×3 events: per-copy session structure is identical,
    so the session count is exactly ×3 — sessionization is per-user
    work, independent of how many other users exist."""
    from flink_tpcds_spark.queries.events import QUERIES as EV

    ev = load_table(spark, sf_dir, "events")
    OFF = 10_000_000
    parts = [
        ev.select(
            (F.col("event_id") + k * OFF).alias("event_id"),
            "ts",
            (F.col("user_id") + k * OFF).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(3)
    ]
    big = parts[0].unionAll(parts[1]).unionAll(parts[2])
    big.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    n_base = EV["ev_session_window"](spark, sf_dir).count()
    n_big = EV["ev_session_window"](spark, str(tmp_path)).count()
    assert n_big == 3 * n_base


# ---------------------------------------------------------------------------
# Misra-Gries frequent-items sketch (operators/sketch.py)
# ---------------------------------------------------------------------------
def test_frequent_items_sketch_bounds(spark):
    """MG guarantees on an adversarially skewed stream: one dominant
    item, a mid band, and a long uniform tail of distinct items, laid
    out across many partitions. Every estimate must satisfy
    true − n/(k+1) ≤ est ≤ true, and every item with
    true > n/(k+1) must be present."""
    from flink_tpcds_spark.operators.sketch import frequent_items_sketch

    # 10_000 rows: "hot" ×3000, ten "warm_i" ×300 each, 4000 distinct
    # singletons. k=16 → threshold n/(k+1) ≈ 588: hot is the only
    # guaranteed hitter; warm items may or may not survive.
    rows = (
        [("hot",)] * 3000
        + [(f"warm_{i}",) for i in range(10) for _ in range(300)]
        + [(f"tail_{j}",) for j in range(4000)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(13)
    k, n = 16, len(rows)
    sk = {r.item: r.est for r in frequent_items_sketch(df, "item", k=k).collect()}
    true = {"hot": 3000, **{f"warm_{i}": 300 for i in range(10)}}
    err = n // (k + 1) + 1
    assert "hot" in sk
    for item, est in sk.items():
        t = true.get(item, 1)
        assert est <= t, (item, est, t)
        assert t - est <= err, (item, est, t)
    # absent items are bounded too: true("warm_i") = 300 < err, fine;
    # nothing with true > n/(k+1) may be missing
    for item, t in true.items():
        if t * (k + 1) > n:
            assert item in sk, item


def test_frequent_items_sketch_output_is_small(spark):
    """Scale contract: the merged summary never exceeds
    partitions × k rows even with a huge distinct domain (the whole
    point vs an exact groupBy over every key)."""
    from flink_tpcds_spark.operators.sketch import frequent_items_sketch

    df = (
        spark.range(0, 50_000, 1, 8)
        .select(F.concat(F.lit("u"), F.col("id")).alias("item"))
    )
    out = frequent_items_sketch(df, "item", k=32)
    assert out.count() <= 8 * 32


def test_frequent_items_sketch_random_property():
    """Property test: MG bounds hold on random streams across random
    partition layouts — est ≤ true always, deficit ≤ n/(k+1), and no
    item with true > n/(k+1) missing."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_tpcds_spark.operators.sketch import frequent_items_sketch
    from flink_tpcds_spark.session import get_spark

    spark = get_spark("mg-prop")

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=120),
        st.integers(1, 6),
        st.integers(1, 5),
    )
    def check(items, k, parts):
        from collections import Counter

        true = Counter(items)
        n = len(items)
        df = spark.createDataFrame(
            [(x,) for x in items], "item string"
        ).repartition(parts)
        sk = {
            r.item: r.est
            for r in frequent_items_sketch(df, "item", k=k).collect()
        }
        for item, est in sk.items():
            assert est <= true[item], (items, k, parts, item)
            assert true[item] - est <= n // (k + 1), (items, k, parts, item)
        for item, t in true.items():
            if t * (k + 1) > n:
                assert item in sk, (items, k, parts, item)

    check()


def test_quantile_sketch_merge_law_and_error(spark, sf_dir):
    """The bottom-k merge identity holds for ANY slicing (set
    equality, not tolerance), and the 256-sample quantile estimates
    land within ±10 rank points on the 60k-row lineitem column."""
    from flink_tpcds_spark.operators.sketch import (
        merge_quantile_sketches,
        quantile_sketch,
    )
    from flink_tpcds_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("uid"),
    )
    whole = sorted(
        map(tuple, quantile_sketch(li, "l_quantity", "uid", 256).collect())
    )
    for n_slices in (2, 7):
        parts = [
            quantile_sketch(
                li.filter(F.pmod("uid", F.lit(n_slices)) == i),
                "l_quantity",
                "uid",
                256,
            )
            for i in range(n_slices)
        ]
        merged = sorted(
            map(tuple, merge_quantile_sketches(parts, 256).collect())
        )
        assert merged == whole, f"merge law broken at {n_slices} slices"
    vals = sorted(float(v) for v, _ in whole)
    n = li.count()
    for q in (0.25, 0.5, 0.9):
        est = vals[int(q * (len(vals) - 1))]
        rank = li.filter(F.col("l_quantity") <= est).count() / n
        assert abs(rank - q) < 0.10, (q, rank)


def test_quantile_sketch_duplicate_keys_deterministic(spark):
    """Round-8 review fix: duplicate key values tie on md5 rank; the
    (rk, v) total order keeps the sample and the merge law exact."""
    from flink_tpcds_spark.operators.sketch import (
        merge_quantile_sketches,
        quantile_sketch,
    )

    # every key appears 3x with different values; k cuts mid-tie
    rows = [(i % 10, float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "k long, v double").repartition(5)
    whole = sorted(map(tuple, quantile_sketch(df, "v", "k", 7).collect()))
    again = sorted(map(tuple, quantile_sketch(df, "v", "k", 7).collect()))
    assert whole == again, "sample not deterministic under tied ranks"
    parts = [
        quantile_sketch(df.filter(F.col("v") % 2 == i), "v", "k", 7)
        for i in range(2)
    ]
    merged = sorted(map(tuple, merge_quantile_sketches(parts, 7).collect()))
    assert merged == whole, "merge law broken under tied ranks"


def test_percentile_cont_bit_exact_cross_engine(spark):
    """ops_ordered_set_aggs safety property: Spark's percentile_cont
    and DuckDB's quantile_cont use the SAME interpolation formula
    (``lo + (hi - lo) * frac``, double arithmetic), so the oracle
    comparison is bit-exact — the full-precision ``repr`` hash cannot
    flake the way decimal division did (VERDICT r9, ops_lateral_alias).
    Seeded-random adversarial inputs across group sizes; any formula
    divergence (e.g. ``lo*(1-frac) + hi*frac``) breaks within a ulp."""
    import random

    import duckdb

    random.seed(20260816)
    rows = []
    gid = 0
    for n in [2, 3, 5, 7, 13, 101]:
        for _ in range(2):
            gid += 1
            rows += [(gid, random.uniform(-1e6, 1e6)) for _ in range(n)]
            gid += 1
            rows += [(gid, float(random.randint(1, 50))) for _ in range(n)]
    df = spark.createDataFrame(rows, "g int, x double")
    df.createOrReplaceTempView("osa_prop_t")
    sp = spark.sql(
        """
        SELECT g,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS p50,
               percentile_cont(0.37) WITHIN GROUP (ORDER BY x) AS p37,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY x) AS d25
        FROM osa_prop_t GROUP BY g ORDER BY g
        """
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    dk = con.execute(
        "SELECT g, quantile_cont(x, 0.5), quantile_cont(x, 0.37),"
        " quantile_disc(x, 0.25) FROM t GROUP BY g ORDER BY g"
    ).fetchall()
    assert len(sp) == len(dk)
    for s, d in zip(sp, dk):
        assert (repr(s.p50), repr(s.p37), repr(s.d25)) == (
            repr(d[1]),
            repr(d[2]),
            repr(d[3]),
        ), f"group {s.g}: {s} vs {d}"


def test_mode_bucket_has_structural_majority(spark, sf_dir):
    """mode() determinism precondition for ops_ordered_set_aggs: the
    derived modal column (quantities <= 25 collapse to -1) must give
    -1 a decisive margin over EVERY other value in EVERY group, so
    engine-specific tie-breaking can never engage. (The raw columns
    are near-uniform — l_linenumber ties were measured at sf0.001,
    which is why the entry aggregates a derived column at all.)"""
    from pyspark.sql import functions as F

    from flink_tpcds_spark.schemas import load_table

    l = load_table(spark, sf_dir, "lineitem")
    counts = (
        l.select(
            "l_returnflag",
            F.when(F.col("l_quantity") <= 25, F.lit(-1))
            .otherwise(F.col("l_quantity").cast("bigint"))
            .alias("bucket"),
        )
        .groupBy("l_returnflag", "bucket")
        .count()
        .collect()
    )
    by_flag: dict[str, dict[int, int]] = {}
    for r in counts:
        by_flag.setdefault(r.l_returnflag, {})[r.bucket] = r["count"]
    for flag, d in by_flag.items():
        majority = d.get(-1, 0)
        runner_up = max(v for k, v in d.items() if k != -1)
        assert majority > 5 * runner_up, (flag, majority, runner_up)


def test_count_min_merge_law_and_bounds(spark):
    """CMS invariants: (1) cell-wise sum of two shard sketches equals
    the sketch of the union (the 100 TB rollup path); (2) estimates
    never under-count; (3) with width 256 and few distinct keys, the
    estimate of a present key is exact unless a collision occurred —
    and the total over-count across all keys is bounded by the
    collision mass (here: zero, 30 keys into 256 buckets x 4 rows
    makes a shared bucket in EVERY row astronomically unlikely)."""
    import random

    from pyspark.sql import functions as F

    from flink_tpcds_spark.operators.sketch import (
        count_min_build,
        count_min_query,
    )

    random.seed(3)
    rows = [(f"k{random.randint(0, 29)}",) for _ in range(5000)]
    df = spark.createDataFrame(rows, "k string")
    a, b = df.filter(F.length("k") <= 2), df.filter(F.length("k") > 2)
    whole = count_min_build(df, "k")
    merged = (
        count_min_build(a, "k")
        .unionAll(count_min_build(b, "k"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )

    keys = [f"k{i}" for i in range(30)] + ["absent"]
    est = {
        r.k: r.cms_estimate
        for r in count_min_query(whole, keys).collect()
    }
    true = {
        r.k: r.cnt
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for k in keys:
        assert est[k] >= true.get(k, 0), k
    assert est["absent"] == 0
    assert sum(est[k] - true.get(k, 0) for k in keys) == 0


def test_gap_fill_locf_and_zero_fill_semantics(spark):
    """gap_fill on a hand-built series with leading, interior, and
    trailing gaps: the grid densifies to [min, max] per key, counts
    zero-fill, LOCF carries the last OBSERVED value (never the zero
    fill), and leading gaps stay NULL."""
    import datetime as dt

    from pyspark.sql import functions as F

    from flink_tpcds_spark.operators.gapfill import gap_fill

    t0 = dt.datetime(2026, 1, 1, 0)
    h = lambda i: t0 + dt.timedelta(hours=i)  # noqa: E731
    rows = [
        ("a", h(1), 2, 10.0),  # key a observed at hours 1 and 4
        ("a", h(4), 1, 7.0),
        ("b", h(0), 3, 5.0),  # key b observed at hours 0 and 2
        ("b", h(2), 1, 1.0),
    ]
    obs = spark.createDataFrame(
        rows, "k string, h timestamp, cnt long, total double"
    )
    out = {
        (r.k, r.h.hour): (r.cnt, r.total, r.total_locf)
        for r in gap_fill(
            obs,
            key_col="k",
            bucket_col="h",
            zero_fill={"cnt": F.lit(0).cast("long"), "total": F.lit(0.0)},
            locf_cols=["total"],
        ).collect()
    }
    # grid is [0, 4] for BOTH keys (global bounds): 10 rows
    assert len(out) == 10
    assert out[("a", 0)] == (0, 0.0, None)  # leading gap: NULL locf
    assert out[("a", 1)] == (2, 10.0, 10.0)
    assert out[("a", 2)] == (0, 0.0, 10.0)  # interior gap carries 10
    assert out[("a", 3)] == (0, 0.0, 10.0)
    assert out[("a", 4)] == (1, 7.0, 7.0)
    assert out[("b", 3)] == (0, 0.0, 1.0)  # trailing gap carries 1
    assert out[("b", 4)] == (0, 0.0, 1.0)


def test_linear_interpolate_known_series(spark):
    """Interpolation on a hand-built series: interior gap of two
    buckets between 10 and 40 -> 20, 30; leading/trailing gaps NULL;
    observed buckets pass through untouched."""
    import datetime as dt

    from pyspark.sql import functions as F

    from flink_tpcds_spark.operators.gapfill import (
        gap_fill,
        linear_interpolate,
    )

    t0 = dt.datetime(2026, 1, 1, 0)
    h = lambda i: t0 + dt.timedelta(hours=i)  # noqa: E731
    obs = spark.createDataFrame(
        [("a", h(1), 10.0), ("a", h(4), 40.0), ("b", h(0), 5.0)],
        "k string, h timestamp, total double",
    )
    dense = gap_fill(
        obs, key_col="k", bucket_col="h", zero_fill={}, locf_cols=[]
    )
    out = {
        (r.k, r.h.hour): r.total_interp
        for r in linear_interpolate(dense, "k", "h", "total").collect()
    }
    assert out[("a", 0)] is None  # leading gap
    assert out[("a", 1)] == 10.0
    assert out[("a", 2)] == 20.0
    assert out[("a", 3)] == 30.0
    assert out[("a", 4)] == 40.0
    assert out[("b", 0)] == 5.0
    for i in (1, 2, 3, 4):  # trailing gaps for key b
        assert out[("b", i)] is None


def test_asof_forward_known_series(spark):
    """Forward as-of on a hand-built series: inclusive bound (a right
    row AT the left time matches), earliest-after wins, no-following
    rows yield NULL, and tolerance nulls out matches too far ahead."""
    from pyspark.sql import functions as F  # noqa: F401

    from flink_tpcds_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 25, 101), (1, 99, 102), (2, 5, 200)],
        "k int, t int, lid int",
    )
    right = spark.createDataFrame(
        [(1, 10, 900), (1, 20, 901), (1, 30, 902), (2, 1, 903)],
        "k int, t int, rid int",
    )
    out = {
        r.lid: r.r_rid
        for r in asof_join(
            left,
            right,
            on="k",
            left_time="t",
            right_time="t",
            right_cols=["rid"],
            direction="forward",
        ).collect()
    }
    assert out == {100: 900, 101: 902, 102: None, 200: None}

    tol = {
        r.lid: r.r_rid
        for r in asof_join(
            left,
            right,
            on="k",
            left_time="t",
            right_time="t",
            right_cols=["rid"],
            direction="forward",
            tolerance_seconds=4.0,
        ).collect()
    }
    # 101 -> 902 is 5 ahead, beyond the 4-second tolerance
    assert tol == {100: 900, 101: None, 102: None, 200: None}
