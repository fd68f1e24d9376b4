"""Materialized-view aggregate rewrite (plans/mv.py): matcher safety
and re-aggregation algebra against direct aggregation."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flink_tpcds_spark.plans.checks import explain_text
from flink_tpcds_spark.plans.mv import MvCatalog, create_mv


def _make_mv(spark, tmp_path, df):
    cat = MvCatalog()
    cat.register(
        create_mv(
            spark,
            "mv_t",
            "t",
            df,
            str(tmp_path / "mv_t"),
            ["a", "b"],
            {
                "s_x": ("sum", "x"),
                "mn_x": ("min", "x"),
                "mx_x": ("max", "x"),
                "c_x": ("count", "x"),
            },
        )
    )
    return cat


def _rand_df(spark, seed=11):
    random.seed(seed)
    rows = [
        (
            random.randint(0, 4),
            random.randint(0, 3),
            random.randint(-100, 100),
        )
        for _ in range(2000)
    ]
    return spark.createDataFrame(rows, "a int, b int, x long")


def test_rewrite_matches_direct_aggregation(spark, tmp_path):
    """Every decomposable measure re-aggregated from the MV equals the
    direct aggregate over the base — including AVG via the sum/count
    split (integer sums: exact, no float-order concerns)."""
    df = _rand_df(spark)
    cat = _make_mv(spark, tmp_path, df)
    got = cat.try_rewrite(
        spark,
        "t",
        ["a"],
        {
            "s": ("sum", "x"),
            "c": ("count", "x"),
            "mn": ("min", "x"),
            "mx": ("max", "x"),
            "av": ("avg", "x"),
        },
    )
    assert got is not None
    want = (
        df.groupBy("a")
        .agg(
            F.sum("x").alias("s"),
            F.count("x").alias("c"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
            (F.sum("x") / F.count("x").cast("double")).alias("av"),
        )
        .orderBy("a")
        .collect()
    )
    got_rows = got.orderBy("a").collect()
    assert [tuple(r) for r in got_rows] == [tuple(r) for r in want]


def test_rewrite_empty_group_by_is_global(spark, tmp_path):
    df = _rand_df(spark, seed=12)
    cat = _make_mv(spark, tmp_path, df)
    got = cat.try_rewrite(spark, "t", [], {"s": ("sum", "x")})
    assert got is not None
    assert got.collect()[0].s == df.agg(F.sum("x")).collect()[0][0]


def test_rewrite_refuses_uncovered_queries(spark, tmp_path):
    """The matcher must return None — never a wrong answer — for:
    a grouping column outside the MV key, a measure the MV does not
    store, and a different base table."""
    df = _rand_df(spark, seed=13)
    cat = _make_mv(spark, tmp_path, df)
    assert cat.try_rewrite(spark, "t", ["x"], {"s": ("sum", "x")}) is None
    assert cat.try_rewrite(spark, "t", ["a"], {"s": ("sum", "b")}) is None
    assert cat.try_rewrite(spark, "u", ["a"], {"s": ("sum", "x")}) is None


def test_rewrite_plan_reads_only_the_mv(spark, tmp_path):
    """The physical scan of the rewritten query references the MV
    parquet path and nothing else."""
    df = _rand_df(spark, seed=14)
    cat = _make_mv(spark, tmp_path, df)
    got = cat.try_rewrite(spark, "t", ["b"], {"mx": ("max", "x")})
    plan = explain_text(got)
    assert "mv_t" in plan


def test_create_mv_rejects_nondecomposable(spark, tmp_path):
    import pytest

    df = _rand_df(spark, seed=15)
    with pytest.raises(ValueError):
        create_mv(
            spark,
            "bad",
            "t",
            df,
            str(tmp_path / "bad"),
            ["a"],
            {"m": ("median", "x")},
        )


def test_apply_insert_delta_equals_rebuild(spark, tmp_path):
    """Delta folding must equal a from-scratch rebuild over base+delta
    for every measure — including groups only in the delta, groups
    untouched by the delta, and a delta that moves a group's min/max."""
    import random

    from flink_tpcds_spark.plans.mv import apply_insert_delta, create_mv

    random.seed(21)
    base_rows = [
        (random.randint(0, 5), random.randint(-50, 50)) for _ in range(1500)
    ]
    delta_rows = [
        (random.randint(3, 9), random.randint(-500, 500)) for _ in range(400)
    ]
    base = spark.createDataFrame(base_rows, "g int, x long")
    delta = spark.createDataFrame(delta_rows, "g int, x long")
    measures = {
        "s": ("sum", "x"),
        "mn": ("min", "x"),
        "mx": ("max", "x"),
        "c": ("count", "x"),
    }
    mv = create_mv(
        spark, "m", "t", base, str(tmp_path / "m"), ["g"], measures
    )
    apply_insert_delta(spark, mv, delta)
    got = sorted(map(tuple, spark.read.parquet(mv.path).collect()))
    rebuilt = create_mv(
        spark,
        "m2",
        "t",
        base.unionAll(delta),
        str(tmp_path / "m2"),
        ["g"],
        measures,
    )
    want = sorted(map(tuple, spark.read.parquet(rebuilt.path).collect()))
    assert got == want


def test_avg_rewrite_null_semantics(spark, tmp_path):
    """AVG over a null-bearing column: the rewrite must divide by the
    NON-NULL count — and must refuse (None) when the MV stores only
    the row count, because that denominator would be wrong."""
    from pyspark.sql import functions as F

    from flink_tpcds_spark.plans.mv import MvCatalog, create_mv

    rows = [(1, 10.0), (1, None), (1, 20.0), (2, None), (2, 8.0)]
    df = spark.createDataFrame(rows, "g int, x double")
    cat = MvCatalog()
    cat.register(
        create_mv(
            spark, "m", "t", df, str(tmp_path / "m"), ["g"],
            {"s_x": ("sum", "x"), "c_x": ("count", "x")},
        )
    )
    got = {
        r.g: r.av
        for r in cat.try_rewrite(
            spark, "t", ["g"], {"av": ("avg", "x")}
        ).collect()
    }
    want = {
        r.g: r.av
        for r in df.groupBy("g").agg(F.avg("x").alias("av")).collect()
    }
    assert got == want == {1: 15.0, 2: 8.0}

    cat2 = MvCatalog()
    cat2.register(
        create_mv(
            spark, "m2", "t", df, str(tmp_path / "m2"), ["g"],
            {"s_x": ("sum", "x")},  # only the auto row count stored
        )
    )
    assert cat2.try_rewrite(spark, "t", ["g"], {"av": ("avg", "x")}) is None


def test_delta_preserves_null_sum(spark, tmp_path):
    """A group whose SUM is stored NULL (all inputs NULL) must stay
    NULL after a delta that doesn't touch it — coalesce(x,0)+… would
    resurrect it as 0, which SUM over the base would never return
    (ADVICE r10). A delta that DOES add a value to such a group
    replaces the NULL (SQL SUM ignores NULLs)."""
    from flink_tpcds_spark.plans.mv import apply_insert_delta, create_mv

    base = spark.createDataFrame(
        [(1, None), (1, None), (2, 5.0), (3, None)], "g int, x double"
    )
    delta = spark.createDataFrame([(2, 7.0), (3, 4.0)], "g int, x double")
    mv = create_mv(
        spark, "m", "t", base, str(tmp_path / "m"), ["g"],
        {"s": ("sum", "x"), "c": ("count", "x")},
    )
    apply_insert_delta(spark, mv, delta)
    got = {r.g: (r.s, r.c) for r in spark.read.parquet(mv.path).collect()}
    want = {
        r.g: (r.s, r.c)
        for r in base.unionAll(delta)
        .groupBy("g")
        .agg(F.sum("x").alias("s"), F.count("x").alias("c"))
        .collect()
    }
    assert got == want
    assert got[1] == (None, 0)  # the resurrected-zero class, pinned


def test_delta_swap_is_crash_safe(spark, tmp_path):
    """The .old-backup promote protocol: every intermediate crash
    state (backup-only, backup+live, orphaned temp) recovers to a
    readable MV — never 'no MV at all' (ADVICE r10: the old
    rmtree-then-move had a window with neither)."""
    import shutil

    from flink_tpcds_spark.plans.mv import (
        MvCatalog,
        _recover,
        apply_insert_delta,
        create_mv,
    )

    base = spark.createDataFrame([(1, 2.0), (2, 3.0)], "g int, x double")
    delta = spark.createDataFrame([(1, 5.0)], "g int, x double")
    mv = create_mv(
        spark, "m", "t", base, str(tmp_path / "m"), ["g"],
        {"s": ("sum", "x")},
    )
    apply_insert_delta(spark, mv, delta)
    want = sorted(map(tuple, spark.read.parquet(mv.path).collect()))

    # crash state A: promoted, stale backup left behind
    shutil.copytree(mv.path, mv.path + ".old")
    _recover(mv.path)
    assert sorted(map(tuple, spark.read.parquet(mv.path).collect())) == want
    import os

    assert not os.path.isdir(mv.path + ".old")

    # crash state B: live dir moved to backup, promote never happened
    shutil.move(mv.path, mv.path + ".old")
    _recover(mv.path)
    assert sorted(map(tuple, spark.read.parquet(mv.path).collect())) == want

    # crash state C: orphaned temp dir alongside the live MV
    shutil.copytree(mv.path, mv.path + ".delta_tmp")
    cat = MvCatalog()
    cat.register(mv)
    got = cat.try_rewrite(spark, "t", ["g"], {"s": ("sum", "x")})
    assert got is not None
    assert not os.path.isdir(mv.path + ".delta_tmp")
