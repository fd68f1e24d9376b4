"""Operator battery: one query per §2 operator family not already
covered by the TPC-H suite, each with a DuckDB oracle.

Covers: Expand (rollup/cube/grouping sets — SURVEY §2.2/§2.4),
OVER-window frames + ranking (§2.6), top-n/dedup (§2.7), set ops
(§2.8), Correlate/UNNEST (§2.2), Values (§2.1), scalar functions
(§2.9), approximate distinct (§2.4), as-of + interval joins (§2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.deterministic import dsum, dsum_sql
from ..operators import asof_join, dedup_first, interval_join, top_n
from ..schemas import load_table

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Expand: ROLLUP / CUBE / GROUPING SETS (reference DecomposeGroupingSetsRule,
# BatchExecExpand — SURVEY §2.2; used by TPC-DS q5,q14,q18,...)
# ---------------------------------------------------------------------------
@_q(
    "ops_rollup",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
           {dsum_sql('l_quantity')} AS sum_qty, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def ops_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() markers → ExpandExec under the hood."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            dsum(l.l_quantity).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_qty", "cnt")
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@_q(
    "ops_cube",
    f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           {dsum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def ops_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum(o.o_totalprice).alias("sum_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@_q(
    "ops_grouping_sets",
    f"""
    SELECT l_returnflag, CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           {dsum_sql('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (ship_year), ())
    ORDER BY l_returnflag NULLS FIRST, ship_year NULLS FIRST
    """,
)
def ops_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (DataFrame API has no direct
    grouping-sets call; spark.sql is the idiomatic route)."""
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("ops_gs_lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, CAST(year(l_shipdate) AS INT) AS ship_year,
               {_spark_dsum('l_extendedprice')} AS sum_price
        FROM ops_gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (ship_year), ())
        ORDER BY l_returnflag ASC NULLS FIRST, ship_year ASC NULLS FIRST
        """
    )


def _spark_dsum(expr: str, scale: int = 6) -> str:
    # Spark-SQL-side rendering of the decimal bridge (same as oracle's).
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# OVER windows: frames, offsets, ranking (reference BatchExecOverAggregate,
# frame classes in runtime/operators/over/frame — SURVEY §2.6)
# ---------------------------------------------------------------------------
@_q(
    "ops_window_frames",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                AS DOUBLE) AS neighborhood_qty,
           LAG(l_quantity, 1) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS prev_qty,
           LEAD(l_quantity, 1) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS next_qty,
           FIRST_VALUE(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_part,
           CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS INTEGER) AS rn,
           CAST(RANK() OVER (PARTITION BY l_orderkey ORDER BY l_returnflag, l_linenumber) AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_returnflag) AS INTEGER) AS drnk
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
)
def ops_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full frame matrix (rows frames, offsets,
    unbounded, ranking) in one plan — WindowExec with 3 window specs."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    )
    by_line = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    running = by_line.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    neigh = by_line.rowsBetween(-1, 1)
    full = by_line.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    by_flag = Window.partitionBy("l_orderkey").orderBy(
        "l_returnflag", "l_linenumber"
    )
    by_flag_only = Window.partitionBy("l_orderkey").orderBy("l_returnflag")
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            F.sum(l.l_extendedprice.cast("decimal(18,6)"))
            .over(running)
            .cast("double")
            .alias("running_price"),
            F.sum(l.l_quantity.cast("decimal(18,6)"))
            .over(neigh)
            .cast("double")
            .alias("neighborhood_qty"),
            F.lag("l_quantity", 1).over(by_line).alias("prev_qty"),
            F.lead("l_quantity", 1).over(by_line).alias("next_qty"),
            F.first("l_partkey").over(full).alias("first_part"),
            F.row_number().over(by_line).cast("int").alias("rn"),
            F.rank().over(by_flag).cast("int").alias("rnk"),
            F.dense_rank().over(by_flag_only).cast("int").alias("drnk"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@_q(
    "ops_topn_per_group",
    """
    SELECT n_name, c_custkey, c_acctbal, CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT n_name, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) t WHERE rn <= 3
    ORDER BY n_name, rn
    """,
)
def ops_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation via the top_n operator
    (WindowGroupLimit pushdown in Spark ≥3.5 = reference's TopNBuffer)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        top_n(
            joined,
            ["n_name"],
            [F.desc("c_acctbal"), F.asc("c_custkey")],
            3,
            rank_col="rn",
        )
        .select("n_name", "c_custkey", "c_acctbal", F.col("rn").cast("int").alias("rn"))
        .orderBy("n_name", "rn")
    )


@_q(
    "ops_dedup_keep_first",
    """
    SELECT user_id, event_id, event_type, value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) t WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def ops_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the first event per (user, type) — StreamExecDeduplicate's
    keep-first semantics in batch form (dedup_first operator)."""
    e = load_table(spark, sf_dir, "events")
    return (
        dedup_first(e, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")])
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Set operations (reference ReplaceIntersectWithSemiJoinRule etc. — §2.8)
# ---------------------------------------------------------------------------
@_q(
    "ops_set_operations",
    """
    WITH building AS (
      SELECT DISTINCT c_custkey FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ), big_spenders AS (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE o_totalprice > 300000
    )
    SELECT 'intersect' AS op, COUNT(*) AS cnt
    FROM (SELECT * FROM building INTERSECT SELECT * FROM big_spenders) a
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS cnt
    FROM (SELECT * FROM building EXCEPT SELECT * FROM big_spenders) b
    UNION ALL
    SELECT 'union' AS op, COUNT(*) AS cnt
    FROM (SELECT * FROM building UNION SELECT * FROM big_spenders) c
    ORDER BY op
    """,
)
def ops_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION — Catalyst rewrites the first two to
    semi/anti joins exactly like the reference's rule set."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = (
        c.filter(c.c_mktsegment == "BUILDING").select("c_custkey").distinct()
    )
    big = (
        o.filter(o.o_totalprice > 300000)
        .select(o.o_custkey.alias("c_custkey"))
        .distinct()
    )
    counts = [
        building.intersect(big).agg(
            F.lit("intersect").alias("op"), F.count(F.lit(1)).alias("cnt")
        ),
        building.exceptAll(big).agg(
            F.lit("except").alias("op"), F.count(F.lit(1)).alias("cnt")
        ),
        building.union(big).distinct().agg(
            F.lit("union").alias("op"), F.count(F.lit(1)).alias("cnt")
        ),
    ]
    out = counts[0]
    for df in counts[1:]:
        out = out.unionByName(df)
    return out.orderBy("op")


# ---------------------------------------------------------------------------
# Correlate / UNNEST (reference BatchExecCorrelate, LogicalUnnestRule — §2.2)
# ---------------------------------------------------------------------------
@_q(
    "ops_explode_words",
    """
    SELECT word, COUNT(*) AS cnt
    FROM (
      SELECT unnest(string_split(text, ' ')) AS word
      FROM documents WHERE lang = 'en'
    ) t
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
)
def ops_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL/UNNEST: explode(split(text)) — word histogram top-20."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        d.select(F.explode(F.split(F.col("text"), " ", -1)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )


@_q(
    "ops_pivot",
    f"""
    SELECT c_mktsegment,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")}
             AS rev_f,
           {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")}
             AS rev_o,
           {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")}
             AS rev_p
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def ops_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (relational crosstab): revenue per market segment ×
    order status through ``groupBy().pivot(values).agg`` — the
    explicit value list keeps the plan a single pass (no
    distinct-values pre-scan) and pins column order. The oracle is
    the standard CASE-decomposition, value-identical via the decimal
    bridge. Physical shape: ONE hash aggregate over the join — pivot
    is Expand-free in Spark (compare Expand-based GROUPING SETS),
    so it scales like any single groupBy."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    piv = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum(F.col("o_totalprice")))
    )
    return piv.select(
        "c_mktsegment",
        F.col("F").alias("rev_f"),
        F.col("O").alias("rev_o"),
        F.col("P").alias("rev_p"),
    ).orderBy("c_mktsegment")


@_q(
    "ops_map_higher_order",
    f"""
    SELECT c_mktsegment, o_orderstatus AS status,
           {dsum_sql('o_totalprice')} * 2 AS rev2
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment, o_orderstatus
    HAVING {dsum_sql('o_totalprice')} * 2 > 100000
    ORDER BY c_mktsegment, status
    """,
)
def ops_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions (transform_values / map_filter —
    with MULTISET/map emulation this closes the lambda surface over
    Blink's map type): per-segment status→revenue maps built with
    map_from_entries, values doubled via transform_values, small
    entries dropped via map_filter, then exploded back to rows so
    every surviving (key, value) pair is value-checked against the
    plain relational oracle (map internals must be a lossless detour:
    same rows in, same rows out)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(dsum(F.col("o_totalprice")).alias("rev"))
    )
    maps = per.groupBy("c_mktsegment").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "rev")))
        ).alias("m")
    )
    adj = maps.select(
        "c_mktsegment",
        F.map_filter(
            F.transform_values("m", lambda _k, v: v * 2),
            lambda _k, v: v > 100000,
        ).alias("m2"),
    )
    return (
        adj.select(
            "c_mktsegment", F.explode("m2").alias("status", "rev2")
        )
        .orderBy("c_mktsegment", "status")
    )


@_q(
    "ops_try_arithmetic",
    """
    SELECT event_id,
           CASE WHEN CAST(event_id % 3 AS DOUBLE) = 0 THEN NULL
                ELSE value / CAST(event_id % 3 AS DOUBLE) END AS d,
           TRY_CAST(CASE WHEN event_id % 2 = 0
                         THEN CAST(event_id AS VARCHAR)
                         ELSE event_type END AS INTEGER) AS maybe_int,
           CASE WHEN event_id = 0 THEN 9223372036854775807
                ELSE NULL END AS add_sat
    FROM events
    WHERE event_id % 11 = 0
    ORDER BY event_id
    """,
)
def ops_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (`try_divide` / `try_cast` / `try_add`):
    NULL-on-failure semantics instead of runtime errors — the
    engine-native form of Blink's lenient cast behavior
    (SqlCastFunction null-on-error mode), and the only sane posture
    for a 100 TB batch job where one malformed row must not kill the
    stage. Divide-by-zero → NULL, unparseable string → NULL, int64
    overflow → NULL; the oracle states each outcome explicitly in
    CASE form (DuckDB's strict arithmetic would error out)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 11 == 0
    )
    return (
        e.select(
            "event_id",
            F.try_divide(
                F.col("value"), (F.col("event_id") % 3).cast("double")
            ).alias("d"),
            F.when(
                F.col("event_id") % 2 == 0,
                F.col("event_id").cast("string"),
            )
            .otherwise(F.col("event_type"))
            .try_cast("int")
            .alias("maybe_int"),
            F.try_add(
                F.lit(9223372036854775807), F.col("event_id")
            ).alias("add_sat"),
        )
        .orderBy("event_id")
    )


@_q(
    "ops_array_higher_order",
    """
    WITH a AS (
      SELECT l_orderkey,
             list(CAST(l_quantity AS DOUBLE)
                  ORDER BY l_linenumber, l_quantity) AS arr
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(arr) AS INTEGER) AS n,
           list_sum(list_transform(arr, x -> x * x)) AS sum_sq,
           CAST(len(list_filter(arr, x -> x > 25)) AS INTEGER) AS n_big,
           list_sum(list_transform(arr,
             (x, i) -> x * arr[len(arr) - i + 1])) AS dot_rev
    FROM a
    WHERE l_orderkey % 50 = 0
    ORDER BY l_orderkey
    """,
)
def ops_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (reference flink gap — Blink has
    no lambda fns; Spark's transform/filter/aggregate/zip_with are
    the engine-native path the ANN dot products use): per-order
    quantity vectors (sorted by (line number, quantity) — the
    testdata's line numbers are NOT unique per order, so the value
    itself is the tiebreak that makes the array, and every lambda
    over it, engine-deterministic), squared-sum via
    transform+aggregate, a predicate count via filter, and a
    self-reversed dot product via zip_with — all codegen'd JVM
    expressions, zero UDFs. Quantities are small integers, so the
    double arithmetic is exact and hash-stable."""
    l = load_table(spark, sf_dir, "lineitem")
    arr_df = (
        l.groupBy("l_orderkey")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "l_linenumber",
                            F.col("l_quantity").cast("double").alias("q"),
                        )
                    )
                ),
                lambda s: s["q"],
            ).alias("arr")
        )
        .filter(F.col("l_orderkey") % 50 == 0)
    )
    zero = F.lit(0.0)
    return (
        arr_df.select(
            "l_orderkey",
            F.size("arr").alias("n"),
            F.aggregate(
                F.transform("arr", lambda x: x * x),
                zero,
                lambda acc, x: acc + x,
            ).alias("sum_sq"),
            F.size(F.filter("arr", lambda x: x > 25)).alias("n_big"),
            F.aggregate(
                F.zip_with(
                    "arr", F.reverse("arr"), lambda a, b: a * b
                ),
                zero,
                lambda acc, x: acc + x,
            ).alias("dot_rev"),
        )
        .orderBy("l_orderkey")
    )


@_q(
    "ops_window_distribution",
    """
    SELECT event_id, event_type,
           CAST(NTILE(4) OVER w AS INTEGER) AS nt,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd,
           NTH_VALUE(value, 2) OVER (
             PARTITION BY event_type ORDER BY value, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS nth2,
           LAST_VALUE(CASE WHEN event_id % 3 != 0 THEN value END
                      IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY value, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_nonnull
    FROM events
    WHERE event_id % 7 = 0
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    ORDER BY event_type, value, event_id
    """,
)
def ops_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-class ranking functions (reference
    RankAggFunction family / Blink OVER surface beyond
    rank/row_number): NTILE, PERCENT_RANK, CUME_DIST, NTH_VALUE over
    the full frame, and IGNORE-NULLS LAST_VALUE over the running
    frame (`F.last(ignorenulls=True)` — the gap-fill primitive the
    as-of join uses, here value-gated directly). Unique (value,
    event_id) order keys make every function deterministic."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 7 == 0
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.select(
            "event_id",
            "event_type",
            F.ntile(4).over(w).cast("int").alias("nt"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.nth_value("value", 2).over(wfull).alias("nth2"),
            F.last(
                F.when(F.col("event_id") % 3 != 0, F.col("value")),
                ignorenulls=True,
            )
            .over(wrun)
            .alias("last_nonnull"),
        )
        .orderBy("event_type", "value", "event_id")
    )


@_q(
    "ops_posexplode",
    """
    SELECT doc_id, CAST(u.x.i - 1 AS INTEGER) AS pos, u.x.w AS word
    FROM (
      SELECT doc_id,
             unnest(list_transform(string_split(text, ' '),
                    (w, i) -> struct_pack(w := w, i := i))) AS x
      FROM documents WHERE lang = 'en'
    ) u
    WHERE u.x.w <> '' AND u.x.i - 1 < 5
    ORDER BY doc_id, pos
    """,
)
def ops_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY (posexplode): token positions are part
    of the Correlate contract (the reference's UDTF rows carry an
    implicit order the collector preserves; here the ordinal is
    explicit). First five positions of every English document,
    position computed BEFORE the empty-token filter so the ordinal
    reflects the original array — matched against DuckDB's indexed
    list lambda."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ", -1)).alias(
                "pos", "word"
            ),
        )
        .filter((F.col("word") != "") & (F.col("pos") < 5))
        .orderBy("doc_id", "pos")
    )


@_q(
    "ops_unpivot",
    f"""
    SELECT metric, {dsum_sql('val')} AS total,
           CAST(COUNT(val) AS BIGINT) AS cnt
    FROM (
      SELECT 'l_extendedprice' AS metric, l_extendedprice AS val
      FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    ) u
    GROUP BY metric
    ORDER BY metric
    """,
)
def ops_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt, PIVOT's inverse): lineitem's three
    money columns into (metric, val) rows via ``DataFrame.unpivot``
    (SQL ``UNPIVOT`` / Expand under the hood — ONE scan emitting 3
    rows per input, not 3 scans like the naive UNION ALL the oracle
    uses), then a decimal-bridged per-metric rollup."""
    l = load_table(spark, sf_dir, "lineitem")
    u = l.unpivot(
        ["l_orderkey"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    return (
        u.groupBy("metric")
        .agg(
            dsum(F.col("val")).alias("total"),
            F.count("val").cast("bigint").alias("cnt"),
        )
        .orderBy("metric")
    )


@_q(
    "ops_lateral_topk",
    """
    SELECT c.c_custkey, o.o_orderkey, o.price
    FROM customer c,
    LATERAL (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
             FROM orders WHERE o_custkey = c.c_custkey
             ORDER BY price DESC, o_orderkey LIMIT 2) o
    WHERE c.c_custkey % 10 = 0
    ORDER BY c.c_custkey, price DESC, o_orderkey
    """,
)
def ops_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY/LIMIT — the
    full SQL-standard Correlate form beyond UNNEST/UDTF (reference
    BatchExecCorrelate serves LATERAL TABLE(udtf); the correlated-
    derived-table form is the general case): each customer's top-2
    orders by price. Catalyst DECORRELATES it into
    WindowGroupLimit + one hash join — plan-audited: zero
    CartesianProduct / BroadcastNestedLoopJoin, i.e. the same
    scale-safe shape as the explicit window top-n, written
    declaratively. Tie-deterministic via (price DESC, o_orderkey)."""
    for name in ("customer", "orders"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(
            f"__lat_{name}"
        )
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.price
        FROM __lat_customer c,
        LATERAL (SELECT o_orderkey,
                        CAST(o_totalprice AS DOUBLE) AS price
                 FROM __lat_orders WHERE o_custkey = c.c_custkey
                 ORDER BY price DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey % 10 = 0
        ORDER BY c.c_custkey, price DESC, o_orderkey
        """
    )


# ---------------------------------------------------------------------------
# Values (reference BatchExecValues / ValuesInputFormat — §2.1)
# ---------------------------------------------------------------------------
@_q(
    "ops_values_join",
    """
    SELECT t.tier, COUNT(*) AS cnt
    FROM customer
    JOIN (VALUES ('BUILDING', 'core'), ('AUTOMOBILE', 'core'),
                 ('MACHINERY', 'growth'), ('FURNITURE', 'growth'),
                 ('HOUSEHOLD', 'other')) AS t(segment, tier)
      ON c_mktsegment = t.segment
    GROUP BY t.tier
    ORDER BY t.tier
    """,
)
def ops_values_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation joined to a table (LocalTableScanExec)."""
    c = load_table(spark, sf_dir, "customer")
    tiers = spark.createDataFrame(
        [
            ("BUILDING", "core"),
            ("AUTOMOBILE", "core"),
            ("MACHINERY", "growth"),
            ("FURNITURE", "growth"),
            ("HOUSEHOLD", "other"),
        ],
        ["segment", "tier"],
    )
    return (
        c.join(F.broadcast(tiers), c.c_mktsegment == tiers.segment)
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("tier")
    )


# ---------------------------------------------------------------------------
# Scalar function battery (FlinkSqlOperatorTable surface — §2.9)
# ---------------------------------------------------------------------------
@_q(
    "ops_scalar_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           substr(c_name, 1, 8) AS name8,
           length(c_name) AS name_len,
           concat(c_name, '#', c_mktsegment) AS tagged,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           replace(c_mktsegment, 'I', '!') AS repl,
           reverse(c_mktsegment) AS rseg,
           strpos(c_name, '_') AS uspos,
           trim(concat(' ', c_name, ' ')) AS trimmed,
           md5(c_name) AS name_md5,
           round(c_acctbal, 1) AS bal_round,
           abs(c_acctbal) AS bal_abs,
           CAST(floor(c_acctbal) AS DOUBLE) AS bal_floor,
           CAST(ceil(c_acctbal) AS DOUBLE) AS bal_ceil,
           CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign,
           coalesce(NULL, c_mktsegment) AS seg2,
           CAST(c_custkey % 7 AS BIGINT) AS mod7
    FROM customer
    WHERE c_custkey <= 200
    ORDER BY c_custkey
    """,
)
def ops_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pass over the shared scalar-function surface (string, math,
    conditional) — every expression stays in whole-stage codegen."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.regexp_replace(F.col("c_mktsegment"), "I", "!").alias("repl"),
        F.reverse(F.col("c_mktsegment")).alias("rseg"),
        F.instr(F.col("c_name"), "_").alias("uspos"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.round(F.col("c_acctbal"), 1).alias("bal_round"),
        F.abs(F.col("c_acctbal")).alias("bal_abs"),
        F.floor(F.col("c_acctbal")).cast("double").alias("bal_floor"),
        F.ceil(F.col("c_acctbal")).cast("double").alias("bal_ceil"),
        F.when(F.col("c_acctbal") < 0, "neg").otherwise("pos").alias("bal_sign"),
        F.coalesce(F.lit(None), F.col("c_mktsegment")).alias("seg2"),
        (F.col("c_custkey") % 7).cast("bigint").alias("mod7"),
    ).orderBy("c_custkey")


@_q(
    "ops_approx_count_distinct",
    """
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
           TRUE AS parts_within_rsd,
           TRUE AS supps_within_rsd
    FROM lineitem
    """,
)
def ops_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate (reference
    ApproximateCountDistinctAggFunction / HyperLogLogPlusPlus.java —
    Spark ships the same algorithm as approx_count_distinct).

    The HLL estimate itself is approximate, so the hash-checkable
    output is the exact count plus a boolean asserting the estimate
    landed within 5× the configured 1% rsd; the oracle emits the
    exact counts and literal TRUE."""
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.01).alias("approx_supps"),
        F.count_distinct(F.col("l_partkey")).alias("exact_parts"),
        F.count_distinct(F.col("l_suppkey")).alias("exact_supps"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) / F.col(e) <= F.lit(0.05)
    )
    return agg.select(
        "exact_parts",
        "exact_supps",
        within("approx_parts", "exact_parts").alias("parts_within_rsd"),
        within("approx_supps", "exact_supps").alias("supps_within_rsd"),
    )


# ---------------------------------------------------------------------------
# As-of (temporal) join + interval join (§2.3 — custom operators)
# ---------------------------------------------------------------------------
@_q(
    "ops_asof_join",
    """
    SELECT e.event_id, e.user_id, e.ts, e.value, s.r_value, s.r_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') e
    ASOF LEFT JOIN (
        SELECT user_id, ts, value AS r_value, event_id AS r_event_id
        FROM events WHERE event_type = 'view'
    ) s ON e.user_id = s.user_id AND s.ts <= e.ts
    ORDER BY e.event_id
    """,
)
def ops_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal as-of join: each purchase joined to the user's latest
    page view at-or-before it (reference TemporalRowTimeJoinOperator —
    SURVEY §2.3 'no built-in as-of join in Spark'). DuckDB's native
    ASOF JOIN is the oracle for our union+window implementation."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("value").alias("value2"),
        F.col("event_id").alias("event_id2"),
    )
    return (
        asof_join(
            purchases,
            views,
            on="user_id",
            left_time="ts",
            right_time="ts",
            right_cols=["value2", "event_id2"],
            prefix="r_",
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.col("r_value2").alias("r_value"),
            F.col("r_event_id2").alias("r_event_id"),
        )
        .orderBy("event_id")
    )


@_q(
    "ops_interval_join",
    """
    SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL 10 MINUTE
    ORDER BY click_id, purchase_id
    """,
)
def ops_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: purchases within 10 minutes after a click
    (reference RowTimeBoundedStreamJoin, batch semantics)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").alias("a")
    purchases = e.filter(F.col("event_type") == "purchase").alias("b")
    return (
        interval_join(
            clicks,
            purchases,
            on=F.col("a.user_id") == F.col("b.user_id"),
            left_time=F.col("a.ts"),
            right_time=F.col("b.ts"),
            lower_seconds=0,
            upper_seconds=600,
        )
        .select(
            F.col("a.event_id").alias("click_id"),
            F.col("b.event_id").alias("purchase_id"),
            F.col("a.user_id").alias("user_id"),
        )
        .orderBy("click_id", "purchase_id")
    )


# ---------------------------------------------------------------------------
# UDAF / UDTAGG surface (§2.11, §2.4 GroupTableAggregate)
# ---------------------------------------------------------------------------
@_q(
    "ops_group_table_agg",
    """
    SELECT event_id, user_id, value
    FROM (
      SELECT event_id, user_id, value,
             AVG(value) OVER (PARTITION BY user_id) AS m
      FROM events WHERE event_type = 'purchase'
    ) t
    WHERE value > m
    ORDER BY event_id
    """,
)
def ops_group_table_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table aggregate (UDTAGG): emit each user's above-mean purchases
    via groupBy().applyInPandas — reference GroupTableAggFunction.

    Tie-safety: a comparison `value > mean` flips between engines only
    if value sits within float-ulp of the group mean, which requires a
    single-row group (excluded identically: x > x is false) — so the
    pandas path and the SQL window oracle agree exactly.
    """
    from ..operators.table_agg import emit_above_group_mean

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return (
        emit_above_group_mean(e, ["user_id"], "value")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )


@_q(
    "ops_pandas_udaf",
    """
    SELECT event_type,
           ROUND(SUM(value * (epoch(ts) % 100)) / SUM(epoch(ts) % 100), 6)
             AS wmean
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ops_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF (GROUPED_AGG pandas UDF): time-weighted mean value
    per event type — reference AggregateFunction-with-accumulator."""
    from ..operators.table_agg import weighted_mean_udaf

    wm = weighted_mean_udaf()
    e = load_table(spark, sf_dir, "events").withColumn(
        "w", (F.col("ts").cast("timestamp_ltz").cast("double") % 100)
    )
    return (
        e.groupBy("event_type")
        .agg(wm(F.col("value"), F.col("w")).alias("wmean"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Blink-specific scalar gap functions (§2.9: SPLIT_INDEX, KEYVALUE,
# IS_DIGIT/IS_ALPHA/IS_DECIMAL — functions/scalar.py)
# ---------------------------------------------------------------------------
@_q(
    "ops_blink_functions",
    """
    SELECT c_custkey,
           string_split(c_name, '#')[2] AS name_part1,
           CASE WHEN len(string_split(c_name, '#')) > 9 THEN string_split(c_name, '#')[10] END AS name_part9,
           regexp_matches(CAST(c_custkey AS VARCHAR), '^[0-9]+$') AS key_is_digit,
           regexp_matches(c_mktsegment, '^[A-Za-z]+$') AS seg_is_alpha,
           regexp_matches(CAST(c_acctbal AS VARCHAR), '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$') AS bal_is_decimal,
           map_extract(map_from_entries([{'k': string_split(p, '=')[1], 'v': string_split(p, '=')[2]} for p in string_split('seg=' || c_mktsegment || ';key=' || CAST(c_custkey AS VARCHAR), ';')]), 'seg')[1] AS kv_seg
    FROM customer
    WHERE c_custkey <= 100
    ORDER BY c_custkey
    """,
)
def ops_blink_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Blink built-ins Spark lacks, from the gap layer
    (functions/scalar.py): SPLIT_INDEX, KEYVALUE, IS_DIGIT, IS_ALPHA,
    IS_DECIMAL — reference FlinkSqlOperatorTable.java (SURVEY §2.9)."""
    from ..functions.scalar import (
        is_alpha,
        is_decimal,
        is_digit,
        keyvalue,
        split_index,
    )

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    kv_str = F.concat(
        F.lit("seg="), F.col("c_mktsegment"),
        F.lit(";key="), F.col("c_custkey").cast("string"),
    )
    return c.select(
        "c_custkey",
        split_index(F.col("c_name"), "#", 1).alias("name_part1"),
        split_index(F.col("c_name"), "#", 9).alias("name_part9"),  # out-of-range → NULL (by design)
        is_digit(F.col("c_custkey").cast("string")).alias("key_is_digit"),
        is_alpha(F.col("c_mktsegment")).alias("seg_is_alpha"),
        is_decimal(F.col("c_acctbal").cast("string")).alias("bal_is_decimal"),
        keyvalue(kv_str, ";", "=", "seg").alias("kv_seg"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Date/time function battery (§2.9: DATE_FORMAT, EXTRACT, FLOOR/CEIL on
# dates, datediff — SqlDateTimeUtils.java)
# ---------------------------------------------------------------------------
@_q(
    "ops_datetime_functions",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           strftime(o_orderdate, '%Y-%m-%d') AS formatted,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def ops_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT family, DATE_FORMAT, truncation, interval arithmetic,
    datediff — reference SqlDateTimeUtils.java (1300 LoC) mapped to
    pyspark.sql.functions one-liners."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("formatted"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast("date").alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("bigint").alias("days_since_epoch_start"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.dayofweek(F.col("o_orderdate")).alias("dow_tmp"),
    ).withColumn(
        # Spark dayofweek: 1=Sunday..7=Saturday → ISO 1=Monday..7=Sunday
        "iso_dow",
        F.when(F.col("dow_tmp") == 1, 7).otherwise(F.col("dow_tmp") - 1).cast("int"),
    ).drop("dow_tmp").orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# COLLECT / LISTAGG / FIRST-LAST-by-order aggregates (§2.4 agg functions)
# ---------------------------------------------------------------------------
@_q(
    "ops_collect_aggs",
    """
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities_csv,
           arg_min(o_orderkey, o_totalprice) AS cheapest_order,
           arg_max(o_orderkey, o_totalprice) AS priciest_order,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def ops_collect_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLECT (multiset→sorted array), LISTAGG, FIRST/LAST_VALUE-by
    (min_by/max_by) — reference aggfunctions/ (SURVEY §2.4).

    The collected set is emitted only as its CSV rendering
    (``priorities_csv``): the driver's canonicalizer cannot hash
    array-typed cells (round-1 red row), and the string carries the
    same information.

    arg_min/arg_max determinism: o_totalprice is continuous (ties
    impossible in the synthetic data), so both engines pick the same
    order key."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_set("o_orderpriority"))
            ).alias("priorities_csv"),
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.count_distinct(F.col("o_orderpriority")).alias("n_priorities"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Plain LIMIT without sort (§2.7 BatchExecLimit) — wrapped in count so
# the result is deterministic while still exercising GlobalLimitExec
# ---------------------------------------------------------------------------
@_q(
    "ops_plain_limit",
    """
    SELECT COUNT(*) AS n FROM (SELECT * FROM lineitem LIMIT 1000) t
    """,
)
def ops_plain_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.limit(1000).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Lookup join (§2.3 BatchExecLookupJoin / LookupJoinRunner)
# ---------------------------------------------------------------------------
@_q(
    "ops_lookup_join",
    """
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'signup'
    ORDER BY e.event_id
    """,
)
def ops_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup join: probe the stream-side rows against an external
    keyed snapshot (customer) — always broadcast, probe side never
    shuffles (operators/joins.py lookup_join)."""
    from ..operators import lookup_join

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return (
        lookup_join(e, c, e.user_id == c.c_custkey, "left")
        .select("event_id", "user_id", "c_name", "c_mktsegment")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Count windows (§2.5 CountTumblingWindowAssigner — Spark has no count
# window primitive; expressed as row_number()-derived window ids)
# ---------------------------------------------------------------------------
@_q(
    "ops_count_window",
    """
    SELECT user_id, win_id, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM (
      SELECT user_id, value,
             CAST((ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)
                  // 10 AS INTEGER) AS win_id
      FROM events
    ) t
    GROUP BY user_id, win_id
    ORDER BY user_id, win_id
    """,
)
def ops_count_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling COUNT window (every 10 events per user): the reference's
    CountTumblingWindowAssigner re-expressed as a derived window id —
    deterministic because the per-user order (ts, event_id) is total."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn(
            "win_id", F.floor((F.row_number().over(w) - 1) / 10).cast("int")
        )
        .groupBy("user_id", "win_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("user_id", "win_id")
    )


# ---------------------------------------------------------------------------
# Hash / encode functions (§2.9: MD5, SHA2 family, TO_BASE64/FROM_BASE64,
# HEX — reference FlinkSqlOperatorTable hash group)
# ---------------------------------------------------------------------------
@_q(
    "ops_hash_functions",
    """
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           base64(encode(substring(text, 1, 24))) AS b64,
           hex(encode(substring(text, 1, 8))) AS hex8,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def ops_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MD5 / SHA-256 / BASE64 / HEX over document text — the reference's
    hash-function group (SqlFunctionUtils.java) as Spark built-ins."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("h_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("h_sha256"),
        F.base64(F.encode(F.substring("text", 1, 24), "utf-8")).alias("b64"),
        F.hex(F.encode(F.substring("text", 1, 8), "utf-8")).alias("hex8"),
        F.length(F.encode(F.col("text"), "utf-8")).cast("bigint").alias("n_bytes"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# MULTISET emulation (§1.3: Blink MULTISET type → count-map; rendered
# as a canonical "value:count" string so both engines hash identically)
# ---------------------------------------------------------------------------
@_q(
    "ops_multiset_emulation",
    """
    SELECT o_orderstatus,
           string_agg(pc, ',' ORDER BY pc) AS priority_multiset
    FROM (
      SELECT o_orderstatus,
             o_orderpriority || ':' || CAST(COUNT(*) AS VARCHAR) AS pc
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    ) t
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def ops_multiset_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLECT-to-MULTISET (reference CollectAggFunction → MULTISET
    type): emulated as element→count, canonicalized to a sorted
    'value:count' string (SURVEY §1.3's count-map mapping)."""
    o = load_table(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        counted.select(
            "o_orderstatus",
            F.concat_ws(":", F.col("o_orderpriority"), F.col("c")).alias("pc"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("pc"))).alias(
                "priority_multiset"
            )
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Statistical aggregate battery (§2.4: reference FlinkSqlOperatorTable
# STDDEV_POP/STDDEV_SAMP/VAR_POP/VAR_SAMP + AggregateReduceFunctionsRule,
# which rewrites them to the same sum/sum² form used here)
# ---------------------------------------------------------------------------
@_q(
    "ops_stats_aggs",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
             AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(stddev_pop(l_quantity), 4) AS sdp_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(var_pop(l_quantity), 4) AS varp_qty,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price,
           ROUND(covar_pop(l_quantity, l_extendedprice), 2) AS covp_qty_price,
           ROUND(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
           ROUND(
             (avg(l_quantity*l_quantity*l_quantity)
              - 3*avg(l_quantity)*avg(l_quantity*l_quantity)
              + 2*avg(l_quantity)*avg(l_quantity)*avg(l_quantity))
             / POWER(avg(l_quantity*l_quantity) - avg(l_quantity)*avg(l_quantity), 1.5),
             4) + 0.0 AS skew_qty,
           ROUND(
             (avg(l_quantity*l_quantity*l_quantity*l_quantity)
              - 4*avg(l_quantity)*avg(l_quantity*l_quantity*l_quantity)
              + 6*avg(l_quantity)*avg(l_quantity)*avg(l_quantity*l_quantity)
              - 3*avg(l_quantity)*avg(l_quantity)*avg(l_quantity)*avg(l_quantity))
             / POWER(avg(l_quantity*l_quantity) - avg(l_quantity)*avg(l_quantity), 2)
             - 3,
             4) + 0.0 AS kurt_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus
    """,
)
def ops_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STDDEV/VAR family + covariance/correlation + skew/kurtosis over
    a ROLLUP with grouping-bit identification. ROUND(·, 4) on BOTH
    sides: the moment aggregates are order-dependent in the last ~10
    ulps, and 4 digits is the reference's own comparison precision
    (TpcUtils.scala DecimalFormat "0.0000").

    Spark computes POPULATION excess kurtosis g2 = m4/m2² − 3 and
    population skewness g1 = m3/m2^1.5; DuckDB's skewness/kurtosis
    are the sample-adjusted G1/G2, so the oracle rebuilds Spark's
    definitions from raw moments instead. The gid column reproduces
    Spark's grouping_id() bit order.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.stddev_pop("l_quantity"), 4).alias("sdp_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.var_pop("l_quantity"), 4).alias("varp_qty"),
            F.round(
                F.covar_samp("l_quantity", "l_extendedprice"), 2
            ).alias("cov_qty_price"),
            F.round(
                F.covar_pop("l_quantity", "l_extendedprice"), 2
            ).alias("covp_qty_price"),
            # + 0.0 normalizes IEEE -0.0 to +0.0 (repr-level hash)
            (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + F.lit(0.0))
            .alias("corr_qty_price"),
            (F.round(F.skewness("l_quantity"), 4) + F.lit(0.0)).alias("skew_qty"),
            (F.round(F.kurtosis("l_quantity"), 4) + F.lit(0.0)).alias("kurt_qty"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE analog (reference StreamExecMatch.scala:68 — SURVEY
# §2.10): PATTERN (DOWN+ UP+) V-shape detection over per-user event
# series, AFTER MATCH SKIP PAST LAST ROW. The DataFrame composition
# (operators/match_recognize.py) is pure JVM window algebra, so the
# identical run-length SQL runs on DuckDB as the oracle.
# ---------------------------------------------------------------------------
@_q(
    "ops_match_recognize",
    """
    WITH c AS (
      SELECT user_id, ts, value,
             row_number() OVER w AS pos,
             CASE WHEN value < lag(value) OVER w THEN 'D'
                  WHEN value > lag(value) OVER w THEN 'U'
                  ELSE 'F' END AS dir
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT *, CASE WHEN lag(dir) OVER w2 IS NULL
                       OR lag(dir) OVER w2 <> dir
                     THEN 1 ELSE 0 END AS chg
      FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY pos)
    ), r AS (
      SELECT *, SUM(chg) OVER w2 AS run
      FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY pos)
    ), runs AS (
      SELECT user_id, run, min(dir) AS dir, min(pos) AS run_pos,
             arg_min(ts, pos) AS lo_o, arg_min(value, pos) AS lo_v,
             arg_max(ts, pos) AS hi_o, arg_max(value, pos) AS hi_v,
             count(*) AS n
      FROM r GROUP BY 1, 2
    ), paired AS (
      SELECT user_id, dir, lead(dir) OVER w3 AS ndir,
             lo_o, lo_v, hi_o, hi_v, n,
             lead(hi_o) OVER w3 AS nhi_o, lead(hi_v) OVER w3 AS nhi_v,
             lead(n) OVER w3 AS nn
      FROM runs WINDOW w3 AS (PARTITION BY user_id ORDER BY run_pos)
    )
    SELECT user_id, lo_o AS start_ts, hi_o AS bottom_ts, nhi_o AS end_ts,
           lo_v AS start_value, hi_v AS bottom_value, nhi_v AS end_value,
           n AS down_rows, nn AS up_rows
    FROM paired WHERE dir = 'D' AND ndir = 'U'
    ORDER BY user_id, start_ts
    """,
)
def ops_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-shape (DOWN+ UP+) pattern matches in each user's value
    series — the reference's MATCH_RECOGNIZE flagship example,
    re-expressed as run-length window algebra (no CEP NFA needed for
    batch; the generic regex form is operators.match_recognize)."""
    from ..operators import match_v_shapes

    e = load_table(spark, sf_dir, "events")
    return match_v_shapes(
        e, "user_id", ["ts", "event_id"], "value"
    ).orderBy("user_id", "start_ts")


@_q(
    "ops_approx_percentile",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           TRUE AS p50_ok,
           TRUE AS p95_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ops_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile (reference PercentileAggFunction family;
    Spark ships the same GK/KLL-style sketch as percentile_approx).

    Like ops_approx_count_distinct, the sketch output itself is
    approximate, so the hash-checkable output is the deterministic
    group count plus booleans asserting the rank of each estimate:
    the p50 estimate must cover rank 0.45-0.55 of its group, the p95
    estimate rank 0.90-1.0. The oracle emits the counts + literal
    TRUE; a wrong sketch (shifted ranks) flips the booleans."""
    e = load_table(spark, sf_dir, "events")
    ap = e.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95], 10000).alias("ap")
    )
    ranks = (
        e.join(ap, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(
                    (F.col("value") <= F.element_at("ap", 1)).cast("long")
                )
                / F.count(F.lit(1))
            ).alias("r50"),
            (
                F.sum(
                    (F.col("value") <= F.element_at("ap", 2)).cast("long")
                )
                / F.count(F.lit(1))
            ).alias("r95"),
        )
    )
    return ranks.select(
        "event_type",
        "n",
        F.col("r50").between(0.45, 0.55).alias("p50_ok"),
        F.col("r95").between(0.90, 1.0).alias("p95_ok"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Single-pass table profiling (data-quality summary; ANALYZE's
# queryable cousin — operators/profile.py)
# ---------------------------------------------------------------------------
@_q(
    "ops_table_profile",
    """
    SELECT 'doc_id' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           MIN(CAST(doc_id AS VARCHAR)) AS min_value,
           MAX(CAST(doc_id AS VARCHAR)) AS max_value
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT lang) AS BIGINT),
           MIN(CAST(lang AS VARCHAR)), MAX(CAST(lang AS VARCHAR))
    FROM documents
    UNION ALL
    SELECT 'source', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT source) AS BIGINT),
           MIN(CAST(source AS VARCHAR)), MAX(CAST(source AS VARCHAR))
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT n_chars) AS BIGINT),
           MIN(CAST(n_chars AS VARCHAR)), MAX(CAST(n_chars AS VARCHAR))
    FROM documents
    ORDER BY col_name
    """,
)
def ops_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/distinct/min/max profile of ``documents`` in
    ONE aggregation pass (multiple DISTINCT aggregates → one Expand,
    one scan) unpivoted via ``stack`` — operators/profile.py."""
    from ..operators.profile import profile_table

    d = load_table(spark, sf_dir, "documents")
    return profile_table(
        d, ["doc_id", "lang", "source", "n_chars"]
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketches (DataSketches HLL — the cluster
# rollup primitive: per-shard sketches union to the global answer
# without re-scanning; reference's HLL++ is estimate-only, no
# re-mergeable sketch surface)
# ---------------------------------------------------------------------------
@_q(
    "ops_hll_mergeable",
    """
    SELECT source, TRUE AS within_tolerance
    FROM (SELECT DISTINCT source FROM documents
          UNION ALL SELECT '__all__')
    ORDER BY source
    """,
)
def ops_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source HLL sketches over document content hashes, unioned
    into the corpus-wide sketch — the partial/merge topology every
    distributed distinct-count rollup runs at scale. Hard-gate
    invariant: every per-source estimate AND the merged estimate land
    within 5 % of the exact distinct count (computed in the same
    job); the oracle pins the group list. At lg_k=12 the observed
    error here is <1 %."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.md5("text").alias("h")
    )
    per = d.groupBy("source").agg(
        F.hll_sketch_agg("h").alias("sk"),
        F.count_distinct("h").alias("exact"),
    )
    per_rows = per.select(
        "source", F.hll_sketch_estimate("sk").alias("est"), "exact"
    )
    merged = per.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("__all__").alias("source"),
        F.hll_sketch_estimate("sk").alias("est"),
    )
    global_exact = d.agg(F.count_distinct("h").alias("exact"))
    all_row = merged.crossJoin(F.broadcast(global_exact))
    return (
        per_rows.unionByName(all_row)
        .select(
            "source",
            (
                F.abs(F.col("est") - F.col("exact"))
                / F.col("exact")
                <= 0.05
            ).alias("within_tolerance"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Sketch-based distinct-overlap estimate (inclusion-exclusion over
# mergeable HLL unions — the cross-corpus contamination estimator
# that never joins the two sides)
# ---------------------------------------------------------------------------
@_q(
    "ops_hll_overlap",
    """
    WITH a AS (SELECT DISTINCT md5(text) AS h FROM documents
               WHERE source IN ('src0','src1','src2','src3')),
    b AS (SELECT DISTINCT md5(text) AS h FROM documents
          WHERE source IN ('src2','src3','src4','src5'))
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
           TRUE AS overlap_ok
    """,
)
def ops_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-overlap estimate between two corpus slices via
    inclusion-exclusion over HLL sketches: |A∩B| ≈ est(A) + est(B)
    − est(A ∪ B), computed from three sketches with NO join between
    the sides — at 100 TB the two "sides" can live on different
    clusters and ship only their sketch bytes. Hard-gate invariant:
    the estimate lands within max(10 % of exact, 8 absolute) of the
    exact overlap (computed in-job); the oracle pins both side
    cardinalities. Exact overlap here ≈ a quarter of each side."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.md5("text").alias("h")
    )
    a = d.filter(F.col("source").isin("src0", "src1", "src2", "src3"))
    b = d.filter(F.col("source").isin("src2", "src3", "src4", "src5"))
    sk = (
        a.agg(
            F.hll_sketch_agg("h").alias("sk_a"),
            F.count_distinct("h").alias("n_a"),
        )
        .crossJoin(
            b.agg(
                F.hll_sketch_agg("h").alias("sk_b"),
                F.count_distinct("h").alias("n_b"),
            )
        )
        .crossJoin(
            a.unionAll(b).agg(F.hll_sketch_agg("h").alias("sk_u"))
        )
    )
    exact_overlap = (
        a.select("h").intersect(b.select("h")).count()
    )
    est = (
        F.hll_sketch_estimate("sk_a")
        + F.hll_sketch_estimate("sk_b")
        - F.hll_sketch_estimate("sk_u")
    )
    tol = F.greatest(F.lit(float(exact_overlap)) * 0.10, F.lit(8.0))
    return sk.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        (F.abs(est - F.lit(float(exact_overlap))) <= tol).alias(
            "overlap_ok"
        ),
    )


@_q(
    "ops_ks_drift",
    """
    WITH a AS (SELECT value AS v FROM events WHERE user_id % 2 = 0),
    b AS (SELECT value AS v FROM events WHERE user_id % 2 = 1),
    pv AS (
      SELECT v,
             CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM (SELECT v, 'a' AS side FROM a
            UNION ALL SELECT v, 'b' FROM b)
      GROUP BY v
    ),
    cum AS (
      SELECT v,
             sum(ca) OVER (ORDER BY v) AS cum_a,
             sum(cb) OVER (ORDER BY v) AS cum_b
      FROM pv
    )
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_old,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS n_new,
           round(max(abs(
             CAST(cum_a AS DOUBLE) / (SELECT count(*) FROM a)
             - CAST(cum_b AS DOUBLE) / (SELECT count(*) FROM b))), 6)
             AS ks_d
    FROM cum
    """,
)
def ops_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    even- and odd-user halves of the events value column, computed
    with the bucket-decomposed distributed prefix sum (no global
    sort; the oracle uses the textbook single-window form) —
    operators/drift.py:ks_statistic."""
    from ..operators.drift import ks_statistic

    e = load_table(spark, sf_dir, "events")
    return ks_statistic(
        e.filter(F.col("user_id") % 2 == 0),
        e.filter(F.col("user_id") % 2 == 1),
        "value",
    )


@_q(
    "ops_chi2_drift",
    """
    WITH oa AS (SELECT event_type AS c, CAST(count(*) AS BIGINT) AS ca
                FROM events WHERE user_id % 2 = 0 GROUP BY event_type),
    ob AS (SELECT event_type AS c, CAST(count(*) AS BIGINT) AS cb
           FROM events WHERE user_id % 2 = 1 GROUP BY event_type),
    j AS (
      SELECT COALESCE(oa.c, ob.c) AS c,
             COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
      FROM oa FULL JOIN ob ON oa.c = ob.c
    ),
    t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM j)
    SELECT CAST(max(na) AS BIGINT) AS n_old,
           CAST(max(nb) AS BIGINT) AS n_new,
           CAST(count(*) AS BIGINT) AS n_categories,
           round(CAST(sum(CAST(
             pow(ca - (ca + cb) * na / (na + nb), 2)
               / ((ca + cb) * na / (na + nb))
             + pow(cb - (ca + cb) * nb / (na + nb), 2)
               / ((ca + cb) * nb / (na + nb))
             AS DECIMAL(18,6))) AS DOUBLE), 4) AS chi2
    FROM j, t
    """,
)
def ops_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared homogeneity statistic over event_type
    frequencies of the even- vs odd-user halves (categorical drift,
    the KS companion; decimal-bridged term sum) —
    operators/drift.py:chi2_statistic."""
    from ..operators.drift import chi2_statistic

    e = load_table(spark, sf_dir, "events")
    return chi2_statistic(
        e.filter(F.col("user_id") % 2 == 0),
        e.filter(F.col("user_id") % 2 == 1),
        "event_type",
    )


@_q(
    "ops_psi_drift",
    """
    WITH a AS (SELECT value AS v FROM events WHERE user_id % 2 = 0),
    b AS (SELECT value AS v FROM events WHERE user_id % 2 = 1),
    rng AS (SELECT min(v) AS mn, max(v) AS mx FROM a),
    ba AS (
      SELECT CASE WHEN mx <= mn THEN 0 ELSE
               least(9, greatest(0, CAST(floor((v - mn) * 10 / (mx - mn))
                                         AS INTEGER))) END AS bin,
             CAST(count(*) AS BIGINT) AS ca
      FROM a, rng GROUP BY 1
    ),
    bb AS (
      SELECT CASE WHEN mx <= mn THEN 0 ELSE
               least(9, greatest(0, CAST(floor((v - mn) * 10 / (mx - mn))
                                         AS INTEGER))) END AS bin,
             CAST(count(*) AS BIGINT) AS cb
      FROM b, rng GROUP BY 1
    ),
    spine AS (SELECT unnest(range(10)) AS bin),
    j AS (
      SELECT spine.bin,
             COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
      FROM spine LEFT JOIN ba ON spine.bin = ba.bin
                 LEFT JOIN bb ON spine.bin = bb.bin
    ),
    t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM j)
    SELECT CAST(max(na) AS BIGINT) AS n_old,
           CAST(max(nb) AS BIGINT) AS n_new,
           round(CAST(sum(CAST(round(
             ((ca + 0.5) / (na + 5.0) - (cb + 0.5) / (nb + 5.0))
             * ln(((ca + 0.5) / (na + 5.0)) / ((cb + 0.5) / (nb + 5.0))),
             8) AS DECIMAL(18,8))) AS DOUBLE), 4) AS psi
    FROM j, t
    """,
)
def ops_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the even- and odd-user
    halves of the events value column (10 equal-width bins from the
    old side's exact min/max, Laplace-smoothed, decimal-bridged term
    sum) — operators/drift.py:psi_statistic."""
    from ..operators.drift import psi_statistic

    e = load_table(spark, sf_dir, "events")
    return psi_statistic(
        e.filter(F.col("user_id") % 2 == 0),
        e.filter(F.col("user_id") % 2 == 1),
        "value",
    )


# ---------------------------------------------------------------------------
# Mergeable frequent-items sketch (Misra-Gries heavy hitters —
# operators/sketch.py; the count counterpart of ops_hll_mergeable)
# ---------------------------------------------------------------------------
@_q(
    "ops_freq_items_sketch",
    """
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS item
      FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT item, CAST(count(*) AS BIGINT) AS true_cnt,
           TRUE AS bounds_ok
    FROM tok, tot
    GROUP BY item, n
    HAVING count(*) * 65 > n
    ORDER BY item
    """,
)
def ops_freq_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Misra-Gries heavy hitters over document tokens
    (k=64): per-partition Arrow-batched summaries, merged by one
    O(partitions × k) groupBy — never a full-vocabulary shuffle.
    Hard-gate invariant: every token with true count > n/(k+1)
    (computed exactly in-job; at most k such tokens can exist) is
    PRESENT in the sketch with 0 ≤ true − est ≤ n/(k+1). All
    comparisons are exact integer arithmetic (·65, no floats); the
    oracle pins the heavy-hitter set and true counts."""
    from ..datapipe.text import tokens
    from ..operators.sketch import frequent_items_sketch

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("item")
    )
    sk = frequent_items_sketch(toks, "item", k=64)
    exact = toks.groupBy("item").agg(F.count(F.lit(1)).alias("true_cnt"))
    n = toks.agg(F.count(F.lit(1)).alias("n"))
    hh = exact.crossJoin(F.broadcast(n)).filter(
        F.col("true_cnt") * 65 > F.col("n")
    )
    return (
        hh.join(sk, "item", "left")
        .select(
            "item",
            "true_cnt",
            (
                F.col("est").isNotNull()
                & (F.col("est") <= F.col("true_cnt"))
                & ((F.col("true_cnt") - F.col("est")) * 65 <= F.col("n"))
            ).alias("bounds_ok"),
        )
        .orderBy("item")
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (bottom-k-by-md5 uniform sample —
# operators/sketch.py; completes the sketch trio: HLL distinct,
# Misra-Gries frequency, bottom-k quantiles)
# ---------------------------------------------------------------------------
@_q(
    "ops_quantile_sketch",
    """
    WITH ranked AS (
      SELECT n_chars AS v, md5(CAST(doc_id AS VARCHAR)) AS rk
      FROM documents
    ),
    sk AS (SELECT v, rk FROM ranked ORDER BY rk, v LIMIT 64),
    est AS (SELECT CAST(quantile_cont(v, 0.5) AS DOUBLE) AS med,
                   CAST(quantile_cont(v, 0.9) AS DOUBLE) AS p90,
                   md5(string_agg(rk, ',' ORDER BY rk)) AS fp,
                   CAST(count(*) AS BIGINT) AS k
            FROM sk),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    ranks AS (SELECT
      (SELECT count(*) FROM documents, est WHERE n_chars <= med) AS le_med,
      (SELECT count(*) FROM documents, est WHERE n_chars <= p90) AS le_p90)
    SELECT est.k AS sketch_rows,
           TRUE AS merge_equals_whole,
           est.fp AS sample_fp,
           ROUND(est.med, 4) AS median_est,
           ROUND(est.p90, 4) AS p90_est,
           ABS(100.0 * ranks.le_med / tot.n - 50.0) <= 15.0 AS median_ok,
           ABS(100.0 * ranks.le_p90 / tot.n - 90.0) <= 15.0 AS p90_ok
    FROM est, tot, ranks
    """,
)
def ops_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile rollup: 4 per-slice bottom-64-by-md5
    sample sketches merged to the corpus sketch. The merge law
    sketch(A∪B) = bottom_k(sketch(A) ∪ sketch(B)) is a SET IDENTITY
    — asserted exactly against the whole-corpus sketch
    (merge_equals_whole) — and the sample itself is a pure function
    of the keys, so the oracle pins its md5 fingerprint and the
    interpolated median/p90 at full value; rank-tolerance flags pin
    the estimates within ±15 rank points of the true quantiles
    (uniform-64-sample error ≈ ±6)."""
    from ..operators.sketch import merge_quantile_sketches, quantile_sketch

    docs = load_table(spark, sf_dir, "documents")
    slices = [
        docs.filter(F.pmod("doc_id", F.lit(4)) == i) for i in range(4)
    ]
    merged = merge_quantile_sketches(
        [quantile_sketch(s, "n_chars", "doc_id", 64) for s in slices], 64
    )
    whole = quantile_sketch(docs, "n_chars", "doc_id", 64)
    merge_ok = sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    est = merged.agg(
        F.percentile("v", F.lit(0.5)).alias("med"),
        F.percentile("v", F.lit(0.9)).alias("p90"),
        F.md5(F.concat_ws(",", F.sort_array(F.collect_list("rk")))).alias(
            "fp"
        ),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    j = docs.crossJoin(F.broadcast(est)).crossJoin(F.broadcast(tot))
    return j.agg(
        F.first("k").alias("sketch_rows"),
        F.lit(merge_ok).alias("merge_equals_whole"),
        F.first("fp").alias("sample_fp"),
        F.round(F.first("med"), 4).alias("median_est"),
        F.round(F.first("p90"), 4).alias("p90_est"),
        (
            F.abs(
                F.sum((F.col("n_chars") <= F.col("med")).cast("int"))
                * 100.0
                / F.first("n")
                - 50.0
            )
            <= 15.0
        ).alias("median_ok"),
        (
            F.abs(
                F.sum((F.col("n_chars") <= F.col("p90")).cast("int"))
                * 100.0
                / F.first("n")
                - 90.0
            )
            <= 15.0
        ).alias("p90_ok"),
    )


def _memo_workdir(name: str, spark: SparkSession, sf_dir: str):
    """(memo_key, workdir) for queries that materialize side state at
    construction time: one run per (query, Spark app, sf_dir), the
    workdir removed at interpreter exit — same contract as the
    streaming_inv module's memoization."""
    import atexit as _atexit
    import shutil as _shutil
    import tempfile as _tempfile

    key = (name, spark.sparkContext.applicationId, sf_dir)
    work = _tempfile.mkdtemp(prefix=f"{name}_")
    _atexit.register(_shutil.rmtree, work, ignore_errors=True)
    return key, work


_SIDE_MEMO: dict[tuple[str, str, str], DataFrame] = {}


# ---------------------------------------------------------------------------
# MERGE INTO (lakehouse upsert on plain parquet — sources/merge.py;
# batch counterpart of the streaming upsert/retract sinks)
# ---------------------------------------------------------------------------
_MERGE_MEMO: dict[tuple[str, str], DataFrame] = {}


@_q(
    "ops_merge_into",
    """
    WITH target AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,6)) AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 4 != 0
    ),
    source AS (
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 2
                  AS DECIMAL(18,6)) AS o_totalprice,
             'M' AS o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT * FROM target WHERE o_orderkey % 2 != 0
      UNION ALL
      SELECT * FROM source
    )
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           o_orderstatus
    FROM merged
    WHERE o_orderkey % 3 != 0
    ORDER BY o_orderkey
    """,
)
def ops_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on a parquet table, both matched modes end-to-end:
    (1) update+insert — even-keyed source rows (price doubled, status
    'M') replace their targets, unmatched ones append; (2) delete —
    keys divisible by 3 are merged away. The oracle rebuilds the final
    table as pure SQL set algebra over ``orders``: target keys are
    % 4 != 0, so after update+insert the table is (odd target keys) ∪
    (all even source keys), minus the % 3 deletes. Every row is
    value-checked — sources/merge.py."""
    import atexit as _atexit
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..sources.merge import merge_into

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _MERGE_MEMO:
        return _MERGE_MEMO[key]

    work = _tempfile.mkdtemp(prefix="ops_merge_")
    _atexit.register(_shutil.rmtree, work, ignore_errors=True)
    tgt = _os.path.join(work, "target")
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,6)").alias("o_totalprice"),
        "o_orderstatus",
    )
    base.filter(F.col("o_orderkey") % 4 != 0).write.parquet(tgt)
    src = base.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") * 2)
        .cast("decimal(18,6)")
        .alias("o_totalprice"),
        F.lit("M").alias("o_orderstatus"),
    )
    merge_into(
        spark, tgt, src, ["o_orderkey"], when_matched="update", validate=True
    )
    dels = base.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey")
    merge_into(
        spark,
        tgt,
        dels,
        ["o_orderkey"],
        when_matched="delete",
        insert_not_matched=False,
    )
    _MERGE_MEMO[key] = (
        spark.read.parquet(tgt)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "o_orderstatus",
        )
        .orderBy("o_orderkey")
    )
    return _MERGE_MEMO[key]


@_q(
    "ops_merge_pruned",
    """
    WITH target AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,6)) AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 5 != 0
    ),
    source AS (
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 3
                  AS DECIMAL(18,6)) AS o_totalprice,
             'P' AS o_orderstatus
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    merged AS (
      SELECT * FROM target WHERE o_orderkey % 7 != 0
      UNION ALL
      SELECT * FROM source
    )
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           o_orderstatus
    FROM merged
    WHERE o_orderkey % 11 != 0
    ORDER BY o_orderkey
    """,
)
def ops_merge_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on the BUCKETED layout (partition-pruned
    copy-on-write — the 100 TB merge posture): the target is
    converted once to ``bucket=pmod(xxhash64(key),N)`` hive
    partitions, then the same two-mode sequence as ``ops_merge_into``
    runs against it — update+insert (keys % 7 == 0, price tripled,
    status 'P') followed by delete (% 11). Each merge rewrites ONLY
    the buckets the source keys hash into; the untouched-bucket
    physical invariant is gated in tests/test_sources.py. Oracle:
    the same set algebra over ``orders`` — the layout must be
    invisible to the logical result — sources/merge.py
    convert_to_bucketed/_merge_bucketed (reference anchor: the
    upsert-table contract of UpsertStreamTableSink.java, served at
    log-structured scale)."""
    import atexit as _atexit
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..sources.merge import (
        convert_to_bucketed,
        merge_into,
        read_merge_table,
    )

    key = (spark.sparkContext.applicationId, sf_dir, "pruned")
    if key in _MERGE_MEMO:
        return _MERGE_MEMO[key]

    work = _tempfile.mkdtemp(prefix="ops_merge_pruned_")
    _atexit.register(_shutil.rmtree, work, ignore_errors=True)
    tgt = _os.path.join(work, "target")
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,6)").alias("o_totalprice"),
        "o_orderstatus",
    )
    base.filter(F.col("o_orderkey") % 5 != 0).write.parquet(tgt)
    convert_to_bucketed(spark, tgt, ["o_orderkey"], n_buckets=16)
    src = base.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") * 3)
        .cast("decimal(18,6)")
        .alias("o_totalprice"),
        F.lit("P").alias("o_orderstatus"),
    )
    m = merge_into(
        spark, tgt, src, ["o_orderkey"], when_matched="update", validate=True
    )
    assert m["n_buckets"] == 16, m
    dels = base.filter(F.col("o_orderkey") % 11 == 0).select("o_orderkey")
    merge_into(
        spark,
        tgt,
        dels,
        ["o_orderkey"],
        when_matched="delete",
        insert_not_matched=False,
    )
    _MERGE_MEMO[key] = (
        read_merge_table(spark, tgt)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "o_orderstatus",
        )
        .orderBy("o_orderkey")
    )
    return _MERGE_MEMO[key]


# ---------------------------------------------------------------------------
# Semi-structured VARIANT access (Spark 4 parse_json/variant_get — the
# engine-native path for JSON event properties; the string-path
# JSON_VALUE analog is ev_json_histogram). Reference: Blink's
# JSON_VALUE/JSON_QUERY scalar functions (SqlJsonUtils.java) — VARIANT
# is the columnar-shredded upgrade of the same access pattern.
# ---------------------------------------------------------------------------
@_q(
    "ops_variant_json",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
           'OBJECT<k: BIGINT>' AS merged_schema
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ops_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON event properties through the VARIANT type: ``parse_json``
    once into the binary variant encoding, then typed path access
    (``variant_get($.k, int)``), missing-path NULL semantics
    (``try_variant_get``), and per-row ``schema_of_variant`` — the
    100 TB posture for semi-structured columns (parse once at ingest,
    shred/prune at scan; no per-expression re-parse like
    get_json_object). The oracle recomputes every value from DuckDB's
    JSON functions and pins the merged schema string."""
    e = load_table(spark, sf_dir, "events")
    rows = e.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.variant_get("v", "$.k", "int").alias("k"),
        F.try_variant_get("v", "$.missing", "string").alias("miss"),
        F.schema_of_variant("v").alias("sch"),
    )
    return (
        rows.groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.when(F.col("miss").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_missing"),
            F.min("sch").alias("merged_schema"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Collation-aware grouping (Spark 4 collated strings — locale/case
# rules pushed into the engine's comparators and hash, not rewritten
# as lower() by the user; Blink exposes the same via
# FlinkSqlOperatorTable collation-aware comparisons)
# ---------------------------------------------------------------------------
@_q(
    "ops_collated_group",
    """
    SELECT lower(lang) AS lang,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lower(lang)
    ORDER BY lang
    """,
)
def ops_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive GROUP BY via the UTF8_LCASE collation: half
    the rows are upper-cased in-flight, then grouped on the COLLATED
    column — the engine's hash/equality honor the collation, so the
    case-mixed values land in one group without a lower() rewrite.
    The oracle is the lower()-rewrite equivalent; a non-collated
    grouping would produce twice the rows and hash-mismatch."""
    d = load_table(spark, sf_dir, "documents")
    mixed = F.when(F.col("doc_id") % 2 == 0, F.upper("lang")).otherwise(
        F.col("lang")
    )
    return (
        d.select(
            F.collate(mixed, "UTF8_LCASE").alias("g"), "n_chars"
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            F.lower("g").cast("string").alias("lang"),
            "cnt",
            "total_chars",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Skew handling beyond AQE: static salting (operators/skew.py) —
# driver-gated equivalence with the plain join
# ---------------------------------------------------------------------------
@_q(
    "ops_skew_join",
    f"""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('l.l_quantity')} AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def ops_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈fact join (8 salt buckets: probe side scattered,
    build side replicated — the static fallback for the one-hot-key
    case AQE's skew split can't fix) must be EXACTLY the plain join:
    the driver value-checks the salted plan's aggregate against the
    unsalted SQL — operators/skew.py salted_join."""
    from ..operators.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(l, o, "o_orderkey", salt_buckets=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Bucketed fact⋈fact join (sources/bucketing.py) — the shuffle-free
# warehouse posture, driver-gated on VALUES (plan gate in
# tests/test_sources.py)
# ---------------------------------------------------------------------------
@_q(
    "ops_bucketed_join",
    f"""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('l.l_quantity')} AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def ops_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join through BUCKETED tables (both sides written
    bucketBy(8) on the order key, then joined shuffle-free — the
    posture that took h21's ×100 core from 22.3 s to 4.9 s). The
    driver value-checks the bucketed plan's result against the plain
    SQL join; the zero-exchange plan property is pytest-gated —
    sources/bucketing.py."""
    from ..sources.bucketing import bucket_table, bucketed_join_ready

    key = ("ops_bucketed_join", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os
        import shutil as _shutil
        from urllib.parse import urlparse as _urlparse

        # a previous session's managed-table directory blocks
        # saveAsTable (LOCATION_ALREADY_EXISTS) even after the
        # in-memory catalog forgot the table — drop both layers
        wh = _urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for t in ("ops_bkt_lineitem", "ops_bkt_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            _shutil.rmtree(_os.path.join(wh, t), ignore_errors=True)
        l = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        bucket_table(l, "ops_bkt_lineitem", ["o_orderkey"], 8)
        bucket_table(o, "ops_bkt_orders", ["o_orderkey"], 8)
        joined = bucketed_join_ready(
            spark, "ops_bkt_lineitem", "ops_bkt_orders", "o_orderkey"
        )
        _SIDE_MEMO[key] = (
            joined.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                dsum(F.col("l_quantity")).alias("sum_qty"),
            )
            .orderBy("o_orderpriority")
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# CSV source round trip (sources/csv.py, the CsvTableSource2 analog)
# — driver-gated: dsdgen-convention CSV must reload value-exact
# ---------------------------------------------------------------------------
@_q(
    "ops_csv_source",
    """
    SELECT r.r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           min(n.n_name) AS first_nation,
           max(n.n_name) AS last_nation
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def ops_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with the reference's dsdgen loading conventions
    (| delimiter, explicit schema, empty→NULL — CsvTableSource2.java:46,
    TpcDsBatchExecITCase.scala:59-61): nation and region written to
    CSV and read back through ``read_dsdgen_csv``, then joined — the
    reloaded values must be EXACTLY the parquet originals (the oracle
    runs on the base tables) — sources/csv.py."""
    from ..sources.csv import read_dsdgen_csv, write_csv

    key = ("ops_csv_source", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os

        _, work = _memo_workdir("ops_csv_source", spark, sf_dir)
        frames = {}
        for t in ("nation", "region"):
            base = load_table(spark, sf_dir, t)
            path = _os.path.join(work, t)
            write_csv(base, path)
            frames[t] = read_dsdgen_csv(spark, path, base.schema)
        n, r = frames["nation"].alias("n"), frames["region"].alias("r")
        _SIDE_MEMO[key] = (
            n.join(r, F.col("n.n_regionkey") == F.col("r.r_regionkey"))
            .groupBy("r.r_name")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_nations"),
                F.min("n.n_name").alias("first_nation"),
                F.max("n.n_name").alias("last_nation"),
            )
            .orderBy("r_name")
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# Avro source round trip (sources/avro.py, pure-python OCF) —
# driver-gated: binary-exact doubles through the Avro encoding
# ---------------------------------------------------------------------------
@_q(
    "ops_avro_source",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ops_avro_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro OCF round trip (deflate codec, pure-python encoder per the
    public Avro 1.11 spec): the events table written to Avro and read
    back must aggregate value-exactly like the parquet original —
    doubles are binary-exact through Avro's little-endian encoding —
    sources/avro.py."""
    from ..sources.avro import read_avro, write_avro

    key = ("ops_avro_source", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os

        _, work = _memo_workdir("ops_avro_source", spark, sf_dir)
        path = _os.path.join(work, "events_avro")
        e = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        write_avro(e, path)
        back = read_avro(spark, path)
        _SIDE_MEMO[key] = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                dsum(F.col("value")).alias("total"),
            )
            .orderBy("event_type")
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# ORC and JSON source round trips — with ops_csv_source and
# ops_avro_source, every §2.1 format row is driver-gated
# ---------------------------------------------------------------------------
@_q(
    "ops_orc_source",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ops_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round trip (built-in vectorized reader/writer): the events
    table written to ORC and read back must aggregate value-exactly
    like the parquet original."""
    key = ("ops_orc_source", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os

        _, work = _memo_workdir("ops_orc_source", spark, sf_dir)
        path = _os.path.join(work, "events_orc")
        e = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        e.write.orc(path)
        back = spark.read.orc(path)
        _SIDE_MEMO[key] = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                dsum(F.col("value")).alias("total"),
            )
            .orderBy("event_type")
        )
    return _SIDE_MEMO[key]


@_q(
    "ops_json_source",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ops_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines round trip with an EXPLICIT schema (never inferred —
    the reference registers fixed schemas): doubles survive via
    shortest-round-trip rendering, so the reloaded aggregate is
    value-exact."""
    key = ("ops_json_source", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os

        _, work = _memo_workdir("ops_json_source", spark, sf_dir)
        path = _os.path.join(work, "events_json")
        e = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        e.write.json(path)
        back = spark.read.schema(
            "event_id long, event_type string, value double"
        ).json(path)
        _SIDE_MEMO[key] = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                dsum(F.col("value")).alias("total"),
            )
            .orderBy("event_type")
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# Schema evolution (mergeSchema scan over drifting file schemas — the
# lakehouse reality every long-lived table hits: files written before
# a column existed read as NULL under the unified schema)
# ---------------------------------------------------------------------------
@_q(
    "ops_schema_evolution",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total,
           CAST(SUM(CASE WHEN event_id % 2 = 1
                         THEN CAST(json_extract_string(props, '$.k')
                                   AS INTEGER) END) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pre_evolution
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ops_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan: half the table is written WITHOUT the
    ``k`` column (the pre-evolution files), half with it, into one
    directory; a ``mergeSchema`` read unifies them — old rows surface
    k = NULL, new rows carry their value. The oracle reconstructs the
    same drift from the base table (CASE on the writing half), so the
    merged scan's NULL semantics are value-checked exactly."""
    key = ("ops_schema_evolution", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os

        _, work = _memo_workdir("ops_schema_evolution", spark, sf_dir)
        path = _os.path.join(work, "events_evolved")
        e = load_table(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            "value",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        e.filter(F.pmod("event_id", F.lit(2)) == 0).drop("k").write.parquet(
            path
        )
        e.filter(F.pmod("event_id", F.lit(2)) == 1).write.mode(
            "append"
        ).parquet(path)
        back = spark.read.option("mergeSchema", "true").parquet(path)
        _SIDE_MEMO[key] = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                dsum(F.col("value")).alias("total"),
                F.sum("k").cast("bigint").alias("sum_k"),
                F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_pre_evolution"),
            )
            .orderBy("event_type")
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# REST row-service connector (sources/restds.py — Spark 4 Python
# DataSource API): the service-connector contract the reference
# registers through its TableFactory SPI (Kafka/ES source+sink
# factories), exercised against a real in-process HTTP service —
# partitioned parallel reads + filter pushdown compiled over the wire
# ---------------------------------------------------------------------------
_REST_SERVERS: list = []  # keep services alive for the app lifetime


@_q(
    "ops_rest_source",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ops_rest_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REST connector round trip: the events table served over HTTP
    (JSON lines — doubles exact via shortest-round-trip reprs), read
    back through the ``flinkrest`` Python DataSource in 4 parallel
    partitions with the IN-filter PUSHED to the service (the
    executors fetch only qualifying rows; no Spark-side Filter node —
    plan-gated in tests/test_restds.py), then aggregated. Reference
    contract: KafkaTableSourceSinkFactory / the ES upsert sink's
    service-connector shape, re-expressed on Spark's public
    DataSource API."""
    from ..sources import restds

    key = ("ops_rest_source", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import atexit as _atexit

        e = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        rows = [
            {
                "event_id": r.event_id,
                "event_type": r.event_type,
                "value": r.value,
            }
            for r in e.collect()
        ]
        srv, url = restds.start_row_service(
            "event_id bigint, event_type string, value double", rows
        )
        _REST_SERVERS.append(srv)
        _atexit.register(srv.shutdown)
        restds.register(spark)
        back = (
            spark.read.format("flinkrest")
            .option("url", url)
            .option("numpartitions", "4")
            .load()
        )
        _SIDE_MEMO[key] = (
            back.filter(F.col("event_type").isin("click", "purchase"))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                dsum(F.col("value")).alias("total"),
            )
            .orderBy("event_type")
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# Catalog-table surface (partitioned saveAsTable + ANALYZE + partition
# pruning) — the catalog contract behind the reference's Hive/catalog
# connectors; the metastore-persistence half lives in
# sources/hive.py + tests/test_hive_metastore.py (static-conf bound,
# so it runs in a subprocess with a real Derby-backed HiveExternalCatalog)
# ---------------------------------------------------------------------------
@_q(
    "ops_catalog_table",
    f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('o_totalprice')} AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def ops_catalog_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned EXTERNAL catalog table: orders registered via
    ``partitionBy(o_orderstatus).saveAsTable`` (hive-style layout, one
    dir per status), ``ANALYZE TABLE ... COMPUTE STATISTICS`` recorded
    in the catalog, then a status-filtered aggregate that must
    partition-prune — the scan's PartitionFilters carry the predicate
    so only the 'F' directory is read (plan-gated in
    tests/test_catalog_table.py). Works against either catalog
    implementation; the Derby-backed HiveExternalCatalog variant is
    proven separately in tests/test_hive_metastore.py."""
    key = ("ops_catalog_table", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os
        import re as _re

        _, work = _memo_workdir("ops_catalog_table", spark, sf_dir)
        app = _re.sub(
            r"[^0-9a-zA-Z]", "_", spark.sparkContext.applicationId
        )
        tbl = f"ops_catalog_orders_{app}"
        o = load_table(spark, sf_dir, "orders")
        (
            o.write.partitionBy("o_orderstatus")
            .option("path", _os.path.join(work, "orders_part"))
            .saveAsTable(tbl)
        )
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
        _SIDE_MEMO[key] = (
            spark.table(tbl)
            .filter(F.col("o_orderstatus") == "F")
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                dsum(F.col("o_totalprice")).alias("total"),
            )
            .orderBy("o_orderpriority")
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# Native XML source (Spark 4 built-in, the spark-xml lineage): the
# remaining self-describing format after CSV/JSON/Avro/ORC — §2.1
# ---------------------------------------------------------------------------
@_q(
    "ops_xml_source",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('value')} AS total
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ops_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML round trip with an explicit read schema (never inferred):
    events written as <row> elements and read back must aggregate
    value-exactly — doubles survive via Java's shortest-round-trip
    Double.toString rendering."""
    key = ("ops_xml_source", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os

        _, work = _memo_workdir("ops_xml_source", spark, sf_dir)
        path = _os.path.join(work, "events_xml")
        e = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        e.write.format("xml").option("rootTag", "events").option(
            "rowTag", "row"
        ).save(path)
        back = (
            spark.read.format("xml")
            .option("rowTag", "row")
            .schema("event_id long, event_type string, value double")
            .load(path)
        )
        _SIDE_MEMO[key] = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                dsum(F.col("value")).alias("total"),
            )
            .orderBy("event_type")
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# SQL UDFs (CREATE FUNCTION ... RETURNS, Spark 4): declarative scalar
# + table functions that inline into the plan — the catalog-function
# counterpart of the reference's registered scalar UDF surface, with
# none of the serialization cost of external UDFs
# ---------------------------------------------------------------------------
@_q(
    "ops_sql_udf",
    f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}
             AS charged,
           CAST(SUM(CAST(l_quantity >= 25 AS INTEGER)) AS BIGINT) AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def ops_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs: ``charge(price, disc, tax)`` and
    ``is_bulk(qty)`` declared with CREATE TEMPORARY FUNCTION ...
    RETURN <expr> — Catalyst inlines the bodies, so the aggregate
    compiles to the same whole-stage-codegen plan as hand-written
    expressions (no Python boundary). The oracle inlines the same
    arithmetic."""
    key = ("ops_sql_udf", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION charge("
            "price DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE "
            "RETURN price * (1 - disc) * (1 + tax)"
        )
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION is_bulk(qty DOUBLE) "
            "RETURNS INT RETURN CAST(qty >= 25 AS INT)"
        )
        l = load_table(spark, sf_dir, "lineitem")
        l.createOrReplaceTempView("ops_sql_udf_lineitem")
        _SIDE_MEMO[key] = spark.sql(
            f"""
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS cnt,
                   {dsum_sql(
                       'charge(l_extendedprice, l_discount, l_tax)'
                   )} AS charged,
                   CAST(SUM(is_bulk(l_quantity)) AS BIGINT) AS n_bulk
            FROM ops_sql_udf_lineitem
            GROUP BY l_returnflag
            ORDER BY l_returnflag
            """
        )
    return _SIDE_MEMO[key]


@_q(
    "ops_sql_table_function",
    """
    SELECT m.bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM orders
    CROSS JOIN (SELECT UNNEST(range(3)) AS bucket) m
    WHERE CAST(o_orderkey AS BIGINT) % 3 = m.bucket
    GROUP BY m.bucket
    ORDER BY m.bucket
    """,
)
def ops_sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TABLE function (CREATE FUNCTION ... RETURNS TABLE):
    ``buckets(n)`` expands to n rows and participates in a lateral-
    style join — the declarative UDTF surface (§2.2 Correlate) with
    the body inlined by Catalyst. The oracle reproduces the expansion
    with a range() unnest."""
    key = (
        "ops_sql_table_function",
        spark.sparkContext.applicationId,
        sf_dir,
    )
    if key not in _SIDE_MEMO:
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION buckets(n INT) "
            "RETURNS TABLE(bucket BIGINT) "
            "RETURN SELECT explode(sequence(0, n - 1))"
        )
        o = load_table(spark, sf_dir, "orders")
        o.createOrReplaceTempView("ops_sql_tf_orders")
        _SIDE_MEMO[key] = spark.sql(
            """
            SELECT m.bucket, CAST(count(*) AS BIGINT) AS cnt
            FROM ops_sql_tf_orders, buckets(3) m
            WHERE o_orderkey % 3 = m.bucket
            GROUP BY m.bucket
            ORDER BY m.bucket
            """
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): gap-filled time spine — the
# densified rollup every calendar report needs; recursion generates
# the month spine, the fact aggregates FIRST (map-combined) so the
# join touches two month-sized sides
# ---------------------------------------------------------------------------
@_q(
    "ops_recursive_cte",
    """
    WITH RECURSIVE spine(m, hi) AS (
      SELECT date_trunc('month', min(o_orderdate)),
             date_trunc('month', max(o_orderdate))
      FROM orders
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi
      FROM spine WHERE m < hi
    ),
    monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             count(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT strftime(s.m, '%Y-%m') AS month,
           CAST(coalesce(monthly.n, 0) AS BIGINT) AS n_orders
    FROM spine s LEFT JOIN monthly ON monthly.m = s.m
    ORDER BY month
    """,
)
def ops_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month spine from min to max order month, LEFT
    JOINed to the pre-aggregated monthly order counts — months with
    no orders surface as 0 instead of vanishing. The recursion depth
    is the month span (~80), the join sides are month-sized; the only
    full-table work is one map-combined aggregate."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ops_rcte_orders")
    return spark.sql(
        """
        WITH RECURSIVE spine(m, hi) AS (
          SELECT trunc(min(o_orderdate), 'MM'),
                 trunc(max(o_orderdate), 'MM')
          FROM ops_rcte_orders
          UNION ALL
          SELECT add_months(m, 1), hi FROM spine WHERE m < hi
        ),
        monthly AS (
          SELECT trunc(o_orderdate, 'MM') AS m, count(*) AS n
          FROM ops_rcte_orders GROUP BY 1
        )
        SELECT date_format(s.m, 'yyyy-MM') AS month,
               CAST(coalesce(monthly.n, 0) AS BIGINT) AS n_orders
        FROM spine s LEFT JOIN monthly ON monthly.m = s.m
        ORDER BY month
        """
    )


# ---------------------------------------------------------------------------
# SQL session variables (Spark 4 DECLARE / SET VAR): the parameterized-
# query surface — a data-driven scalar computed once, then used as a
# plain literal-like reference in later statements
# ---------------------------------------------------------------------------
@_q(
    "ops_sql_variables",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS cnt
    FROM orders
    WHERE o_totalprice >
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                  / count(*) FROM orders)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def ops_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARE VARIABLE + SET VAR ... = (scalar subquery), then the
    variable used as a pushable filter constant: orders above the
    mean price, counted by status. The mean goes through the decimal
    bridge so both engines derive the bit-identical cutoff; the
    variable reference plans as a literal (filter pushdown intact)."""
    key = ("ops_sql_variables", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        o = load_table(spark, sf_dir, "orders")
        o.createOrReplaceTempView("ops_var_orders")
        spark.sql(
            "DECLARE OR REPLACE VARIABLE price_cutoff DOUBLE DEFAULT 0.0"
        )
        spark.sql(
            """
            SET VAR price_cutoff =
              (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                           AS DOUBLE) / count(*)
               FROM ops_var_orders)
            """
        )
        _SIDE_MEMO[key] = spark.sql(
            """
            SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt
            FROM ops_var_orders
            WHERE o_totalprice > price_cutoff
            GROUP BY o_orderstatus
            ORDER BY o_orderstatus
            """
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL (Spark 4): infer the grouping set from
# the select list — same text runs on DuckDB (the feature's origin)
# ---------------------------------------------------------------------------
@_q(
    "ops_group_by_all",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('o_totalprice')} AS total
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def ops_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL: the grouping keys inferred from
    the non-aggregate select items — byte-identical SQL on both
    engines."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ops_gba_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS cnt,
               {dsum_sql('o_totalprice')} AS total
        FROM ops_gba_orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# ---------------------------------------------------------------------------
# Aggregate FILTER clause (SQL:2003 <filter clause>; Calcite parses it
# for the reference's planner — AggregateCall.filterArg — and Spark 3+
# and DuckDB both execute it natively): per-group conditional
# aggregation without CASE rewrites. Byte-identical SQL on both
# engines.
# ---------------------------------------------------------------------------
@_q(
    "ops_agg_filter",
    f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt_all,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F')
                AS BIGINT) AS cnt_f,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                FILTER (WHERE o_orderstatus = 'O')
                AS DOUBLE) AS total_open,
           CAST(count(DISTINCT o_custkey)
                FILTER (WHERE o_totalprice > 150000)
                AS BIGINT) AS big_spenders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def ops_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 aggregate FILTER clause — plain, decimal-bridged, and
    DISTINCT aggregates each under their own predicate, in one
    grouped pass (Catalyst plans the distinct+filter mix as the same
    two-phase expand it uses for multi-distinct)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ops_aggf_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS cnt_all,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F')
                    AS BIGINT) AS cnt_f,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                    FILTER (WHERE o_orderstatus = 'O')
                    AS DOUBLE) AS total_open,
               CAST(count(DISTINCT o_custkey)
                    FILTER (WHERE o_totalprice > 150000)
                    AS BIGINT) AS big_spenders
        FROM ops_aggf_orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM — Calcite's
# IS_NOT_DISTINCT_FROM join conditions, which the reference's planner
# routes through BatchExecHashJoin's null-safe key path): NULL keys
# MATCH each other instead of vanishing from the join.
# ---------------------------------------------------------------------------
@_q(
    "ops_null_safe_join",
    """
    WITH a AS (
      SELECT NULLIF(o_orderstatus, 'F') AS k,
             CAST(count(*) AS BIGINT) AS cnt_o
      FROM orders GROUP BY 1
    ), b AS (
      SELECT NULLIF(l_linestatus, 'F') AS k,
             CAST(count(*) AS BIGINT) AS cnt_l
      FROM lineitem GROUP BY 1
    )
    SELECT a.k AS k, cnt_o, cnt_l
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY k NULLS FIRST
    """,
)
def ops_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join: NULLIF manufactures NULL keys on both
    sides, then ``eqNullSafe`` joins them — the NULL↔NULL pair
    survives (a plain equi-join would drop it), proving the planner
    treats <=> as a hashable key, not a residual filter."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = (
        o.groupBy(
            F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("k")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt_o"))
    )
    b = (
        li.groupBy(
            F.nullif(F.col("l_linestatus"), F.lit("F")).alias("k")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt_l"))
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]), "inner")
        .select(a["k"].alias("k"), "cnt_o", "cnt_l")
        .orderBy(F.col("k").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# ANSI interval arithmetic (the reference's TimestampPlus/Minus
# RexCalls over INTERVAL literals — planner ExpressionReducer folds
# them; Spark's year-month / day-time interval types execute them):
# timestamp ± day-time interval, date + year-month interval with
# end-of-month clamping — identical calendars on both engines.
# ---------------------------------------------------------------------------
@_q(
    "ops_interval_arith",
    """
    SELECT CAST(date_trunc('day', ts + INTERVAL 90 MINUTE) AS DATE)
             AS shifted_day,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(min(o_next) AS DATE) AS first_next
    FROM (
      SELECT e.ts,
             CAST(o.o_orderdate + INTERVAL 3 MONTH AS DATE) AS o_next
      FROM events e
      JOIN orders o ON o.o_orderkey % 10000 = e.event_id
    )
    GROUP BY 1 ORDER BY 1
    """,
)
def ops_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-time (ts + 90 minutes) and year-month (date + 3 months,
    calendar-clamped) interval arithmetic inside join/group/agg —
    exercised as DataFrame expressions, value-matched against the
    identical ANSI text in DuckDB."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    j = e.join(o, o["o_orderkey"] % 10000 == e["event_id"]).select(
        (F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("ts_p"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH"))
        .cast("date")
        .alias("o_next"),
    )
    return (
        j.groupBy(
            F.date_trunc("day", F.col("ts_p"))
            .cast("date")
            .alias("shifted_day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min("o_next").cast("date").alias("first_next"),
        )
        .orderBy("shifted_day")
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4, SQL:2023-adjacent |> operators): the same
# logical plan the classic form produces — a beyond-parity surface
# the reference's Calcite parser has no counterpart for. The oracle
# is the classic rendering; Catalyst compiles both to one plan.
# ---------------------------------------------------------------------------
@_q(
    "ops_sql_pipe",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(o_totalprice / 2 AS DECIMAL(18,6)))
                AS DOUBLE) AS half_total
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def ops_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax: FROM |> WHERE |> EXTEND |> AGGREGATE …
    GROUP BY |> ORDER BY — the linear form of the classic query the
    oracle runs; value-hash-identical because both lower to the same
    Catalyst plan."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ops_pipe_orders")
    return spark.sql(
        """
        FROM ops_pipe_orders
        |> WHERE o_orderstatus = 'O'
        |> EXTEND o_totalprice / 2 AS half_price
        |> AGGREGATE CAST(count(*) AS BIGINT) AS cnt,
                     CAST(SUM(CAST(half_price AS DECIMAL(18,6)))
                          AS DOUBLE) AS half_total
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Lateral column alias (Spark 3.4+ / DuckDB): a SELECT item referring
# to an alias defined earlier in the SAME select list — byte-identical
# text on both engines.
#
# Divisor MUST have a terminating decimal expansion (CORRECTNESS_r09
# red, root-caused in VERDICT r9): DuckDB evaluates DECIMAL / INTEGER
# in DOUBLE (typeof = DOUBLE, duckdb 1.0) and casts the binary result
# to DECIMAL(18,6); Spark divides exactly in decimal and HALF_UP
# rounds. With ``/ 7`` the true quotient is non-terminating, so rows
# whose 6th decimal digit sits near a rounding boundary flip between
# engines — data-dependent flakiness. With ``/ 8`` the true quotient
# terminates at 5 decimal digits (1/8 = 0.125), so it sits >= 5e-7
# from every scale-6 boundary while the double error is ~1e-11: both
# engines land on the identical value for every possible input.
# tests/test_oracle_lint.py bans the non-terminating class repo-wide.
#
# Output-type bridge (CORRECTNESS_r10 red, root-caused in VERDICT
# r10): even with bit-identical values, a DECIMAL-typed FINAL column
# diverges at the driver because DuckDB's pandas fetch coerces
# DECIMAL to float64 while Spark's toPandas keeps decimal.Decimal —
# the driver's canonicalizer renders the two differently. So the
# lateral-alias chain still computes in DECIMAL (the ÷8 fix above),
# but every final column is CAST to DOUBLE on BOTH engines (values
# terminate at ≤6 decimal digits — double-exact). The rule is now
# enforced registry-wide by tests/test_oracle_lint.py (no DECIMAL/
# ARRAY/MAP/STRUCT-typed final columns in suite entries).
# ---------------------------------------------------------------------------
@_q(
    "ops_lateral_alias",
    """
    SELECT o_orderkey,
           CAST(CAST(o_totalprice / 8 AS DECIMAL(18,6)) AS DOUBLE) AS eighth,
           CAST(eighth * 2 AS DOUBLE) AS quarter_half,
           CAST(quarter_half > 40000 AS BOOLEAN) AS is_big
    FROM orders
    ORDER BY o_orderkey
    LIMIT 100
    """,
)
def ops_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases: ``eighth`` and ``quarter_half`` are
    consumed by later items of the same select list (Catalyst
    rewrites to nested projects) — the identical text runs on DuckDB,
    where the feature originated."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ops_lca_orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(CAST(o_totalprice / 8 AS DECIMAL(18,6)) AS DOUBLE)
                   AS eighth,
               CAST(eighth * 2 AS DOUBLE) AS quarter_half,
               CAST(quarter_half > 40000 AS BOOLEAN) AS is_big
        FROM ops_lca_orders
        ORDER BY o_orderkey
        LIMIT 100
        """
    )


# ---------------------------------------------------------------------------
# Small-file compaction (sources/compact.py) under the driver gate:
# the operational rewrite every long-lived lake needs. The entry
# fragments orders into 64 undersized files, compacts them toward a
# size target, asserts IN-ENTRY that the file count actually dropped
# (the operator's whole point), and value-checks the compacted table
# against the pristine oracle — a lossy rewrite cannot hide.
# ---------------------------------------------------------------------------
@_q(
    "ops_compact_table",
    """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS price_sum
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def ops_compact_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment → compact → verify: 64 small files rewritten into
    size-targeted ones by one round-robin repartition (no shuffle
    key, no skew), rows preserved exactly."""
    key = ("ops_compact_table", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os

        from ..sources.compact import compact_parquet

        _, work = _memo_workdir("ops_compact_table", spark, sf_dir)
        frag = _os.path.join(work, "orders_fragmented")
        compacted = _os.path.join(work, "orders_compacted")
        o = load_table(spark, sf_dir, "orders")
        o.repartition(64).write.parquet(frag)
        manifest = compact_parquet(
            spark, frag, compacted, target_file_bytes=64 * 1024 * 1024
        )
        if manifest["dst_files"] >= manifest["src_files"]:
            raise AssertionError(
                f"compaction did not reduce file count: {manifest}"
            )
        back = spark.read.parquet(compacted)
        _SIDE_MEMO[key] = (
            back.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.sum("o_orderkey").cast("bigint").alias("key_sum"),
                dsum(F.col("o_totalprice")).alias("price_sum"),
            )
            .orderBy("o_orderstatus")
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# Hadoop SequenceFile round trip (the reference's flink-sequence-file
# format module + flink-hadoop-compatibility). Spark has no DataFrame
# source for SequenceFiles, so this is one of the rare legitimate RDD
# touchpoints: saveAsSequenceFile/sequenceFile speak the real Hadoop
# Writable container (org.apache.hadoop.io.Text via the bundled
# hadoop-client), then the rows re-enter the DataFrame world for the
# aggregation. At 100 TB the read parallelizes per HDFS block exactly
# like any Hadoop input format.
# ---------------------------------------------------------------------------
@_q(
    "ops_sequence_file",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def ops_sequence_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SequenceFile round trip: (orderkey, priority) written as
    Text/Text key-value records and read back must aggregate exactly
    (count + key checksum per priority)."""
    key = ("ops_sequence_file", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os

        _, work = _memo_workdir("ops_sequence_file", spark, sf_dir)
        path = _os.path.join(work, "orders_seq")
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        o.rdd.map(
            lambda r: (str(r["o_orderkey"]), r["o_orderpriority"])
        ).saveAsSequenceFile(path)
        back = spark.sparkContext.sequenceFile(
            path,
            "org.apache.hadoop.io.Text",
            "org.apache.hadoop.io.Text",
        )
        df = spark.createDataFrame(
            back, "o_orderkey string, o_orderpriority string"
        )
        _SIDE_MEMO[key] = (
            df.select(
                F.col("o_orderkey").cast("long").alias("k"),
                "o_orderpriority",
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.sum("k").cast("bigint").alias("key_sum"),
            )
            .orderBy("o_orderpriority")
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# Parameterized SQL (Spark 3.4+ named parameter markers / Spark 4
# EXECUTE IMMEDIATE ... USING): the Flink-side analog is the SQL
# client's statement-set parameter binding; the oracle runs the same
# query with the parameters inlined as literals (binding happens
# before planning, so the plans are identical).
# ---------------------------------------------------------------------------
@_q(
    "ops_parameterized_sql",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def ops_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named parameter markers: ``:minp`` / ``:st`` bound via
    ``spark.sql(..., args=...)`` — injection-safe server-side binding,
    value-identical to the literal-inlined oracle."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ops_param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
        FROM ops_param_orders
        WHERE o_totalprice > :minp AND o_orderstatus = :st
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"minp": 150000.0, "st": "O"},
    )


@_q(
    "ops_execute_immediate",
    """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt
    FROM orders
    WHERE o_totalprice > 200000.0
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def ops_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE with positional USING binding (Spark 4 /
    SQL-standard dynamic SQL): the statement text is itself a SQL
    value, parameters bound at execution."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ops_execimm_orders")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt
           FROM ops_execimm_orders
           WHERE o_totalprice > ?
           GROUP BY o_orderstatus
           ORDER BY o_orderstatus'
        USING 200000.0
        """
    )


@_q(
    "ops_order_by_all",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def ops_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL (+ GROUP BY ALL): the DuckDB-origin shorthand,
    byte-identical text on both engines; ALL expands to every select
    item in order, giving a total output order."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ops_oball_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(count(*) AS BIGINT) AS cnt
        FROM ops_oball_orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# ---------------------------------------------------------------------------
# Runtime bloom-filter join pruning (Spark's runtime-filter injection;
# the reference's closest analog is Blink's runtime filter pushdown
# work in the planner — at 100 TB this is the difference between
# shuffling the whole probe side and shuffling only rows that can
# join). The entry EXECUTES under the injected plan (gated in-entry:
# bloom_filter_agg must appear) and returns the value-checked result.
# ---------------------------------------------------------------------------
@_q(
    "ops_runtime_filter",
    f"""
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('l.l_quantity')} AS sum_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def ops_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction: the selective dim
    filter (urgent orders) is turned into a bloom filter applied to
    the fact scan BEFORE the join shuffle. Broadcast is disabled so
    the shuffle join is what the filter protects — the posture that
    matters when neither side broadcasts at 100 TB (the app-side
    size threshold is lowered only because sf0.01 is far below the
    10 GB default that would trigger naturally at scale). The plan
    is asserted to contain bloom_filter_agg, the result computed
    UNDER that plan, and confs restored."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).cast("long").alias("cnt"),
                dsum(F.col("l_quantity")).alias("sum_qty"),
            )
            .orderBy("l_returnflag")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, (
            "runtime bloom filter was not injected — plan gate failed"
        )
        rows = j.collect()  # executed UNDER the injected plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(
        rows, "l_returnflag string, cnt long, sum_qty double"
    )


# ---------------------------------------------------------------------------
# LIMIT ... OFFSET (Spark 3.4+ OFFSET clause; Calcite's fetch/offset
# on Sort — the reference's SortLimit carries both): pagination over
# a deterministic total order.
# ---------------------------------------------------------------------------
@_q(
    "ops_offset",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def ops_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET pagination under a unique total order — planned as
    GlobalLimit(offset+limit) over TakeOrdered, rows [100, 150)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


# ---------------------------------------------------------------------------
# INTERSECT ALL / EXCEPT ALL — the MULTISET variants (Calcite
# SqlSetOperator with all=true; the reference plans them through
# ranked joins): duplicate multiplicities follow bag semantics
# (min(m,n) for intersect, m−n clamped at 0 for except).
# ---------------------------------------------------------------------------
@_q(
    "ops_set_ops_all",
    """
    WITH returned AS (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ), finished AS (
      SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'
    )
    SELECT 'intersect_all' AS op, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT * FROM returned INTERSECT ALL SELECT * FROM finished) a
    UNION ALL
    SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT * FROM returned EXCEPT ALL SELECT * FROM finished) b
    ORDER BY op
    """,
)
def ops_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations: both inputs carry heavy
    duplicate multiplicities (suppkeys repeat across lineitems), so
    ALL-variant counts differ from the DISTINCT forms by
    construction — Catalyst plans both via the generate+join rewrite
    the reference expresses with ranked joins."""
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    finished = li.filter(F.col("l_linestatus") == "F").select("l_suppkey")
    parts = [
        returned.intersectAll(finished).agg(
            F.lit("intersect_all").alias("op"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        ),
        returned.exceptAll(finished).agg(
            F.lit("except_all").alias("op"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        ),
    ]
    return parts[0].unionByName(parts[1]).orderBy("op")


# ---------------------------------------------------------------------------
# IDENTIFIER() clause (Spark 3.5+): SQL-injection-safe parameterized
# table/column names — the constant-expression-to-identifier bridge
# a templated lakehouse job uses instead of string-splicing DDL/DML.
# DuckDB has no IDENTIFIER; the oracle is the resolved query.
# ---------------------------------------------------------------------------
@_q(
    "ops_identifier_clause",
    """
    SELECT l_linestatus,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def ops_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER('view_name') and IDENTIFIER('col') resolve
    string-typed constants into catalog/column references at analysis
    time — the Spark query is fully parameterized, the oracle is its
    resolution."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("ops_ident_lineitem")
    return spark.sql(
        """
        SELECT IDENTIFIER('l_linestatus'),
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(IDENTIFIER('l_extendedprice')
                             AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM IDENTIFIER('ops_ident_lineitem')
        GROUP BY IDENTIFIER('l_linestatus')
        ORDER BY IDENTIFIER('l_linestatus')
        """
    )


# ---------------------------------------------------------------------------
# UNION by NAME (Spark unionByName w/ allowMissingColumns; DuckDB's
# UNION ALL BY NAME — schema-evolution-tolerant stacking: columns
# align by name, absent ones become NULL).
# ---------------------------------------------------------------------------
@_q(
    "ops_union_by_name",
    """
    WITH a AS (
      SELECT o_orderkey AS k, o_totalprice AS price
      FROM orders WHERE o_orderstatus = 'P'
    ), b AS (
      SELECT l_extendedprice AS price, l_orderkey AS k,
             l_quantity AS qty
      FROM lineitem WHERE l_orderkey % 997 = 0
    )
    SELECT k, price, qty
    FROM (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b) u
    ORDER BY k, price, qty NULLS FIRST
    """,
)
def ops_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-aligned union across mismatched schemas (different column
    order, one side missing `qty`) — Spark's
    unionByName(allowMissingColumns=True) vs DuckDB's native
    UNION ALL BY NAME; the missing column is NULL-filled on the
    narrow side."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
    )
    b = li.filter(F.col("l_orderkey") % 997 == 0).select(
        F.col("l_extendedprice").alias("price"),
        F.col("l_orderkey").alias("k"),
        F.col("l_quantity").alias("qty"),
    )
    return a.unionByName(b, allowMissingColumns=True).orderBy(
        "k", "price", F.col("qty").asc_nulls_first()
    )


# ---------------------------------------------------------------------------
# LISTAGG WITHIN GROUP (SQL:2016 ordered string aggregation — Spark
# 4.0's listagg; the reference exposes it via Calcite's LISTAGG,
# flink-table planner aggfunctions). Distinct from ops_collect_aggs:
# this is the standard syntax with DUPLICATES RETAINED and an explicit
# WITHIN GROUP order, plus the DISTINCT form — not a collect_set
# rendering. DuckDB's equivalent spelling is string_agg(... ORDER BY).
# ---------------------------------------------------------------------------
@_q(
    "ops_listagg",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           string_agg(DISTINCT substr(n_name, 1, 1), ''
                      ORDER BY substr(n_name, 1, 1)) AS initials
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def ops_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg(...) WITHIN GROUP (ORDER BY ...): duplicates retained,
    deterministic order; the DISTINCT form dedups before joining.
    Whole-stage codegen aggregate on the JVM — no UDF."""
    n = load_table(spark, sf_dir, "nation")
    n.createOrReplaceTempView("ops_listagg_nation")
    return spark.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                   AS nations_csv,
               listagg(DISTINCT substr(n_name, 1, 1), '')
                   WITHIN GROUP (ORDER BY substr(n_name, 1, 1))
                   AS initials
        FROM ops_listagg_nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
        """
    )


# ---------------------------------------------------------------------------
# Ordered-set aggregates (SQL:2008 WITHIN GROUP family): PERCENTILE_CONT
# (linear interpolation), PERCENTILE_DISC (smallest value with
# cume_dist >= p), MODE. Reference: Calcite's ordered-set agg surface
# in the Blink planner.
#
# percentile_cont bit-exactness: both engines interpolate as
# ``lo + (hi - lo) * frac`` in double arithmetic, so the driver's
# full-precision repr hash cannot flake (seeded adversarial property
# test: tests/test_operators.py::test_percentile_cont_bit_exact_...).
#
# mode() determinism: engines break ties differently, and the
# synthetic lineitem is near-uniform in every raw column (ties DO
# occur at sf0.001 — measured), so the modal column is derived with a
# guaranteed-majority value: quantities <= 25 collapse to -1 (~50 %
# of rows), every surviving raw value keeps ~2 % — the mode is -1 by
# an enormous structural margin, while MODE still aggregates a
# 26-valued multiset per group.
# ---------------------------------------------------------------------------
@_q(
    "ops_ordered_set_aggs",
    """
    SELECT l_returnflag,
           CAST(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5)
                AS DOUBLE) AS median_qty,
           CAST(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9)
                AS DOUBLE) AS p90_price,
           CAST(quantile_disc(CAST(l_quantity AS DOUBLE), 0.25)
                AS DOUBLE) AS q1_qty_disc,
           CAST(mode(CASE WHEN l_quantity <= 25 THEN -1
                          ELSE CAST(l_quantity AS BIGINT) END)
                AS BIGINT) AS mode_bucket
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def ops_ordered_set_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_CONT / PERCENTILE_DISC / MODE via the standard
    WITHIN GROUP syntax; exact (sort-based) percentiles, not the
    approx_percentile sketch — the oracle uses DuckDB's quantile
    spellings of the same definitions."""
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("ops_osa_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(percentile_cont(0.5) WITHIN GROUP
                    (ORDER BY CAST(l_quantity AS DOUBLE))
                    AS DOUBLE) AS median_qty,
               CAST(percentile_cont(0.9) WITHIN GROUP
                    (ORDER BY CAST(l_extendedprice AS DOUBLE))
                    AS DOUBLE) AS p90_price,
               CAST(percentile_disc(0.25) WITHIN GROUP
                    (ORDER BY CAST(l_quantity AS DOUBLE))
                    AS DOUBLE) AS q1_qty_disc,
               CAST(mode(CASE WHEN l_quantity <= 25 THEN -1
                              ELSE CAST(l_quantity AS BIGINT) END)
                    AS BIGINT) AS mode_bucket
        FROM ops_osa_lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# Z-order clustering rewrite (sources/zorder.py): multi-dimensional
# file skipping — the Delta OPTIMIZE ZORDER BY / Iceberg sort-order
# rewrite surface. The entry rewrites lineitem clustered on
# (l_partkey, l_orderkey), PROVES the skipping property in-entry from
# parquet footer statistics (a partkey box spanning 1/16 of the
# domain must prune >= half the z-ordered files while touching EVERY
# file of an orderkey-sorted control layout — the non-leading-
# dimension case that motivates z-order at all), proves losslessness
# (row count), and value-checks a two-sided box query against the
# pristine oracle — the layout must be invisible to query results.
# ---------------------------------------------------------------------------
@_q(
    "ops_zorder_cluster",
    """
    SELECT l_orderkey, CAST(l_partkey AS BIGINT) AS partkey,
           CAST(l_suppkey AS BIGINT) AS suppkey,
           CAST(l_quantity AS DOUBLE) AS qty
    FROM lineitem
    WHERE l_partkey <= 100 AND l_orderkey <= 5000
    ORDER BY l_orderkey, partkey, suppkey, qty
    """,
)
def ops_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ... ZORDER BY (l_partkey, l_orderkey): quantile-rank
    Morton-key range-partitioned rewrite (sources/zorder.py, skew-
    proof bucketing); footer-stats pruning asserted against a
    single-column-sorted control layout."""
    key = ("ops_zorder_cluster", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os

        from ..sources.zorder import files_touched, write_zordered

        _, work = _memo_workdir("ops_zorder_cluster", spark, sf_dir)
        zdst = _os.path.join(work, "lineitem_z")
        ldst = _os.path.join(work, "lineitem_linear")
        l = load_table(spark, sf_dir, "lineitem")
        n_files = 32
        write_zordered(l, zdst, ["l_partkey", "l_orderkey"], n_files=n_files)
        # control: the classic single-column layout (sorted by the
        # OTHER dimension), same file count
        (
            l.repartitionByRange(n_files, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.mode("overwrite")
            .parquet(ldst)
        )
        # skipping property on the non-leading dimension: a partkey
        # box spanning 1/16 of the domain
        b = l.agg(
            F.min("l_partkey").alias("lo"), F.max("l_partkey").alias("hi")
        ).collect()[0]
        box_hi = b.lo + max(1, (b.hi - b.lo) // 16)
        z_t, z_n = files_touched(zdst, "l_partkey", b.lo, box_hi)
        lin_t, lin_n = files_touched(ldst, "l_partkey", b.lo, box_hi)
        if not (z_t * 2 <= z_n and lin_t == lin_n):
            raise AssertionError(
                f"z-order skipping property failed: z {z_t}/{z_n}, "
                f"linear {lin_t}/{lin_n}"
            )
        back = spark.read.parquet(zdst)
        if back.count() != l.count():
            raise AssertionError("z-order rewrite lost rows")
        _SIDE_MEMO[key] = (
            back.filter(
                (F.col("l_partkey") <= 100) & (F.col("l_orderkey") <= 5000)
            )
            .select(
                "l_orderkey",
                F.col("l_partkey").cast("bigint").alias("partkey"),
                F.col("l_suppkey").cast("bigint").alias("suppkey"),
                F.col("l_quantity").cast("double").alias("qty"),
            )
            .orderBy("l_orderkey", "partkey", "suppkey", "qty")
        )
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# Materialized-view aggregate rewrite (plans/mv.py): the Calcite
# MaterializedViewAggregateRule surface the Blink planner inherits.
# The entry materializes a 3-key rollup of lineitem, answers a
# 1-key aggregate query THROUGH the rewriter, plan-gates IN-ENTRY
# that the physical scan reads the MV parquet and never the base
# table, and value-checks against the oracle running directly on the
# base — the rewrite must be semantically invisible. Freshness under
# a changelog is the already-gated IVM surface (st_incremental_rollup,
# st_join_view); this entry is the read-side rule.
# ---------------------------------------------------------------------------
@_q(
    "ops_mv_rewrite",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS DOUBLE) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def ops_mv_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate query answered from a registered MV: group-by subset
    + decomposable-measure re-aggregation (AVG via sum/count split);
    the base table is provably untouched (plan-gated)."""
    key = ("ops_mv_rewrite", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os

        from ..plans.checks import explain_text
        from ..plans.mv import MvCatalog, create_mv

        _, work = _memo_workdir("ops_mv_rewrite", spark, sf_dir)
        path = _os.path.join(work, "mv_lineitem_rollup")
        l = load_table(spark, sf_dir, "lineitem").withColumn(
            "qty_dec", F.col("l_quantity").cast("decimal(18,6)")
        )
        cat = MvCatalog()
        cat.register(
            create_mv(
                spark,
                "mv_lineitem_rollup",
                "lineitem",
                l,
                path,
                ["l_returnflag", "l_linestatus", "l_linenumber"],
                {
                    "sum_qty_dec": ("sum", "qty_dec"),
                    "cnt_qty_dec": ("count", "qty_dec"),
                    "min_price": ("min", "l_extendedprice"),
                    "max_price": ("max", "l_extendedprice"),
                },
            )
        )
        got = cat.try_rewrite(
            spark,
            "lineitem",
            ["l_returnflag"],
            {
                "sum_qty_raw": ("sum", "qty_dec"),
                "cnt": ("count", None),
                "min_price": ("min", "l_extendedprice"),
                "max_price": ("max", "l_extendedprice"),
                "avg_qty": ("avg", "qty_dec"),
            },
        )
        if got is None:
            raise AssertionError("MV rewrite did not match")
        plan = explain_text(got)
        if "mv_lineitem_rollup" not in plan or "lineitem.parquet" in plan:
            raise AssertionError(
                "MV rewrite plan still touches the base table"
            )
        # sum_qty rides the repo's decimal bridge (CAST AS DOUBLE):
        # the exact decimal sum terminates at 6 digits and is far
        # below 2^53, so the cast is value-exact on both engines —
        # a DECIMAL-typed final column would diverge at the driver's
        # pandas canonicalization (CORRECTNESS_r10 red).
        _SIDE_MEMO[key] = got.select(
            "l_returnflag",
            F.col("sum_qty_raw").cast("double").alias("sum_qty"),
            "cnt",
            F.col("min_price").cast("double").alias("min_price"),
            F.col("max_price").cast("double").alias("max_price"),
            (
                F.col("sum_qty_raw").cast("double")
                / F.col("cnt").cast("double")
            ).alias("avg_qty"),
        ).orderBy("l_returnflag")
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# Count-min sketch (operators/sketch.py): the fourth classic sketch
# next to the HLL / Misra-Gries / bottom-k-quantile trio — point
# FREQUENCY estimates from an O(depth x width) counter table,
# mergeable by plain cell-wise sum. The hash family rides the
# engine-portable md5 bridge, so the oracle replays the exact sketch
# (cells, probes, minima) in SQL. In-entry property check: every
# estimate bounds its true count from above (CMS can only over-count).
# ---------------------------------------------------------------------------
_CMS_KEYS = [
    "column", "join", "key", "merge", "qzxv", "scan", "value", "window",
]
_CMS_KEYS_SQL = ", ".join(f"'{k}'" for k in _CMS_KEYS)


@_q(
    "ops_countmin_sketch",
    f"""
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS k
      FROM documents
    ),
    per AS (SELECT k, CAST(count(*) AS BIGINT) AS w FROM tok GROUP BY k),
    rows_ AS (SELECT CAST(g AS BIGINT) AS row FROM generate_series(0, 3) s(g)),
    cells AS (
      SELECT rows_.row,
             CAST(CAST(concat('0x',
                    substr(md5(concat(rows_.row, ':', per.k)), 1, 8))
                  AS UBIGINT) % 256 AS BIGINT) AS bucket,
             per.w
      FROM per, rows_
    ),
    sk AS (
      SELECT row, bucket, CAST(sum(w) AS BIGINT) AS cnt
      FROM cells GROUP BY row, bucket
    ),
    q AS (SELECT unnest([{_CMS_KEYS_SQL}]) AS k),
    probes AS (
      SELECT q.k, rows_.row,
             CAST(CAST(concat('0x',
                    substr(md5(concat(rows_.row, ':', q.k)), 1, 8))
                  AS UBIGINT) % 256 AS BIGINT) AS bucket
      FROM q, rows_
    )
    SELECT k, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS cms_estimate
    FROM probes LEFT JOIN sk USING (row, bucket)
    GROUP BY k
    ORDER BY k
    """,
)
def ops_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS over the documents token stream (depth 4, width 256):
    build once per distinct token, probe 8 fixed keys (one absent),
    estimates asserted >= exact counts in-entry."""
    from ..operators.sketch import count_min_build, count_min_query

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("k")
    )
    # Tokenize once: the per-key count table (vocabulary-sized) feeds
    # BOTH the sketch build (as pre-aggregated weights) and the exact
    # counts for the in-entry lower-bound gate — previously each path
    # re-ran the corpus tokenize, and the gate's count() action plus
    # the caller's collect re-ran everything again.
    per = (
        toks.groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .localCheckpoint(eager=True)
    )
    sketch = count_min_build(per, "k", weight_col="w", depth=4, width=256)
    est = count_min_query(sketch, _CMS_KEYS, depth=4, width=256)
    exact = per.filter(F.col("k").isin(_CMS_KEYS)).select(
        "k", F.col("w").alias("true_cnt")
    )
    viol = (
        est.join(exact, "k", "left")
        .filter(
            F.col("cms_estimate")
            < F.coalesce(F.col("true_cnt"), F.lit(0))
        )
        .count()
    )
    if viol:
        raise AssertionError("CMS under-counted — impossible by design")
    return est.orderBy("k")


# ---------------------------------------------------------------------------
# TIME data type (Spark 4.1, behind spark.sql.timeType.enabled): the
# SQL-standard time-of-day type the reference supports natively
# (Flink's TIME WITHOUT TIME ZONE, LogicalTypeRoot.TIME_WITHOUT_TIME_
# ZONE). Spark 4.1 cannot yet cast TIMESTAMP -> TIME directly, so the
# extraction rides a formatted-string bridge (microsecond precision
# preserved — verified value-identical to DuckDB's native
# CAST(ts AS TIME) on this data). The entry enables the flag itself:
# the driver's session is vanilla. TIME values aggregate (min/max),
# group and order like any other atomic type.
# ---------------------------------------------------------------------------
@_q(
    "ops_time_type",
    """
    SELECT CAST(hour(CAST(ts AS TIME)) AS INTEGER) AS h,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(min(CAST(ts AS TIME)) AS VARCHAR) AS first_t,
           CAST(max(CAST(ts AS TIME)) AS VARCHAR) AS last_t
    FROM events
    GROUP BY h
    ORDER BY h
    """,
)
def ops_time_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-typed time-of-day rollup: extract, group by hour, min/max
    TIME per hour — the time-without-date class of the reference's
    type system.

    Session hygiene (ADVICE r10): the flag used to stay set on the
    driver's shared session, a cross-entry side effect. It cannot
    simply be restored after building the plan — execution
    RE-analyzes it (UNSUPPORTED_TIME_TYPE at collect even when TIME
    is only intermediate; verified on 4.1) — so the 24-row rollup is
    materialized inside the flag-on scope and returned as a local
    DataFrame, TIME values rendered to their ISO text (identical to
    DuckDB's TIME→VARCHAR rendering: micros iff nonzero). The TIME
    feature itself — cast, group, min/max over TIME — still runs
    distributed under the flag; only the 24-row result crosses."""
    prev = None
    try:
        prev = spark.conf.get("spark.sql.timeType.enabled")
    except Exception:
        prev = None
    spark.conf.set("spark.sql.timeType.enabled", "true")
    try:
        e = load_table(spark, sf_dir, "events")
        e.createOrReplaceTempView("ops_time_events")
        rows = spark.sql(
            """
            SELECT CAST(hour(t) AS INT) AS h,
                   CAST(count(*) AS BIGINT) AS cnt,
                   min(t) AS first_t,
                   max(t) AS last_t
            FROM (
              SELECT CAST(date_format(ts, 'HH:mm:ss.SSSSSS') AS TIME) AS t
              FROM ops_time_events
            )
            GROUP BY h
            ORDER BY h
            """
        ).collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.timeType.enabled")
        else:
            spark.conf.set("spark.sql.timeType.enabled", prev)
    def _tstr(t) -> str:
        # DuckDB's TIME→VARCHAR trims trailing fractional zeros
        # ('10:00:23.3766'); Python isoformat pads to 6 ('…376600').
        s = t.isoformat()
        return s.rstrip("0").rstrip(".") if "." in s else s

    return spark.createDataFrame(
        [(r.h, r.cnt, _tstr(r.first_t), _tstr(r.last_t)) for r in rows],
        "h int, cnt bigint, first_t string, last_t string",
    ).orderBy("h")


# ---------------------------------------------------------------------------
# MV freshness under an insert delta (plans/mv.py:apply_insert_delta):
# the write-path half of the MV lifecycle. Build the rollup from 3/4
# of lineitem, fold the remaining 1/4 in as an insert-only delta
# (O(delta + groups), base never rescanned), answer the query through
# the rewriter, value-check against the oracle running on the FULL
# base — a stale or mis-merged MV cannot hash-match.
# ---------------------------------------------------------------------------
@_q(
    "ops_mv_incremental",
    """
    SELECT l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def ops_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV built from a prefix, kept fresh by delta folding, queried
    through the rewrite rule — create / maintain / serve end-to-end."""
    key = ("ops_mv_incremental", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import os as _os

        from ..plans.mv import MvCatalog, apply_insert_delta, create_mv

        _, work = _memo_workdir("ops_mv_incremental", spark, sf_dir)
        path = _os.path.join(work, "mv_inc")
        l = load_table(spark, sf_dir, "lineitem").withColumn(
            "qty_dec", F.col("l_quantity").cast("decimal(18,6)")
        )
        head = l.filter(F.pmod("l_orderkey", F.lit(4)) != 0)
        delta = l.filter(F.pmod("l_orderkey", F.lit(4)) == 0)
        cat = MvCatalog()
        mv = create_mv(
            spark,
            "mv_inc",
            "lineitem",
            head,
            path,
            ["l_returnflag", "l_linestatus"],
            {
                "s": ("sum", "qty_dec"),
                "mn": ("min", "l_extendedprice"),
                "mx": ("max", "l_extendedprice"),
            },
        )
        cat.register(mv)
        apply_insert_delta(spark, mv, delta)
        got = cat.try_rewrite(
            spark,
            "lineitem",
            ["l_linestatus"],
            {
                "sum_qty_raw": ("sum", "qty_dec"),
                "cnt": ("count", None),
                "min_price": ("min", "l_extendedprice"),
                "max_price": ("max", "l_extendedprice"),
            },
        )
        if got is None:
            raise AssertionError("MV rewrite did not match")
        # CAST AS DOUBLE = the decimal bridge (see ops_mv_rewrite).
        _SIDE_MEMO[key] = got.select(
            "l_linestatus",
            F.col("sum_qty_raw").cast("double").alias("sum_qty"),
            "cnt",
            F.col("min_price").cast("double").alias("min_price"),
            F.col("max_price").cast("double").alias("max_price"),
        ).orderBy("l_linestatus")
    return _SIDE_MEMO[key]


# ---------------------------------------------------------------------------
# Moving (windowed) MEDIAN — the order-statistic-over-sliding-frame
# class Spark has no native window aggregate for: expressed as
# sort_array(collect_list) over the frame + element_at of the
# ceil(n/2)-th element (PERCENTILE_DISC(0.5) semantics — the smallest
# value with cumulative share >= 1/2, discrete, so results are exact
# elements and engine-comparison is never an interpolation question).
# Frame size is bounded (3 PRECEDING), so the per-row collected array
# is O(4) — this is NOT the unbounded-collect antipattern.
# ---------------------------------------------------------------------------
@_q(
    "ops_moving_median",
    """
    SELECT user_id, event_id,
           CAST(quantile_disc(value, 0.5) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS mov_median
    FROM events
    WHERE user_id % 50 = 0
    ORDER BY user_id, event_id
    """,
)
def ops_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC(0.5) over a 4-row sliding frame per user."""
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 50 == 0
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, W.currentRow)
    )
    frame = F.sort_array(F.collect_list("value").over(w))
    median = F.element_at(
        frame, F.ceil(F.size(frame) * 0.5).cast("int")
    )
    return (
        e.select(
            "user_id",
            "event_id",
            median.cast("double").alias("mov_median"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension build (slowly-changing dimension, the
# classic warehouse versioning op): a change stream becomes validity
# intervals — valid_from = the change's timestamp, valid_to = the
# NEXT change's timestamp for the same key (NULL while current),
# is_current on the open row. One window (lead over ts per key), no
# self-join. The entry versions each user's event history and probes
# it with the interval arithmetic every downstream as-of join relies
# on (duration of each closed version, count of open rows == count
# of keys).
# ---------------------------------------------------------------------------
@_q(
    "ops_scd2_dimension",
    """
    WITH versions AS (
      SELECT user_id, event_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM events
    )
    SELECT user_id, event_id, event_type, valid_from, valid_to,
           CAST(valid_to IS NULL AS BOOLEAN) AS is_current,
           CAST(CASE WHEN valid_to IS NOT NULL
                     THEN date_diff('second', valid_from, valid_to)
                END AS BIGINT) AS version_seconds
    FROM versions
    WHERE user_id % 25 = 0
    ORDER BY user_id, valid_from, event_id
    """,
)
def ops_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change stream -> versioned dimension rows with
    [valid_from, valid_to) intervals and a current-row flag."""
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    out = (
        e.withColumn("valid_to", F.lead("ts").over(w))
        .filter(F.col("user_id") % 25 == 0)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
            F.when(
                F.col("valid_to").isNotNull(),
                (
                    F.col("valid_to").cast("long")
                    - F.col("ts").cast("long")
                ),
            )
            .cast("bigint")
            .alias("version_seconds"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )
    return out


# ---------------------------------------------------------------------------
# FORWARD as-of join (operators/joins.py asof_join
# direction="forward"): for each purchase, the NEXT view event by the
# same user at or after the purchase time — the pandas merge_asof
# direction=forward contract, still one shuffle + one ordered window
# scan (never the O(n*m) inequality join). The DuckDB oracle uses a
# window over the tagged union (DuckDB's native ASOF is
# backward-only), mirroring the operator's own strategy text.
# ---------------------------------------------------------------------------
@_q(
    "ops_asof_forward",
    """
    WITH tagged AS (
      SELECT user_id, ts, 0 AS side, event_id, NULL::BIGINT AS view_id
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 1 AS side, NULL, event_id
      FROM events WHERE event_type = 'view'
    ),
    filled AS (
      SELECT user_id, ts, side, event_id,
             first_value(view_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_view_id
      FROM tagged
    )
    SELECT CAST(event_id AS BIGINT) AS purchase_id,
           CAST(next_view_id AS BIGINT) AS next_view_id
    FROM filled
    WHERE side = 0
    ORDER BY purchase_id
    """,
)
def ops_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event-at-or-after join per user (forward as-of)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    out = asof_join(
        purchases,
        views,
        on="user_id",
        right_cols=["view_id"],
        direction="forward",
    )
    return out.select(
        F.col("event_id").cast("bigint").alias("purchase_id"),
        F.col("r_view_id").cast("bigint").alias("next_view_id"),
    ).orderBy("purchase_id")


# ---------------------------------------------------------------------------
# Point-in-time dimension join (the read side of SCD2; reference
# TemporalRowTimeJoinOperator): each fact row joins the dimension
# VERSION valid at the fact's timestamp. Because SCD2 intervals
# partition each key's timeline (contiguous, non-overlapping — the
# lead() build guarantees it), "valid_from <= t < valid_to" is
# EXACTLY the backward as-of match on valid_from — one window pass,
# not an interval join. Dimension: each user's view history
# versioned SCD2-style; facts: purchases.
# ---------------------------------------------------------------------------
@_q(
    "ops_scd2_pit_join",
    """
    WITH dim AS (
      SELECT user_id, event_id AS version_id, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type = 'view'
    ),
    facts AS (
      SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.purchase_id,
           CAST(d.version_id AS BIGINT) AS version_id
    FROM facts f
    LEFT JOIN dim d
      ON d.user_id = f.user_id
     AND d.valid_from <= f.ts
     AND (d.valid_to > f.ts OR d.valid_to IS NULL)
    ORDER BY f.purchase_id
    """,
)
def ops_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facts x versioned dimension at fact time — backward as-of on
    valid_from (valid because SCD2 intervals partition the timeline);
    the oracle uses the definitional interval join."""
    e = load_table(spark, sf_dir, "events")
    dim = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.col("event_id").alias("version_id"),
    )
    facts = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    out = asof_join(
        facts,
        dim,
        on="user_id",
        left_time="ts",
        right_time="valid_from",
        right_cols=["version_id"],
    )
    return out.select(
        "purchase_id",
        F.col("r_version_id").cast("bigint").alias("version_id"),
    ).orderBy("purchase_id")


# ---------------------------------------------------------------------------
# Async lookup join (reference AsyncLookupJoinRunner.java:60,
# AsyncTableFunction.java:66 — the async-I/O lookup operator, the last
# open §2.3 capability row): each task probes the external keyed
# service with a bounded number of lookups IN FLIGHT (asyncio socket
# multiplexing inside mapInPandas), key-batched IN-pushdown on the
# wire, partition-local cache (LookupJoinCachingRunner analog). The
# oracle is the definitional equi-join — the async transport must be
# invisible in the result.
# ---------------------------------------------------------------------------
@_q(
    "ops_async_lookup_join",
    f"""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS cnt,
           {dsum_sql('o_totalprice')} AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def ops_async_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders probe the customer dimension served over HTTP: per-task
    asyncio client, capacity-8 in-flight bound (server-verified via
    /meta max_inflight in tests/test_async_lookup.py), inner lookup
    semantics, then the usual aggregate. The service seed collect is
    fixture setup (standing in for the external system), not part of
    the operator's data path — the probe side never leaves the
    executors."""
    from ..operators.async_lookup import async_lookup_join
    from ..sources import restds

    key = ("ops_async_lookup_join", spark.sparkContext.applicationId, sf_dir)
    if key not in _SIDE_MEMO:
        import atexit as _atexit

        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        rows = [
            {"c_custkey": r.c_custkey, "c_mktsegment": r.c_mktsegment}
            for r in c.collect()
        ]
        srv, url = restds.start_row_service(
            "c_custkey bigint, c_mktsegment string", rows
        )
        _REST_SERVERS.append(srv)
        _atexit.register(srv.shutdown)
        o = load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_totalprice"
        )
        joined = async_lookup_join(
            o,
            url,
            "o_custkey",
            "c_custkey",
            "c_custkey bigint, c_mktsegment string",
            right_cols=["c_mktsegment"],
            how="inner",
            capacity=8,
            batch_keys=64,
        )
        _SIDE_MEMO[key] = (
            joined.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                dsum(F.col("o_totalprice")).alias("total"),
            )
            .orderBy("c_mktsegment")
        )
    return _SIDE_MEMO[key]
