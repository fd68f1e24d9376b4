"""TPC-DS-pattern queries (the reference's primary corpus — SURVEY §2).

The driver's testdata is TPC-H-shaped, so the 103-file TPC-DS corpus
cannot run verbatim; these queries reproduce the defining TPC-DS
*plan patterns* on the available tables, completing the §2 inventory:

- ds01: multi-channel UNION ALL + ROLLUP (q5/q77/q80 pattern)
- ds02: ROLLUP + RANK within category (q67 pattern)
- ds03: year-over-year self-join growth (q47/q57/q75 pattern)
- ds04: WITH-CTE reused twice + scalar threshold (q23/q95 pattern,
  the reference's SubplanReuser showcase — SURVEY §4.2)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.deterministic import dsum, dsum_sql
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


REV = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# ds01 — channel union + rollup (TPC-DS q5: store/catalog/web UNION ALL
# into a per-channel rollup; channels modeled by l_returnflag)
# ---------------------------------------------------------------------------
@_q(
    "ds01_channel_rollup",
    f"""
    SELECT channel, CAST(year(l_shipdate) AS INTEGER) AS sales_year,
           CAST(GROUPING(channel) AS INTEGER) AS g_ch,
           {dsum_sql(REV)} AS revenue, COUNT(*) AS cnt
    FROM (
      SELECT 'returned' AS channel, l_shipdate, l_extendedprice, l_discount
      FROM lineitem WHERE l_returnflag = 'R'
      UNION ALL
      SELECT 'accepted' AS channel, l_shipdate, l_extendedprice, l_discount
      FROM lineitem WHERE l_returnflag = 'A'
      UNION ALL
      SELECT 'neutral' AS channel, l_shipdate, l_extendedprice, l_discount
      FROM lineitem WHERE l_returnflag = 'N'
    ) channels
    GROUP BY ROLLUP (channel, sales_year)
    ORDER BY channel NULLS FIRST, sales_year NULLS FIRST, g_ch
    """,
)
def ds01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5-pattern: n-ary UNION ALL of channel relations → rollup."""
    l = load_table(spark, sf_dir, "lineitem")

    def channel(flag: str, name: str) -> DataFrame:
        return l.filter(l.l_returnflag == flag).select(
            F.lit(name).alias("channel"),
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
        )

    channels = (
        channel("R", "returned")
        .unionAll(channel("A", "accepted"))
        .unionAll(channel("N", "neutral"))
        .withColumn("sales_year", F.year("l_shipdate"))
    )
    rev = channels.l_extendedprice * (1 - channels.l_discount)
    return (
        channels.rollup("channel", "sales_year")
        .agg(
            F.grouping("channel").cast("int").alias("g_ch"),
            dsum(rev).alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select("channel", "sales_year", "g_ch", "revenue", "cnt")
        .orderBy(
            F.col("channel").asc_nulls_first(),
            F.col("sales_year").asc_nulls_first(),
            "g_ch",
        )
    )


# ---------------------------------------------------------------------------
# ds02 — rollup + rank within category (TPC-DS q67)
# ---------------------------------------------------------------------------
@_q(
    "ds02_rank_in_category",
    f"""
    WITH agg AS (
      SELECT p_brand, p_type, {dsum_sql(REV)} AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY ROLLUP (p_brand, p_type)
    )
    SELECT p_brand, p_type, revenue, CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT *, RANK() OVER (PARTITION BY p_brand
                             ORDER BY revenue DESC, p_type NULLS FIRST) AS rk
      FROM agg
    ) t
    WHERE rk <= 3
    ORDER BY p_brand NULLS FIRST, rk, p_type NULLS FIRST
    """,
)
def ds02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q67-pattern: rollup aggregate, then rank rows within each brand
    partition and keep the top 3."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    agg = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .rollup("p_brand", "p_type")
        .agg(dsum(l.l_extendedprice * (1 - l.l_discount)).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("revenue"), F.col("p_type").asc_nulls_first()
    )
    return (
        agg.withColumn("rk", F.rank().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_type", "revenue", "rk")
        .orderBy(
            F.col("p_brand").asc_nulls_first(),
            "rk",
            F.col("p_type").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# ds03 — year-over-year growth self-join (TPC-DS q47/q57/q75)
# ---------------------------------------------------------------------------
@_q(
    "ds03_yoy_growth",
    f"""
    WITH yearly AS (
      SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {dsum_sql(REV)} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, o_year
    )
    SELECT cur.n_name, cur.o_year, cur.revenue AS cur_revenue,
           prev.revenue AS prev_revenue,
           (cur.revenue - prev.revenue) / prev.revenue AS growth
    FROM yearly cur JOIN yearly prev
      ON cur.n_name = prev.n_name AND cur.o_year = prev.o_year + 1
    ORDER BY cur.n_name, cur.o_year
    """,
)
def ds03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q75-pattern: the same aggregate joined to itself shifted by one
    year (CTE reused → exchange reuse in the plan)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    yearly = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(l.l_extendedprice * (1 - l.l_discount)).alias("revenue"))
    )
    cur = yearly.alias("cur")
    prev = yearly.alias("prev")
    return (
        cur.join(
            prev,
            (F.col("cur.n_name") == F.col("prev.n_name"))
            & (F.col("cur.o_year") == F.col("prev.o_year") + 1),
        )
        .select(
            F.col("cur.n_name").alias("n_name"),
            F.col("cur.o_year").alias("o_year"),
            F.col("cur.revenue").alias("cur_revenue"),
            F.col("prev.revenue").alias("prev_revenue"),
            (
                (F.col("cur.revenue") - F.col("prev.revenue"))
                / F.col("prev.revenue")
            ).alias("growth"),
        )
        .orderBy("n_name", "o_year")
    )


# ---------------------------------------------------------------------------
# ds04 — CTE used twice + scalar threshold (TPC-DS q23 pattern)
# ---------------------------------------------------------------------------
@_q(
    "ds04_cte_reuse",
    f"""
    WITH best_customers AS (
      SELECT o_custkey, {dsum_sql('o_totalprice')} AS spend
      FROM orders GROUP BY o_custkey
    )
    SELECT COUNT(*) AS n_best,
           {dsum_sql('spend')} AS total_spend
    FROM best_customers
    WHERE spend > (SELECT {dsum_sql('spend')} * 0.001 FROM best_customers)
    """,
)
def ds04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q23-pattern: a CTE consumed twice (rows + its own total) — the
    reference relies on SubplanReuser here; Spark reuses the exchange."""
    o = load_table(spark, sf_dir, "orders")
    best = o.groupBy("o_custkey").agg(dsum(o.o_totalprice).alias("spend"))
    threshold = best.agg((dsum(F.col("spend")) * 0.001).alias("thr"))
    return (
        best.join(F.broadcast(threshold))
        .filter(F.col("spend") > F.col("thr"))
        .agg(
            F.count(F.lit(1)).alias("n_best"),
            dsum(F.col("spend")).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# ds05 — cross-channel item intersection (TPC-DS q14: items sold in
# every channel; channels modeled by l_returnflag)
# ---------------------------------------------------------------------------
@_q(
    "ds05_cross_channel_items",
    f"""
    WITH cross_items AS (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
    )
    SELECT COUNT(DISTINCT l_partkey) AS n_items,
           {dsum_sql(REV)} AS revenue
    FROM lineitem
    WHERE l_partkey IN (SELECT l_partkey FROM cross_items)
    """,
)
def ds05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14-pattern: INTERSECT chain defines the cross-channel item set,
    then a semi join restricts the fact scan to it."""
    l = load_table(spark, sf_dir, "lineitem")

    def parts(flag: str) -> DataFrame:
        return l.filter(l.l_returnflag == flag).select("l_partkey")

    cross_items = parts("R").intersect(parts("A")).intersect(parts("N"))
    return (
        l.join(cross_items, "l_partkey", "left_semi")
        .agg(
            F.count_distinct(F.col("l_partkey")).alias("n_items"),
            dsum(l.l_extendedprice * (1 - l.l_discount)).alias("revenue"),
        )
    )
