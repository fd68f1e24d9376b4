"""TPC-H-shaped analytics suite over the driver's star schema.

The reference runs the 22 TPC-H queries through its Blink batch planner
(reference: flink-table-planner-blink/src/test/resources/tpch/queries/
q*.sql, harness TpcHBatchExecITCase.scala). The driver's testdata is a
*column subset* of TPC-H (TESTDATA.md — no partsupp table, no
commit/receipt dates, no comments/phones), so queries whose predicates
touch missing columns are adapted: same operator shape (join graph,
agg structure, subquery pattern), predicates rewritten onto available
columns. Each docstring states the adaptation.

All float aggregates go through the decimal bridge
(``functions.deterministic``) so results are bit-identical across any
partitioning — and identical to the DuckDB oracle.

Scale design notes (100 TB):
- every dim→fact join here is broadcastable (region/nation/supplier/
  part/customer are tiny relative to fact tables); Spark's AQE converts
  them at runtime, and ``BROADCASTABLE_DIMS`` documents the intent.
- aggregations are partial-agg friendly (sum/count/min/max over
  group keys with bounded cardinality) → map-side combine keeps the
  shuffle volume proportional to groups, not rows.
- the only unavoidable fact-fact shuffles are lineitem⋈orders joins on
  l_orderkey/o_orderkey; at cluster scale these co-partition and would
  benefit from bucketing both tables on the order key (see
  sources/bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import davg, davg_sql, dsum, dsum_sql
from ..schemas import load_table

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    """Register a query function + its oracle under ``name``."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _rev(l):  # noqa: E741 — per-row revenue expression (deterministic double)
    return l.l_extendedprice * (1 - l.l_discount)


REV_SQL = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# h01 — pricing summary report (TPC-H q1, unmodified shape)
# ---------------------------------------------------------------------------
@_q(
    "h01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql(REV_SQL)} AS sum_disc_price,
           {dsum_sql(f'({REV_SQL}) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def h01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q1: full-scan agg; exercises hash agg + partial agg.

    Reference: tpch/queries/q1.sql; BatchExecHashAggregate
    (SURVEY §2.4). One scan, one shuffle on a 6-value group key.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(l.l_shipdate <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(l.l_quantity).alias("sum_qty"),
            dsum(l.l_extendedprice).alias("sum_base_price"),
            dsum(_rev(l)).alias("sum_disc_price"),
            dsum(_rev(l) * (1 + l.l_tax)).alias("sum_charge"),
            davg(l.l_quantity).alias("avg_qty"),
            davg(l.l_extendedprice).alias("avg_price"),
            davg(l.l_discount).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# h02 — best supplier per part class (q2 adapted: no partsupp table)
# ---------------------------------------------------------------------------
@_q(
    "h02_best_supplier",
    """
    WITH shipped AS (
        SELECT p_brand, p_type, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size < 15
        GROUP BY p_brand, p_type, l_suppkey
    ), ranked AS (
        SELECT *, RANK() OVER (PARTITION BY p_brand, p_type
                               ORDER BY total_qty DESC, l_suppkey) AS rnk
        FROM shipped
    )
    SELECT p_brand, p_type, l_suppkey AS s_suppkey, total_qty
    FROM ranked WHERE rnk = 1
    ORDER BY p_brand, p_type
    """,
)
def h02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 adapted (partsupp is absent from the driver schema): pick the
    top supplier by shipped quantity per (p_brand, p_type), p_size < 15.

    Same operator shape as q2: join + agg + correlated "min per group"
    resolved as a rank-1 window (the reference plans q2's scalar
    subquery the same way; SURVEY §2.6/§2.7 BatchExecRank).
    """
    from pyspark.sql.window import Window

    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    shipped = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "l_suppkey")
        .agg(dsum(l.l_quantity).alias("total_qty"))
    )
    w = Window.partitionBy("p_brand", "p_type").orderBy(
        F.desc("total_qty"), F.asc("l_suppkey")
    )
    return (
        shipped.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "p_brand", "p_type", F.col("l_suppkey").alias("s_suppkey"), "total_qty"
        )
        .orderBy("p_brand", "p_type")
    )


# ---------------------------------------------------------------------------
# h03 — shipping priority (q3; o_shippriority column absent → dropped)
# ---------------------------------------------------------------------------
@_q(
    "h03_shipping_priority",
    f"""
    SELECT l_orderkey,
           {dsum_sql(REV_SQL)} AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def h03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q3: 3-way join + agg + top-k (TakeOrderedAndProject).

    Reference: tpch/queries/q3.sql. The customer dim is broadcast; the
    lineitem⋈orders join shuffles on the order key.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_rev(l)).alias("revenue"))
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# h04 — order priority checking (q4 adapted: commit/receipt dates absent)
# ---------------------------------------------------------------------------
@_q(
    "h04_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def h04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 adapted: EXISTS predicate uses l_shipdate > o_orderdate
    (commit/receipt dates are absent). Exercises LEFT SEMI join — the
    reference rewrites EXISTS via FlinkSubQueryRemoveRule (SURVEY §2.3).
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# h05 — local supplier volume (q5, unmodified shape)
# ---------------------------------------------------------------------------
@_q(
    "h05_local_supplier_volume",
    f"""
    SELECT n_name, {dsum_sql(REV_SQL)} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def h05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q5: 6-way join; all dims broadcast, facts shuffle once.

    Reference: tpch/queries/q5.sql; the join-reorder posture mirrors
    TpcDsBatchExecITCase.scala:71-72 (reorder ON).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev(l)).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# h06 — revenue forecast (q6, unmodified shape)
# ---------------------------------------------------------------------------
@_q(
    "h06_forecast_revenue",
    f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def h06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6: pure scan+filter+agg — the predicate-pushdown probe.

    All four predicates must reach the parquet scan (PushedFilters);
    reference: tpch/queries/q6.sql, PushFilterIntoTableSourceScanRule.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (l.l_shipdate >= F.lit("1997-01-01").cast("timestamp"))
        & (l.l_shipdate < F.lit("1998-01-01").cast("timestamp"))
        & (l.l_discount >= 0.05)
        & (l.l_discount <= 0.07)
        & (l.l_quantity < 24)
    ).agg(dsum(l.l_extendedprice * l.l_discount).alias("revenue"))


# ---------------------------------------------------------------------------
# h07 — volume shipping (q7, nation names adapted to the synthetic data)
# ---------------------------------------------------------------------------
@_q(
    "h07_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, {dsum_sql('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             {REV_SQL} AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def h07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7: self-joined dim (nation twice) + disjunctive join filter.

    Reference: tpch/queries/q7.sql.
    """
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    joined = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2.n_nationkey"))
        .filter(
            (
                (F.col("n1.n_name") == "NATION_1")
                & (F.col("n2.n_name") == "NATION_2")
            )
            | (
                (F.col("n1.n_name") == "NATION_2")
                & (F.col("n2.n_name") == "NATION_1")
            )
        )
        .select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
            _rev(l).alias("volume"),
        )
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# h08 — national market share (q8 adapted: p_type values simplified)
# ---------------------------------------------------------------------------
@_q(
    "h08_market_share",
    f"""
    SELECT o_year,
           ({dsum_sql("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")}
            / {dsum_sql('volume')}) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {REV_SQL} AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region    ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def h08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8: 8-way join + conditional-aggregate market share.

    Reference: tpch/queries/q8.sql. Deterministic double division of
    two decimal-bridged sums.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    all_nations = (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev(l).alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    return (
        all_nations.groupBy("o_year")
        .agg(
            (
                dsum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                        0.0
                    )
                )
                / dsum(F.col("volume"))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# h09 — product type profit (q9 adapted: no ps_supplycost → margin only)
# ---------------------------------------------------------------------------
@_q(
    "h09_product_profit",
    f"""
    SELECT nation, o_year, {dsum_sql('amount')} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {REV_SQL} AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def h09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 adapted: profit = discounted revenue (ps_supplycost absent).
    Same shape: LIKE-filtered part dim + 5-way join + 2-key agg.
    Reference: tpch/queries/q9.sql.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            n.n_name.alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _rev(l).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# h10 — returned item reporting (q10; phone/address/comment dropped)
# ---------------------------------------------------------------------------
@_q(
    "h10_returned_items",
    f"""
    SELECT c_custkey, c_name, {dsum_sql(REV_SQL)} AS revenue, c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def h10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10: join + agg + top-20. Reference: tpch/queries/q10.sql."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(l)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# h11 — important part stock (q11 adapted: value from lineitem, no partsupp)
# ---------------------------------------------------------------------------
@_q(
    "h11_important_stock",
    f"""
    SELECT l_partkey AS p_partkey, {dsum_sql(REV_SQL)} AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING {dsum_sql(REV_SQL)} > (
        SELECT {dsum_sql(REV_SQL)} * 0.0005 FROM lineitem
    )
    ORDER BY part_value DESC, p_partkey
    """,
)
def h11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 adapted: part "value" = discounted revenue per part, kept when
    above 0.05% of the global total (scalar subquery → broadcast join).
    Reference: tpch/queries/q11.sql (HAVING > scalar subquery shape).
    """
    l = load_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(dsum(_rev(l)).alias("part_value"))
    total = l.agg((dsum(_rev(l)) * 0.0005).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


# ---------------------------------------------------------------------------
# h12 — shipping modes / priority split (q12 adapted: l_shipmode absent)
# ---------------------------------------------------------------------------
@_q(
    "h12_priority_split",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def h12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 adapted: group key l_linestatus stands in for the absent
    l_shipmode; the CASE-split conditional counts are q12's shape.
    Reference: tpch/queries/q12.sql.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# h13 — customer order distribution (q13; comment filter → status filter)
# ---------------------------------------------------------------------------
@_q(
    "h13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def h13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13: LEFT OUTER join with an extra join-condition filter,
    double aggregation. Reference: tpch/queries/q13.sql (the o_comment
    NOT LIKE filter becomes o_orderstatus <> 'P' — same plan shape).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus != "P"), "left_outer"
        )
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# h14 — promotion effect (q14; PROMO p_type exists in the data)
# ---------------------------------------------------------------------------
@_q(
    "h14_promo_effect",
    f"""
    SELECT (100.00 * {dsum_sql(f"CASE WHEN p_type = 'PROMO' THEN {REV_SQL} ELSE 0 END")}
            / {dsum_sql(REV_SQL)}) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def h14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14: conditional revenue share. Reference: tpch/queries/q14.sql."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    return l.join(F.broadcast(p), l.l_partkey == p.p_partkey).agg(
        (
            F.lit(100.0)
            * dsum(F.when(p.p_type == "PROMO", _rev(l)).otherwise(0.0))
            / dsum(_rev(l))
        ).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# h15 — top supplier (q15, unmodified shape)
# ---------------------------------------------------------------------------
@_q(
    "h15_top_supplier",
    f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no, {dsum_sql(REV_SQL)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
    """,
)
def h15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15: CTE + scalar-subquery max (view in the original).

    Reference: tpch/queries/q15.sql. The CTE is reused twice — the
    reference's SubplanReuser dedups it (SURVEY §4.2); Spark reuses the
    exchange; determinism of MAX equality relies on the decimal bridge.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue0 = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev(l)).alias("total_revenue")
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue0.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# h16 — supplier count by part class (q16 adapted: no partsupp)
# ---------------------------------------------------------------------------
@_q(
    "h16_supplier_count",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#9'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 14, 23, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def h16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 adapted (partsupp → lineitem as the part-supplier bridge):
    COUNT(DISTINCT) + NOT IN (→ anti join). Reference: tpch/queries/q16.sql.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 14, 23, 45)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad_supp), l.l_suppkey == bad_supp.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# h17 — small-quantity-order revenue (q17; container → brand-only filter)
# ---------------------------------------------------------------------------
@_q(
    "h17_small_quantity",
    f"""
    SELECT ({dsum_sql('l_extendedprice')} / 7.0) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * {davg_sql('l_quantity')}
        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def h17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17: correlated AVG subquery → per-part average computed
    once and joined back (the same decorrelation the reference's
    FlinkDecorrelateProgram performs). Reference: tpch/queries/q17.sql.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part_avg = l.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * davg(l.l_quantity)).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(per_part_avg, l.l_partkey == F.col("ap_partkey"))
        .filter(l.l_quantity < F.col("qty_threshold"))
        .agg((dsum(l.l_extendedprice) / 7.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# h18 — large volume customers (q18; threshold fit to synthetic data)
# ---------------------------------------------------------------------------
@_q(
    "h18_large_volume_customer",
    f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_totalprice, {dsum_sql('l_quantity')} AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def h18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18: IN (grouped HAVING subquery) → semi join; top-100.

    Reference: tpch/queries/q18.sql (threshold 300 → 250 for the
    synthetic line-count distribution).

    Shape (r13, guide §2.4 "remove shuffles outright" + §3.1): the
    declared GROUP BY keys are all functionally determined by
    o_orderkey (orders/customer keys are unique), so ONE aggregation
    of lineitem by l_orderkey computes both the HAVING sum (the exact
    decimal(18,4) form) and sum_qty. The r1-r12 form scanned lineitem
    twice (HAVING subquery + join), broadcast the ENTIRE orders table,
    and paid a second wide 5-column groupBy exchange on the joined
    rows; this form scans lineitem once, keeps the single orderkey
    exchange, and broadcasts only the ~few qualifying aggregated rows
    — orders and customer are never shuffled at any scale. Oracle
    hash-parity pins the equivalence (every lineitem l_orderkey joins
    at most one orders row, so per-order sums are identical).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        l.groupBy(l.l_orderkey.alias("bo_key"))
        .agg(
            F.sum(l.l_quantity.cast("decimal(18,4)")).alias("q"),
            dsum(l.l_quantity).alias("sum_qty"),
        )
        .filter(F.col("q") > 250)
        .select("bo_key", "sum_qty")
    )
    return (
        o.join(F.broadcast(big_orders), o.o_orderkey == F.col("bo_key"))
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# h19 — discounted revenue (q19 adapted: container/shipmode → size ranges)
# ---------------------------------------------------------------------------
@_q(
    "h19_discounted_revenue",
    f"""
    SELECT {dsum_sql(REV_SQL)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def h19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19: disjunction of conjunctive range predicates across the
    join — the classic OR-of-ANDs join filter. Reference: tpch/queries/q19.sql.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        (
            (p.p_brand == "Brand#1")
            & p.p_size.between(1, 15)
            & l.l_quantity.between(1, 21)
        )
        | (
            (p.p_brand == "Brand#12")
            & p.p_size.between(10, 30)
            & l.l_quantity.between(10, 40)
        )
        | (
            (p.p_brand == "Brand#23")
            & p.p_size.between(20, 50)
            & l.l_quantity.between(20, 50)
        )
    )
    return j.filter(cond).agg(dsum(_rev(l)).alias("revenue"))


# ---------------------------------------------------------------------------
# h20 — potential part promotion (q20 adapted: availqty → shipped qty)
# ---------------------------------------------------------------------------
@_q(
    "h20_potential_promotion",
    """
    SELECT s_name, s_suppkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 100
      )
    ORDER BY s_suppkey
    """,
)
def h20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 adapted (no partsupp.availqty): suppliers that shipped >100
    units of 'red%' parts in 1997 — nested semi-join chain.
    Reference: tpch/queries/q20.sql.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    qualified = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(l.l_quantity.cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualified, s.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# h21 — suppliers who kept orders waiting (q21 adapted to shipdate)
# ---------------------------------------------------------------------------
@_q(
    "h21_suppliers_waiting",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name = 'NATION_0'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def h21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 adapted: "the supplier whose shipment was last in a
    multi-supplier finished order" (receipt/commit dates absent; the
    EXISTS / NOT EXISTS correlated pair is q21's defining shape —
    LEFT SEMI + LEFT ANTI self-joins on the fact table).
    Reference: tpch/queries/q21.sql.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = load_table(spark, sf_dir, "lineitem").alias("l1")
    l2 = load_table(spark, sf_dir, "lineitem").alias("l2")
    l3 = load_table(spark, sf_dir, "lineitem").alias("l3")

    base = (
        l1.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    with_other = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    not_last = with_other.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    return (
        not_last.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# h22 — global sales opportunity (q22 adapted: cntrycode from nationkey)
# ---------------------------------------------------------------------------
@_q(
    "h22_sales_opportunity",
    f"""
    SELECT cntrycode, COUNT(*) AS numcust, {dsum_sql('c_acctbal')} AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode, c_acctbal
      FROM customer
      WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
        AND c_acctbal > (
          SELECT {davg_sql('c_acctbal')} FROM customer
          WHERE c_acctbal > 0 AND c_nationkey % 10 IN (1, 3, 5, 7, 9)
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01'
        )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def h22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 adapted: country code = c_nationkey % 10 (no c_phone column);
    "no orders" → "no orders since 2000" (every synthetic customer has
    some order). Scalar-subquery average + NOT EXISTS anti join.
    Reference: tpch/queries/q22.sql.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    code = (c.c_nationkey % 10).cast("int")
    eligible = c.filter(code.isin(1, 3, 5, 7, 9))
    avg_bal = eligible.filter(c.c_acctbal > 0).agg(
        davg(c.c_acctbal).alias("avg_bal")
    )
    return (
        eligible.join(F.broadcast(avg_bal))
        .filter(c.c_acctbal > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(code.alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
