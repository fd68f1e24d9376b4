"""Run the 103-query TPC-DS corpus on Spark and validate vs DuckDB.

The reference gates this corpus in TpcDsBatchExecITCase.scala with
TpcUtils.scala's comparator: every numeric formatted to 4 decimal
places, rows compared as strings — order-sensitive only when the
query has a top-level ORDER BY, and eight queries marked
``isUncertain`` compared as sorted multisets. This module reproduces
that posture:

- both engines read the SAME parquet (no CSV parsing skew),
- DuckDB's null ordering is pinned to Spark's
  (``nulls_first_on_asc_last_on_desc``),
- rows are compared as sorted multisets of per-cell canonical strings
  (floats/decimals at 4 decimals, the reference's precision),
- a small per-query tolerance handles the last-ulp differences of
  double aggregates (DuckDB avg(decimal) returns double, Spark
  returns decimal(·,6) — both round to the same 4 decimals except at
  exact ties, which the tolerance absorbs).

Spark runs the query text directly (``spark.sql``) — the plan is
whatever Catalyst picks: pushdown, broadcast dims, AQE; nothing is
hand-lowered. That is the whole point of the Spark-first design.
"""

from __future__ import annotations

import math
import os
import re
from dataclasses import dataclass
from decimal import Decimal

QUERY_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "queries")

# Queries the reference itself compares only as unordered multisets
# (TpcDsBatchExecITCase.parameters: isUncertain=true) — ORDER BY ...
# LIMIT with tie-prone keys, so the selected rows can legitimately
# differ between engines. Our comparator is multiset-based already,
# so the only real ambiguity is LIMIT row *selection*: those queries
# get a subset-validity check (count matches AND every Spark row is
# a member of DuckDB's un-LIMITed result multiset) instead of the
# reference's weaker sorted-full-row golden compare.
UNCERTAIN = {"q6", "q24a", "q56", "q64", "q71", "q75", "q77", "q79"}

_TRAILING_LIMIT_RE = re.compile(r"\blimit\s+(\d+)\s*$", re.I)


def trailing_limit(sql: str) -> int | None:
    m = _TRAILING_LIMIT_RE.search(sql.rstrip())
    return int(m.group(1)) if m else None


def strip_trailing_limit(sql: str) -> str:
    return _TRAILING_LIMIT_RE.sub("", sql.rstrip()).rstrip()


def query_names() -> list[str]:
    names = [
        f[:-4]
        for f in os.listdir(QUERY_DIR)
        if f.endswith(".sql")
    ]
    return sorted(names, key=lambda n: (int("".join(c for c in n if c.isdigit())), n))


# Minimal DuckDB-side shims. The SQL fixtures are valid Spark SQL
# as-is; DuckDB needs (a) double quotes instead of backtick
# identifiers and (b) explicit qualification where its binder calls
# an ORDER BY reference ambiguous that Spark resolves to the
# single output column.
DUCK_PATCHES = {
    # (c) decimal→int CAST semantics: Spark (and the reference's
    # Calcite/Flink planner) truncate toward zero; DuckDB rounds.
    # q54's revenue/50 segment hits a .5+ boundary at SF1 volumes
    # (micro data never did) — make the oracle truncate explicitly.
    "q54": [
        (
            "cast((revenue/50) as int)",
            "cast(trunc(revenue/50) as int)",
        )
    ],
    "q58": [("order by item_id", "order by ss_items.item_id")],
    "q72": [
        (
            "order by total_cnt desc, i_item_desc, w_warehouse_name, d_week_seq",
            "order by total_cnt desc, i_item_desc, w_warehouse_name, d1.d_week_seq",
        )
    ],
}


# Exact algebraic rewrites of the heaviest ORACLE queries, for the
# decade-up (SF10+) DuckDB side only. q24a/q24b join customer_address
# on (c_birth_country = upper(ca_country), s_zip = ca_zip) — a
# many-to-many fanout (~961M pre-aggregation rows at SF10) that
# DuckDB's single-node evaluation cannot spill within the sandbox's
# disk, while the Spark side finishes in ~30-80 s. The rewrite pushes
# the aggregate through that join: customer_address collapses to
# (upper(ca_country), ca_zip, ca_state, count(*)) — valid because no
# other address column is referenced — and each fact row contributes
# ss_net_paid * count instead of count replicated rows. The identity
# is CERTIFIED, not assumed: tests/test_tpcds.py runs both forms in
# DuckDB at micro scale, and check_tpcds_sf1_parity.py --certify-
# rewrites does the same at SF1, before the rewrite is trusted at
# SF10. (Ref corpus: test/resources/tpcds/queries/1/q24a.sql.)
_Q24_REWRITE = """
with addrg as
 (select upper(ca_country) ac, ca_zip az, ca_state, count(*) acnt
  from customer_address
  group by 1, 2, 3),
ssales as
 (select c_last_name
       ,c_first_name
       ,s_store_name
       ,ca_state
       ,s_state
       ,i_color
       ,i_current_price
       ,i_manager_id
       ,i_units
       ,i_size
       ,sum(ss_net_paid * acnt) netpaid
 from store_sales
     ,store_returns
     ,store
     ,item
     ,customer
     ,addrg
 where ss_ticket_number = sr_ticket_number
   and ss_item_sk = sr_item_sk
   and ss_customer_sk = c_customer_sk
   and ss_item_sk = i_item_sk
   and ss_store_sk = s_store_sk
   and c_birth_country = ac
   and s_zip = az
 and s_market_id=5
 group by c_last_name
         ,c_first_name
         ,s_store_name
         ,ca_state
         ,s_state
         ,i_color
         ,i_current_price
         ,i_manager_id
         ,i_units
         ,i_size)
 select c_last_name
       ,c_first_name
       ,s_store_name
       ,sum(netpaid) paid
 from ssales
 where i_color = '{color}'
 group by c_last_name
         ,c_first_name
         ,s_store_name
 having sum(netpaid) > (select 0.05*avg(netpaid)
                                  from ssales)
"""

HEAVY_ORACLE_REWRITES = {
    "q24a": _Q24_REWRITE.format(color="yellow"),
    "q24b": _Q24_REWRITE.format(color="almond"),
}


def query_text(name: str, dialect: str = "spark") -> str:
    with open(os.path.join(QUERY_DIR, f"{name}.sql")) as f:
        txt = f.read()
    # strip the template comment lines; keep pure SQL
    lines = [l for l in txt.splitlines() if not l.strip().startswith("--")]
    sql = "\n".join(lines).strip().rstrip(";")
    if dialect == "duckdb":
        sql = re.sub(r"`([^`]*)`", r'"\1"', sql)
        for old, new in DUCK_PATCHES.get(name, ()):
            sql = sql.replace(old, new)
    return sql


def register_spark_views(spark, data_dir: str) -> None:
    from .schema import TPCDS_SCHEMAS

    for t in TPCDS_SCHEMAS:
        spark.read.parquet(os.path.join(data_dir, f"{t}.parquet")).createOrReplaceTempView(t)


def register_catalog_tables(
    spark, data_dir: str, names: list[str] | None = None, analyze: bool = True
) -> None:
    """Once-per-load catalog registration — the cluster posture.

    Registers the corpus tables as EXTERNAL parquet catalog tables
    (no data copied) and, with ``analyze=True``, runs
    ``ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`` so
    Spark's CBO join-reorder has cardinalities, mirroring the
    reference's join-reorder-ON benchmark posture
    (TpcDsBatchExecITCase.scala:71-72). ``scripts/bench_cbo.py``
    measured the effect at −7.4 % on the corpus suite (13–21 % on the
    WITH-heavy tail). At 100 TB this is the "analyze once per data
    load" step — stats cost one scan per load and then amortize over
    every query; the per-round driver gate keeps using temp views
    (``register_spark_views``) because re-ANALYZE per round would
    dominate sf0.01 runtimes.
    """
    from .schema import TPCDS_SCHEMAS

    for t in names or list(TPCDS_SCHEMAS):
        # a same-named temp view would SHADOW the catalog table and
        # silently void the stats posture — drop it first
        spark.catalog.dropTempView(t)
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(
            f"CREATE TABLE {t} USING parquet "
            f"LOCATION '{os.path.join(data_dir, t + '.parquet')}'"
        )
        if analyze:
            spark.sql(
                f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS"
            )


def duckdb_conn(data_dir: str):
    import duckdb

    from .schema import TPCDS_SCHEMAS

    con = duckdb.connect()
    con.execute("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    for t in TPCDS_SCHEMAS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(data_dir, t + '.parquet')}')"
        )
    return con


def _canon_cell(v) -> str:
    """Reference TpcUtils posture: numerics at 4 decimals."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (float, Decimal)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == 0:
            f = 0.0  # fold -0.0
        return f"{f:.4f}"
    return str(v)


def canon_rows(rows) -> list[tuple[str, ...]]:
    return sorted(tuple(_canon_cell(v) for v in row) for row in rows)


@dataclass
class TpcdsResult:
    name: str
    ok: bool
    spark_rows: int
    duck_rows: int
    detail: str = ""


def _cells_close(rs: tuple[str, ...], rd: tuple[str, ...]) -> bool:
    if len(rs) != len(rd):
        return False
    for a, b in zip(rs, rd):
        if a == b:
            continue
        try:
            fa, fb = float(a), float(b)
        except ValueError:
            return False
        if not math.isclose(fa, fb, rel_tol=1e-4, abs_tol=2e-4):
            return False
    return True


def subset_check(name: str, s_rows, d_rows, d_unlimited) -> TpcdsResult:
    """Uncertain-query validation: counts must match the LIMITed
    oracle, and every Spark row must be a member of the oracle's
    un-LIMITed result multiset (with multiplicity). Catches wrong
    values while tolerating cross-engine tie selection."""
    if len(s_rows) != len(d_rows):
        return TpcdsResult(
            name, False, len(s_rows), len(d_rows),
            "row-count mismatch (uncertain query)",
        )
    from collections import Counter

    pool = Counter(canon_rows(d_unlimited))
    missing = []
    for row in canon_rows(s_rows):
        if pool[row] > 0:
            pool[row] -= 1
        else:
            missing.append(row)
    # tolerance pass for the last-ulp rounding cases: each still-missing
    # row may consume any remaining close row from the pool.
    hard_missing = []
    for row in missing:
        hit = next(
            (cand for cand, n in pool.items() if n > 0 and _cells_close(row, cand)),
            None,
        )
        if hit is not None:
            pool[hit] -= 1
        else:
            hard_missing.append(row)
    ok = not hard_missing
    return TpcdsResult(
        name, ok, len(s_rows), len(d_rows),
        "" if ok else f"rows outside oracle superset: {hard_missing[:2]}",
    )


def compare_rows(name: str, s_rows, d_rows) -> TpcdsResult:
    cs, cd = canon_rows(s_rows), canon_rows(d_rows)
    if cs == cd:
        return TpcdsResult(name, True, len(s_rows), len(d_rows))
    # tolerance pass: same count and all cells equal-or-close
    if len(cs) == len(cd) and all(
        _cells_close(rs, rd) for rs, rd in zip(cs, cd)
    ):
        return TpcdsResult(name, True, len(s_rows), len(d_rows), "tolerance")
    only_s = [r for r in cs if r not in set(cd)][:2]
    only_d = [r for r in cd if r not in set(cs)][:2]
    return TpcdsResult(
        name, False, len(s_rows), len(d_rows),
        f"only_spark={only_s} only_duck={only_d}",
    )


def run_spark(name: str, spark) -> list[tuple]:
    """Run one corpus query on Spark with multi-referenced CTE bodies
    materialized once (the reference's SubplanReuser behavior — see
    plans/cte.py)."""
    from ..plans.cte import run_with_materialized_ctes

    df, cleanup = run_with_materialized_ctes(spark, query_text(name, "spark"))
    try:
        return [tuple(r) for r in df.collect()]
    finally:
        cleanup()


def run_one(name: str, spark, con, heavy_rewrites: bool = False) -> TpcdsResult:
    s_rows = run_spark(name, spark)
    if heavy_rewrites and name in HEAVY_ORACLE_REWRITES:
        d_sql = HEAVY_ORACLE_REWRITES[name]
    else:
        d_sql = query_text(name, "duckdb")
    d_rows = con.execute(d_sql).fetchall()
    if name in UNCERTAIN and trailing_limit(d_sql) is not None:
        d_unlimited = con.execute(strip_trailing_limit(d_sql)).fetchall()
        return subset_check(name, s_rows, d_rows, d_unlimited)
    return compare_rows(name, s_rows, d_rows)
