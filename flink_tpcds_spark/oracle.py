"""Local mirror of the driver's DuckDB-oracle correctness gate.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then
compares row count + schema + an order-insensitive value hash
(columns sorted by name). This module reproduces that comparison so
the gate can be exercised in CI (tests/test_oracle_parity.py) before
the driver ever sees the code.

Modeled on the reference's comparator (BatchTestBase.compareResult,
TpcUtils.scala:51-64): sorted-row multiset compare with normalized
rendering of floats/decimals/dates.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A connection with the driver's view layout pre-registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _render(v) -> str:
    """Canonical string form of a cell (engine-neutral)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — the decimal bridge makes it exact
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render(x) for x in v) + "]"
    return str(v)


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    """Order-insensitive hash: columns sorted by name, rows sorted."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    rendered = sorted(
        "\x1f".join(_render(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in rendered:
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    hash_match: bool
    detail: str = ""


def pandas_rows(pdf) -> list[tuple]:
    """Rows of a pandas fetch as plain-Python tuples.

    Emulates a driver that fetches the oracle via ``fetch_df``: numpy
    scalars become Python scalars (so an int64 column renders ``123``
    but a float64-coerced one renders ``123.0`` — the exact
    divergence certification must catch), and the missing-value
    sentinels pandas substitutes for SQL NULL (NaN, NaT) map back to
    None, since NULL-bearing float/date columns are a
    driver-proven-green class (round 4) — the driver demonstrably
    does NOT diverge on them.
    """
    import numpy as np

    rows = []
    for raw in pdf.to_numpy(dtype=object).tolist():
        vals = []
        for v in raw:
            if isinstance(v, np.ndarray):
                v = v.tolist()
            elif v is None or v != v:  # NaN/NaT are not self-equal
                v = None
            vals.append(v)
        rows.append(tuple(vals))
    return rows


def compare(
    name: str,
    spark_df,
    oracle_con,
    oracle_sql: str,
    fetch: str = "native",
) -> CompareResult:
    """Run both sides and compare (row count, column names, value hash).

    ``fetch`` selects how the oracle result is materialized:
    ``"native"`` mirrors the driver's ``fetchall()`` path;
    ``"pandas"`` emulates a ``fetch_df``-based driver (dtype
    coercions like HUGEINT → float64 become visible to the hash).
    Certification runs both so a renderer-level coercion can never
    again pass offline and fail the driver.
    """
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    o_res = oracle_con.execute(oracle_sql)
    o_cols = [d[0] for d in o_res.description]
    if fetch == "pandas":
        o_rows = pandas_rows(o_res.fetch_df())
    else:
        o_rows = [tuple(r) for r in o_res.fetchall()]

    cols_match = sorted(s_cols) == sorted(o_cols)
    h_s = value_hash(s_cols, s_rows)
    h_o = value_hash(o_cols, o_rows)
    ok = cols_match and len(s_rows) == len(o_rows) and h_s == h_o
    detail = ""
    if not cols_match:
        detail = f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    elif h_s != h_o:
        s_set = {tuple(_render(v) for v in r) for r in s_rows}
        o_set = {tuple(_render(v) for v in r) for r in o_rows}
        only_s = list(s_set - o_set)[:3]
        only_o = list(o_set - s_set)[:3]
        detail = f"only_spark={only_s} only_oracle={only_o}"
    return CompareResult(
        name, ok, len(s_rows), len(o_rows), cols_match, h_s == h_o, detail
    )
