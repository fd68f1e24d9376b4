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
        if v.time() == datetime.min.time():
            # DuckDB's fetch_df returns DATE as a midnight Timestamp
            # while every native path keeps datetime.date — a
            # driver-proven-GREEN divergence (h03/h18/ops_datetime are
            # green with DATE finals), so the renderer unifies them.
            # Symmetric, so it can never CREATE a mismatch.
            return v.date().isoformat()
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render(x) for x in v) + "]"
    return str(v)


# ---------------------------------------------------------------------------
# Driver-canon-unsafe final output types (VERDICT r10, four reds, one
# cause): the driver canonicalizes BOTH engines' results through
# pandas. DECIMAL diverges there — DuckDB's fetch_df coerces
# DECIMAL(p,s) to float64 while Spark keeps decimal.Decimal objects,
# and the two render differently — and ARRAY/MAP/STRUCT crash
# pandas' factorize outright ("unhashable type: 'list'", the recorded
# dp_bpe_tokens err). Suite entries must bridge these in the FINAL
# select on both engines: CAST(decimal AS DOUBLE) (exact whenever the
# value terminates within double's 2^53 integer range — every suite
# aggregate does) and array_join/array_to_string for arrays. The
# corpus generator already canonicalizes its outputs this way; these
# helpers hold the hand-written suites to the same contract
# (tests/test_oracle_lint.py, tests/test_oracle_parity.py).
# ---------------------------------------------------------------------------
BANNED_FINAL_TYPES = ("DecimalType", "ArrayType", "MapType", "StructType")


def banned_final_types(schema) -> list[str]:
    """Final output columns whose Spark type the driver's pandas
    canonicalization cannot hash faithfully; empty list = safe."""
    return [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if type(f.dataType).__name__ in BANNED_FINAL_TYPES
    ]


def _render_driver(v) -> str:
    """Driver-faithful rendering: type-divergent cells must NOT
    render equal. ``_render`` normalizes Decimal('123.456000') and
    float 123.456 to the same text — exactly the blind spot that let
    four entries ship locally-green and driver-red — so this variant
    type-tags Decimal and refuses containers the way the driver's
    pandas canon crashes on them."""
    if isinstance(v, Decimal):
        return "decimal:" + str(v)
    if isinstance(v, (list, tuple, dict)):
        raise TypeError(
            f"driver canon cannot hash a container cell ({type(v).__name__})"
        )
    return _render(v)


def value_hash(columns: list[str], rows: list[tuple], render=_render) -> str:
    """Order-insensitive hash: columns sorted by name, rows sorted."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    rendered = sorted(
        "\x1f".join(render(row[i]) for i in order) for row in rows
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
    spark_rows: list[tuple] | None = None,
) -> CompareResult:
    """Run both sides and compare (row count, column names, value hash).

    ``spark_rows`` lets a caller collect the Spark side ONCE and
    certify under several fetch modes without re-running the job
    (see :func:`certify`).

    ``fetch`` selects how BOTH results are materialized:
    ``"native"`` mirrors a ``collect()``/``fetchall()`` driver;
    ``"pandas"`` emulates the real driver's canonicalization — BOTH
    sides round-trip through pandas (Spark via ``toPandas``, the
    oracle via ``fetch_df``), so symmetric dtype coercions (nullable
    int64 → float64 on both engines: driver-proven green) pass while
    one-sided ones (DuckDB-only HUGEINT → float64, the r4 reds)
    fail; ``"driver"`` is the strictest mode (round-11 hardening):
    the pandas materialization PLUS ``_render_driver`` (Decimal never
    renders equal to float, container cells raise) PLUS a
    ``banned_final_types`` schema pre-check — the exact class that
    shipped locally-green and driver-red in r9/r10. Certification
    runs all three so a renderer-level coercion can never again pass
    offline and fail the driver.
    """
    s_cols = list(spark_df.columns)
    if fetch == "driver":
        bad = banned_final_types(spark_df.schema)
        if bad:
            return CompareResult(
                name, False, -1, -1, False, False,
                f"driver-canon-unsafe final column types: {bad}",
            )
    if spark_rows is not None:
        s_rows = spark_rows
    elif fetch in ("pandas", "driver"):
        s_rows = pandas_rows(spark_df.toPandas())
    else:
        s_rows = [tuple(r) for r in spark_df.collect()]
    o_res = oracle_con.execute(oracle_sql)
    o_cols = [d[0] for d in o_res.description]
    if fetch in ("pandas", "driver"):
        o_rows = pandas_rows(o_res.fetch_df())
    else:
        o_rows = [tuple(r) for r in o_res.fetchall()]

    cols_match = sorted(s_cols) == sorted(o_cols)
    render = _render_driver if fetch == "driver" else _render
    h_s = value_hash(s_cols, s_rows, render)
    h_o = value_hash(o_cols, o_rows, render)
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


CERTIFY_MODES = ("native", "pandas", "driver")


def certify(
    name: str,
    spark_df,
    oracle_con,
    oracle_sql: str,
) -> list[CompareResult]:
    """Full three-mode certification with TWO Spark jobs (one
    ``collect``, one ``toPandas`` — each mode's own materialization,
    never re-run per mode). New registrations must pass all three
    (VERDICT r10 item 3) — ``native`` proves value parity,
    ``pandas`` proves it survives BOTH engines' pandas dtype
    coercions the way the driver sees them, ``driver`` additionally
    proves the output types themselves are canon-safe."""
    native = [tuple(r) for r in spark_df.collect()]
    via_pandas = pandas_rows(spark_df.toPandas())
    per_mode = {"native": native, "pandas": via_pandas, "driver": via_pandas}
    return [
        compare(name, spark_df, oracle_con, oracle_sql, fetch=m,
                spark_rows=per_mode[m])
        for m in CERTIFY_MODES
    ]
