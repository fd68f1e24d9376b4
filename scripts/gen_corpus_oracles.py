"""Generate + certify flink_tpcds_spark/tpcds/oracles.py.

For every corpus query this script:

1. computes the canonicalization mask:
   - float-round (kind 1): any column that is float/decimal on EITHER
     engine, PLUS any integer column that contains NULLs at
     certification scale (a nullable int64 degrades to float64 under
     a pandas driver fetch; NULL-bearing DOUBLE columns are a
     driver-proven-green class, round 4);
   - bigint-cast (kind 2): NULL-free integer columns DuckDB types as
     HUGEINT (``fetch_df`` coerces INT128 → float64 — the round-4
     driver red rows q14a/q21/q29/q35);
   - date-to-string (kind 3): DATE columns (``fetch_df`` coerces DATE
     → datetime64, rendering a midnight timestamp; ISO strings are
     fetch-mode-stable and sort identically);
2. builds the self-contained DuckDB oracle (read_parquet CTE bindings,
   positional c00.. rename, 4-digit rounding — queries/corpus.py) and
   STRUCTURALLY asserts the canonicalized oracle output contains no
   HUGEINT column;
3. CERTIFIES it: runs the Spark side through the exact runtime code
   path and the oracle on a *vanilla* DuckDB connection (no pinned
   null order — the driver's connection is vanilla too), comparing
   with the driver's own comparison (oracle.compare: column names +
   order-insensitive value hash) under BOTH oracle fetch modes —
   native ``fetchall()`` AND a ``fetch_df`` emulation — so a
   renderer-level dtype coercion can never again pass certification
   offline and fail the driver;
4. uncertain queries (reference isUncertain) and any query whose
   strict form fails certification are retried in limit-lifted form
   (LIMIT re-applied over a total order on canonical columns);
5. writes SPECS (mask, lifted limit, oracle SQL) for every certified
   query; prints an exclusion report for the rest.

Run:  python scripts/gen_corpus_oracles.py
"""

from __future__ import annotations

import os
import pprint
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from flink_tpcds_spark import oracle as oracle_mod  # noqa: E402
from flink_tpcds_spark.queries import corpus  # noqa: E402
from flink_tpcds_spark.session import session_builder  # noqa: E402
from flink_tpcds_spark.tpcds import datagen  # noqa: E402
from flink_tpcds_spark.tpcds.runner import (  # noqa: E402
    UNCERTAIN,
    query_names,
    query_text,
)

OUT = os.path.join(REPO, "flink_tpcds_spark", "tpcds", "oracles.py")

_FLOATY_DUCK = ("DECIMAL", "DOUBLE", "FLOAT", "REAL")
_FLOATY_SPARK = ("double", "float", "decimal")
_INTY_DUCK = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT")


def duck_types(con, name: str) -> list[str]:
    sql = (
        f"WITH {corpus.table_bindings(datagen.generate())}\n"
        f"SELECT * FROM (\n{query_text(name, 'duckdb')}\n) AS t"
    )
    return [r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()]


def duck_null_counts(con, name: str, ncols: int) -> list[int]:
    """Per-column NULL count over the UN-limited query output (a
    superset of both strict and lifted forms — conservative)."""
    inner = corpus.strip_trailing_limit(query_text(name, "duckdb"))
    names = corpus.canon_names(ncols)
    sel = ", ".join(f"count(*) - count({n})" for n in names)
    sql = (
        f"WITH {corpus.table_bindings(datagen.generate())}\n"
        f"SELECT {sel} FROM (\n{inner}\n) AS t({', '.join(names)})"
    )
    return [int(x) for x in con.execute(sql).fetchall()[0]]


def assert_no_fragile_types(con, name: str, mask, lift_limit) -> None:
    """Structural guard: the canonicalized oracle must not emit
    HUGEINT or DATE — neither survives a non-native fetch mode."""
    o_sql = corpus.build_oracle(name, mask, lift_limit).replace(
        corpus.DATA_PLACEHOLDER, datagen.generate()
    )
    types = [r[1] for r in con.execute(f"DESCRIBE {o_sql}").fetchall()]
    bad = [t for t in types if "HUGEINT" in t.upper() or t.upper() == "DATE"]
    assert not bad, f"{name}: canonicalized oracle still emits {bad}"


def spark_types(spark, name: str) -> list[str]:
    return [
        f.dataType.simpleString()
        for f in spark.sql(query_text(name, "spark")).schema.fields
    ]


def certify(spark, name: str, mask, lift_limit) -> tuple[bool, str]:
    """Certify under BOTH oracle fetch modes (fetchall + fetch_df)."""
    o_sql = corpus.build_oracle(name, mask, lift_limit).replace(
        corpus.DATA_PLACEHOLDER, datagen.generate()
    )
    runner = corpus._runner(name, mask, lift_limit)
    df = runner(spark, "")
    for fetch in ("native", "pandas"):
        con = duckdb.connect()  # vanilla, like the driver's
        try:
            res = oracle_mod.compare(name, df, con, o_sql, fetch=fetch)
        finally:
            con.close()
        if not res.ok:
            return False, f"[{fetch}] {res.detail}"
    return True, ""


def main() -> None:
    data_dir = datagen.generate()
    spark = session_builder("gen-corpus-oracles").getOrCreate()
    corpus.ensure_views(spark, data_dir)

    specs: dict[str, dict] = {}
    excluded: dict[str, str] = {}
    t0 = time.time()
    for name in query_names():
        txt = query_text(name, "spark")
        st = spark_types(spark, name)
        con = duckdb.connect()
        try:
            dt = duck_types(con, name)
            nulls = duck_null_counts(con, name, len(dt))
        finally:
            con.close()
        assert len(st) == len(dt), f"{name}: col count {len(st)} vs {len(dt)}"
        mask = []
        for s, d, n in zip(st, dt, nulls):
            du = d.upper()
            if s.startswith(_FLOATY_SPARK) or du.startswith(_FLOATY_DUCK):
                mask.append(corpus.KIND_FLOAT)
            elif du.startswith(_INTY_DUCK) and n > 0:
                # nullable int: degrades to float64 under pandas fetch
                mask.append(corpus.KIND_FLOAT)
            elif "HUGEINT" in du:
                mask.append(corpus.KIND_BIGINT)
            elif du == "DATE":
                mask.append(corpus.KIND_DATESTR)
            else:
                mask.append(corpus.KIND_PASS)
        mask = tuple(mask)
        limit = corpus.trailing_limit(txt)
        forms: list[int | None] = []
        if name in UNCERTAIN and limit is not None:
            forms = [limit]
        elif limit is not None:
            forms = [None, limit]
        else:
            forms = [None]
        ok, detail, used = False, "", None
        for form in forms:
            ok, detail = certify(spark, name, mask, form)
            if ok:
                used = form
                break
        if ok:
            con = duckdb.connect()
            try:
                assert_no_fragile_types(con, name, mask, used)
            finally:
                con.close()
            specs[name] = {
                "mask": mask,
                "limit": used,
                "sql": corpus.build_oracle(name, mask, used),
            }
            lifted = "lifted" if used is not None else "strict"
            print(f"  {name}: OK ({lifted})  [{time.time()-t0:.0f}s]")
        else:
            excluded[name] = detail[:200]
            print(f"  {name}: EXCLUDED — {detail[:120]}")

    header = (
        '"""GENERATED by scripts/gen_corpus_oracles.py — do not edit.\n\n'
        "Certified self-contained DuckDB oracles for the TPC-DS corpus\n"
        "(see queries/corpus.py for the canonicalization contract).\n"
        '"""\n\n'
    )
    with open(OUT, "w") as f:
        f.write(header)
        f.write("SPECS = ")
        f.write(pprint.pformat(specs, width=100, sort_dicts=False))
        f.write("\n\nEXCLUDED = ")
        f.write(pprint.pformat(excluded, width=100, sort_dicts=False))
        f.write("\n")
    print(
        f"wrote {OUT}: {len(specs)} certified, {len(excluded)} excluded "
        f"({time.time()-t0:.0f}s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
