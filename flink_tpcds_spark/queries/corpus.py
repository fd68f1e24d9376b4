"""TPC-DS corpus queries registered under the driver's hard gate.

The 103-query corpus (vendored from the reference's
``TpcDsBatchExecITCase.scala`` resource set) already passes a local
Spark-vs-DuckDB parity gate (tpcds/runner.py). This module puts the
same corpus under the *driver's* correctness gate: each entry runs
the vendored SQL on Spark over the deterministic 24-table generator
output, and its oracle is a **self-contained** DuckDB statement that
binds every table via ``read_parquet('<abs path>')`` CTEs — so the
driver's vanilla DuckDB connection (which only knows the TPC-H-ish
sf tables) can execute it verbatim.

Cross-engine hash stability is engineered, not hoped for:

- output columns are renamed positionally to ``c00..cNN`` on BOTH
  sides (unaliased aggregate names differ between engines);
- every column that is floating/decimal on EITHER engine is
  canonicalized to ``round(CAST(x AS DOUBLE), 4) + 0.0`` on BOTH
  sides (4 digits = the reference comparator's precision,
  TpcUtils.scala DecimalFormat "0.0000"; ``+ 0.0`` folds IEEE -0.0);
- integer columns DuckDB types as HUGEINT (``sum(INTEGER)`` etc.)
  are ``CAST(.. AS BIGINT)`` on both sides: HUGEINT survives neither
  a pandas fetch (``fetch_df`` coerces INT128 → float64, rendering
  ``123.0`` vs Spark's ``123`` — the exact round-4 driver red rows)
  nor an Arrow fetch (decimal128 → ``Decimal``). Values are int
  sums at certification scale, nowhere near 2^63;
- integer columns that CONTAIN NULLs at certification scale are
  folded into the float-round mask instead: a nullable int64 column
  also degrades to float64 under a pandas fetch, while NULL-bearing
  DOUBLE columns are a driver-proven-green class (round-4 q2/q13/
  q17), so both engines render such columns as rounded doubles;
- DATE columns are cast to their ISO-8601 VARCHAR form on both
  sides: a pandas fetch turns DATE into datetime64 (``1998-03-24
  00:00:00`` vs native ``1998-03-24``), and no driver-green row has
  ever contained a DATE output, so the type is canonicalized away
  (ISO strings also sort identically to the dates they encode);
- queries whose trailing ``ORDER BY … LIMIT n`` is tie-ambiguous
  (the reference's ``isUncertain`` set, plus any query whose strict
  form fails offline certification) are *limit-lifted*: the LIMIT is
  removed, and a total order over all canonical output columns
  (``NULLS FIRST`` pinned on both engines) re-applies it — two rows
  that tie on every canonical column are interchangeable, so the
  selected canonical multiset is engine-deterministic.

Which queries use which form, the per-column canonicalization mask,
and the final oracle text are produced offline by
``scripts/gen_corpus_oracles.py``, which also *certifies* every
registered query by running the exact driver comparison (column
match + order-insensitive value hash, ``oracle.py``) against a
vanilla DuckDB connection. Only certified queries are registered.

Arithmetic contract for NON-corpus (suite) oracles, which run
byte-identical SQL without this canonicalization: division by a
literal with a non-terminating decimal expansion (any divisor with a
prime factor other than 2/5) is BANNED outside a
``CAST(... AS DOUBLE)`` context — DuckDB computes DECIMAL/INTEGER in
DOUBLE while Spark divides exactly in decimal and HALF_UP-rounds, so
such quotients flip near rounding boundaries (CORRECTNESS_r09's
``ops_lateral_alias`` red). Enforced by ``tests/test_oracle_lint.py``.

Output-type contract for suite oracles (round 11): the FINAL Spark
schema may not contain DECIMAL, ARRAY, MAP or STRUCT columns. The
driver canonicalizes both engines through pandas, where DuckDB's
``fetch_df`` coerces DECIMAL → float64 while Spark keeps
``decimal.Decimal`` (rendered differently → hash mismatch at
matching rows/schema: CORRECTNESS_r10's ``ops_lateral_alias`` /
``ops_mv_rewrite`` / ``ops_mv_incremental``), and container cells
crash pandas ``factorize`` outright (``dp_bpe_tokens``). Bridge in
the final select on BOTH engines: ``CAST(x AS DOUBLE)`` for decimals
(exact while values terminate within 2^53) and
``array_join``/``array_to_string`` for arrays. Enforced over every
built suite DataFrame by ``tests/test_oracle_parity.py`` and by
``oracle.compare(fetch="driver")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tpcds import datagen
from ..tpcds.runner import query_text, strip_trailing_limit, trailing_limit  # noqa: F401 — re-exported for gen_corpus_oracles.py
from ..tpcds.schema import TPCDS_SCHEMAS

DATA_PLACEHOLDER = "__TPCDS_DATA__"


def canon_names(ncols: int) -> list[str]:
    return [f"c{i:02d}" for i in range(ncols)]


#: Mask kinds (per output column position):
KIND_PASS = 0  #: pass through unchanged
KIND_FLOAT = 1  #: round(CAST(x AS DOUBLE), 4) + 0.0 on both sides
KIND_BIGINT = 2  #: CAST(x AS BIGINT) on both sides (DuckDB HUGEINT)
KIND_DATESTR = 3  #: CAST(x AS VARCHAR/string) — ISO form, both sides


def canonicalize_df(df: DataFrame, mask: tuple[int, ...]) -> DataFrame:
    """Positional rename to c00..cNN; masked columns → rounded double
    (kind 1) or bigint (kind 2).

    ``toDF`` renames positionally first: corpus queries can emit
    duplicate column names (e.g. q76's ``channel``), which name-based
    selection cannot address.
    """
    df = df.toDF(*canon_names(len(mask)))
    cols = []
    for name, kind in zip(df.columns, mask):
        c = F.col(name)
        if kind == KIND_FLOAT:
            c = F.round(c.cast("double"), 4) + F.lit(0.0)
        elif kind == KIND_BIGINT:
            c = c.cast("bigint")
        elif kind == KIND_DATESTR:
            c = c.cast("string")
        cols.append(c.alias(name))
    return df.select(*cols)


def table_bindings(data_dir: str = DATA_PLACEHOLDER) -> str:
    """CTE prefix binding all 24 TPC-DS tables to their parquet files.

    Unreferenced CTEs are pruned by DuckDB's planner, so binding the
    full schema costs nothing and keeps the oracle builder uniform.
    """
    return ",\n  ".join(
        f"{t} AS (SELECT * FROM read_parquet('{data_dir}/{t}.parquet'))"
        for t in TPCDS_SCHEMAS
    )


def build_oracle(name: str, mask: tuple[int, ...], lift_limit: int | None) -> str:
    """Self-contained DuckDB oracle for one corpus query (path uses
    DATA_PLACEHOLDER; substitute before executing)."""
    inner = query_text(name, "duckdb")
    if lift_limit is not None:
        inner = strip_trailing_limit(inner)
    names = canon_names(len(mask))

    def _canon(n: str, kind: int) -> str:
        if kind == KIND_FLOAT:
            return f"(round(CAST({n} AS DOUBLE), 4) + 0.0) AS {n}"
        if kind == KIND_BIGINT:
            return f"CAST({n} AS BIGINT) AS {n}"
        if kind == KIND_DATESTR:
            return f"CAST({n} AS VARCHAR) AS {n}"
        return n

    sel = ", ".join(_canon(n, m) for n, m in zip(names, mask))
    alias = ", ".join(names)
    sql = (
        f"WITH {table_bindings()}\n"
        f"SELECT {sel} FROM (\n{inner}\n) AS t({alias})"
    )
    if lift_limit is not None:
        order = ", ".join(f"{n} NULLS FIRST" for n in names)
        sql = (
            f"SELECT * FROM (\n{sql}\n) AS lifted "
            f"ORDER BY {order} LIMIT {lift_limit}"
        )
    return sql


_VIEWS_READY: set[tuple[int, str]] = set()


def ensure_views(spark: SparkSession, data_dir: str) -> None:
    key = (id(spark), data_dir)
    if key in _VIEWS_READY:
        return
    for t in TPCDS_SCHEMAS:
        spark.read.parquet(f"{data_dir}/{t}.parquet").createOrReplaceTempView(t)
    _VIEWS_READY.add(key)


def _runner(name: str, mask: tuple[int, ...], lift_limit: int | None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # sf_dir intentionally unused: the corpus runs on its own
        # deterministic 24-table generator output (same data the
        # oracle's read_parquet bindings point at).
        data_dir = datagen.generate()
        ensure_views(spark, data_dir)
        txt = query_text(name, "spark")
        if lift_limit is not None:
            txt = strip_trailing_limit(txt)
        df = canonicalize_df(spark.sql(txt), mask)
        if lift_limit is not None:
            df = df.orderBy(
                *[F.col(c).asc_nulls_first() for c in df.columns]
            ).limit(lift_limit)
        return df

    run.__name__ = f"corpus_{name}"
    run.__doc__ = (
        f"TPC-DS corpus {name} (vendored reference SQL) with "
        f"canonicalized output; oracle is self-contained DuckDB."
    )
    return run


def _build() -> tuple[dict, dict]:
    try:
        from ..tpcds.oracles import SPECS
    except ImportError:  # oracles not generated yet
        return {}, {}
    queries: dict = {}
    oracles: dict = {}
    data_dir = datagen.generate()
    for name, spec in SPECS.items():
        key = name  # corpus names q1..q99 don't collide with suites
        queries[key] = _runner(name, spec["mask"], spec["limit"])
        oracles[key] = spec["sql"].replace(DATA_PLACEHOLDER, data_dir)
    return queries, oracles


QUERIES, ORACLES = _build()
