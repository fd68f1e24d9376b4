"""Mirror of the driver's correctness gate: every queries() entry with
an oracle must hash-match DuckDB on the same parquet tables.

This is the translation of the reference's golden-file comparison
(TpcDsBatchExecITCase / BatchTestBase.compareResult) — the oracle
replaces checked-in golden results.
"""

from __future__ import annotations

import pytest

from flink_tpcds_spark.oracle import banned_final_types, certify, compare
from flink_tpcds_spark.queries import all_oracles, all_queries

_QUERIES = all_queries()
_ORACLES = all_oracles()

# The TPC-DS corpus is parity-gated in tests/test_tpcds.py AND every
# registered oracle was certified offline with this exact comparison
# (scripts/gen_corpus_oracles.py), so re-running all 103 here would
# only double the suite's runtime. A small sample stays to prove the
# registered wiring (rotation, canonicalization, self-contained
# oracle text) end-to-end.
_CORPUS_SAMPLE = {"q3", "q7", "q23a", "q76", "q96"}
_PARITY = sorted(
    n for n in _QUERIES if not n.startswith("q") or n in _CORPUS_SAMPLE
)


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_driver_window_is_fully_oracled():
    """The first 50 entries (the driver's sweep window) must all be
    hash-checkable — zero rows-only entries in the window."""
    window = list(_QUERIES)[:50]
    assert len(window) == 50
    assert [n for n in window if n not in _ORACLES] == []


@pytest.mark.parametrize("name", _PARITY)
def test_query_matches_oracle(name, spark, oracle_con, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    if not name.startswith("q"):
        # r11 class guard (VERDICT r10): suite entries may not emit
        # DECIMAL/ARRAY/MAP/STRUCT final columns — the driver's pandas
        # canonicalization renders or crashes on them divergently.
        # Corpus entries are exempt: their generator canonicalizes.
        assert banned_final_types(df.schema) == [], (
            f"{name} emits driver-canon-unsafe final columns: "
            f"{banned_final_types(df.schema)} — bridge with CAST AS "
            f"DOUBLE / array_join on BOTH engines"
        )
    if name not in _ORACLES:
        # rows-only check (non-SQL-expressible op) — must at least run.
        assert df.count() >= 0
        return
    # Three-mode certification, one Spark job (oracle.certify): the
    # native hash plus the two pandas-coercion modes that caught the
    # r4 (HUGEINT) and r10 (DECIMAL/ARRAY) locally-green-driver-red
    # classes.
    for res, fetch in zip(
        certify(name, df, oracle_con, _ORACLES[name]),
        ("native", "pandas", "driver"),
    ):
        assert res.ok, (
            f"{name} [{fetch}]: rows {res.spark_rows}/{res.oracle_rows}, "
            f"cols_match={res.columns_match}, hash_match={res.hash_match}, "
            f"{res.detail}"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


# ---------------------------------------------------------------------------
# Fetch-mode parity (round-5 hardening, VERDICT r4 items 1 & 5).
#
# The round-4 driver reds (q14a/q21/q29/q35) were a renderer-level gap:
# DuckDB HUGEINT survives fetchall() but degrades to float64 under a
# pandas fetch, so the value hash diverged only in the driver. Oracles
# are now certified under BOTH fetch modes; these tests keep that
# property (and its Spark-side mirror) pinned in CI.
# ---------------------------------------------------------------------------

_FAMILY_SQL = {
    "decimal": "SELECT CAST(1.23 AS DECIMAL(10,2)) c UNION ALL SELECT 4.5",
    "date": "SELECT DATE'1998-03-24' c UNION ALL SELECT DATE'2001-01-01'",
    "timestamp": (
        "SELECT TIMESTAMP'1998-03-24 01:02:03.123456' c "
        "UNION ALL SELECT TIMESTAMP'2001-01-01 00:00:00'"
    ),
    "array": "SELECT array(1,2) c UNION ALL SELECT array(3)",
    "bigint": "SELECT CAST(1 AS BIGINT) c UNION ALL SELECT 2",
    "double_null": "SELECT CAST(NULL AS DOUBLE) c UNION ALL SELECT 1.5E0",
    "string_null": "SELECT CAST(NULL AS STRING) c UNION ALL SELECT 'x'",
}


@pytest.mark.parametrize("family", sorted(_FAMILY_SQL))
def test_spark_fetch_mode_parity(family, spark):
    """collect() and a pandas fetch of the SAME Spark result must
    render identically under the driver hash for every output-type
    family the engine emits. (Nullable-int is deliberately absent:
    it is the one divergent family — toPandas coerces it to float64 —
    so corpus canonicalization folds nullable ints into the double
    mask; see queries/corpus.py.)"""
    from flink_tpcds_spark.oracle import pandas_rows, value_hash

    df = spark.sql(_FAMILY_SQL[family])
    native = [tuple(r) for r in df.collect()]
    via_pandas = pandas_rows(df.toPandas())
    assert value_hash(df.columns, native) == value_hash(
        df.columns, via_pandas
    ), f"{family}: {native} vs {via_pandas}"


def test_nullable_int_is_the_divergent_family(spark):
    """Documents WHY nullable ints are canonicalized away: a pandas
    fetch renders 1 as 1.0 once the column holds a NULL. If this ever
    starts passing, the defensive mask in gen_corpus_oracles can be
    retired."""
    from flink_tpcds_spark.oracle import pandas_rows, value_hash

    df = spark.sql("SELECT CAST(NULL AS BIGINT) c UNION ALL SELECT 1")
    native = [tuple(r) for r in df.collect()]
    via_pandas = pandas_rows(df.toPandas())
    assert value_hash(df.columns, native) != value_hash(df.columns, via_pandas)


@pytest.mark.parametrize("name", sorted(_CORPUS_SAMPLE | {"q14a", "q21", "q29", "q35", "q51", "q67"}))
def test_corpus_oracle_both_fetch_modes(name, spark, oracle_con, sf_dir):
    """Corpus entries must hash-match DuckDB under BOTH oracle fetch
    modes (fetchall + fetch_df) — the exact certification the round-4
    driver reds lacked. Sample = standing corpus sample + the four
    round-4 red queries (HUGEINT) + q51 (DATE output) + q67
    (nullable-int output)."""
    df = _QUERIES[name](spark, sf_dir)
    df.persist()
    try:
        for fetch in ("native", "pandas"):
            res = compare(name, df, oracle_con, _ORACLES[name], fetch=fetch)
            assert res.ok, (
                f"{name} [{fetch}]: rows {res.spark_rows}/{res.oracle_rows}, "
                f"{res.detail}"
            )
    finally:
        df.unpersist()


def test_window_rotation_is_status_aware(tmp_path, monkeypatch):
    """The driver window must (1) pin red-but-seen queries first,
    (2) drain never-seen corpus queries next, (3) rotate greens out —
    driven purely by the CORRECTNESS_r*.json files at the repo root
    (round 4's rotation silently froze by globbing the wrong dir)."""
    import json

    import flink_tpcds_spark.queries as q

    corpus_names = [n for n in _QUERIES if n.startswith("q")]
    some_green = corpus_names[:30]
    some_red = corpus_names[30:34]
    rows = {}
    for n in some_green:
        rows[n] = {"rows_match": True, "schema_match": True,
                   "hash_match": True, "err": None}
    for n in some_red:
        rows[n] = {"rows_match": True, "schema_match": True,
                   "hash_match": False, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    monkeypatch.setattr(q, "_REPO", str(tmp_path))

    window = list(q.all_queries())[:50]
    # red queries pinned at the very front (their relative order is
    # SUITE-definition order, which may differ from _QUERIES' live
    # window order that some_red was sampled from — compare as a set)
    assert set(window[: len(some_red)]) == set(some_red)
    # greens rotated out of the window entirely
    assert not (set(window) & set(some_green))
    # the rest of the window is never-seen entries only
    assert all(n not in rows for n in window[len(some_red):])


def test_window_rotation_green_beats_old_red(tmp_path, monkeypatch):
    """A query red in round N but green in round N+1 must NOT stay
    pinned — any green row anywhere clears it."""
    import json

    import flink_tpcds_spark.queries as q

    name = next(n for n in _QUERIES if n.startswith("q"))
    red = {name: {"rows_match": True, "schema_match": True,
                  "hash_match": False, "err": None}}
    green = {name: {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(red))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(green))
    monkeypatch.setattr(q, "_REPO", str(tmp_path))
    assert name not in list(q.all_queries())[:50]


def test_window_rotation_corpus_outranks_new_suite_ops(tmp_path, monkeypatch):
    """Until the TPC-DS corpus is fully driver-confirmed, unseen
    corpus queries must fill the window BEFORE unseen non-corpus
    operators (the corpus is the standing top ask; new operators
    queue for the following round)."""
    import json

    import flink_tpcds_spark.queries as q

    corpus_names = [n for n in _QUERIES if n.startswith("q")]
    # mark some corpus green, leaving more unseen corpus than window
    rows = {
        n: {"rows_match": True, "schema_match": True,
            "hash_match": True, "err": None}
        for n in corpus_names[:40]
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    monkeypatch.setattr(q, "_REPO", str(tmp_path))
    window = list(q.all_queries())[:50]
    unseen_corpus = [n for n in corpus_names if n not in rows]
    # with 63 unseen corpus queries the whole window is corpus
    assert len(unseen_corpus) >= 50
    assert all(n in unseen_corpus for n in window)


def test_window_rotation_steady_state_reconfirms_stalest_greens(
    tmp_path, monkeypatch
):
    """Steady state (0 red, 0 unseen): the window must hold the 50
    queries whose last green row is OLDEST, so regressions resurface
    within ⌈N/50⌉ rounds instead of hiding behind an ancient green."""
    import json

    import flink_tpcds_spark.queries as q

    names = [n for mod in q._modules() for n in mod.QUERIES]
    # everything green; first 80 certified in r1, the rest in r2
    r1 = {n: {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None} for n in names[:80]}
    r2 = {n: {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None} for n in names[80:]}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(r1))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(r2))
    monkeypatch.setattr(q, "_REPO", str(tmp_path))
    monkeypatch.setattr(q, "_PRIORITY_RECHECK", {})
    window = list(q.all_queries())[:50]
    # all 50 come from the r1 (stalest) cohort, in stable suite order
    assert window == names[:50]

    # a changed-implementation entry (priority recheck with a round
    # threshold ABOVE its latest green) jumps ahead of the
    # stale-green cohort even when its own green is FRESH …
    monkeypatch.setattr(q, "_PRIORITY_RECHECK", {names[-1]: 3})
    window = list(q.all_queries())[:50]
    assert window[0] == names[-1]
    assert window[1:] == names[:49]

    # … but DEMOTES once the driver certifies it in a round >= the
    # threshold (one early re-confirmation, not a standing
    # reservation that would starve the rotation)
    import json as _json

    r3 = {names[-1]: {"rows_match": True, "schema_match": True,
                      "hash_match": True, "err": None}}
    (tmp_path / "CORRECTNESS_r03.json").write_text(_json.dumps(r3))
    window = list(q.all_queries())[:50]
    assert names[-1] not in window  # freshest green → back of the line
    assert window == names[:50]


def test_window_rotation_full_registry_recertifies(tmp_path, monkeypatch):
    """Simulated driver loop AGAINST THE REAL _PRIORITY_RECHECK dict:
    with everything green once, successive 50-entry windows must
    re-certify EVERY registered query within ⌈N/50⌉ + 1 rounds (the
    +1 absorbs the one-shot priority re-confirmations; a PERPETUAL
    priority bump would starve stale greens and fail this gate —
    exactly what the round-12 threshold semantics prevent).
    Simulated round numbers start above every threshold so the
    demotion path is the one exercised."""
    import json
    import math

    import flink_tpcds_spark.queries as q

    names = list(_QUERIES)
    green = {n: {"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None} for n in names}
    (tmp_path / "CORRECTNESS_r50.json").write_text(json.dumps(green))
    monkeypatch.setattr(q, "_REPO", str(tmp_path))
    assert all(thr <= 50 for thr in q._PRIORITY_RECHECK.values()), (
        "simulation starts at round 51; bump its base above every "
        "_PRIORITY_RECHECK threshold"
    )

    need = math.ceil(len(names) / 50) + 1
    recertified: set[str] = set()
    for rnd in range(51, 51 + need):
        window = list(q.all_queries())[:50]
        rows = {n: {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None} for n in window}
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(rows)
        )
        recertified.update(window)
    assert recertified == set(names), (
        f"{len(names) - len(recertified)} queries starved: "
        f"{sorted(set(names) - recertified)[:5]}"
    )


def test_window_rotation_red_still_outranks_stale_green(
    tmp_path, monkeypatch
):
    """A red query must pin ahead of even the stalest green."""
    import json

    import flink_tpcds_spark.queries as q

    names = [n for mod in q._modules() for n in mod.QUERIES]
    rows = {n: {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": None} for n in names}
    rows[names[200]] = {"rows_match": True, "schema_match": True,
                        "hash_match": False, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    monkeypatch.setattr(q, "_REPO", str(tmp_path))
    window = list(q.all_queries())[:50]
    assert window[0] == names[200]
