"""Randomized differential testing: Spark vs DuckDB on generated SQL.

The reference's correctness net is fixed golden outputs (SURVEY §5 —
"No randomized/property-based testing"). This goes beyond it:
hypothesis generates predicates over a dialect-neutral SQL template
(decimal-bridged SUM, so float aggregation is bit-deterministic in
both engines — the repo's decimal-bridge rule), and the exact same
query text must hash-match between Spark and DuckDB.

The grammar deliberately stays inside the common dialect (int
compares, modulo, string equality, timestamp literals) — the
dialect-divergent constructs (division, casts, NULL ordering) are
covered by the curated oracle suite instead.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_tpcds_spark.oracle import value_hash
from flink_tpcds_spark.schemas import load_table

_ATOMS = [
    lambda draw: f"l_quantity < {draw(st.integers(1, 50))}",
    lambda draw: (
        f"l_orderkey % {draw(st.sampled_from([2, 3, 5, 7]))}"
        f" = {draw(st.integers(0, 1))}"
    ),
    lambda draw: f"l_returnflag = '{draw(st.sampled_from('ANR'))}'",
    lambda draw: f"l_linestatus = '{draw(st.sampled_from('FO'))}'",
    lambda draw: f"l_extendedprice > {draw(st.integers(100, 90000))}",
    lambda draw: (
        "l_shipdate < TIMESTAMP '"
        f"199{draw(st.integers(5, 8))}-"
        f"{draw(st.integers(1, 12)):02d}-15 00:00:00'"
    ),
]


@st.composite
def predicates(draw):
    n = draw(st.integers(1, 3))
    parts = []
    for _ in range(n):
        atom = draw(st.sampled_from(_ATOMS))(draw)
        if draw(st.booleans()):
            atom = f"NOT ({atom})"
        parts.append(atom)
    ops = [draw(st.sampled_from([" AND ", " OR "])) for _ in range(n - 1)]
    out = parts[0]
    for op, p in zip(ops, parts[1:]):
        out = f"({out}{op}{p})"
    return out


def _sql(pred: str) -> str:
    return f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s_qty,
           MIN(l_extendedprice) AS mn_price, MAX(l_orderkey) AS mx_ok
    FROM lineitem
    WHERE {pred}
    GROUP BY l_returnflag, l_linestatus
    """


@pytest.fixture(scope="module")
def lineitem_view(spark, sf_dir):
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicates())
def test_random_aggregates_match_duckdb(lineitem_view, oracle_con, pred):
    sql = _sql(pred)
    s = lineitem_view.sql(sql)
    s_rows = [tuple(r) for r in s.collect()]
    r = oracle_con.execute(sql)
    o_cols = [d[0] for d in r.description]
    o_rows = r.fetchall()
    assert value_hash(s.columns, s_rows) == value_hash(o_cols, o_rows), (
        f"divergence on: {pred!r}"
    )


# ---------------------------------------------------------------------------
# Property tests for the curation text operators (round 5): invariants
# that must hold on ARBITRARY text, not just the synthetic corpus.
# ---------------------------------------------------------------------------

_texts = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
            whitelist_characters="@.+-_",
        ),
        max_size=120,
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts)
def test_pii_scrub_idempotent_and_clean(spark, texts):
    """Scrubbing is idempotent (scrub(scrub(x)) == scrub(x)) and the
    scrubbed text never matches any PII pattern again — on arbitrary
    unicode-ish input, not just the corpus."""
    from flink_tpcds_spark.datapipe.text import scrub_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = scrub_pii(df).select(
        "doc_id", F.col("text_scrubbed").alias("text")
    )
    twice = scrub_pii(once)
    rows = twice.collect()
    for r in rows:
        assert r.text_scrubbed == r.text  # idempotent
        assert (r.pii_n_emails, r.pii_n_phones, r.pii_n_ips) == (0, 0, 0)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts)
def test_repetition_ratio_bounds(spark, texts):
    """top_bigram_ratio ∈ (0, 1]; counts are consistent
    (top ≤ total, total = n_tokens − 1 per emitted doc)."""
    from flink_tpcds_spark.datapipe.text import repetition_stats, tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ntok = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n")
        ).collect()
    }
    for r in repetition_stats(df).collect():
        assert 0 < r.top_bigram_ratio <= 1.0
        assert r.top_bigram_n <= r.n_bigrams
        assert r.n_bigrams == ntok[r.doc_id] - 1


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=_texts,
    chunk=st.integers(4, 32),
    overlap=st.integers(0, 3),
)
def test_chunk_documents_tiles_arbitrary_text(spark, texts, chunk, overlap):
    """On arbitrary unicode-ish input: chunks exactly tile the token
    stream (reconstruction via overlap-stripping), every chunk is the
    literal token slice at its offset, and chunk counts match the
    closed-form ceil((n-overlap)/stride)."""
    from flink_tpcds_spark.datapipe.curate import chunk_documents
    from flink_tpcds_spark.datapipe.text import tokens as tok_expr

    stride = chunk - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    originals = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", tok_expr(F.col("text")).alias("t")
        ).collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunk_documents(df, chunk, overlap).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {i for i, t in originals.items() if t}
    for doc_id, rows in by_doc.items():
        toks = originals[doc_id]
        rows.sort(key=lambda r: r.chunk_id)
        n = len(toks)
        want_chunks = max(1, -((n - overlap) // -stride))  # ceil div
        assert [r.chunk_id for r in rows] == list(range(want_chunks))
        rebuilt: list[str] = []
        for r in rows:
            ctoks = r.chunk_text.split(" ") if r.chunk_text else []
            assert ctoks == toks[r.chunk_id * stride : r.chunk_id * stride + chunk]
            rebuilt.extend(ctoks if not rebuilt else ctoks[overlap:])
        assert rebuilt == toks


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts, min_docs=st.integers(2, 4))
def test_boilerplate_removal_invariants(spark, texts, min_docs):
    """On arbitrary input: dropped counts are consistent (0 ≤ dropped
    ≤ n_tokens), docs with no boilerplate hash to their original
    token stream, and a second pass over already-cleaned counts never
    drops more than the first (the blocklist only shrinks)."""
    import hashlib

    from flink_tpcds_spark.datapipe.dedup import remove_boilerplate_ngrams
    from flink_tpcds_spark.datapipe.text import tokens as tok_expr

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    originals = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", tok_expr(F.col("text")).alias("t")
        ).collect()
    }
    out = remove_boilerplate_ngrams(df, k=3, min_docs=min_docs).collect()
    assert {r.doc_id for r in out} == {
        i for i, t in originals.items() if len(t) >= 3
    }
    for r in out:
        assert 0 <= r.n_dropped <= r.n_tokens
        assert r.n_tokens == len(originals[r.doc_id])
        if r.n_dropped == 0:
            want = hashlib.md5(
                " ".join(originals[r.doc_id]).encode()
            ).hexdigest()
            assert r.clean_md5 == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts, holdout_mod=st.integers(2, 4))
def test_curation_ledger_is_a_partition(spark, texts, holdout_mod):
    """The ledger covers every input doc exactly once with a valid
    status, holdout flags are honored verbatim, and `kept` docs have
    unique texts among themselves (no surviving exact dup)."""
    from flink_tpcds_spark.datapipe.pipeline import curation_ledger

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ledger = curation_ledger(df, F.col("doc_id") % holdout_mod == 0).collect()
    assert len(ledger) == len(texts)
    statuses = {
        "holdout", "low_quality", "exact_dup", "near_dup",
        "contaminated", "kept",
    }
    by_id = {r.doc_id: r.status for r in ledger}
    assert set(by_id) == set(range(len(texts)))
    assert set(by_id.values()) <= statuses
    for i in range(len(texts)):
        assert (by_id[i] == "holdout") == (i % holdout_mod == 0)
    kept_texts = [texts[i] for i, s in by_id.items() if s == "kept"]
    assert len(kept_texts) == len(set(kept_texts))
