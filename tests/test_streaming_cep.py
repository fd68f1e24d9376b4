"""StreamingCep (streaming/cep.py): generic-pattern CEP.

Ground truth layers:
1. ``match_spans`` == Python ``re.finditer`` (greedy, non-overlapping,
   SKIP PAST LAST ROW) on random symbol strings × random
   deterministic-greedy patterns — pure-Python, hundreds of cases;
2. streaming (random micro-batch splits + flush) == ``batch_cep``;
3. the "D+ U+" instance == StreamingMatchRecognize's span set;
4. state stays bounded on never-matching keys;
5. an anchor row never re-starts a match after a batch boundary.
"""

from __future__ import annotations

import datetime as dt
import random
import re
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_tpcds_spark.streaming.cep import (
    StreamingCep,
    batch_cep,
    compile_pattern,
    match_spans,
)

T0 = dt.datetime(2026, 1, 1)
ROWS_DDL = "user_id long, ts timestamp, event_id long, value double"


# ---------------------------------------------------------------------------
# layer 1: the scanner vs re
# ---------------------------------------------------------------------------


def _re_spans(symbols: str, pattern: str) -> list[tuple[int, int]]:
    rx = pattern.replace(" ", "")
    return [
        (m.start(), m.end())
        for m in re.finditer(rx, symbols)
        if m.end() > m.start()
    ]


def _random_pattern(rnd: random.Random) -> str | None:
    elems = []
    for _ in range(rnd.randint(1, 4)):
        elems.append(
            rnd.choice("DUF") + rnd.choice(["", "+", "*", "?"])
        )
    p = " ".join(elems)
    try:
        compile_pattern(p)
    except ValueError:
        return None
    return p


def test_scanner_equals_re_on_random_cases():
    rnd = random.Random(7)
    checked = 0
    while checked < 400:
        p = _random_pattern(rnd)
        if p is None:
            continue
        s = "".join(rnd.choice("DUF") for _ in range(rnd.randint(0, 30)))
        got, keep_from = match_spans(list(s), compile_pattern(p), True)
        assert got == _re_spans(s, p), (p, s)
        assert keep_from == len(s)
        checked += 1


def test_scanner_hold_prefix_consistency():
    """Non-final spans must be a prefix of the final spans, and
    nothing at or after keep_from may be emitted."""
    rnd = random.Random(9)
    checked = 0
    while checked < 200:
        p = _random_pattern(rnd)
        if p is None:
            continue
        elems = compile_pattern(p)
        s = "".join(rnd.choice("DUF") for _ in range(rnd.randint(1, 25)))
        part, keep_from = match_spans(list(s), elems, False)
        full, _ = match_spans(list(s), elems, True)
        assert part == full[: len(part)], (p, s)
        assert all(b <= keep_from for _a, b in part), (p, s)
        # resuming the scan from keep_from on the full string yields
        # exactly the remaining matches (start-at contract)
        rest, _ = match_spans(list(s), elems, True, start_at=keep_from)
        assert part + rest == full, (p, s)
        checked += 1


def test_ambiguous_patterns_rejected():
    for bad in ("D+ D", "U* U+", "F? F", "D F* U? F+", "D+ U? D"):
        with pytest.raises(ValueError, match="ambiguous"):
            compile_pattern(bad)


# ---------------------------------------------------------------------------
# layers 2-5: the streaming operator
# ---------------------------------------------------------------------------


def _mk_rows(series: dict[int, list[float]]):
    rows = []
    for uid, vals in series.items():
        for i, v in enumerate(vals):
            rows.append(
                (uid, T0 + dt.timedelta(minutes=i), 1000 * uid + i, float(v))
            )
    return rows


def _drive(spark, rows, pattern, n_batches, lateness_min=5):
    work = tempfile.mkdtemp(prefix="st_cep_")
    m = StreamingCep(
        work + "/state", pattern, dt.timedelta(minutes=lateness_min)
    )
    arr = sorted(rows, key=lambda r: (r[1], r[2]))
    step = max(1, (len(arr) + n_batches - 1) // n_batches)
    for b, i in enumerate(range(0, len(arr), step)):
        m.foreach_batch(
            spark.createDataFrame(arr[i : i + step], ROWS_DDL), b
        )
    m.flush(spark)
    got = {
        tuple(r)
        for r in m.matches(spark)
        .select("user_id", "start_ts", "end_ts", "n_rows", "symbols")
        .collect()
    }
    return m, got


def test_streaming_equals_batch_v_pattern(spark):
    rows = _mk_rows(
        {
            1: [5, 4, 3, 4, 5, 2, 1, 3],
            2: [1, 2, 3, 4],
            5: [5, 1, 5, 1, 5],
        }
    )
    _, got = _drive(spark, rows, "D+ U+", n_batches=4)
    want = set(batch_cep(spark.createDataFrame(rows, ROWS_DDL), "D+ U+"))
    assert got == want and len(got) >= 3


def test_streaming_matches_vshape_operator(spark):
    from flink_tpcds_spark.streaming.match import StreamingMatchRecognize

    rnd = random.Random(11)
    series = {
        uid: [rnd.randint(0, 5) for _ in range(rnd.randint(5, 30))]
        for uid in range(1, 6)
    }
    rows = _mk_rows(series)
    _, got = _drive(spark, rows, "D+ U+", n_batches=5)
    work = tempfile.mkdtemp(prefix="st_vs_")
    vm = StreamingMatchRecognize(work + "/s", dt.timedelta(minutes=5))
    arr = sorted(rows, key=lambda r: (r[1], r[2]))
    step = max(1, (len(arr) + 4) // 5)
    for b, i in enumerate(range(0, len(arr), step)):
        vm.foreach_batch(
            spark.createDataFrame(arr[i : i + step], ROWS_DDL), b
        )
    vm.flush(spark)
    v = {
        (r.user_id, r.start_ts, r.end_ts, r.down_rows + r.up_rows)
        for r in vm.matches(spark).collect()
    }
    assert {(u, s, e, n) for (u, s, e, n, _sym) in got} == v


def test_random_patterns_random_splits(spark):
    rnd = random.Random(23)
    series = {
        uid: [rnd.randint(0, 3) for _ in range(rnd.randint(4, 25))]
        for uid in range(1, 5)
    }
    rows = _mk_rows(series)
    df = spark.createDataFrame(rows, ROWS_DDL)
    tried = 0
    while tried < 4:
        p = _random_pattern(rnd)
        if p is None:
            continue
        _, got = _drive(spark, rows, p, n_batches=rnd.randint(1, 6))
        assert got == set(batch_cep(df, p)), p
        tried += 1


def test_replay_is_idempotent(spark):
    rows = _mk_rows({1: [5, 4, 3, 4, 5, 2, 1, 3]})
    work = tempfile.mkdtemp(prefix="st_cep_")
    m = StreamingCep(work + "/s", "D+ U+", dt.timedelta(minutes=5))
    df1 = spark.createDataFrame(rows[:4], ROWS_DDL)
    df2 = spark.createDataFrame(rows[4:], ROWS_DDL)
    m.foreach_batch(df1, 0)
    m.foreach_batch(df1, 0)
    m.foreach_batch(df2, 1)
    m.foreach_batch(df2, 1)
    m.flush(spark)
    got = {tuple(r) for r in m.matches(spark).collect()}
    assert got == set(
        batch_cep(spark.createDataFrame(rows, ROWS_DDL), "D+ U+")
    )


def test_anchor_cannot_restart_match(spark):
    """Pattern starting on 'F': the first row of every key classifies
    as F, so a re-scanned anchor would duplicate matches — the anchor
    kind must prevent that across any batch split."""
    rows = _mk_rows({1: [2, 1, 2, 2, 1, 2]})  # F D U F D U
    df = spark.createDataFrame(rows, ROWS_DDL)
    want = set(batch_cep(df, "F D U"))
    assert len(want) == 2
    for n_batches in (1, 2, 3, 6):
        _, got = _drive(spark, rows, "F D U", n_batches=n_batches)
        assert got == want, n_batches


def test_state_bounded_on_never_matching_key(spark):
    rows = _mk_rows({1: list(range(120))})  # monotone: never D
    work = tempfile.mkdtemp(prefix="st_cep_")
    m = StreamingCep(work + "/s", "D+ U+", dt.timedelta(minutes=3))
    for b, i in enumerate(range(0, 120, 20)):
        m.foreach_batch(
            spark.createDataFrame(rows[i : i + 20], ROWS_DDL), b
        )
        pend = (
            m._state(spark)
            .filter(F.col("kind").isin("pending", "anchor"))
            .count()
        )
        assert pend <= 1 + 3 + 20, f"batch {b}: {pend}"
    m.flush(spark)
    assert m.matches(spark).count() == 0


def test_untouched_keys_pass_through(spark):
    """A batch touching only key 1 must not re-scan key 2: key 2's
    pending/anchor state survives verbatim (the O(touched-keys)
    per-batch property), and the final result is still exact."""
    rows1 = _mk_rows({1: [5, 4, 3, 4, 5]})
    rows2 = _mk_rows({2: [3, 2, 3, 2, 3]})
    work = tempfile.mkdtemp(prefix="st_cep_")
    m = StreamingCep(work + "/s", "D+ U+", dt.timedelta(minutes=2))
    m.foreach_batch(spark.createDataFrame(rows1 + rows2, ROWS_DDL), 0)
    before = sorted(
        tuple(r)
        for r in m._state(spark)
        .filter(
            F.col("kind").isin("pending", "anchor")
            & (F.col("user_id") == 2)
        )
        .collect()
    )
    # key-1-only batch with the SAME max ts: watermark cannot advance,
    # so key 2 is untouched
    extra1 = [(1, T0 + dt.timedelta(minutes=4), 1999, 5.0)]
    m.foreach_batch(spark.createDataFrame(extra1, ROWS_DDL), 1)
    after = sorted(
        tuple(r)
        for r in m._state(spark)
        .filter(
            F.col("kind").isin("pending", "anchor")
            & (F.col("user_id") == 2)
        )
        .collect()
    )
    assert after == before and len(after) > 0
    m.flush(spark)
    want = set(
        batch_cep(
            spark.createDataFrame(rows1 + rows2 + extra1, ROWS_DDL),
            "D+ U+",
        )
    )
    got = {tuple(r) for r in m.matches(spark).collect()}
    assert got == want
