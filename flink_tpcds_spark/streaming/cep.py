"""Generic-pattern streaming CEP: MATCH_RECOGNIZE over arbitrary
quantified symbol chains, the NFA core of the reference's
StreamExecMatch (flink-table-planner-blink .../stream/
StreamExecMatch.scala backed by flink-cep's NFA/SharedBuffer).

Pattern language: a chain of quantified symbols — ``"D+ U+"``,
``"A B? C+"``, ``"X* Y"`` — with greedy quantifiers and AFTER MATCH
SKIP PAST LAST ROW. The compiler admits only the DETERMINISTIC-GREEDY
class: adjacent elements may not match the same symbol when the
earlier one is variable-length (``A+ A?`` is rejected), so the greedy
longest match is computed by a single forward scan with no
backtracking — and is provably identical to Python ``re`` with greedy
quantifiers on the same symbol string (property-tested). This class
covers the MATCH_RECOGNIZE patterns the reference's corpus and docs
exercise (V-shapes, W-shapes, bounded sequences); full alternation
would need flink-cep's versioned SharedBuffer, which nothing here
requires.

Streaming semantics (same watermark contract as streaming/match.py):
rows with event time below the watermark are FINAL — any straggler
that would sort among them arrives late and is dropped — so the
matcher consumes the frozen prefix per key per batch and HOLDS at the
frozen boundary instead of failing: an in-progress match suspends
until more rows freeze (or ``flush`` declares end-of-stream). Matches
complete only when a frozen row fails to extend them, which makes the
emitted set EXACTLY the batch matcher's output after flush.

State per key is the in-progress suffix only: the rows after the last
emitted match that the scanner still cares about (current candidate
start onward), one anchor row (fixes the next row's classification),
and the mutable (≥ watermark) region. A key whose rows never match
holds O(lateness window) state, not O(stream).

The per-key scan runs in one Arrow-batched ``applyInPandas`` pass —
the (b)-tier escape hatch for semantics DataFrame algebra can't
express; everything around it (freeze split, state swap) is JVM-side.
Classifiers are registered by NAME (``classify="updown"``) so the
operator's state carries no pickled closures.
"""

from __future__ import annotations

import datetime as _dt
import re as _re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..sources.incremental import CrashSafeParquetState

# ---------------------------------------------------------------------------
# pattern compiler
# ---------------------------------------------------------------------------

_ELEM_RE = _re.compile(r"^([A-Za-z])([+*?]?)$")


def compile_pattern(pattern: str) -> list[tuple[str, str]]:
    """``"D+ U+"`` → ``[("D","+"), ("U","+")]``, validated to the
    deterministic-greedy class (see module docstring)."""
    elems: list[tuple[str, str]] = []
    for tok in pattern.split():
        m = _ELEM_RE.match(tok)
        if not m:
            raise ValueError(f"bad pattern element {tok!r}")
        elems.append((m.group(1), m.group(2)))
    if not elems:
        raise ValueError("empty pattern")
    # deterministic-greedy check: a variable-length element may not
    # share its symbol with any element REACHABLE from it — the next
    # elements up to and including the first one that cannot match
    # empty (* and ? match empty, so they don't block reachability).
    # Otherwise the greedy run could steal rows a later element needs
    # and only backtracking would recover (D F* U? F+ on "DFF").
    for i, (s1, q1) in enumerate(elems):
        if q1 not in ("+", "*", "?"):
            continue
        for s2, q2 in elems[i + 1 :]:
            if s1 == s2:
                raise ValueError(
                    f"ambiguous pattern: {s1}{q1} can steal rows from a "
                    f"reachable {s2}{q2} — greedy scan would need "
                    "backtracking"
                )
            if q2 in ("", "+"):  # required element: blocks reachability
                break
    return elems


def match_spans(
    symbols: list[str],
    elems: list[tuple[str, str]],
    final: bool,
    start_at: int = 0,
) -> tuple[list[tuple[int, int]], int]:
    """Greedy SKIP-PAST-LAST-ROW scan over ``symbols``.

    Returns ``(spans, keep_from)``: completed match spans
    ``[start, end)`` and the index from which the caller must retain
    rows — the current in-progress candidate's start (or
    ``len(symbols)`` when the scanner is idle). With ``final=False``
    a match that reaches the end of input HOLDS (it may extend when
    more rows freeze); with ``final=True`` end-of-input closes it.
    ``start_at`` skips already-scanned anchor rows: they classify
    their successor but may not START a match again.
    """
    spans: list[tuple[int, int]] = []
    n = len(symbols)
    i = start_at  # scan position
    while i < n:
        # try to match starting at i
        j = i
        e = 0
        matched_any = False
        failed = False
        held = False
        while e < len(elems):
            sym, q = elems[e]
            if q in ("+",):
                if j < n and symbols[j] == sym:
                    j += 1
                    while j < n and symbols[j] == sym:
                        j += 1
                    if j == n and not final:
                        held = True  # the greedy run may extend
                        break
                elif j == n and not final:
                    held = True
                    break
                else:
                    failed = True
                    break
            elif q == "*":
                while j < n and symbols[j] == sym:
                    j += 1
                if j == n and not final:
                    held = True
                    break
            elif q == "?":
                if j < n and symbols[j] == sym:
                    j += 1
                elif j == n and not final:
                    held = True
                    break
            else:  # exactly one
                if j < n and symbols[j] == sym:
                    j += 1
                elif j == n and not final:
                    held = True
                    break
                else:
                    failed = True
                    break
            e += 1
        if held:
            return spans, i
        if not failed and e == len(elems) and j > i:
            matched_any = True
        if matched_any:
            spans.append((i, j))
            i = j  # SKIP PAST LAST ROW
        else:
            i += 1  # no match at i: slide the start
    return spans, n


# ---------------------------------------------------------------------------
# row classifiers (by name — state carries no closures)
# ---------------------------------------------------------------------------


def _classify_updown(prev_value, value) -> str:
    if prev_value is None:
        return "F"
    if value < prev_value:
        return "D"
    if value > prev_value:
        return "U"
    return "F"


def _classify_threshold75(prev_value, value) -> str:
    """Stateless magnitude classifier: H(igh) above 75.0, else L —
    the spike-episode alphabet (`H+` = a maximal high run). The
    constant lives in the NAME so state stays closure-free."""
    return "H" if value > 75.0 else "L"


CLASSIFIERS = {
    "updown": _classify_updown,
    "threshold75": _classify_threshold75,
}

# ---------------------------------------------------------------------------
# the streaming operator
# ---------------------------------------------------------------------------

_STATE_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("start_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
        StructField("n_rows", LongType()),
        StructField("symbols", StringType()),
    ]
)

_EPOCH = _dt.datetime(1970, 1, 1)


class StreamingCep(CrashSafeParquetState):
    """Generic-pattern CEP over micro-batches of (user_id, ts,
    event_id, value). Drive with ``foreach_batch``; ``flush`` on
    stream end; read ``matches()`` — (user_id, start_ts, end_ts,
    n_rows, symbols)."""

    WM_MARKER = "_WATERMARK_US"
    LATE_MARKER = "_LATE_DROPPED"

    def __init__(
        self,
        path: str,
        pattern: str,
        lateness: _dt.timedelta,
        classify: str = "updown",
    ):
        super().__init__(path)
        self.elems = compile_pattern(pattern)
        if classify not in CLASSIFIERS:
            raise ValueError(f"unknown classifier {classify!r}")
        self.classify = classify
        self.lateness = lateness

    def watermark(self) -> _dt.datetime:
        self._recover()
        v = self._marker(self.WM_MARKER)
        return (
            _EPOCH + _dt.timedelta(microseconds=int(v))
            if v is not None
            else _EPOCH
        )

    def late_dropped(self) -> int:
        self._recover()
        v = self._marker(self.LATE_MARKER)
        return int(v) if v is not None else 0

    def _state(self, spark: SparkSession) -> DataFrame:
        import os

        self._recover()
        if os.path.isdir(self.path):
            return spark.read.schema(_STATE_SCHEMA).parquet(self.path)
        return spark.createDataFrame([], _STATE_SCHEMA)

    def matches(self, spark: SparkSession) -> DataFrame:
        return (
            self._state(spark)
            .filter(F.col("kind") == "match")
            .select("user_id", "start_ts", "end_ts", "n_rows", "symbols")
        )

    def update(
        self,
        spark: SparkSession,
        batch_df: DataFrame,
        batch_id: int | None = None,
        final: bool = False,
    ) -> None:
        state = self._state(spark)
        prev_matches = state.filter(F.col("kind") == "match")
        pending = state.filter(
            F.col("kind").isin("pending", "anchor")
        ).select(
            "user_id",
            "ts",
            "event_id",
            "value",
            (F.col("kind") == "anchor").alias("is_anchor"),
        )
        prev_wm = self.watermark()

        batch_df = batch_df.select("user_id", "ts", "event_id", "value")
        n_late = batch_df.filter(F.col("ts") < F.lit(prev_wm)).count()
        on_time = batch_df.filter(F.col("ts") >= F.lit(prev_wm)).withColumn(
            "is_anchor", F.lit(False)
        )

        if final:
            wm = _dt.datetime(9999, 1, 1)
        else:
            hi = on_time.agg(F.max("ts")).collect()[0][0]
            wm = prev_wm
            if hi is not None:
                wm = max(prev_wm, hi - self.lateness)

        # touched-key isolation: a key is re-scanned only if this
        # batch brought it rows OR the advancing watermark froze some
        # of its pending rows (prev_wm ≤ ts < wm). Every other key's
        # state passes through UNTOUCHED — per-batch scan cost is
        # O(touched keys), not O(all keyed state), the property a
        # million-key stream needs. (In-progress holds below prev_wm
        # re-scan to the same hold, so skipping them is lossless.)
        if final:
            # end-of-stream closes held in-progress matches on EVERY
            # key, including those whose rows all froze long ago
            touched = pending.select("user_id").unionByName(
                on_time.select("user_id")
            ).distinct()
        else:
            touched = (
                on_time.select("user_id")
                .unionByName(
                    pending.filter(
                        (F.col("ts") >= F.lit(prev_wm))
                        & (F.col("ts") < F.lit(wm))
                    ).select("user_id")
                )
                .distinct()
            )
        pending_touched = pending.join(touched, "user_id", "left_semi")
        pending_untouched = pending.join(touched, "user_id", "left_anti")

        rows = pending_touched.unionByName(on_time)
        elems = self.elems
        clf = CLASSIFIERS[self.classify]
        is_final = final
        wm_py = wm

        out_schema = _STATE_SCHEMA

        def scan(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
            uid = int(pdf["user_id"].iloc[0])
            tss = list(pdf["ts"])
            vals = list(pdf["value"])
            eids = list(pdf["event_id"])
            anchors = list(pdf["is_anchor"])
            # the anchor (if present) sorts first: it was the last row
            # of the already-scanned region
            n_anchor = 1 if anchors and anchors[0] else 0
            # frozen prefix: rows with ts < wm (stragglers below wm
            # are dropped on arrival, so this prefix is final)
            n_frozen = 0
            while n_frozen < len(tss) and tss[n_frozen] < wm_py:
                n_frozen += 1
            syms = []
            prev = None
            for k in range(n_frozen):
                syms.append(clf(prev, vals[k]))
                prev = vals[k]
            spans, keep_from = match_spans(
                syms, elems, is_final, start_at=n_anchor
            )
            out = []
            for a, b in spans:
                out.append(
                    {
                        "kind": "match",
                        "user_id": uid,
                        "ts": None,
                        "event_id": None,
                        "value": None,
                        "start_ts": tss[a],
                        "end_ts": tss[b - 1],
                        "n_rows": b - a,
                        "symbols": "".join(syms[a:b]),
                    }
                )
            # retained pending: anchor (fixes the next frozen row's
            # classification, may not start a match again) +
            # in-progress candidate + mutable region
            lo = max(0, keep_from - 1)
            for k in range(lo, len(tss)):
                out.append(
                    {
                        "kind": "anchor" if k < keep_from else "pending",
                        "user_id": uid,
                        "ts": tss[k],
                        "event_id": eids[k],
                        "value": vals[k],
                        "start_ts": None,
                        "end_ts": None,
                        "n_rows": None,
                        "symbols": None,
                    }
                )
            return pd.DataFrame(
                out, columns=[f.name for f in out_schema.fields]
            )

        new_state_part = rows.groupBy("user_id").applyInPandas(
            scan, out_schema
        )
        if final:
            new_state_part = new_state_part.filter(
                F.col("kind") == "match"
            )
        untouched_state = pending_untouched.select(
            F.when(F.col("is_anchor"), F.lit("anchor"))
            .otherwise(F.lit("pending"))
            .alias("kind"),
            "user_id",
            "ts",
            "event_id",
            "value",
            *[
                F.lit(None).cast(t).alias(n)
                for n, t in [
                    ("start_ts", "timestamp"),
                    ("end_ts", "timestamp"),
                    ("n_rows", "long"),
                    ("symbols", "string"),
                ]
            ],
        )
        new_state = prev_matches.unionByName(new_state_part).unionByName(
            untouched_state
        )
        wm_us = int((wm - _EPOCH) / _dt.timedelta(microseconds=1))
        self._swap_in(
            new_state,
            batch_id,
            markers={
                self.WM_MARKER: str(wm_us),
                self.LATE_MARKER: str(self.late_dropped() + n_late),
            },
        )

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._recover()
        if batch_id <= self._last_batch():
            return
        self.update(batch_df.sparkSession, batch_df, batch_id=batch_id)

    def flush(self, spark: SparkSession) -> None:
        self._recover()
        self.update(
            spark,
            spark.createDataFrame(
                [], "user_id long, ts timestamp, event_id long, value double"
            ),
            batch_id=self._last_batch() + 1,
            final=True,
        )


def batch_cep(
    df: DataFrame,
    pattern: str,
    key: str = "user_id",
    classify: str = "updown",
) -> "list[tuple]":
    """Batch reference semantics (driver-side, for oracles/tests):
    the same scan applied once with final=True over the whole input.
    Returns [(key, start_ts, end_ts, n_rows, symbols), ...]."""
    elems = compile_pattern(pattern)
    clf = CLASSIFIERS[classify]
    out = []
    rows = sorted(
        df.select(key, "ts", "event_id", "value").collect(),
        key=lambda r: (r[0], r[1], r[2]),
    )
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    for k, rs in by_key.items():
        syms = []
        prev = None
        for r in rs:
            syms.append(clf(prev, r[3]))
            prev = r[3]
        spans, _ = match_spans(syms, elems, final=True)
        for a, b in spans:
            out.append(
                (k, rs[a][1], rs[b - 1][1], b - a, "".join(syms[a:b]))
            )
    return out
