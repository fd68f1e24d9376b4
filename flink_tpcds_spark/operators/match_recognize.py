"""MATCH_RECOGNIZE analog: row-pattern matching over partitioned,
ordered rows.

The reference plans SQL MATCH_RECOGNIZE through StreamExecMatch
(reference: flink-table-planner-blink/src/main/scala/org/apache/
flink/table/planner/plan/nodes/physical/stream/StreamExecMatch.scala:68)
backed by a CEP NFA. Spark has no MATCH_RECOGNIZE, so this module
re-expresses the two layers Spark-first:

1. ``match_v_shapes`` — the canonical ``PATTERN (DOWN+ UP+)`` /
   ``AFTER MATCH SKIP PAST LAST ROW`` query (the Flink docs' V-shape
   example) as a pure DataFrame composition: LAG classification →
   run-length encoding via a cumulative change counter → run collapse
   → adjacent-run pairing. Everything stays in JVM window operators —
   no Python in the hot path, shuffles only on the partition key —
   and the same SQL runs on DuckDB, so the whole operator is
   oracle-checkable.

2. ``match_recognize`` — the general form: arbitrary regex patterns
   over per-row symbol classifications. Rows are classified JVM-side
   (a CASE chain), then an Arrow-batched ``applyInPandas`` per
   partition materializes the symbol string and runs Python's ``re``
   with SKIP PAST LAST ROW semantics. This is the (b) escape hatch
   for semantics the composition can't express (alternation, bounded
   quantifiers, reluctant modes).

Scale: both forms shuffle once on ``partition_by``. The generic form
additionally requires each partition to fit in one Arrow batch — the
same per-key-state assumption the reference's NFA operator makes.
Determinism: callers must pass a total order (tie columns included);
both forms and the oracle use identical orderings.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def match_v_shapes(
    df: DataFrame,
    partition_by: str,
    order_by: list[str],
    value: str,
) -> DataFrame:
    """Find maximal DOWN+ UP+ runs of ``value`` per partition.

    Emits one row per match: (partition key, start of the descent,
    the bottom, end of the ascent, rows in each leg, peak-to-trough
    values). Matches never overlap (SKIP PAST LAST ROW): runs are
    maximal by construction, so a descent pairs with exactly the
    ascent that follows it.
    """
    ocol = order_by[0]
    w = Window.partitionBy(partition_by).orderBy(*order_by)
    prev = F.lag(F.col(value)).over(w)
    classified = df.withColumn("_pos", F.row_number().over(w)).withColumn(
        "_dir",
        F.when(F.col(value) < prev, F.lit("D"))
        .when(F.col(value) > prev, F.lit("U"))
        .otherwise(F.lit("F")),  # flat or first row: breaks runs
    )
    wp = Window.partitionBy(partition_by).orderBy("_pos")
    classified = classified.withColumn(
        "_chg",
        F.when(
            F.lag("_dir").over(wp).isNull()
            | (F.lag("_dir").over(wp) != F.col("_dir")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = (
        classified.withColumn("_run", F.sum("_chg").over(wp))
        .groupBy(partition_by, "_run")
        .agg(
            F.min("_dir").alias("_dir"),  # constant within a run
            F.min("_pos").alias("_run_pos"),
            F.min_by(ocol, "_pos").alias("_lo_o"),
            F.min_by(value, "_pos").alias("_lo_v"),
            F.max_by(ocol, "_pos").alias("_hi_o"),
            F.max_by(value, "_pos").alias("_hi_v"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    wr = Window.partitionBy(partition_by).orderBy("_run_pos")
    nxt = lambda c: F.lead(c).over(wr)  # noqa: E731
    return (
        runs.withColumn("_ndir", nxt("_dir"))
        .withColumn("_nhi_o", nxt("_hi_o"))
        .withColumn("_nhi_v", nxt("_hi_v"))
        .withColumn("_nn", nxt("_n"))
        .filter((F.col("_dir") == "D") & (F.col("_ndir") == "U"))
        .select(
            F.col(partition_by),
            F.col("_lo_o").alias("start_" + ocol),
            F.col("_hi_o").alias("bottom_" + ocol),
            F.col("_nhi_o").alias("end_" + ocol),
            F.col("_lo_v").alias("start_value"),
            F.col("_hi_v").alias("bottom_value"),
            F.col("_nhi_v").alias("end_value"),
            F.col("_n").alias("down_rows"),
            F.col("_nn").alias("up_rows"),
        )
    )


def match_recognize(
    df: DataFrame,
    partition_by: str,
    order_by: list[str],
    define: dict[str, Column],
    pattern: str,
) -> DataFrame:
    """General row-pattern matching (reference StreamExecMatch form).

    ``define`` maps single-letter symbols to boolean classifier
    columns (evaluated JVM-side, first match wins; unclassified rows
    get ``.`` which only matches an explicit ``.`` in the pattern).
    ``pattern`` is a Python regex over those symbols, e.g. ``D+U+``.
    Matching is greedy, non-overlapping (AFTER MATCH SKIP PAST LAST
    ROW). Emits (key, match_seq, start/end order column, row count,
    matched symbol string).
    """
    for s in define:
        if len(s) != 1 or not s.isalpha():
            raise ValueError(f"symbols must be single letters, got {s!r}")
    sym = None
    for s, cond in define.items():
        sym = F.when(cond, F.lit(s)) if sym is None else sym.when(cond, F.lit(s))
    sym = sym.otherwise(F.lit("."))
    ocol = order_by[0]
    classified = df.select(
        F.col(partition_by), *[F.col(c) for c in order_by], sym.alias("_sym")
    )
    rx = _re.compile(pattern)
    out_fields = []
    for f in classified.schema.fields:
        if f.name == partition_by or f.name == ocol:
            out_fields.append(f"{f.name} {f.dataType.simpleString()}")
    schema = (
        f"{out_fields[0]}, match_seq bigint, "
        f"start_{ocol} {classified.schema[ocol].dataType.simpleString()}, "
        f"end_{ocol} {classified.schema[ocol].dataType.simpleString()}, "
        "match_rows bigint, symbols string"
    )

    def _match(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        s = "".join(pdf["_sym"])
        rows = []
        for seq, m in enumerate(rx.finditer(s), 1):
            if m.end() == m.start():  # zero-width: skip defensively
                continue
            rows.append(
                (
                    pdf[partition_by].iloc[0],
                    seq,
                    pdf[ocol].iloc[m.start()],
                    pdf[ocol].iloc[m.end() - 1],
                    m.end() - m.start(),
                    m.group(0),
                )
            )
        cols = [
            partition_by, "match_seq", f"start_{ocol}", f"end_{ocol}",
            "match_rows", "symbols",
        ]
        return pd.DataFrame(rows, columns=cols)

    return classified.groupBy(partition_by).applyInPandas(_match, schema=schema)


def match_recognize_bounded(
    df: DataFrame,
    partition_by: str,
    order_by: list[str],
    define: dict[str, Column],
    pattern: str,
    max_match_rows: int = 256,
) -> DataFrame:
    """Bounded-memory form of :func:`match_recognize` — the 100 TB
    path for the generic matcher.

    :func:`match_recognize` materializes each partition key's rows in
    ONE Arrow group (the same per-key-state assumption the
    reference's NFA makes — fine for bounded keys, wrong for a key
    with billions of rows). This variant streams each task's rows
    through a carry buffer instead: rows arrive ordered
    (``repartitionByRange`` + ``sortWithinPartitions``), and the
    matcher keeps only a window of undecided symbols per key.

    Correctness contract: results are IDENTICAL to the unbounded
    matcher whenever every true match spans fewer than
    ``max_match_rows`` rows (equivalence-tested). The buffer logic:

    - a match wholly clear of the last ``max_match_rows`` of the
      buffer can neither extend nor change with future input (no
      match may exceed the cap) → accepted and the prefix advanced;
    - a match touching that lookahead zone is deferred to the next
      flush (it may still grow);
    - with no match found, every start with a full cap-window of
      lookahead is provably dead → the buffer trims to the last
      ``max_match_rows − 1`` symbols;
    - a match that reaches the cap raises rather than silently
      truncating (matching the fail-loud posture of
      dedup.near_dup_clusters' convergence guard).

    SKIP PAST LAST ROW semantics, greedy regex, same output schema as
    :func:`match_recognize`.
    """
    for s in define:
        if len(s) != 1 or not s.isalpha():
            raise ValueError(f"symbols must be single letters, got {s!r}")
    if max_match_rows < 2:
        raise ValueError("max_match_rows must be >= 2")
    sym = None
    for s, cond in define.items():
        sym = F.when(cond, F.lit(s)) if sym is None else sym.when(cond, F.lit(s))
    sym = sym.otherwise(F.lit("."))
    ocol = order_by[0]
    classified = (
        df.select(
            F.col(partition_by), *[F.col(c) for c in order_by], sym.alias("_sym")
        )
        .repartitionByRange(F.col(partition_by))
        .sortWithinPartitions(partition_by, *order_by)
    )
    rx = _re.compile(pattern)
    cap = max_match_rows
    schema = (
        f"{partition_by} {classified.schema[partition_by].dataType.simpleString()}, "
        "match_seq bigint, "
        f"start_{ocol} {classified.schema[ocol].dataType.simpleString()}, "
        f"end_{ocol} {classified.schema[ocol].dataType.simpleString()}, "
        "match_rows bigint, symbols string"
    )
    cols = [
        partition_by, "match_seq", f"start_{ocol}", f"end_{ocol}",
        "match_rows", "symbols",
    ]

    def gen(batches):
        import pandas as pd

        key = None
        buf_sym = ""
        buf_ord: list = []
        seq = 0

        def scan(final: bool):
            """Accept decidable matches; trim the buffer; return rows."""
            nonlocal buf_sym, buf_ord, seq
            out = []
            pos = 0
            keep_from = None
            while True:
                m = rx.search(buf_sym, pos)
                if m is None or m.end() == m.start():
                    # starts with a full cap-window of lookahead are dead
                    keep_from = (
                        len(buf_sym) if final
                        else max(pos, len(buf_sym) - (cap - 1))
                    )
                    break
                if m.end() - m.start() >= cap:
                    raise RuntimeError(
                        f"match spans >= max_match_rows ({cap}) rows — "
                        "raise the cap above the pattern's true maximum"
                    )
                if not final and m.end() > len(buf_sym) - cap:
                    # may still grow with future rows: defer
                    keep_from = m.start()
                    break
                seq += 1
                out.append(
                    (
                        key, seq,
                        buf_ord[m.start()], buf_ord[m.end() - 1],
                        m.end() - m.start(), m.group(0),
                    )
                )
                pos = m.end()
            buf_sym = buf_sym[keep_from:]
            buf_ord = buf_ord[keep_from:]
            return out

        import numpy as np

        for pdf in batches:
            rows = []
            if len(pdf):
                keys = pdf[partition_by].to_numpy()
                change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
                bounds = [0, *change.tolist(), len(pdf)]
                for b0, b1 in zip(bounds[:-1], bounds[1:]):
                    k = keys[b0]
                    if key is not None and k != key:
                        rows.extend(scan(final=True))
                        buf_sym, buf_ord = "", []
                        seq = 0
                    key = k
                    buf_sym += "".join(pdf["_sym"].iloc[b0:b1])
                    buf_ord.extend(pdf[ocol].iloc[b0:b1].tolist())
                rows.extend(scan(final=False))
            yield pd.DataFrame(rows, columns=cols)
        if key is not None:
            yield pd.DataFrame(scan(final=True), columns=cols)

    return classified.mapInPandas(gen, schema)
