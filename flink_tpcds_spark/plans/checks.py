"""Physical-plan introspection: the engine's translation of the
reference's golden-plan tests (SURVEY §5 — 139 checked-in plan XMLs
asserting optimizer behavior).

Instead of snapshotting full plans (brittle across Spark versions),
we assert the *properties that matter at 100 TB*:

- filters reached the parquet scan (``PushedFilters`` non-empty)
- scans read only the needed columns (``ReadSchema`` projection)
- small dims joined via broadcast, not shuffle
- operator pipelines run inside WholeStageCodegen

tests/test_plans.py applies these to the query corpus.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_text(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists appearing in the plan's scans."""
    text = explain_text(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", text)


def has_pushed_filters(df: DataFrame, needle: str | None = None) -> bool:
    """True if any scan carries pushed filters (optionally matching
    ``needle``, e.g. a column name)."""
    found = [f for f in pushed_filters(df) if f.strip()]
    if needle is None:
        return bool(found)
    return any(needle in f for f in found)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_text(df) or "BroadcastNestedLoopJoin" in explain_text(df)


def scan_read_columns(df: DataFrame) -> list[list[str]]:
    """Column lists from each scan's ReadSchema — to assert pruning."""
    text = explain_text(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", text)
    return [
        [c.split(":")[0].strip() for c in s.split(",") if c.strip()]
        for s in schemas
    ]


def _top_level_bracket_groups(args: str) -> list[str]:
    """Top-level ``[...]`` groups of a formatted-plan Arguments line."""
    groups: list[str] = []
    depth = 0
    start = -1
    for i, ch in enumerate(args):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(args[start + 1 : i])
    return groups


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window-exec nodes whose window spec has NO partition columns —
    the single-partition shape that serializes an unbounded input
    through one task at scale.

    Formatted-plan rendering (Spark 4): a ``Window`` node's Arguments
    are ``[functions], [partitionSpec], [orderSpec]`` with EMPTY groups
    omitted entirely — so 2 groups is ambiguous between a missing
    partitionSpec and a missing orderSpec (an orderless aggregate
    window like ``count(*) OVER (PARTITION BY k)`` renders
    ``[functions], [partitionSpec]``). Disambiguate by content: every
    orderSpec entry carries a sort direction (``ASC``/``DESC``), a
    partitionSpec never does. ``WindowGroupLimit`` renders
    ``[partitionSpec], [orderSpec], fn, k, mode`` (1 bracket group
    when unpartitioned; its orderSpec is never empty — rank functions
    require an ORDER BY). Returns the node header lines, one per
    offending node.
    """
    text = explain_text(df)
    bad: list[str] = []
    for block in re.split(r"\n\n", text):
        lines = block.strip().split("\n")
        header = lines[0].strip()
        m = re.match(r"\(\d+\) (Window|WindowGroupLimit)\b", header)
        if not m:
            continue
        arg_m = re.search(r"^Arguments: (.*)$", block, re.M)
        if not arg_m:
            continue
        groups = _top_level_bracket_groups(arg_m.group(1))
        if m.group(1) == "Window":
            if len(groups) >= 3:
                continue
            # 2 groups: partitioned iff the second group is a plain
            # attribute list (no sort-direction markers)
            unpartitioned = len(groups) < 2 or re.search(
                r"\b(ASC|DESC)\b", groups[1]
            )
        else:
            unpartitioned = len(groups) < 2
        if unpartitioned:
            bad.append(header)
    return bad


def whole_stage_codegen_ops(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans in the EXECUTED plan.

    Under AQE the codegen stages exist only after execution, so this
    triggers the query (use on test-scale data) and reads the final
    adaptive plan's ``*(n)`` markers.
    """
    df.collect()  # count() would execute a DIFFERENT QueryExecution
    text = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return len(set(re.findall(r"\*\((\d+)\)", text)))
