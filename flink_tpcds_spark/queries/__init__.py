"""Query corpus: each suite module exposes

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]``  (DuckDB-runnable ANSI SQL; may omit keys
  for non-SQL-expressible ops → driver records a rows-only check)

``all_queries()`` / ``all_oracles()`` merge the suites for the driver
contract in ``__spark_entry__.py``.

Driver-window ordering
----------------------
The driver's correctness sweep covers the FIRST 50 entries of
``all_queries()`` (verified: exactly 50 rows per CORRECTNESS file).
Rather than a blind offset rotation (round 4's scheme — which also
silently froze at offset 0 because it globbed for CORRECTNESS files
in the package dir instead of the repo root), the window is now
DRIVER-STATUS-AWARE: it reads the ``CORRECTNESS_r*.json`` files the
driver leaves at the repo root and packs the window as

1. queries that have APPEARED in a driver file but never earned a
   green row (red rows get re-confirmed after a fix instead of
   silently rotating out — round 4's q14a/q21/q29/q35);
2. queries the driver has NEVER seen, corpus first in stable order
   (so the 103-query TPC-DS corpus drains as fast as the window
   allows — it is the standing top ask until complete), then any
   new non-corpus suite entries;
3. everything already green, OLDEST last-green round first (stable
   suite order breaking ties) — the steady-state posture once 0 red
   and 0 unseen remain: every registered query is re-confirmed within
   ⌈N/50⌉ driver rounds, so a silent regression (Spark upgrade,
   datagen drift) cannot hide behind a years-old green row.

A query is green if ANY round recorded rows+schema+hash all matching
with no error. This self-heals: nothing to edit per round, a failed
query automatically re-enters the window, and coverage monotonically
expands until every entry has a driver-confirmed row — after which
the window becomes a rolling regression-confirmation sweep.
"""

from __future__ import annotations

import glob
import json
import os
import re
import warnings
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# three levels up: queries/ -> flink_tpcds_spark/ -> repo root
_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_WINDOW = 50

# Entries whose IMPLEMENTATION changed since their last driver-green
# row — a fresh green round says nothing about code it never ran, so
# these re-enter the window ahead of stale-green re-confirmations
# (after reds and never-seen entries). Maintained by hand when a
# round rewrites the guts behind a registered query. The value is the
# CORRECTNESS-file round number of the change: the bump is ACTIVE
# only until the driver records a green row in a round >= that
# threshold, then the entry demotes back to normal stale ordering —
# ONE early re-confirmation, not a standing reservation (a perpetual
# bump would starve stale greens out of the ⌈N/50⌉ rotation; gated by
# tests/test_oracle_parity.py's rotation tests).
_PRIORITY_RECHECK: dict[str, int] = {
    # file r9: CDC state rerouted to the bucketed merge layout
    # (re-confirmed green in CORRECTNESS_r09 → inert)
    "st_cdc_apply": 9,
    # file r9: bucket_table gained the adoption marker write
    # (re-confirmed green in CORRECTNESS_r09 → inert)
    "ops_bucketed_join": 9,
    # file r10: the Spark-4 SQL-surface batch siblings of the fixed
    # ops_lateral_alias red re-enter early per VERDICT r9 item 5
    # (lateral_alias itself re-enters first as the sole red)
    "ops_sql_pipe": 10,
    "ops_agg_filter": 10,
    "ops_interval_arith": 10,
    "ops_identifier_clause": 10,
    "ops_sql_udf": 10,
    "ops_sql_table_function": 10,
    "ops_recursive_cte": 10,
    "ops_sql_variables": 10,
    "ops_group_by_all": 10,
    # file r11: restds grew the /rows in-flight counter + sleep_ms knob
    # (async-lookup round) — the service every REST entry runs through
    "ops_rest_source": 11,
    "st_rest_stream": 11,
    # file r12: async_lookup gained request timeouts, object-dtype
    # fills (exact ints past 2^53), and the unique-key fail-loud; the
    # streaming form's retry narrowed to transient classes (ADVICE r11)
    "ops_async_lookup_join": 12,
    "st_async_enrich": 12,
}


def _driver_status() -> tuple[dict[str, int], set[str]]:
    """(green_round, seen) across all CORRECTNESS_r*.json files.

    ``green_round[name]`` = the LATEST round number whose file records
    a green row (rows/schema/hash all matching, no error) for the
    query; absent = never green. ``seen`` = appeared in any round's
    file. The round number is parsed from the filename
    (``CORRECTNESS_r07.json`` → 7) so staleness ranking survives
    files being rewritten in place.
    """
    green: dict[str, int] = {}
    seen: set[str] = set()
    files = sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
    if not files:
        # Correctness files live at the repo root; finding none means
        # either a fresh checkout or a path regression (round 4's bug).
        warnings.warn(
            f"no CORRECTNESS_r*.json under {_REPO} — window ordering "
            "falls back to stable suite order",
            stacklevel=2,
        )
    for path in files:
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError) as e:  # pragma: no cover
            warnings.warn(f"unreadable {path}: {e}", stacklevel=2)
            continue
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        for name, row in data.items():
            seen.add(name)
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                green[name] = max(green.get(name, 0), rnd)
    return green, seen


def _modules():
    from . import (
        corpus,
        datapipe,
        events,
        operators,
        streaming_inv,
        tpcds_style,
        tpch,
    )

    return (
        events,
        datapipe,
        operators,
        streaming_inv,
        tpch,
        tpcds_style,
        corpus,
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import corpus

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {sorted(overlap)}")
        merged.update(mod.QUERIES)

    green, seen = _driver_status()
    corpus_names = [n for n in corpus.QUERIES if n in merged]
    red = [n for n in merged if n in seen and n not in green]
    unseen_corpus = [n for n in corpus_names if n not in seen]
    unseen_other = [
        n for n in merged if n not in seen and n not in corpus.QUERIES
    ]
    # Steady state (0 red, 0 unseen): re-confirm the STALEST greens
    # first — oldest last-green round, suite order breaking ties — so
    # a silent regression (Spark upgrade, datagen drift) in any of the
    # N registered queries resurfaces within ⌈N/window⌉ rounds.
    stable_idx = {n: i for i, n in enumerate(merged)}
    stale_green = sorted(
        (n for n in green if n in stable_idx),
        key=lambda n: (green[n], stable_idx[n]),
    )

    recheck = [
        n
        for n, thr in _PRIORITY_RECHECK.items()
        if n in merged and green.get(n, -1) < thr
    ]

    front: list[str] = []
    for group in (red, unseen_corpus, unseen_other, recheck, stale_green):
        for n in group:
            if len(front) >= _WINDOW:
                break
            if n not in front:
                front.append(n)

    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in front:
        ordered[name] = merged.pop(name)
    ordered.update(merged)
    return ordered


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLES)
    return merged
