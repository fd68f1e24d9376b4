"""MERGE INTO for parquet tables (the lakehouse upsert primitive).

The reference's retract/upsert sinks maintain keyed state inside a
streaming job (UpsertStreamTableSink.java); the batch-side
counterpart every warehouse user runs is ``MERGE INTO target USING
source ON keys`` — update/delete matched rows, insert unmatched ones.
Plain-parquet Spark has no MERGE (that is Delta/Iceberg territory),
so this implements the standard subset as join algebra plus an atomic
directory swap.

Semantics (Delta's deterministic subset):
- ``when_matched="update"``: a matched target row is REPLACED by its
  source row (whole-row update).
- ``when_matched="delete"``: a matched target row is removed.
- ``insert_not_matched=True``: source rows with no target match are
  appended.
- Target rows with no source match are always kept.
- The source must be key-unique (the same precondition Delta enforces
  — a multiply-matched target row makes MERGE nondeterministic).
  ``validate=True`` asserts it with one aggregate pass.

Two physical layouts, same logical contract:

**Plain layout** (any parquet dir): the kept side is ONE left-anti
join target⟕source on the merge keys; the rewrite streams to a fresh
directory and swaps in two renames (target → .old, tmp → target), so
concurrent readers see the old or the new table, never a mix. Cost is
O(state) per call — fine for one-shot batch MERGE, wrong for a CDC
stream applying small deltas against big state.

**Bucketed layout** (``convert_to_bucketed`` / ``create_bucketed_table``):
the target is laid out as ``bucket=pmod(xxhash64(keys), N)`` hive
partitions with a ``_merge_buckets.json`` marker recording
keys/N/schema. Each merge computes the source's touched bucket set
(≤ N small ints — the only driver collect), partition-prunes the
target scan to those buckets, runs the identical join algebra on that
subset, and rewrites ONLY the touched bucket directories — untouched
buckets are never read, shuffled, or written. Per-call cost is
O(delta ∪ touched-bucket rows), the Delta/Iceberg copy-on-write
pruning shape; this is what makes a MERGE-per-micro-batch CDC apply
(streaming/cdc.py) O(delta) instead of O(state) at 100 TB.

Bucketed crash safety is roll-forward: the tmp dir (one subdir per
touched bucket, empty dirs included so intent is always explicit) is
fully written, then a ``_merge_inflight.json`` manifest is atomically
published inside the target, then each bucket is swapped with the
same two-rename dance (live → .merge-old-<id>/, tmp → live). A crash
anywhere replays from the manifest: buckets whose tmp subdir still
exists get their swap completed, the rest are already done; backups
and tmp are then swept. Readers see each BUCKET atomically; a reader
racing the multi-bucket swap can observe a mix of pre/post buckets
(table-level snapshot isolation is the metastore/transaction-log
feature Delta adds on top — documented tradeoff, not a silent one).
The plain layout keeps whole-table atomicity.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType
from pyspark.sql.utils import AnalysisException

BUCKET_COL = "bucket"
_MARKER = "_merge_buckets.json"
_INFLIGHT = "_merge_inflight.json"


def _bucket_expr(keys: list[str], n_buckets: int):
    """Deterministic bucket id — Spark-native xxhash64 so the same
    expression computes identically on any executor / any session."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast(
        "int"
    )


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_bucket_marker(target_path: str) -> dict | None:
    """The bucketed-layout marker, or None for a plain table."""
    p = os.path.join(target_path, _MARKER)
    if os.path.isfile(p):
        with open(p) as f:
            return json.load(f)
    return None


def _finish_bucket_swaps(target_path: str, man: dict) -> None:
    """Complete (or re-complete after a crash) the per-bucket swaps
    described by an inflight manifest. Idempotent: each bucket's state
    is read off the filesystem — tmp subdir present means the swap for
    that bucket has not finished; absent means it has."""
    mid = man["id"]
    tmp = os.path.join(os.path.dirname(target_path) or ".", man["tmp"])
    old_root = os.path.join(target_path, f".merge-old-{mid}")
    for k in man["buckets"]:
        part = f"{BUCKET_COL}={k}"
        new = os.path.join(tmp, part)
        live = os.path.join(target_path, part)
        if os.path.isdir(new):
            if os.path.isdir(live):
                os.makedirs(old_root, exist_ok=True)
                os.rename(live, os.path.join(old_root, part))
            os.rename(new, live)
    os.remove(os.path.join(target_path, _INFLIGHT))
    shutil.rmtree(old_root, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def _recover(target_path: str) -> None:
    """Heal every crash window of both swap protocols.

    Order matters: the bucketed roll-forward consumes its ``.merge-*``
    tmp dir, so it must run BEFORE the orphan-tmp sweep. Then: a
    whole-dir ``.old`` backup with NO live table (crash between the
    two renames of the plain swap) is restored; a backup ALONGSIDE a
    live table is stale and removed; orphaned ``.merge-*`` tmp dirs
    (crash before any promise was made) and ``.merge-old-*`` bucket
    backups (crash after the manifest was consumed) are deleted."""
    if os.path.isdir(target_path):
        man_p = os.path.join(target_path, _INFLIGHT)
        if os.path.isfile(man_p):
            with open(man_p) as f:
                man = json.load(f)
            _finish_bucket_swaps(target_path, man)
    old = target_path + ".old"
    if os.path.isdir(old):
        if not os.path.isdir(target_path):
            os.rename(old, target_path)
        else:
            shutil.rmtree(old)
    parent = os.path.dirname(target_path) or "."
    base = os.path.basename(target_path) + ".merge-"
    if os.path.isdir(parent):
        for d in os.listdir(parent):
            if d.startswith(base):
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    if os.path.isdir(target_path):
        for d in os.listdir(target_path):
            if d.startswith(".merge-old-"):
                shutil.rmtree(
                    os.path.join(target_path, d), ignore_errors=True
                )


def _read_target(
    spark: SparkSession, target_path: str, meta: dict | None
) -> DataFrame:
    """Read the target; an empty bucketed table (marker only, no data
    files yet) materializes as an empty DataFrame of the recorded
    schema — parquet cannot self-describe an empty directory."""
    try:
        return spark.read.parquet(target_path)
    except AnalysisException:
        if meta is None:
            raise
        schema = StructType.fromJson(json.loads(meta["schema"]))
        return spark.createDataFrame([], schema)


def read_merge_table(spark: SparkSession, target_path: str) -> DataFrame:
    """The current table state, layout-agnostic: the physical
    ``bucket`` partition column of a bucketed target is dropped."""
    meta = read_bucket_marker(target_path)
    df = _read_target(spark, target_path, meta)
    return df.drop(BUCKET_COL) if meta is not None else df


def create_bucketed_table(
    spark: SparkSession,
    target_path: str,
    schema: StructType,
    keys: list[str],
    n_buckets: int = 64,
) -> None:
    """Initialize an EMPTY bucketed merge target: just the marker —
    partitions appear as merges touch them."""
    for k in keys:
        if k not in schema.fieldNames():
            raise ValueError(f"create_bucketed_table: key {k!r} not in schema")
    if BUCKET_COL in schema.fieldNames():
        raise ValueError(
            f"create_bucketed_table: schema already has a {BUCKET_COL!r} "
            "column — it is reserved for the physical layout"
        )
    os.makedirs(target_path, exist_ok=True)
    full = StructType(
        list(schema.fields) + [StructField(BUCKET_COL, IntegerType())]
    )
    _write_json_atomic(
        os.path.join(target_path, _MARKER),
        {
            "version": 1,
            "keys": list(keys),
            "n_buckets": int(n_buckets),
            "schema": full.json(),
        },
    )


def suggest_bucket_count(
    target_path: str,
    target_bucket_bytes: int = 256 * 1024 * 1024,
    lo: int = 16,
    hi: int = 65536,
) -> int:
    """Bucket-count sizing for ``convert_to_bucketed``: the bucket is
    the copy-on-write write-amplification unit (a 1-row delta
    rewrites its whole bucket), so N should put each bucket near a
    target on-disk size — 256 MB default, the usual
    parquet/file-group sweet spot. Rounded to a power of two
    (doubling N later re-splits each bucket exactly in half under
    pmod of the same hash — a future re-bucket moves the minimum
    data), clamped to [lo, hi]. Uses the COMPRESSED on-disk size, the
    quantity that actually bounds a bucket rewrite's IO."""
    total = 0
    for root, dirs, files in os.walk(target_path):
        # never descend into backup/tmp dirs (.merge-old-*) — they
        # are not table bytes
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        for f in files:
            if not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, f))
    raw = max(total / target_bucket_bytes, 1.0)
    n = 1 << max(0, round(math.log2(raw)))
    return max(lo, min(hi, n))


def convert_to_bucketed(
    spark: SparkSession,
    target_path: str,
    keys: list[str],
    n_buckets: int | None = 64,
) -> dict:
    """One-time rewrite of a plain parquet table into the bucketed
    hive layout (the 100 TB amortization story: one bucketed load,
    every later MERGE partition-pruned). Whole-dir two-rename swap —
    same atomicity as a plain merge. ``n_buckets=None`` sizes the
    bucket count from the table's on-disk bytes
    (``suggest_bucket_count``)."""
    if n_buckets is None:
        n_buckets = suggest_bucket_count(target_path)
    _recover(target_path)
    existing = read_bucket_marker(target_path)
    if existing is not None:
        if (
            list(existing["keys"]) == list(keys)
            and existing["n_buckets"] == n_buckets
        ):
            return {"n_buckets": n_buckets, "keys": list(keys), "cached": True}
        raise ValueError(
            "convert_to_bucketed: target already bucketed with a different "
            f"spec ({existing['keys']}/{existing['n_buckets']})"
        )
    df = spark.read.parquet(target_path)
    for k in keys:
        if k not in df.columns:
            raise ValueError(f"convert_to_bucketed: key {k!r} not in target")
    if BUCKET_COL in df.columns:
        raise ValueError(
            f"convert_to_bucketed: target already has a {BUCKET_COL!r} column"
        )
    tmp = f"{target_path}.merge-{uuid.uuid4().hex[:8]}"
    (
        df.withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets))
        .repartition(n_buckets, F.col(BUCKET_COL))
        .write.partitionBy(BUCKET_COL)
        .parquet(tmp)
    )
    schema = spark.read.parquet(tmp).schema
    _write_json_atomic(
        os.path.join(tmp, _MARKER),
        {
            "version": 1,
            "keys": list(keys),
            "n_buckets": int(n_buckets),
            "schema": schema.json(),
        },
    )
    old = target_path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old, ignore_errors=True)
    return {"n_buckets": n_buckets, "keys": list(keys), "cached": False}


def _check_source_schema(
    source: DataFrame, target: DataFrame, data_cols: list[str], why: str
) -> None:
    """Full-row source validation, up front and by TYPE, not just by
    name — unionByName would otherwise insert implicitly-cast values
    on a type drift, and a keys-only source in an insert mode would
    fail late with an opaque AnalysisException."""
    tgt_types = {f.name: f.dataType for f in target.schema.fields}
    src_types = {f.name: f.dataType for f in source.schema.fields}
    want = {c: tgt_types[c] for c in data_cols}
    if set(src_types) != set(want):
        raise ValueError(
            f"merge_into {why}: source/target schemas differ: "
            f"{sorted(src_types)} vs {sorted(want)}"
        )
    drift = {
        c: (str(src_types[c]), str(want[c]))
        for c in want
        if src_types[c] != want[c]
    }
    if drift:
        raise ValueError(
            f"merge_into {why}: source/target schemas differ in type: {drift}"
        )


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    when_matched: str = "update",
    insert_not_matched: bool = True,
    validate: bool = False,
) -> dict:
    """Merge ``source`` into the parquet table at ``target_path``
    (plain or bucketed layout — auto-detected from the marker).

    Single-writer per target (both layouts): concurrent merges to the
    same path would race the swap/manifest — serialize them upstream
    (the foreachBatch contract already does for CDC).

    Returns a manifest dict: plain layout reports ``rows_after``;
    bucketed layout reports ``rows_written`` / ``buckets_touched`` /
    ``n_buckets`` (counting the full table would defeat the pruning).
    """
    _recover(target_path)
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    meta = read_bucket_marker(target_path)
    target = _read_target(spark, target_path, meta)
    data_cols = (
        [c for c in target.columns if c != BUCKET_COL]
        if meta is not None
        else list(target.columns)
    )

    if when_matched == "update" or insert_not_matched:
        # update replaces whole rows; any insert mode appends whole
        # rows — both need a full-row, type-identical source
        why = (
            "update"
            if when_matched == "update"
            else "delete+insert (inserts need full rows)"
        )
        _check_source_schema(source, target, data_cols, why)
    else:  # pure delete: a keys-only source is the natural shape
        source = source.select(*keys)
    if validate:
        dup = (
            source.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"merge_into: source is not key-unique on {keys}: {dup[0]}"
            )

    if meta is not None:
        return _merge_bucketed(
            spark,
            target_path,
            source,
            keys,
            when_matched,
            insert_not_matched,
            meta,
            target,
        )

    kept = target.join(source.select(*keys), on=keys, how="left_anti")
    if when_matched == "update":
        # matched-replacement ∪ unmatched-insert == all of source
        incoming = (
            source
            if insert_not_matched
            else source.join(target.select(*keys), on=keys, how="left_semi")
        )
    else:  # delete
        incoming = (
            source.join(target.select(*keys), on=keys, how="left_anti")
            if insert_not_matched
            else None
        )
    merged = (
        kept.select(*target.columns).unionByName(
            incoming.select(*target.columns)
        )
        if incoming is not None
        else kept
    )

    n_after = _swap_plain(spark, target_path, merged)
    return {"rows_after": n_after, "keys": list(keys), "mode": when_matched}


def _swap_plain(spark: SparkSession, target_path: str, merged: DataFrame) -> int:
    """Plain-layout rewrite + whole-dir two-rename swap; returns the
    row count of the new table."""
    tmp = f"{target_path}.merge-{uuid.uuid4().hex[:8]}"
    merged.write.parquet(tmp)
    n_after = spark.read.parquet(tmp).count()
    old = target_path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old, ignore_errors=True)
    return n_after


def apply_changeset(
    spark: SparkSession,
    target_path: str,
    upserts: DataFrame,
    delete_keys: DataFrame,
    keys: list[str],
) -> dict:
    """One-PASS CDC apply: ``upserts`` replace/insert whole rows and
    ``delete_keys`` are removed, in a SINGLE rewrite of the touched
    buckets (or one plain-layout rewrite) — not one rewrite per op
    type like two ``merge_into`` calls would cost. This halves the
    write amplification of a MERGE-per-micro-batch CDC fold (each
    batch usually carries both upserts and tombstones, and their
    touched-bucket sets overlap heavily).

    Contract (what a last-op-wins in-batch reduce guarantees, see
    streaming/cdc.py): upsert keys are unique, and the upsert and
    delete key sets are disjoint. Idempotent for a fixed changeset —
    replay-safe under foreachBatch at-least-once.
    """
    _recover(target_path)
    meta = read_bucket_marker(target_path)
    target = _read_target(spark, target_path, meta)
    data_cols = (
        [c for c in target.columns if c != BUCKET_COL]
        if meta is not None
        else list(target.columns)
    )
    _check_source_schema(upserts, target, data_cols, "changeset upsert")
    delete_keys = delete_keys.select(*keys)
    all_keys = upserts.select(*keys).unionByName(delete_keys)

    if meta is None:
        kept = target.join(all_keys, on=keys, how="left_anti")
        merged = kept.select(*data_cols).unionByName(
            upserts.select(*data_cols)
        )
        n_after = _swap_plain(spark, target_path, merged)
        return {"rows_after": n_after, "keys": list(keys), "mode": "changeset"}

    if list(meta["keys"]) != list(keys):
        raise ValueError(
            f"apply_changeset: target is bucketed on {meta['keys']}, "
            f"changeset keys are {keys}"
        )
    n = int(meta["n_buckets"])
    src_keys = all_keys.withColumn(BUCKET_COL, _bucket_expr(keys, n)).persist()
    ups = upserts.withColumn(BUCKET_COL, _bucket_expr(keys, n)).persist()
    try:
        touched = sorted(
            r[0] for r in src_keys.select(BUCKET_COL).distinct().collect()
        )
        if not touched:
            return {
                "rows_written": 0,
                "buckets_touched": 0,
                "n_buckets": n,
                "keys": list(keys),
                "mode": "changeset",
            }
        tgt_sub = target.filter(F.col(BUCKET_COL).isin(touched))
        kept = tgt_sub.join(
            src_keys.select(*keys), on=keys, how="left_anti"
        )
        cols = list(target.columns)
        merged = kept.select(*cols).unionByName(ups.select(*cols))
        rows_written = _write_and_swap_buckets(
            spark, target_path, merged, keys, touched
        )
        return {
            "rows_written": rows_written,
            "buckets_touched": len(touched),
            "n_buckets": n,
            "keys": list(keys),
            "mode": "changeset",
        }
    finally:
        src_keys.unpersist()
        ups.unpersist()


def _merge_bucketed(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    when_matched: str,
    insert_not_matched: bool,
    meta: dict,
    target: DataFrame,
) -> dict:
    if list(meta["keys"]) != list(keys):
        raise ValueError(
            f"merge_into: target is bucketed on {meta['keys']}, "
            f"merge keys are {keys}"
        )
    n = int(meta["n_buckets"])
    # the source plan is evaluated three times below (touched-bucket
    # collect, the anti join, the union) — persist it once; it is
    # delta-sized by the CDC contract, so memory-and-disk is safe
    src = source.withColumn(BUCKET_COL, _bucket_expr(keys, n)).persist()
    try:
        # the only driver collect: ≤ n_buckets small ints
        touched = sorted(
            r[0] for r in src.select(BUCKET_COL).distinct().collect()
        )
        if not touched:
            return {
                "rows_written": 0,
                "buckets_touched": 0,
                "n_buckets": n,
                "keys": list(keys),
                "mode": when_matched,
            }
        return _apply_bucketed(
            spark,
            target_path,
            src,
            keys,
            when_matched,
            insert_not_matched,
            n,
            touched,
            target,
        )
    finally:
        src.unpersist()


def _apply_bucketed(
    spark: SparkSession,
    target_path: str,
    src: DataFrame,
    keys: list[str],
    when_matched: str,
    insert_not_matched: bool,
    n: int,
    touched: list[int],
    target: DataFrame,
) -> dict:

    # partition-pruned: only the touched buckets are ever scanned
    # (PartitionFilters in the plan — gated in tests/test_sources.py)
    tgt_sub = target.filter(F.col(BUCKET_COL).isin(touched))
    kept = tgt_sub.join(src.select(*keys), on=keys, how="left_anti")
    if when_matched == "update":
        incoming = (
            src
            if insert_not_matched
            else src.join(tgt_sub.select(*keys), on=keys, how="left_semi")
        )
    else:
        incoming = (
            src.join(tgt_sub.select(*keys), on=keys, how="left_anti")
            if insert_not_matched
            else None
        )
    cols = list(target.columns)  # data cols + bucket
    merged = (
        kept.select(*cols).unionByName(incoming.select(*cols))
        if incoming is not None
        else kept.select(*cols)
    )

    rows_written = _write_and_swap_buckets(
        spark, target_path, merged, keys, touched
    )
    return {
        "rows_written": rows_written,
        "buckets_touched": len(touched),
        "n_buckets": n,
        "keys": list(keys),
        "mode": when_matched,
    }


def _write_and_swap_buckets(
    spark: SparkSession,
    target_path: str,
    merged: DataFrame,
    keys: list[str],
    touched: list[int],
) -> int:
    """Write ``merged`` (touched-bucket rows, bucket column included)
    as hive partitions and swap them in under the roll-forward
    manifest. Returns the rewritten row count."""
    mid = uuid.uuid4().hex[:8]
    tmp = f"{target_path}.merge-{mid}"
    # small delta → one task (≈ one file) per touched bucket; a merge
    # touching most buckets (bulk load / backfill) would then write
    # the whole state through len(touched) tasks with hash-collision
    # skew — salt each bucket into enough sub-parts to use the
    # cluster's parallelism (partitionBy still routes every row to
    # its bucket dir; salting only adds files within a bucket)
    par = spark.sparkContext.defaultParallelism
    salt_parts = max(1, par // max(len(touched), 1))
    if salt_parts > 1:
        # the lit(1) seed decorrelates the salt from the bucket id
        # (both are xxhash64 of the keys; without it, salt ≡ f(bucket)
        # whenever salt_parts divides n_buckets and nothing splits)
        shuffled = merged.repartition(
            len(touched) * salt_parts,
            F.col(BUCKET_COL),
            F.pmod(
                F.xxhash64(F.lit(1), *[F.col(k) for k in keys]),
                F.lit(salt_parts),
            ),
        )
    else:
        shuffled = merged.repartition(len(touched), F.col(BUCKET_COL))
    shuffled.write.partitionBy(BUCKET_COL).parquet(tmp)
    try:
        rows_written = spark.read.parquet(tmp).count()
    except AnalysisException:
        rows_written = 0  # every touched bucket emptied by deletes
    # a touched bucket with zero surviving rows writes no dir; make
    # the intent explicit so roll-forward recovery is uniform
    for k in touched:
        os.makedirs(os.path.join(tmp, f"{BUCKET_COL}={k}"), exist_ok=True)
    man = {"id": mid, "tmp": os.path.basename(tmp), "buckets": touched}
    _write_json_atomic(os.path.join(target_path, _INFLIGHT), man)
    _finish_bucket_swaps(target_path, man)
    return rows_written
