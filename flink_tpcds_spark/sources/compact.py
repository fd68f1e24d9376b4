"""Small-file compaction for parquet tables.

The operational chore every long-lived lake accumulates: streaming
micro-batches, dynamic-partition overwrites, and per-executor writers
leave thousands of undersized files, and scan throughput collapses
under per-file open/footer costs long before data volume is the
problem. Compaction rewrites a table (or one partition of it) into
size-targeted files.

Scale shape: ONE round-robin repartition to ``ceil(bytes/target)``
tasks — no shuffle key, no sort, no skew (round-robin is balanced by
construction); each task streams one output file. File sizing comes
from the actual on-disk bytes (cheap directory listing), not a row
estimate, so compression ratio is accounted for. The rewrite goes to
a fresh directory and the swap is the caller's atomic-rename step —
compacting in place would race concurrent readers.
"""

from __future__ import annotations

import math
import os


def _dir_bytes(path: str) -> tuple[int, int]:
    """(total_bytes, n_data_files) of the parquet files under path."""
    total = 0
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") or (
                f.startswith("part-") and not f.endswith(".crc")
            ):
                total += os.path.getsize(os.path.join(root, f))
                n += 1
    return total, n


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite the parquet table at ``src_path`` into ``dst_path``
    with files sized toward ``target_file_bytes``. Returns a manifest
    dict: files/bytes before and after, and the task count used.

    The output file count is ``ceil(source_bytes / target)`` — the
    number of ~target-sized files the data actually fills. Row data
    is preserved exactly (no ordering contract: parquet tables carry
    none between files).
    """
    if os.path.realpath(src_path) == os.path.realpath(dst_path):
        raise ValueError(
            f"compact_parquet: dst_path == src_path ({src_path!r}) — "
            "mode('overwrite') would truncate the source mid-scan"
        )
    src_bytes, src_files = _dir_bytes(src_path)
    n_out = max(1, math.ceil(src_bytes / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_out).write.mode("overwrite").parquet(dst_path)
    dst_bytes, dst_files = _dir_bytes(dst_path)
    return {
        "src_files": src_files,
        "src_bytes": src_bytes,
        "dst_files": dst_files,
        "dst_bytes": dst_bytes,
        "tasks": n_out,
    }
