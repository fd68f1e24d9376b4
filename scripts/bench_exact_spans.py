"""Exact-substring dedup scale reading — the measured growth curve
behind dp_exact_dup_spans (Lee et al. 2021 full form, hash-prefilter
+ content-verify topology in datapipe/dedup.py:exact_duplicate_spans).

Two readings:

1. sf growth: documents at sf0.01 (500 docs) vs sf0.1 (5k docs) —
   wall-clock should track corpus size roughly linearly (the first
   shuffle is positioned 16-byte hashes; nothing is quadratic).
2. planted ×N synthetic: a corpus of N mostly-unique docs with one
   duplicated 12-token paragraph planted into a fixed 2% of them at a
   known token offset; asserts every planted doc (and ONLY planted
   docs) yields exactly the planted span, at N = 10k and 100k —
   correctness is scale-invariant, wall-clock is the ×10 reading.

    python scripts/bench_exact_spans.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    from pyspark.sql import functions as F

    from flink_tpcds_spark.datapipe.dedup import exact_duplicate_spans
    from flink_tpcds_spark.schemas import load_table
    from flink_tpcds_spark.session import get_spark

    spark = get_spark("bench_exact_spans")
    out: dict = {}

    for sf in ("sf0.01", "sf0.1"):
        d = load_table(spark, f"/root/testdata/{sf}", "documents")
        t0 = time.time()
        n = exact_duplicate_spans(d, min_len=8).count()
        out[sf] = {"spans": n, "sec": round(time.time() - t0, 3)}

    # planted synthetic: doc i is 40 doc-unique tokens (u{i}x{j} —
    # underscore-free, since the token regex [a-z0-9]+ splits on _),
    # and docs with i % 50 == 0 carry the duplicated paragraph at
    # token offset 10. Unique filler can never produce a >=2x
    # 12-window, so the exact result is known in closed form.
    plant = " ".join(f"dup{j}" for j in range(12))
    for n_docs in (10_000, 100_000):
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.concat_ws(
                    " ",
                    *[
                        F.format_string(f"u%dx{j}", "id")
                        for j in range(10)
                    ],
                ),
                F.when(F.col("id") % 50 == 0, F.lit(plant)).otherwise(
                    F.concat_ws(
                        " ",
                        *[
                            F.format_string(f"v%dx{j}", "id")
                            for j in range(12)
                        ],
                    )
                ),
                F.concat_ws(
                    " ",
                    *[
                        F.format_string(f"w%dx{j}", "id")
                        for j in range(18)
                    ],
                ),
            ).alias("text"),
        )
        t0 = time.time()
        spans = exact_duplicate_spans(
            docs, min_len=12, text_col="text"
        ).collect()
        sec = round(time.time() - t0, 3)
        expect = {(i, 10, 12) for i in range(0, n_docs, 50)}
        got = {(r.doc_id, r.span_start, r.span_tokens) for r in spans}
        assert got == expect, (
            f"planted-span mismatch at N={n_docs}: "
            f"{len(got ^ expect)} differing spans"
        )
        out[f"planted_{n_docs}"] = {
            "planted_docs": n_docs // 50,
            "spans_found": len(got),
            "exact": True,
            "sec": sec,
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
