#!/usr/bin/env python
"""Decade-up scaling measurement for the LLM-datapipe stack.

The corpus-side twin of scripts/bench_sf1.py: every 100 TB verdict on
the dedup/ANN/text operators is a plan-shape argument verified at
sf0.1 (5k docs / 2k vectors); this script MEASURES the same operators
at ×10 and ×100 that volume and checks exact structural invariants.

Scaled corpora are built by structure-preserving transforms so the
expected results are known in closed form:

- documents ×m: copy k gets a per-copy random character permutation
  (a bijection on characters → a bijection on
  tokens → a bijection on shingle sets). Jaccard similarity is
  invariant under a token bijection, so every copy carries EXACTLY
  the original duplicate structure, while cross-copy token spaces are
  disjoint — near-dup pair count must be exactly m× the base count,
  and length_histogram's fraction columns must be bit-identical.
- embeddings ×m: copy k multiplies every vector elementwise by a
  deterministic ±1 pattern (sign flip). Within-copy cosines are
  EXACTLY preserved ((s⊙x)·(s⊙y) = x·y); cross-copy cosines
  concentrate near 0 at dim=64.

Usage: python scripts/bench_datapipe_scale.py [--scales 1,10,100]
       [--ops name1,name2]   (restrict to a subset of operators)
Prints one JSON line: per-op seconds at each scale + invariant checks.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")

from pyspark.sql import functions as F  # noqa: E402

from flink_tpcds_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/datapipe_scale"

from flink_tpcds_spark.datapipe.scaling import (  # noqa: E402
    COPY_OFFSET as OFF,
    scaled_documents,
    scaled_embeddings,
)


def build(spark, m: int) -> tuple[str, str]:
    docs_path = f"{WORK}/documents_x{m}.parquet"
    embs_path = f"{WORK}/embeddings_x{m}.parquet"
    if os.path.exists(docs_path) and os.path.exists(embs_path):
        return docs_path, embs_path
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    embs = spark.read.parquet(f"{BASE}/embeddings.parquet")
    scaled_documents(docs, m).repartition(32).write.mode(
        "overwrite"
    ).parquet(docs_path)
    scaled_embeddings(embs, m).repartition(32).write.mode(
        "overwrite"
    ).parquet(embs_path)
    return docs_path, embs_path


def dp_image_decode_rows(spark, docs) -> int:
    """The dp_image_decode pipeline over a scaled corpus: synth a real
    PPM/PNG per doc → stdlib decode → NN resize (decode runs inside
    the fused resize stage); one output row per document."""
    import pandas as pd

    from flink_tpcds_spark.datapipe.multimodal import (
        _encode_png,
        _encode_ppm,
        resize_image,
    )

    def synth(batches):
        for pdf in batches:
            payloads = []
            for raw in pdf["doc_id"]:
                i = int(raw)
                h, w = 3 + i % 7, 4 + i % 13
                px = bytes([i % 251]) * (h * w * 3)
                payloads.append(
                    _encode_ppm(h, w, 3, px)
                    if i % 2 == 0
                    else _encode_png(h, w, 3, px, filter_type=i % 5)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    imgs = docs.select("doc_id").mapInPandas(
        synth, "doc_id long, payload binary"
    )
    return resize_image(imgs, 4, 6).count()


def dp_audio_decode_rows(spark, docs) -> int:
    """The dp_audio_decode pipeline over a scaled corpus: synth a real
    PCM WAV per doc → stdlib parse + exact sample stats."""
    import struct

    import pandas as pd

    from flink_tpcds_spark.datapipe.multimodal import (
        _encode_wav,
        decode_audio,
    )

    def synth(batches):
        for pdf in batches:
            payloads = []
            for raw in pdf["doc_id"]:
                i = int(raw)
                nch = 1 + i % 2
                nfr = 100 + i % 50
                samples = struct.pack("<h", i % 1000 - 500) * (nfr * nch)
                payloads.append(_encode_wav(8000, nch, samples))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    wavs = docs.select("doc_id").mapInPandas(
        synth, "doc_id long, payload binary"
    )
    return decode_audio(wavs).count()


def dp_video_frames(spark, docs) -> int:
    """The dp_video_decode pipeline over a scaled corpus: synth a real
    AVI per doc → container parse → every-2nd-frame DIB decode."""
    import pandas as pd

    from flink_tpcds_spark.datapipe.multimodal import (
        _encode_avi,
        sample_video_frames,
    )

    def synth(batches):
        for pdf in batches:
            payloads = []
            for raw in pdf["doc_id"]:
                i = int(raw)
                h, w = 2 + i % 3, 4 + i % 5
                frames = [
                    bytes(
                        (i + k) % 200 + x + 2 * y + c
                        for y in range(h)
                        for x in range(w)
                        for c in range(3)
                    )
                    for k in range(3 + i % 6)
                ]
                payloads.append(_encode_avi(h, w, frames))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    vids = docs.select("doc_id").mapInPandas(
        synth, "doc_id long, payload binary"
    )
    return sample_video_frames(vids, stride=2).count()


def main() -> None:
    scales = [1, 10, 100]
    if "--scales" in sys.argv:
        scales = [
            int(x)
            for x in sys.argv[sys.argv.index("--scales") + 1].split(",")
        ]
    spark = get_spark("datapipe-scale")

    from flink_tpcds_spark.datapipe.curate import (
        bpe_encode,
        length_histogram,
    )
    from flink_tpcds_spark.queries.datapipe import _BPE_MERGES
    from flink_tpcds_spark.datapipe.dedup import (
        edit_distance_pairs,
        exact_dedup_stats,
        minhash_near_dup_pairs,
        ngram_jaccard_pairs_exact,
        release_caches,
        simhash_fingerprints,
    )
    from flink_tpcds_spark.datapipe.similarity import (
        knn_bruteforce,
        knn_ivf,
        semantic_dedup,
    )
    from flink_tpcds_spark.datapipe.text import (
        add_quality_columns,
        token_stats,
    )

    out: dict = {"metric": "datapipe_scale", "scales": {}}
    base_vals: dict = {}
    for m in scales:
        docs_path, embs_path = build(spark, m)
        docs = spark.read.parquet(docs_path)
        embs = spark.read.parquet(embs_path)
        n_embs = embs.count()
        # FIXED query set (copy-0 only): knn timing then measures how
        # the CORPUS side scales, not query fan-out.
        qf = (F.col("vec_id") < OFF) & (F.col("vec_id") % 20 == 0)
        # scale posture: cells of ~256 vectors, like any real IVF
        # deployment (fixed cell size → linear total compute)
        n_cells = max(16, n_embs // 256)

        ops = {
            "token_stats_sum": lambda: token_stats(docs)
            .agg(F.sum("n_tokens"))
            .collect()[0][0],
            "quality_rows": lambda: add_quality_columns(docs).count(),
            "length_hist": lambda: sorted(
                (r.bucket, r.n_docs, round(r.frac_docs, 12))
                for r in length_histogram(docs).collect()
            ),
            "exact_dup_docs": lambda: exact_dedup_stats(docs)
            .agg(F.sum("n_dups"))
            .collect()[0][0],
            "minhash_pairs": lambda: minhash_near_dup_pairs(docs).count(),
            "jaccard_pairs": lambda: ngram_jaccard_pairs_exact(docs).count(),
            "simhash_rows": lambda: simhash_fingerprints(docs).count(),
            # 16-char key, ed≤1: the per-copy cipher is a character
            # bijection, and levenshtein is invariant under one, so
            # within-copy pairs replicate exactly; cross-copy keys
            # differ in (almost) every letter → pair count = m× base.
            "fuzzy_pairs": lambda: edit_distance_pairs(
                docs.select("doc_id", F.substring("text", 1, 16).alias("k")),
                key_col="k",
            ).count(),
            # tokenizer encode: n_words/n_chars are invariant under the
            # per-copy character bijection (m× base exactly); n_tokens
            # is not (the merge table names literal chars), so it is
            # recorded for throughput only.
            "bpe_encode": lambda: (
                lambda r: {"chars": r[0], "tokens": r[1]}
            )(
                bpe_encode(docs, _BPE_MERGES)
                .agg(F.sum("n_chars"), F.sum("n_tokens"))
                .collect()[0]
            ),
            # real codec path: synth PPM/PNG per doc → decode → resize
            # (the dp_image_decode pipeline); one output row per doc,
            # so rows = m× base exactly.
            "image_rows": lambda: dp_image_decode_rows(spark, docs),
            # audio: synth WAV per doc → parse + exact PCM stats
            "audio_rows": lambda: dp_audio_decode_rows(spark, docs),
            # video: synth AVI per doc → container parse → every-2nd-
            # frame DIB decode; sampled-frame count is doc_id-derived,
            # and scaled copies use fresh ids, so only throughput and
            # the per-doc coverage invariant (checked in-op) apply
            "video_frames": lambda: dp_video_frames(spark, docs),
            "knn_bf_rows": lambda: knn_bruteforce(embs, qf, k=10).count(),
            "knn_ivf_rows": lambda: knn_ivf(
                embs, qf, k=10, n_clusters=n_cells
            ).count(),
            "semantic_kept": lambda: semantic_dedup(
                embs, n_clusters=n_cells
            ).count(),
        }
        if "--ops" in sys.argv:
            want = sys.argv[sys.argv.index("--ops") + 1].split(",")
            ops = {n: f for n, f in ops.items() if n in want}
        res: dict = {}
        for name, fn in ops.items():
            release_caches()
            t0 = time.time()
            val = fn()
            res[name] = {"sec": round(time.time() - t0, 2), "val": val}
        out["scales"][m] = {
            "rows_docs": docs.count(),
            "rows_embs": embs.count(),
            "ops": {
                n: {
                    "sec": r["sec"],
                    "val": r["val"] if not isinstance(r["val"], list) else "hist",
                }
                for n, r in res.items()
            },
        }
        if m == scales[0] and m == 1:
            base_vals = {n: r["val"] for n, r in res.items()}
        elif base_vals:
            inv = {}
            for n in (
                "exact_dup_docs",
                "minhash_pairs",
                "jaccard_pairs",
                "fuzzy_pairs",
                "image_rows",
                "audio_rows",
            ):
                if n in res:
                    inv[n] = res[n]["val"] == m * base_vals[n]
            if "bpe_encode" in res and "bpe_encode" in base_vals:
                inv["bpe_chars"] = (
                    res["bpe_encode"]["val"]["chars"]
                    == m * base_vals["bpe_encode"]["chars"]
                )
            if "length_hist" in base_vals:
                base_h = {b: (nd, f) for b, nd, f in base_vals["length_hist"]}
                got_h = {b: (nd, f) for b, nd, f in res["length_hist"]["val"]}
                inv["length_hist_fracs"] = set(base_h) == set(got_h) and all(
                    got_h[b][0] == m * base_h[b][0]
                    and got_h[b][1] == base_h[b][1]
                    for b in base_h
                )
            out["scales"][m]["invariants_x_base"] = inv
    print(json.dumps(out))


if __name__ == "__main__":
    main()
