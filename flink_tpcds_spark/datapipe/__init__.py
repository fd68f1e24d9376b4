"""Beyond-reference operators for large-scale training-data pipelines.

These are first-class engine components (BASELINE.json north star):
- ``dedup``       — exact, MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity``  — brute-force cosine top-k, LSH-bucketed ANN
- ``text``        — language-ID, quality scoring, token counting,
                    document fingerprinting
- ``multimodal``  — opaque binary columns + Arrow-batched decode
                    plumbing (decoders stubbed: no image/audio libs
                    in this environment)
- ``curate``      — sequence packing, stratified sampling,
                    decontamination, chunking, reservoir caps,
                    domain mixing, shard writer
- ``pipeline``    — the composed curation chain (quality → exact
                    dedup → near-dup election → decontamination)
                    with a per-document audit ledger

Everything is expressed over DataFrames with JVM-side expressions
wherever possible; Python only appears as Arrow-batched ``mapInPandas``
for the multimodal decode path.
"""

from .curate import (
    bpe_merge_candidates,
    chunk_documents,
    reservoir_per_group,
    write_training_shards,
)
from .dedup import (
    exact_dedup_stats,
    minhash_near_dup_pairs,
    remove_boilerplate_ngrams,
    simhash_fingerprints,
)
from .pipeline import curation_ledger, curation_report
from .similarity import knn_bruteforce, knn_lsh, knn_pq, pq_encode
from .text import add_quality_columns, langid, token_stats

__all__ = [
    "bpe_merge_candidates",
    "chunk_documents",
    "curation_ledger",
    "curation_report",
    "exact_dedup_stats",
    "minhash_near_dup_pairs",
    "remove_boilerplate_ngrams",
    "reservoir_per_group",
    "simhash_fingerprints",
    "knn_bruteforce",
    "knn_lsh",
    "knn_pq",
    "pq_encode",
    "add_quality_columns",
    "langid",
    "token_stats",
    "write_training_shards",
]
