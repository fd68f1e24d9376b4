"""Beyond-reference operators for large-scale training-data pipelines.

These are first-class engine components (BASELINE.json north star):
- ``dedup``       — exact, MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity``  — brute-force cosine top-k, LSH-bucketed ANN
- ``text``        — language-ID, quality scoring, token counting,
                    document fingerprinting
- ``multimodal``  — opaque binary columns + Arrow-batched decode
                    plumbing (decoders stubbed: no image/audio libs
                    in this environment)

Everything is expressed over DataFrames with JVM-side expressions
wherever possible; Python only appears as Arrow-batched ``mapInPandas``
for the multimodal decode path.
"""

from .dedup import exact_dedup_stats, minhash_near_dup_pairs, simhash_fingerprints
from .similarity import knn_bruteforce, knn_lsh
from .text import add_quality_columns, langid, token_stats

__all__ = [
    "exact_dedup_stats",
    "minhash_near_dup_pairs",
    "simhash_fingerprints",
    "knn_bruteforce",
    "knn_lsh",
    "add_quality_columns",
    "langid",
    "token_stats",
]
