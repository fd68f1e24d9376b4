"""Structure-preserving corpus replication — scale-testing utilities.

Every 100 TB claim about the dedup/ANN/text operators is a plan-shape
argument until measured on more data. These helpers build an m× corpus
from a base corpus such that the EXPECTED results are known in closed
form, so a scale run checks correctness and timing simultaneously
(scripts/bench_datapipe_scale.py drives them):

- ``scaled_documents``: copy k re-ids its docs into a disjoint id
  range and applies a per-copy character bijection (a seeded random
  permutation of letters and digits). A bijection on characters induces a
  bijection on tokens and on shingle sets, and Jaccard similarity is
  invariant under any bijection of the underlying sets — so every
  copy carries EXACTLY the base corpus's duplicate structure while
  cross-copy token spaces stay disjoint. Consequences a scale run can
  assert exactly: near-dup pair count = m × base, exact-dup count =
  m × base, length_histogram fractions bit-identical (token counts
  are untouched).
- ``scaled_embeddings``: copy k multiplies every vector elementwise
  by a deterministic UNBIASED ±1 pattern (md5 bit per (copy, dim)).
  Within-copy cosines are exactly preserved ((s⊙x)·(s⊙y) = x·y
  because s_i² = 1); cross-copy cosines concentrate as
  ~N(0, 1/sqrt(dim)). The pattern must be unbiased: with
  P(+1) = p ≠ 0.5, copies of the same vector keep a systematic
  cosine ≈ (2p−1), which at p = 4/7 is enough to cross a 0.4
  semantic-dedup threshold corpus-wide.
"""

from __future__ import annotations

import hashlib
import string

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: id offset between copies — keeps per-copy id ranges disjoint
COPY_OFFSET = 10_000_000


def copy_cipher(k: int) -> tuple[str, str]:
    """(src, dst) for ``F.translate``: a seeded random permutation of
    the letters (applied to both cases identically, so lowercasing
    commutes with the cipher) and of the digits — a distinct bijection
    per copy. NOT a Caesar shift: with only 26 rotations, copies k and
    k+26 of digit-free text are character-IDENTICAL, which at m=100
    manufactured 370k phantom exact dups in the first scale run."""
    import random

    lo = string.ascii_lowercase
    dg = string.digits
    if k == 0:
        return lo + lo.upper() + dg, lo + lo.upper() + dg
    rnd = random.Random(0xC0FFEE ^ (k * 2654435761))
    lo_p = list(lo)
    rnd.shuffle(lo_p)
    dg_p = list(dg)
    rnd.shuffle(dg_p)
    lo_p = "".join(lo_p)
    dg_p = "".join(dg_p)
    return lo + lo.upper() + dg, lo_p + lo_p.upper() + dg_p


def sign_pattern(k: int, dim: int) -> list[float]:
    """Deterministic unbiased ±1 pattern for copy k (identity at 0)."""
    if k == 0:
        return [1.0] * dim
    return [
        1.0 if hashlib.md5(f"{k}:{i}".encode()).digest()[0] & 1 else -1.0
        for i in range(dim)
    ]


def scaled_documents(
    docs: DataFrame,
    m: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """m bijection-ciphered copies with disjoint id ranges (copy 0
    pristine). Scale shape: a union of narrow projections — one scan
    per copy, no shuffle; the writer repartitions.

    Precondition (ADVICE r7): the cipher is the identity on
    non-alphanumeric characters, so a document containing NO letters
    or digits (punctuation/whitespace-only) would be byte-identical
    across copies — breaking the closed-form invariants (disjoint
    cross-copy token spaces, exact m× dup counts). Such docs carry no
    dedup structure anyway, so they are filtered out here; callers
    measuring invariants should count from the returned frame."""
    docs = docs.filter(
        F.col(text_col).rlike("[A-Za-z0-9]")
    )
    parts = []
    others = [c for c in docs.columns if c not in (id_col, text_col)]
    for k in range(m):
        src, dst = copy_cipher(k)
        parts.append(
            docs.select(
                (F.col(id_col) + k * COPY_OFFSET).alias(id_col),
                F.translate(text_col, src, dst).alias(text_col),
                *others,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def scaled_embeddings(
    embs: DataFrame,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """m sign-flipped copies with disjoint id ranges (copy 0
    pristine). Element type is preserved (cast back to float)."""
    first = embs.select(vec_col).first()
    if first is None or first[0] is None:
        raise ValueError(
            "scaled_embeddings: input has no rows (or a null first "
            f"vector) — cannot derive the dimension from {vec_col!r}"
        )
    dim = len(first[0])
    parts = []
    others = [c for c in embs.columns if c not in (id_col, vec_col)]
    for k in range(m):
        pat = F.array(*[F.lit(v) for v in sign_pattern(k, dim)])
        parts.append(
            embs.select(
                (F.col(id_col) + k * COPY_OFFSET).alias(id_col),
                F.zip_with(
                    vec_col, pat, lambda x, y: (x * y).cast("float")
                ).alias(vec_col),
                *others,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
