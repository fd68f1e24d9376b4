"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these ops is 100 TB corpora):

- **exact**: hash → groupBy hash → keep min id. One shuffle on a
  16-byte key; dedup state never materializes the texts twice.
- **MinHash+LSH**: per-doc signature (map-side, no shuffle) →
  explode to (band, band_hash) keys → self-join on band buckets →
  exact-Jaccard verify on the candidates only. Shuffle volume is
  O(docs × bands), never O(docs²); the verify join touches only
  LSH-colliding pairs. This is the standard web-scale near-dedup
  topology (cf. Broder '97 resemblance + banding analysis in MMDS).
- **SimHash**: 64-bit fingerprint via per-token hash bit-votes —
  pure map + one groupBy; candidates by fingerprint band equality.

Parameters b=16 bands × r=4 rows (64 hashes): detection probability
at Jaccard s is 1-(1-s⁴)¹⁶ — ≈0.9998 at s=0.8, ≈1-4e-8 at s=0.9 —
against the exact-Jaccard oracle this is exhaustive for true
near-duplicates.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import TOKEN_RE, tokens

N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS

# Deterministic Carter-Wegman universal-hash permutations over the
# base xxhash64, in the 31-bit Mersenne-prime field: products stay
# < 2^62, so the arithmetic never overflows a long — required because
# Spark 4 runs ANSI mode by default (overflow is an error, and the
# driver runs our queries under ITS session, not ours).
_MERSENNE = (1 << 31) - 1
_rng = random.Random(0x5EED)
_PERM_A = [_rng.randrange(1, _MERSENNE) for _ in range(N_HASHES)]
_PERM_B = [_rng.randrange(0, _MERSENNE) for _ in range(N_HASHES)]

# Cached shingle tables registered here so long-lived sessions (bench
# warmup + headline sweep, parity suites) can evict them after the
# result is materialized — .cache() without unpersist would pin
# executor memory for the session lifetime. Spark's own LRU eviction
# is the backstop; release_caches() is the deterministic path.
_LIVE_CACHES: list[DataFrame] = []


def _register_cache(df: DataFrame) -> DataFrame:
    # The cache is a correctness barrier as much as a perf one: without
    # it Catalyst CSE inlines the quadratic shingle expression into the
    # downstream filters (the HOF/CSE hazard). At 100 TB, MEMORY-only
    # caching of a corpus-sized shingle table becomes a spill storm —
    # swap to persist(StorageLevel.DISK_ONLY) or .localCheckpoint()
    # there; the barrier property is what matters, not the medium.
    _LIVE_CACHES.append(df.cache())
    return df


def release_caches() -> None:
    """Unpersist every shingle cache created by the near-dup operators.

    Safe to call any time after the returned DataFrames have been
    materialized (collect/write); harmless if called early — Spark
    just recomputes."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()


def shingles_of_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-gram word shingles over a MATERIALIZED token-array
    column. The token array must be a real column, not the tokens()
    expression inline: Catalyst does no subexpression elimination
    inside higher-order-function lambdas, so an inline tokens() would
    re-run the regexp extraction for every element_at — O(doc_len²).
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + off) for off in range(k)]
        ),
    )
    return F.array_distinct(gram)


def shingles(col: Column, k: int = 3) -> Column:
    """Convenience form over a raw text column — only for small inputs
    or single-use expressions; hot paths should materialize tokens()
    first and use shingles_of_tokens (see docstring above)."""
    return shingles_of_tokens(tokens(col), k)


def exact_dedup_stats(df: DataFrame, text_col: str = "text", by: str = "source") -> DataFrame:
    """Exact duplicate accounting per group: docs, distinct texts
    (by md5), duplicate count."""
    h = F.md5(F.col(text_col).cast("binary"))
    return (
        df.withColumn("__h", h)
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("__h")).alias("n_distinct"),
            (F.count(F.lit(1)) - F.count_distinct(F.col("__h"))).alias("n_dups"),
        )
    )


def hashed_shingles(shingle_col: Column) -> Column:
    """Base hashes of the shingles in the 31-bit Mersenne field.
    Materialize this ONCE per row (withColumn) before computing the
    signature: each of the 64 permutations reads the same array, so the
    string hashing cost is paid once, not 64×."""
    return F.transform(
        shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE))
    )


def minhash_signature(hashed_col: Column) -> Column:
    """64-element MinHash signature over pre-hashed shingles:
    ``min_i((a_i * h + b_i) mod M)`` per permutation.

    Pure-JVM expression form — kept as the reference implementation;
    the hot path uses :func:`minhash_signature_udf` (identical math,
    ~4× faster: 64 array transforms per row allocate heavily, while
    numpy broadcasts the whole permutation matrix per Arrow batch).
    """

    def perm(a: int, b: int):
        # closure (NOT default-arg capture: PySpark HOFs introspect the
        # lambda arity, and default args read as extra positionals)
        return lambda h: F.pmod(
            h * F.lit(a).cast("long") + F.lit(b).cast("long"),
            F.lit(_MERSENNE),
        )

    return F.array(
        *[
            F.array_min(F.transform(hashed_col, perm(a, b)))
            for a, b in zip(_PERM_A, _PERM_B)
        ]
    )


def minhash_signature_udf():
    """Vectorized MinHash signatures: bit-identical to
    :func:`minhash_signature` (int64 products ≤ 2^62 — no overflow;
    numpy % on non-negatives ≡ Spark pmod)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def sigs(hashed: pd.Series) -> pd.Series:
        a = np.array(_PERM_A, dtype=np.int64)[:, None]
        b = np.array(_PERM_B, dtype=np.int64)[:, None]
        out = []
        for h in hashed:
            hh = np.asarray(h, dtype=np.int64)[None, :]
            out.append((a * hh + b) % _MERSENNE)
        return pd.Series([m.min(axis=1) for m in out])

    return sigs


def _band_keys(sig_col: Column) -> Column:
    """Array of (band_id, band_hash) structs — one per LSH band."""
    return F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.xxhash64(
                    *[
                        F.element_at(sig_col, band * ROWS_PER_BAND + r + 1)
                        for r in range(ROWS_PER_BAND)
                    ]
                ).alias("bucket"),
            )
            for band in range(N_BANDS)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact set Jaccard of two shingle arrays (int/int division —
    bit-deterministic across engines)."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    min_tokens: int = 3,
    max_bucket_size: int | None = 5000,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact jaccard ≥ threshold)
    via MinHash-LSH candidate generation + exact verification.

    ``max_bucket_size`` guards the band join against pathological
    buckets: m docs colliding in one (band, bucket) yield m² candidate
    pairs, so one adversarial low-entropy cluster can dominate the
    whole job. Buckets above the cap are skipped for candidate
    generation in THAT band only — colliding docs still pair through
    their 15 other bands, so recall loss needs a cluster to blow the
    cap in every band at once (i.e. near-identical docs, which exact
    dedup upstream should have removed). The guard is a map-combined
    count (shuffle volume = distinct buckets, not rows) feeding a
    **broadcast anti-join** — over-cap buckets are outliers by
    construction, so the broadcast set is tiny and the bands table is
    never re-shuffled for the guard. Set ``None`` to disable.

    Returns columns: ``id_a, id_b, jaccard``.
    """
    # Filter on the RAW text first, then two clean stacked projects.
    # Interleaving filters with computed array columns lets predicate
    # pushdown inline the (tokens→shingles) expression tree into the
    # filter conditions, recomputing the quadratic form — this shape
    # keeps each expensive expression evaluated exactly once.
    # min_tokens ≥ 3 also guarantees ≥1 shingle, so no post-filter.
    sh_table = _register_cache(  # read 3×: bands + both verify sides
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .filter(F.size(tokens(F.col("t"))) >= max(min_tokens, 3))
        .select("id", tokens(F.col("t")).alias("toks"))
        .select("id", shingles_of_tokens(F.col("toks")).alias("sh"))
    )
    # bands table carries only (band, bucket, id) — the signature and
    # shingle arrays do NOT ride through the 16× band explosion.
    sig_udf = minhash_signature_udf()
    bands = (
        sh_table.withColumn("hashed", hashed_shingles(F.col("sh")))
        .withColumn("sig", sig_udf(F.col("hashed")))
        .select("id", F.explode(_band_keys(F.col("sig"))).alias("bk"))
        .select(
            "id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
        )
    )
    if max_bucket_size is not None:
        # Cache first: (id, band, bucket) is 3 ints × 16 rows/doc —
        # tiny next to the signature UDF it shields from recompute
        # (the guard branch + both self-join sides all read it).
        bands = _register_cache(bands)
        over_cap = (
            bands.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") > max_bucket_size)
            .select("band", "bucket")
        )
        bands = bands.join(F.broadcast(over_cap), ["band", "bucket"], "left_anti")
    candidates = (
        # merge: the bands table is corpus-sized (16 rows/doc) and
        # cached — its static estimate can still trip a broadcast of
        # a corpus-proportional side; same policy as the verify joins.
        bands.alias("x").hint("merge")
        .join(bands.alias("y").hint("merge"), ["band", "bucket"])
        .select(
            F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b")
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    # merge hint: the shingle table is corpus-sized with fat array
    # rows — its byte size is invisible to the optimizer's estimate
    # (computed columns), so AQE can pick a broadcast join that OOMs
    # the driver at ~500k docs (measured). Sort-merge, not
    # shuffle-hash: SMJ spills, while a shuffled-hash build side is a
    # monolithic in-memory hash relation that fails under concurrent
    # memory pressure (measured in the CC-loop consumer at x100).
    verified = (
        candidates.join(
            sh_table.select(
                F.col("id").alias("id_a"), F.col("sh").alias("sh_a")
            ).hint("merge"),
            "id_a",
        )
        .join(
            sh_table.select(
                F.col("id").alias("id_b"), F.col("sh").alias("sh_b")
            ).hint("merge"),
            "id_b",
        )
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def ngram_jaccard_pairs_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold via **prefix filtering**
    (PPJoin-style): under a global rarity order of shingles, two sets
    with J ≥ t must share an element within each one's first
    ``|d| - ⌈t·|d|⌉ + 1`` shingles — so an inverted index over only
    those prefixes finds every qualifying pair (lossless), and the
    exact Jaccard verify runs on candidates only.

    vs the naive blocked self-join this turns O(block²) work into
    O(postings-of-rare-shingles) — the difference between 85 s and
    ~5 s at sf0.1 locally, and between impossible and routine at
    100 TB. Blocking by ``block_col`` still applies (lang here).
    """
    from pyspark.sql.window import Window

    # same no-interleaved-filter shape as minhash_near_dup_pairs (see
    # the CollapseProject/pushdown note there); sizes derived AFTER the
    # cache barrier so they never inline the shingle expression.
    cached = _register_cache(
        df.select(
            F.col(id_col).alias("id"),
            F.col(block_col).alias("blk"),
            F.col(text_col).alias("t"),
        )
        .filter(F.size(tokens(F.col("t"))) >= 3)
        .select("id", "blk", tokens(F.col("t")).alias("toks"))
        .select("id", "blk", shingles_of_tokens(F.col("toks")).alias("sh"))
    )
    base = cached.withColumn("n", F.size("sh"))
    exploded = base.select(
        "id", "blk", "n", F.explode("sh").alias("shingle")
    )
    # document frequency = global rarity order key (ties by shingle)
    dfreq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    by_rarity = Window.partitionBy("id").orderBy("df", "shingle")
    prefix_len = F.col("n") - F.ceil(F.col("n") * F.lit(threshold)) + 1
    # dfreq is distinct-shingle-sized — grows with the corpus, so it
    # must not be broadcast either (same class of mis-estimate as the
    # verify join below); merge so the build can spill.
    prefixes = (
        exploded.join(dfreq.hint("merge"), "shingle")
        .withColumn("pos", F.row_number().over(by_rarity))
        .filter(F.col("pos") <= prefix_len)
        .select("blk", "shingle", "id", "n")
    )
    a = prefixes.select(
        "blk", "shingle", F.col("id").alias("id_a"), F.col("n").alias("n_a")
    )
    b = prefixes.select(
        "blk", "shingle", F.col("id").alias("id_b"), F.col("n").alias("n_b")
    )
    candidates = (
        # merge: the prefix postings list is corpus-proportional —
        # never a broadcast candidate (same policy as the verify joins)
        a.hint("merge").join(b.hint("merge"), ["blk", "shingle"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # size-ratio bound: |A|/|B| ∈ [t, 1/t] is necessary for J ≥ t
            & (F.col("n_a") * F.lit(1.0) >= F.col("n_b") * F.lit(threshold))
            & (F.col("n_b") * F.lit(1.0) >= F.col("n_a") * F.lit(threshold))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # merge: same reasoning as minhash_near_dup_pairs' verify join —
    # the shingle-array table must never be broadcast (measured driver
    # OOM at 500k docs) and SMJ spills where a hash build cannot.
    verified = (
        candidates.join(
            base.select(
                F.col("id").alias("id_a"), F.col("sh").alias("sh_a")
            ).hint("merge"),
            "id_a",
        )
        .join(
            base.select(
                F.col("id").alias("id_b"), F.col("sh").alias("sh_b")
            ).hint("merge"),
            "id_b",
        )
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, each bit votes
    ±1, fingerprint bit = sign of the vote sum.

    Shape (r12, guide §2.4 "remove shuffles outright" + §4.2 "native
    code inside the UDF"): a document's fingerprint is a pure function
    of its own token multiset, so it needs NO shuffle at all — the
    r1-r11 form exploded tokens and ran a groupBy(id) with 64
    conditional sums (one corpus-sized exchange carrying 64 vote
    columns, measured 2.41 s at sf0.1); this form hashes the token
    array JVM-side (same xxhash64 per token) and computes the bit
    votes per row in one vectorized numpy kernel (0.43 s, 5.6×,
    bit-identical output — parity asserted over the full corpus in
    scripts/profile_r12b.py and tests/test_datapipe.py). Map-only:
    linear at any corpus size, zero exchange.
    """
    from pyspark.sql.functions import pandas_udf

    hashed = F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t))
    # Empty-token docs are absent from the output (the explode form
    # dropped them implicitly). The emptiness test is a cheap rlike on
    # the raw text — `size(__hs) >= 1` would let filter pushdown
    # inline the whole tokenize+hash transform into the Filter node
    # and evaluate it twice per row (guide §4.4's duplication, seen in
    # the plan).
    base = df.filter(F.lower(F.col(text_col)).rlike(TOKEN_RE)).select(
        F.col(id_col).alias("__id"), hashed.alias("__hs")
    )

    @pandas_udf("bigint")
    def fp(hs: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        one = np.uint64(1)
        out = np.empty(len(hs), dtype=np.int64)
        for i, h in enumerate(hs):
            # int64 hashes viewed as uint64 so >> is a logical shift;
            # vote = Σ(2·bit − 1); fingerprint bit set iff vote > 0.
            a = np.asarray(h, dtype=np.int64).view(np.uint64)
            bits = (a[:, None] >> shifts) & one
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            word = (((votes > 0).astype(np.uint64)) << shifts).sum(
                dtype=np.uint64
            )
            # uint64 → int64 two's-complement view: bit 63 becomes
            # Long.MIN_VALUE exactly as the JVM long arithmetic did.
            out[i] = np.uint64(word).view(np.int64)
        return pd.Series(out)

    return base.select(
        F.col("__id").alias(id_col), fp("__hs").alias("simhash")
    )


def near_dup_clusters(pairs: DataFrame, max_iters: int = 50) -> DataFrame:
    """Connected components over a near-duplicate pair list →
    cluster assignment + canonical-document election (the step real
    dedup pipelines run AFTER pair detection: keep one doc per
    duplicate cluster).

    Algorithm: iterative min-label propagation — every node starts
    labeled with its own id; each round takes the min of its own and
    its neighbors' labels; converges in O(component diameter) rounds.
    This is the standard shared-nothing connected-components shape
    (one self-equi-join + groupBy per round, labels persisted between
    rounds, driver sees only a convergence scalar). Duplicate-cluster
    graphs have tiny diameters (docs near-identical to a common
    ancestor), so the loop is 2-3 rounds in practice; pathological
    chain graphs would want the large-star/small-star variant, which
    halves rounds but shuffles the same data per round.

    Returns (doc_id, cluster_id = min doc_id in component,
    is_canonical = doc_id == cluster_id) for every doc in ≥1 pair.
    """
    # Materialize the pair list ONCE before symmetrizing: the union's
    # two branches otherwise each evaluate the full upstream pair
    # subtree (for minhash input that is the banded self-join + both
    # verify SMJs — measured 11.6 s -> 5.4 s at sf0.1 for the
    # clusters entry with this one barrier). The pair list is the
    # small proxy by construction (near-dup pairs, not the corpus),
    # so checkpoint storage is negligible at any scale.
    pairs = pairs.localCheckpoint(eager=True)
    fwd = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    edges = fwd.union(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    labels = edges.select("u").distinct().withColumn("label", F.col("u")).persist()
    labels.count()  # materialize before the loop mutates lineage
    prev_cache = labels
    for _ in range(max_iters):
        nb_min = (
            edges.join(
                labels.select(F.col("u").alias("v"), "label"), "v"
            )
            .groupBy("u")
            .agg(F.min("label").alias("nb_label"))
        )
        # one cached frame carries BOTH the new label and the old one,
        # so the convergence probe and the next round's input share a
        # single materialization — one Spark action per round instead
        # of two (the probe was ~half the loop's wall-clock: each
        # action pays the full scheduling floor at small SF)
        joined = (
            labels.join(nb_min, "u", "left")
            .select(
                "u",
                F.col("label").alias("__old"),
                F.least(
                    F.col("label"), F.coalesce("nb_label", "label")
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            joined.filter(F.col("label") < F.col("__old")).limit(1).count()
        )
        prev_cache.unpersist()
        prev_cache = joined
        labels = joined.select("u", "label")
        if changed == 0:
            break
    else:
        # Exhausting max_iters means the labels are NOT a fixpoint —
        # returning them silently would hand back wrong cluster ids
        # (and an oracle mismatch with no hint why). Duplicate-cluster
        # graphs converge in 2-3 rounds; hitting this indicates a
        # pathological chain graph → raise so the caller can switch to
        # a large-star/small-star variant or raise max_iters.
        edges.unpersist()
        prev_cache.unpersist()
        raise RuntimeError(
            f"near_dup_clusters did not converge in {max_iters} rounds"
        )
    out = labels.select(
        F.col("u").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("u") == F.col("label")).alias("is_canonical"),
    )
    edges.unpersist()
    # the final cached frame stays persisted (it backs the returned
    # frame); release_caches() evicts it after materialization
    _LIVE_CACHES.append(prev_cache)
    return out


def duplicate_spans(
    df: DataFrame,
    k: int = 3,
    min_span_tokens: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated-span detection — the token-level
    approximation of exact-substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"):
    positions whose k-gram occurs in ≥2 documents are marked, and
    maximal runs of consecutive marked positions become spans
    (a run of m shared k-grams = m+k-1 duplicated tokens). Emits
    ``(id, span_start, span_tokens)`` for spans ≥ ``min_span_tokens``;
    the removal policy (cut the span, drop the doc) is the caller's.

    Approximation contract: spans are k-gram-anchored (nothing
    shorter than k is found, boundaries are token-aligned) and
    "shared" is per-k-gram — a long span's k-grams may match
    different partner documents. That is the standard suffix-array
    shortcut used at corpus scale.

    Scale shape: positioned k-grams explode once; the shared set is
    one map-combined distinct-doc count filtered to ≥2 (vocabulary-
    sized); marking is an equi-join on the gram; runs are a per-doc
    gaps-and-islands window (one shuffle on the doc id). Nothing is
    quadratic in corpus size.
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__t")).filter(
        F.size("__t") >= k
    )
    grams = F.expr(
        f"transform(sequence(1, size(__t) - {k - 1}), "
        f"i -> struct(i - 1 as pos, "
        f"concat_ws(' ', {', '.join(f'__t[i + {off} - 1]' for off in range(k))})"
        f" as s))"
    )
    ps = base.select(id_col, F.explode(grams).alias("g")).select(
        id_col, F.col("g.pos").alias("pos"), F.col("g.s").alias("s")
    )
    shared = (
        ps.groupBy("s")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("s")
    )
    marked = ps.join(shared, "s", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = marked.withColumn(
        "grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        runs.groupBy(id_col, "grp")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("bigint").alias(
                "span_tokens"
            ),
        )
        .filter(F.col("span_tokens") >= min_span_tokens)
        .select(id_col, "span_start", "span_tokens")
    )


def exact_duplicate_spans(
    df: DataFrame,
    min_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT substring dedup detection — the full Lee et al. 2021
    form ("Deduplicating Training Data Makes Language Models
    Better"): a token position is duplicated iff it lies inside a
    verbatim substring of ≥ ``min_len`` tokens that occurs more than
    once in the corpus (ANY occurrences — cross-document or repeated
    within one document). Emits the maximal duplicated spans as
    ``(id, span_start, span_tokens)``.

    Exactness argument (why this equals the paper's suffix-array
    method without building one): a substring of length M ≥ L occurs
    twice ⟺ every one of its L-token windows occurs twice (each
    window of one occurrence has its verbatim twin inside the other),
    and conversely every ≥2× L-window is itself a duplicated
    substring of length L. So the union of all ≥2×-occurring L-token
    windows is precisely the token set covered by duplicated
    substrings of length ≥ L — the suffix array is one way to find
    that union; a positioned L-gram multiplicity count is another.
    Unlike :func:`duplicate_spans` (the k<L chained approximation)
    this anchors on full L-windows (no chaining overclaim, nothing
    shorter than L is ever reported) and counts total occurrences
    (intra-document repeats are found).

    Scale shape (the suffix array's O(N) memory is traded for
    shuffle-light passes): pass 1 shuffles only ``(id, pos, hash)``
    triples — 16-byte keys, never the gram text — to find candidate
    hashes with multiplicity ≥ 2; pass 2 re-derives the gram text
    ONLY for candidate positions (a semi-join-pruned slice of the
    corpus) and confirms multiplicity on the actual content, making
    the result hash-collision-proof, i.e. exact; the interval union
    is a per-doc gaps-and-islands window (merge when the next start
    is ≤ L past the previous — overlap or touch). Duplicate-free
    corpus ⇒ pass 2 touches ~nothing.
    """
    L = min_len
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__t")).filter(
        F.size("__t") >= L
    )
    gram = F.expr(
        f"transform(sequence(1, size(__t) - {L - 1}), "
        f"i -> struct(i - 1 as pos, "
        f"concat_ws(' ', slice(__t, i, {L})) as s))"
    )
    # pass 1: narrow shuffle — hash only, gram text dropped pre-shuffle
    ph = base.select(id_col, F.explode(gram).alias("g")).select(
        id_col,
        F.col("g.pos").alias("pos"),
        F.xxhash64(F.col("g.s")).alias("h"),
    )
    cand_h = (
        ph.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("h")
    )
    cand_pos = ph.join(cand_h, "h", "left_semi").select(id_col, "pos")
    # pass 2: content verify on candidates only (collision-proof) —
    # the token arrays re-enter just for docs that hold a candidate
    cand_s = cand_pos.join(base, id_col).select(
        id_col,
        "pos",
        F.concat_ws(" ", F.slice(F.col("__t"), F.col("pos") + 1, L)).alias(
            "s"
        ),
    )
    dup_s = (
        cand_s.groupBy("s")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("s")
    )
    confirmed = cand_s.join(dup_s, "s", "left_semi").select(id_col, "pos")
    # interval union of the [pos, pos+L) windows: merge when the gap
    # between consecutive starts is ≤ L (overlap OR touch)
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = confirmed.withColumn(
        "brk",
        F.when(
            F.col("pos") - F.lag("pos").over(w) > L, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "grp",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        runs.groupBy(id_col, "grp")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + F.lit(L) - F.min("pos"))
            .cast("bigint")
            .alias("span_tokens"),
        )
        .select(id_col, "span_start", "span_tokens")
    )


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 3,
    min_span_tokens: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply :func:`duplicate_spans`: cut every flagged span out of
    the token stream and re-join the survivors — the "remove the
    duplicated substring, keep the document" policy of exact-substring
    dedup (the alternative to dropping whole near-dup documents).
    Emits ``(id, text_clean, n_tokens, n_removed_tokens)`` for every
    document (zero-removal docs included).

    Scale shape: the span list aggregates per doc (collect_list over
    the handful of spans a doc has) and joins back on the id; the cut
    itself is a JVM higher-order ``filter`` with a positional lambda
    over the token array — no Python, no extra shuffle beyond the
    span join.
    """
    spans = duplicate_spans(df, k, min_span_tokens, id_col, text_col)
    return _cut_spans(df, spans, id_col, text_col)


def _cut_spans(
    df: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Cut every ``(id, span_start, span_tokens)`` span out of the
    token stream and re-join the survivors — the shared removal tail
    of both span detectors. The cut is a JVM higher-order ``filter``
    with a positional lambda; no Python, no shuffle beyond the
    per-doc span join."""
    span_lists = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_tokens")).alias("__spans")
    )
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__t"))
    joined = base.join(span_lists, id_col, "left").withColumn(
        "__spans", F.coalesce("__spans", F.array())
    )
    kept = F.filter(
        F.col("__t"),
        lambda x, i: ~F.exists(
            F.col("__spans"),
            lambda s: (i >= s["span_start"])
            & (i < s["span_start"] + s["span_tokens"]),
        ),
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("text_clean"),
        F.size("__t").cast("bigint").alias("n_tokens"),
        (F.size("__t") - F.size(kept)).cast("bigint").alias(
            "n_removed_tokens"
        ),
    )


def remove_exact_duplicate_spans(
    df: DataFrame,
    min_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply :func:`exact_duplicate_spans`: cut every token covered
    by a verbatim ≥``min_len``-token substring occurring ≥2 times in
    the corpus. This is the cut-every-occurrence variant (the repo's
    established span-removal policy, matching
    :func:`remove_duplicate_spans`); Lee et al. 2021 instead keep
    one canonical copy per duplicate — a policy choice orthogonal to
    the exact detection itself. Emits
    ``(id, text_clean, n_tokens, n_removed_tokens)`` for every doc.
    """
    spans = exact_duplicate_spans(df, min_len, id_col, text_col)
    return _cut_spans(df, spans, id_col, text_col)


def boilerplate_ngrams(
    df: DataFrame,
    k: int = 3,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate detector: the k-gram phrases that
    occur in at least ``min_docs`` distinct documents (navigation
    chrome, license headers, templated footers — the C4/RefinedWeb
    cleanup target). Returns (gram, n_docs).

    Scale shape: explode distinct per-doc grams → map-side-combined
    ``groupBy(gram)`` count — one shuffle keyed on the gram. The
    ≥min_docs filter cuts the output to the (tiny) boilerplate
    vocabulary before anything downstream touches it.
    """
    base = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .filter(F.size("__toks") >= k)
    )
    return (
        base.select(
            F.col(id_col),
            F.explode(shingles_of_tokens(F.col("__toks"), k)).alias("gram"),
        )
        .groupBy("gram")
        .agg(F.count_distinct(id_col).cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_ngrams(
    df: DataFrame,
    k: int = 3,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style boilerplate removal: drop every token covered by an
    occurrence of a boilerplate k-gram (a k-gram present in
    ≥``min_docs`` distinct documents), and report per-document
    accounting plus the md5 of the cleaned text so the result is
    value-checkable without shipping full texts.

    Returns (id, n_tokens, n_dropped, clean_md5) for every document
    with ≥k tokens; ``clean_md5`` hashes the space-joined surviving
    tokens in original order.

    Scale shape (three keyed exchanges, none quadratic):
    1. positional k-gram explode → groupBy(gram) builds the
       boilerplate vocabulary (map-side combined);
    2. the vocabulary — tiny after the ≥min_docs cut — broadcasts
       back onto the positional gram stream; covered token positions
       aggregate per document (groupBy id);
    3. a left join re-attaches the dropped-position set to each doc,
       and a higher-order ``filter`` lambda masks tokens JVM-side —
       no Python, no per-row UDF, no re-tokenization.
    """
    base = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .filter(F.size("__toks") >= k)
    )
    # Eager barrier, not a lazy cache: base feeds the vocabulary
    # build, the coverage join AND the final reattach — concurrent
    # subtrees of one action race an unpopulated cache and each
    # re-tokenize the corpus (same pathology measured on the curation
    # ledger). The stored rows are the token arrays the cache held
    # anyway; MEMORY_AND_DISK spills rather than fails.
    base = base.localCheckpoint(eager=True)
    # (id, pos, gram) for every k-gram occurrence, pos 1-based
    pos_grams = base.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - (k - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(
                        " ",
                        *[
                            F.element_at(F.col("__toks"), i + off)
                            for off in range(k)
                        ],
                    ).alias("gram"),
                ),
            )
        ).alias("pg"),
    ).select(id_col, F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    block = (
        pos_grams.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gram")
    )
    dropped = (
        pos_grams.join(F.broadcast(block), "gram")
        .select(id_col, F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("tp"))
        .groupBy(id_col)
        .agg(F.collect_set("tp").alias("__dropped"))
    )
    no_drop = F.array().cast("array<int>")
    cleaned = (
        base.join(dropped, id_col, "left")
        .withColumn("__dropped", F.coalesce("__dropped", no_drop))
        .select(
            F.col(id_col),
            F.size("__toks").cast("bigint").alias("n_tokens"),
            F.size("__dropped").cast("bigint").alias("n_dropped"),
            F.md5(
                F.array_join(
                    F.filter(
                        "__toks",
                        lambda x, i: ~F.array_contains(
                            F.col("__dropped"), (i + 1).cast("int")
                        ),
                    ),
                    " ",
                )
            ).alias("clean_md5"),
        )
    )
    return cleaned


def _deletion_variants(col: Column) -> Column:
    """All strings obtained by deleting exactly ONE character of
    ``col`` — the depth-1 FastSS deletion neighborhood. Pure JVM
    expression (sequence → transform → substr/concat), no UDF. The
    zero-length case is guarded explicitly: Spark's ``sequence(1, 0)``
    would generate a DESCENDING sequence, not an empty one."""
    one_deleted = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - F.lit(1)),
            col.substr(i + F.lit(1), F.length(col)),
        ),
    )
    return F.when(F.length(col) > 0, one_deleted).otherwise(
        F.array().cast("array<string>")
    )


def _deletion_neighborhood(col: Column, k: int) -> Column:
    """Strings reachable from ``col`` by deleting 0..k characters
    (duplicates removed). Size ≤ 1 + len + len·(len−1)/2 + … —
    (len+1)^k in the worst case, so keys are meant to be short."""
    nb = F.array(col)
    for _ in range(k):
        nb = F.array_union(
            nb,
            F.array_distinct(F.flatten(F.transform(nb, _deletion_variants))),
        )
    return nb


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "text",
    max_dist: int = 1,
) -> DataFrame:
    """EXACT edit-distance-≤k similarity self-join (entity resolution
    / fuzzy key matching) via FastSS deletion-neighborhood blocking.

    Blocking guarantee (Bocek et al. 2007, "Fast Similarity Search in
    Big Dictionaries"): if lev(s, t) ≤ k, deleting the ≤k edited
    positions from each side yields a COMMON string, so the depth-k
    deletion neighborhoods of s and t intersect — neighborhood
    blocking is lossless. Candidates are then verified with the exact
    ``levenshtein`` built-in in its threshold form (the DP
    early-aborts above ``max_dist``), so the result is identical to
    the O(n²) all-pairs oracle. Flink exposes no such operator; the
    reference's scalar surface stops at per-row similarity functions
    (flink-docs similarity UDFs) — this is the set-level join a
    curation pipeline actually needs.

    Scale design (100 TB): the variant equi-join runs over DISTINCT
    keys, so identical-key clusters — the classic adversarial skew,
    m copies of one title ⇒ m² candidates — never enter the block
    join at all; they re-expand afterwards as dist-0 pairs, which is
    the true output size, not intermediate state. Shuffle volume is
    O(distinct_keys × neighborhood), never O(n²). Corpus-sized join
    sides carry the module's ``merge`` hint (spillable SMJ — computed
    exploded columns make byte estimates meaningless, the r7-measured
    broadcast/SHJ failure modes). Keys are meant to be SHORT entity
    keys (names, titles, normalized prefixes): the neighborhood is
    ~(len+1)^k variants per key, so len 16 / k=1 is 17 rows per
    distinct key and len 12 / k=2 is ~79.

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``, one row per
    unordered pair, ``dist ≤ max_dist``.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be ≥ 1 — use exact dedup for 0")
    keyed = _register_cache(
        df.select(F.col(id_col).alias("id"), F.col(key_col).alias("k")).filter(
            F.col("k").isNotNull()
        )
    )
    # The block join sees each key ONCE regardless of multiplicity.
    variants = (
        keyed.select("k")
        .distinct()
        .select(
            "k",
            F.explode(_deletion_neighborhood(F.col("k"), max_dist)).alias("v"),
        )
    )
    key_pairs = (
        variants.alias("x")
        .hint("merge")
        .join(variants.alias("y").hint("merge"), "v")
        .filter(F.col("x.k") < F.col("y.k"))
        .select(F.col("x.k").alias("k_a"), F.col("y.k").alias("k_b"))
        .distinct()
        .withColumn("dist", F.levenshtein("k_a", "k_b", max_dist))
        .filter(F.col("dist") >= 0)  # threshold form returns -1 above k
    )
    # dist-0 pairs: identical keys never reach the variant join; their
    # quadratic fan-out IS the requested output, produced directly.
    same_key = (
        keyed.alias("p")
        .hint("merge")
        .join(keyed.alias("q").hint("merge"), "k")
        .filter(F.col("p.id") < F.col("q.id"))
        .select(
            F.col("p.id").alias("id_a"),
            F.col("q.id").alias("id_b"),
            F.lit(0).alias("dist"),
        )
    )
    cross_key = (
        key_pairs.join(
            keyed.select(F.col("k").alias("k_a"), F.col("id").alias("ia")).hint(
                "merge"
            ),
            "k_a",
        )
        .join(
            keyed.select(F.col("k").alias("k_b"), F.col("id").alias("ib")).hint(
                "merge"
            ),
            "k_b",
        )
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "dist",
        )
    )
    return same_key.unionByName(cross_key)
