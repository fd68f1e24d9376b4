"""Dataset-curation operators for training-data pipelines.

These go beyond the reference's operator set (it has no data-curation
layer); they are the standard LLM-corpus preparation steps expressed
Spark-first, each deterministic and SQL-expressible so the driver's
DuckDB oracle can value-check them:

- ``sequence_pack`` — single-pass greedy packing of documents into
  fixed token-budget training sequences (shard-local, one window);
- ``stratified_sample`` — deterministic hash-based sampling with
  per-stratum rates (md5-prefix rule: no RNG state, any engine
  reproduces membership bit-for-bit);
- ``decontaminate`` — n-gram overlap between a train split and a
  held-out split (benchmark-contamination detection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import shingles_of_tokens
from .text import tokens


def sequence_pack(
    df: DataFrame,
    budget: int,
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a training-sequence pack of ~``budget``
    tokens: documents are scanned in deterministic (``part_col``,
    ``id_col``) order and a pack closes once its cumulative token
    count reaches the budget (the boundary-crossing document joins
    the open pack, so packs span [budget, budget + max_doc) tokens
    except the last).

    Packing is **shard-local** (windowed per ``part_col``), the shape
    a 100 TB corpus needs: one shuffle on the shard key, no global
    ordering, each shard's window evaluated independently. A global
    single-sequence pack would serialize onto one partition — that is
    the degenerate case this signature avoids by construction.
    """
    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    return pack_rows(
        df.select(part_col, id_col, n_tok.alias("n_tokens")),
        budget,
        part_col=part_col,
        id_col=id_col,
    )


def pack_rows(
    counts_df: DataFrame,
    budget: int,
    part_col: str = "source",
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
) -> DataFrame:
    """Greedy budget packing over PRE-COMPUTED per-row counts (e.g.
    real tokenizer output from :func:`bpe_encode` instead of the
    regex estimate) — same shard-local window as
    :func:`sequence_pack`, one shuffle on the shard key."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(count_col).over(w), F.lit(0).cast("bigint")
    )
    return counts_df.withColumn(
        "pack_id", F.floor(cum_before / F.lit(budget)).cast("bigint")
    )


def stratified_sample(
    df: DataFrame,
    rates_hex: dict[str, str],
    default_hex: str,
    stratum_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic stratified sampling: a row is kept when the
    first hex digit of ``md5(text)`` is ≤ the stratum's threshold
    digit (threshold '3' → 4/16 = 25% expected rate). md5 is
    identical across engines and runs, so membership is reproducible
    with zero RNG state and the sample composes with any later
    pipeline stage. Pure map + filter — no shuffle at any scale.
    """
    digit = F.upper(F.substring(F.md5(F.col(text_col)), 1, 1))
    thr = F.lit(default_hex.upper())
    for stratum, t in sorted(rates_hex.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(t.upper())
        ).otherwise(thr)
    return df.filter(digit <= thr)


def decontaminate(
    df: DataFrame,
    holdout: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Benchmark-decontamination check: for every train document
    (``NOT holdout``), count distinct k-gram shingles it shares with
    the held-out split. Rows are emitted only for contaminated docs
    (≥1 shared shingle); dropping them (or their matched spans) is
    the caller's policy decision.

    Scale shape: both sides explode to (shingle, doc) and meet in a
    shingle-keyed equi-join — the held-out side is deduplicated to
    distinct shingles first, so the join's build side is the held-out
    *vocabulary*, not its corpus. Hot shingles are already rare in
    the distinct set; residual skew is AQE's skew-join case.
    """
    toks = tokens(F.col(text_col))
    sh = shingles_of_tokens(F.col("__toks"), k)
    base = df.withColumn("__toks", toks).filter(F.size("__toks") >= k)
    train = base.filter(~holdout).select(
        F.col(id_col), F.explode(sh).alias("s")
    )
    held = (
        base.filter(holdout)
        .select(F.explode(sh).alias("s"))
        .distinct()
    )
    return (
        train.join(held, "s")
        .groupBy(id_col)
        .agg(F.count_distinct("s").cast("bigint").alias("n_shared_shingles"))
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed token-budget training chunks
    with ``overlap`` tokens of context carried between consecutive
    chunks (the standard long-document → context-window preparation
    step). Chunk ``i`` covers tokens ``[i*stride+1, i*stride+chunk]``
    (1-based, stride = chunk_tokens − overlap); the final chunk is
    the last start position that still contributes at least one
    non-overlap token, so no chunk is a suffix of its predecessor.

    Returns (id, chunk_id, chunk_text, n_chunk_tokens), one row per
    chunk, dropping empty documents.

    Scale shape: tokenize → arithmetic → ``explode`` — a pure
    map-side operator with zero shuffle at any corpus size; output
    cardinality is ~n_tokens/stride rows per document, bounded and
    streamed through the scan partition that produced the document.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    base = (
        df.select(F.col(id_col), F.col(text_col))
        .withColumn("__toks", tokens(F.col(text_col)))
        .withColumn("__n", F.size("__toks").cast("bigint"))
        .filter(F.col("__n") >= 1)
        # integer ceil((n - overlap) / stride), floored at 1 chunk
        .withColumn(
            "__chunks",
            F.greatest(
                F.lit(1).cast("bigint"),
                F.expr(f"(__n - {overlap} + {stride - 1}) div {stride}"),
            ),
        )
    )
    i = F.col("chunk_id")
    start = (i * stride + 1).cast("int")
    chunk = F.slice(F.col("__toks"), start, chunk_tokens)
    return (
        base.select(
            F.col(id_col),
            F.col("__toks"),
            F.col("__n"),
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), F.col("__chunks") - 1)
            ).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            i.alias("chunk_id"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens).cast("bigint"), F.col("__n") - i * stride
            ).alias("n_chunk_tokens"),
        )
    )


def reservoir_per_group(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic per-group cap: keep at most ``k`` documents per
    group, selected by ``md5(text)`` order (ties by id) — a
    reservoir-sample analog with zero RNG state, so any engine (and
    any re-run) elects the same survivors. This is the "no single
    domain dominates the mix" cap applied before mixing weights.

    Scale shape: one shuffle on the group key; the ``row_number() ≤ k``
    filter is Spark's WindowGroupLimit pushdown (plan-asserted), so
    each map task keeps a k-row heap per group and the exchange moves
    only candidate survivors, never the full group.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(text_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select(group_col, id_col, "rk")
    )


def shard_assignments(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-shard id per document:
    ``md5(id)[:8] as uint32 mod n_shards``. md5 is engine- and
    run-stable (unlike Spark's ``hash()``/``xxhash64`` which other
    engines don't reproduce), so a re-run — or a different engine —
    assigns every document to the same shard; that stability is what
    makes incremental re-shards and cross-system audits possible.

    Pure map, zero shuffle; the writer (``write_training_shards``)
    adds the single repartition that materializes shard locality.
    """
    hex8 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    shard = (F.conv(hex8, 16, 10).cast("bigint") % n_shards).alias("shard")
    return df.withColumn("shard", shard)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a training-ready sharded corpus: assign
    deterministic shards, co-locate each shard in one task
    (``repartition(n_shards, shard)``), write
    ``shard=<i>/part-*.parquet`` via Hive-style ``partitionBy``, and
    return the manifest (shard → docs, bytes) the training loader
    reads instead of listing files.

    Scale shape: exactly one shuffle (the shard repartition);
    ``sortWithinPartitions(id)`` costs no extra exchange and makes
    every output file internally ordered, so loaders get
    deterministic sample order without a global sort. The manifest
    rides the same shard key as a map-side-combined groupBy.
    """
    sharded = shard_assignments(df, n_shards, id_col)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return (
        sharded.groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("n_text_bytes"),
        )
        .orderBy("shard")
    )


def global_shuffle(
    df: DataFrame,
    seed: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: every document
    gets a pseudo-random sort key ``md5(seed || '|' || id)``, a shard
    (the key's first hex digit → 16 shards), and a position within
    its shard (row_number over the key). Changing ``seed`` produces an
    independent permutation; re-running with the same seed reproduces
    it bit-for-bit on any engine — the property epoch shuffles and
    resumable training loaders need, and what ``ORDER BY rand()``
    can never give.

    Scale shape: NO global sort. The md5 key hash-distributes rows
    uniformly across the 16 shards, each shard's ordering is an
    independent window (one shuffle on the shard key), and the loader
    reads shards in order — equivalent to a blocked global
    permutation. A single ``orderBy(key)`` would range-partition the
    whole corpus just to enumerate it; the shard decomposition keeps
    every partition executor-sized at any corpus size.
    """
    key = F.md5(
        F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))
    )
    out = df.select(F.col(id_col)).withColumn("shuffle_key", key)
    shard = F.conv(F.substring("shuffle_key", 1, 1), 16, 10).cast("int")
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        out.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select(id_col, "shard", "pos", "shuffle_key")
    )


def contamination_fraction(
    df: DataFrame,
    holdout: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document contamination *score*: the fraction of a train
    document's distinct k-gram shingles that also occur anywhere in
    the held-out split. ``decontaminate`` reports only contaminated
    docs; this emits every train doc THAT HAS AT LEAST ``k`` TOKENS
    (zero-contamination rows included) with an exact
    ``n_shared / n_shingles`` double — the signal a curation policy
    thresholds instead of hard-dropping. Docs shorter than ``k``
    tokens have no k-gram shingles and are excluded from the output
    (the oracle applies the same floor).

    Scale shape: like ``decontaminate`` — held-out side reduced to
    its distinct shingle vocabulary before the equi-join; the train
    side explodes per-doc *distinct* shingles so join volume is
    bounded by vocabulary incidence, not corpus length. Two shuffles
    (join + per-doc agg), no windows.
    """
    toks = tokens(F.col(text_col))
    sh = F.array_distinct(shingles_of_tokens(F.col("__toks"), k))
    base = df.withColumn("__toks", toks).filter(F.size("__toks") >= k)
    train = base.filter(~holdout).select(
        F.col(id_col), F.explode(sh).alias("s")
    )
    held = base.filter(holdout).select(F.explode(sh).alias("s")).distinct()
    shared = (
        train.join(held, "s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    totals = train.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    return totals.join(shared, id_col, "left").select(
        id_col,
        "n_shingles",
        F.coalesce("n_shared", F.lit(0).cast("bigint")).alias("n_shared"),
        (
            F.coalesce("n_shared", F.lit(0)).cast("double")
            / F.col("n_shingles")
        ).alias("contamination"),
    )


def weighted_sample_per_group(
    df: DataFrame,
    k: int,
    weight: Column,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic weighted sampling without replacement, ``k`` per
    group — Efraimidis-Spirakis A-Res: each row gets priority
    ``u^(1/w)`` for a uniform ``u``; the top-``k`` priorities ARE a
    weighted sample without replacement. ``u`` derives from md5 of
    the text (first 12 hex digits / 16^12), so the sample is
    reproducible on any engine and any run — same posture as
    ``stratified_sample``, but weight-proportional (e.g. sample
    long documents more) instead of fixed-rate.

    Scale shape: priority is a pure map expression; top-k per group
    is the WindowGroupLimit pushdown (per-task k-row heaps, only
    candidate survivors cross the exchange).
    """
    u = (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 12), 16, 10).cast(
            "double"
        )
        + F.lit(0.5)
    ) / F.lit(float(16**12))
    priority = F.round(F.pow(u, F.lit(1.0) / weight), 10)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("priority"), F.col(id_col).asc()
    )
    return (
        df.withColumn("priority", priority)
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
        .select(group_col, id_col, "sample_rank", "priority")
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions: per-document status
    ``added`` / ``removed`` / ``changed`` / ``unchanged``, decided by
    content hash (md5 over the text). The audit every incremental
    corpus delivery runs — "what did v2 actually change" — without
    trusting upstream changelogs.

    Scale shape: each side reduces to ``(id, md5)`` at the scan (text
    never survives the projection), then one full-outer equi-join on
    the id. No windows, no driver state; the join key is the unique
    document id so skew is structural-zero.
    """
    o = old.select(F.col(id_col), F.md5(F.col(text_col)).alias("__h_old"))
    n = new.select(F.col(id_col), F.md5(F.col(text_col)).alias("__h_new"))
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def domain_mix_weights(
    df: DataFrame,
    alpha: float = 0.5,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled domain mixing weights — the sampling-weight
    computation behind multi-source training mixes (alpha < 1 upweights
    small domains, the multilingual-sampling rule of Conneau & Lample):
    ``w_d = tokens_d^alpha / sum_d tokens_d^alpha``.

    Determinism: per-row doubles are exact, but the normalizing SUM
    over domains is order-sensitive in IEEE — so the powered sizes go
    through the decimal bridge (functions/deterministic.py): cast to
    DECIMAL(18,6) before summing makes the total associative and
    engine-independent, and the final weight is rounded at 6 digits.

    Scale shape: one groupBy on the domain key (map-side combined) to
    domain granularity — thousands of rows at worst — then a broadcast
    cross-join of the 1-row total. No global window, no driver collect.
    """
    from ..functions.deterministic import DEFAULT_SCALE

    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    per_dom = (
        df.select(F.col(domain_col).alias("domain"), n_tok.alias("n"))
        .groupBy("domain")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "powed",
            # alpha=0.5 → sqrt, which IEEE 754 requires to be
            # correctly rounded (bit-identical on every engine);
            # Math.pow(x, 0.5) carries no such guarantee.
            (
                F.sqrt(F.col("n_tokens").cast("double"))
                if alpha == 0.5
                else F.pow(
                    F.col("n_tokens").cast("double"), F.lit(float(alpha))
                )
            ).cast(f"decimal(18,{DEFAULT_SCALE})"),
        )
    )
    total = per_dom.agg(F.sum("powed").alias("powed_total"))
    return (
        per_dom.crossJoin(F.broadcast(total))
        .withColumn(
            "mix_weight",
            F.round(
                F.col("powed").cast("double")
                / F.col("powed_total").cast("double"),
                6,
            ),
        )
        .select("domain", "n_docs", "n_tokens", "mix_weight")
    )


def vocab_top_k(
    df: DataFrame, k: int = 25, text_col: str = "text"
) -> DataFrame:
    """Corpus-level top-k vocabulary with coverage — the token-
    frequency head every tokenizer-training / corpus-QA pass reports.
    Ties break lexicographically so rank is total and deterministic.

    Returns (rank, token, n_occurrences, coverage) where coverage is
    the exact int/int double fraction of all token occurrences.

    Scale shape: explode → map-side-combined groupBy(token); the
    global top-k is ``orderBy(...).limit(k)`` — Spark's distributed
    TakeOrdered, per-partition heaps then a k-row merge, NOT a global
    sort — and ranking happens on the k surviving rows only. The
    corpus total rides the same aggregate as a broadcast 1-row join.
    """
    toks = tokens(F.col(text_col))
    counts = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
    )
    total = counts.agg(F.sum("n_occurrences").cast("bigint").alias("total"))
    top = (
        counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(k)
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "coverage",
            F.col("n_occurrences").cast("double") / F.col("total"),
        )
        .select("rank", "token", "n_occurrences", "coverage")
    )


def bpe_merge_candidates(
    df: DataFrame,
    top_n: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """First-iteration BPE merge statistics: the frequency of every
    adjacent character pair inside corpus words, weighted by word
    occurrence — the quantity byte-pair-encoding tokenizer training
    maximizes when electing its next merge. Returns the ``top_n``
    pairs as (merge_rank, pair, n_occurrences); ties break
    lexicographically so the ranking is total and engine-stable.

    Scale shape: explode → groupBy(word) count (map-side combined,
    one shuffle on the word key — the vocabulary, not the corpus) →
    per-word char-pair explode via JVM higher-order functions (no
    Python) → groupBy(pair) weighted sum — a second shuffle whose key
    space is ≤ alphabet². The global top-n is a distributed
    TakeOrdered (per-partition heaps), not a global sort, mirroring
    ``vocab_top_k``.

    Driver-gated as ``dp_bpe_merges`` (queries/datapipe.py) against a
    DuckDB oracle computing the same weighted pair counts.
    """
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n_word"))
        .filter(F.length("word") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        F.col("n_word"),
    )
    counts = (
        pairs.groupBy("pair")
        .agg(F.sum("n_word").cast("bigint").alias("n_occurrences"))
    )
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("pair")).limit(top_n)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("pair"))
    return top.withColumn(
        "merge_rank", F.row_number().over(w).cast("bigint")
    ).select("merge_rank", "pair", "n_occurrences")


# ---------------------------------------------------------------------------
# BPE tokenizer: full training + distributed encode (completes the
# train-data pipeline end-to-end: curate → dedup → decontaminate →
# pack → TOKENIZE — VERDICT r9 item 8). Word-level BPE in the
# Sennrich subword-nmt shape: merges never cross word boundaries,
# words come from the corpus-wide tokenization contract (text.TOKEN_RE).
# ---------------------------------------------------------------------------


def bpe_apply_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply a trained merge table to one word (GPT-2 ``bpe()`` shape):
    repeatedly find the LOWEST-RANK adjacent pair present and merge
    every occurrence left-to-right. For a training-ordered merge
    table this equals applying merges sequentially in rank order
    (each merge's parts are built only by earlier merges, and merging
    (X,Y)→XY can never recreate the pair (X,Y) across a replacement
    boundary) — the equivalence the DuckDB oracle's replace-chain
    rendering relies on (queries/datapipe.py::dp_bpe_encode)."""
    parts: list[str] = list(word)
    while len(parts) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (parts[i], parts[i + 1])
        if best_pair is None:
            break
        x, y = best_pair
        out: list[str] = []
        i = 0
        while i < len(parts):
            if i < len(parts) - 1 and parts[i] == x and parts[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    vocab_budget: int = 100_000,
) -> list[tuple[str, str]]:
    """Train a BPE merge table on the corpus.

    Scale shape: the corpus-sized work is ONE distributed word count
    (explode → map-side-combined groupBy on the word key); training
    then iterates over the weighted VOCABULARY — bounded by
    ``vocab_budget`` via TakeOrdered (per-partition heaps, the same
    pinned driver-collect budget the IVF k-means uses) — never over
    the corpus. This is the standard production posture
    (sentencepiece/HF train from word-frequency tables); at 100 TB
    the top-100k word table is ~2 MB regardless of corpus size.
    Ranks are deterministic: ties break lexicographically on the
    pair, so the table is engine- and partitioning-stable.
    """
    word_counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(vocab_budget)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]): r["n"] for r in word_counts if len(r["word"]) >= 2
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for parts, n in vocab.items():
            for i in range(len(parts) - 1):
                p = (parts[i], parts[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        x, y = best
        new_vocab: dict[tuple[str, ...], int] = {}
        for parts, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == x and parts[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Distributed tokenizer encode: apply a trained merge table to
    every document. Returns (id, *keep_cols, n_words, n_chars,
    n_tokens) — ``keep_cols`` pass through the Arrow stage so a
    downstream consumer (e.g. the shard-local packer) needs no
    re-join shuffle against the input.

    Scale shape: the merge table rides a broadcast variable (a real
    tokenizer is ~50k merges ≈ 1 MB — broadcast, never shuffled);
    documents stream through ONE Arrow-batched ``mapInPandas`` stage
    with a per-executor word→token-count cache (Zipf reuse: the hot
    vocabulary dominates, so the per-word BPE loop amortizes to a
    dict hit for almost every token) — no shuffle at all, output is
    one row per input row."""
    import re

    import pandas as pd
    from pyspark.sql import types as T

    from .text import TOKEN_RE

    keep_cols = keep_cols or []
    sc = df.sparkSession.sparkContext
    ranks_bc = sc.broadcast({p: r for r, p in enumerate(merges)})
    word_re = re.compile(TOKEN_RE)

    in_schema = {f.name: f.dataType for f in df.schema.fields}
    schema = T.StructType(
        [T.StructField(id_col, T.LongType())]
        + [T.StructField(c, in_schema[c]) for c in keep_cols]
        + [
            T.StructField("n_words", T.LongType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def encode(batches):
        ranks = ranks_bc.value
        cache: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            n = cache.get(w)
            if n is None:
                n = len(bpe_apply_word(w, ranks))
                cache[w] = n
            return n

        for pdf in batches:
            n_words, n_chars, n_tokens = [], [], []
            for text in pdf[text_col]:
                words = word_re.findall((text or "").lower())
                n_words.append(len(words))
                n_chars.append(sum(len(w) for w in words))
                n_tokens.append(sum(word_tokens(w) for w in words))
            out = {id_col: pdf[id_col].astype("int64")}
            for c in keep_cols:
                out[c] = pdf[c]
            out["n_words"] = pd.Series(n_words, dtype="int64")
            out["n_chars"] = pd.Series(n_chars, dtype="int64")
            out["n_tokens"] = pd.Series(n_tokens, dtype="int64")
            yield pd.DataFrame(out)

    return df.select(id_col, *keep_cols, text_col).mapInPandas(
        encode, schema
    )


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full tokenizer output: (id, tokens array<string>) — the flat
    BPE token sequence of each document (word-internal merges only,
    words in document order). Same distribution shape as
    :func:`bpe_encode` (broadcast table, one Arrow-batched stage,
    per-executor word cache), but materializing the token column a
    training-data writer would feed to an id-mapping step."""
    import re

    import pandas as pd
    from pyspark.sql import types as T

    from .text import TOKEN_RE

    sc = df.sparkSession.sparkContext
    ranks_bc = sc.broadcast({p: r for r, p in enumerate(merges)})
    word_re = re.compile(TOKEN_RE)

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
        ]
    )

    def encode(batches):
        ranks = ranks_bc.value
        cache: dict[str, list[str]] = {}

        def word_parts(w: str) -> list[str]:
            p = cache.get(w)
            if p is None:
                p = bpe_apply_word(w, ranks)
                cache[w] = p
            return p

        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in word_re.findall((text or "").lower()):
                    out.extend(word_parts(w))
                toks.append(out)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "tokens": pd.Series(toks, dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode, schema)


def length_histogram(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Sequence-length distribution in power-of-two buckets — the
    corpus-QA report that sizes packing budgets and flags truncation
    cliffs before a training run (a packing budget below the mass of
    the histogram wastes compute; above it, truncation eats data).

    Bucket b holds documents with token count in [2^b, 2^(b+1));
    zero-token documents land in bucket -1. Returns one row per
    non-empty bucket: (bucket, lo_tokens, hi_tokens, n_docs,
    n_tokens, frac_docs, frac_tokens), fractions exact int/int
    doubles.

    Scale shape: one scan computes per-doc token counts (JVM regex,
    no Python), one map-side-combined groupBy on the ≤ ~40 possible
    bucket keys, and the corpus totals ride a broadcast 1-row join —
    nothing row-sized after the first aggregation.
    """
    n = F.size(tokens(F.col(text_col)))
    bucket = F.when(n <= 0, F.lit(-1)).otherwise(
        F.floor(F.log2(n.cast("double"))).cast("int")
    )
    per_bucket = (
        df.select(bucket.alias("bucket"), n.alias("__n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__n").cast("bigint").alias("n_tokens"),
        )
    )
    totals = per_bucket.agg(
        F.sum("n_docs").cast("bigint").alias("t_docs"),
        F.sum("n_tokens").cast("bigint").alias("t_tokens"),
    )
    lo = F.when(F.col("bucket") < 0, F.lit(0)).otherwise(
        F.expr("shiftleft(1L, bucket)")
    )
    hi = F.when(F.col("bucket") < 0, F.lit(0)).otherwise(
        F.expr("shiftleft(1L, bucket + 1)") - 1
    )
    return (
        per_bucket.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            lo.cast("bigint").alias("lo_tokens"),
            hi.cast("bigint").alias("hi_tokens"),
            "n_docs",
            "n_tokens",
            (F.col("n_docs").cast("double") / F.col("t_docs")).alias(
                "frac_docs"
            ),
            (
                F.col("n_tokens").cast("double")
                / F.greatest(F.col("t_tokens"), F.lit(1))
            ).alias("frac_tokens"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup-aware train/val/test split: every document of a
    near-duplicate CLUSTER lands in the same split, so a test document
    can never have a near-copy in train — the contamination mode a
    per-document split cannot prevent (same failure class as
    benchmark leakage, but internal to the corpus).

    ``clusters`` is ``near_dup_clusters`` output (doc_id, cluster_id);
    unclustered documents form singleton clusters (cluster_id =
    doc_id). The split is a pure function of the CLUSTER id (first
    hex char of md5: 0-b → train 75 %, c-d → val 12.5 %, e-f → test
    12.5 %), so it is deterministic, reproducible on any cluster, and
    re-running after corpus growth keeps old documents in their old
    splits (stable assignment — the property that makes incremental
    re-splits safe).

    Scale shape: one broadcast-or-shuffle left join on the id plus a
    row-local hash — no extra shuffle beyond the cluster labels
    themselves.
    """
    labeled = docs.join(
        clusters.select(id_col, "cluster_id"), id_col, "left"
    ).withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    h = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 1)
    return labeled.withColumn(
        "split",
        F.when(h.isin(*"0123456789ab"), "train")
        .when(h.isin("c", "d"), "val")
        .otherwise("test"),
    )


def token_budget_mix(
    df: DataFrame,
    budget_tokens: int,
    alpha: float = 0.5,
    max_epochs: int = 4,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a training mixture to a TOKEN BUDGET: the step
    after ``domain_mix_weights`` that actually picks documents. Each
    domain gets ``floor(budget * w_d)`` tokens; a domain smaller than
    its share is up-sampled whole-corpus-at-a-time (epochs, capped at
    ``max_epochs`` — the standard guard against memorizing a tiny
    domain), a larger one is down-sampled by a deterministic
    hash-ordered prefix (md5 of the id — reproducible on any engine,
    any run, any partitioning).

    Per selected document the output carries ``n_epochs``: full
    passes over the domain plus one more if the document falls inside
    the remainder prefix (a document is IN the prefix when the
    cumulative token count of all hash-earlier documents is still
    below the remainder — the crossing document is included, the
    "fill then stop" rule).

    Scale shape: weights are domain-granular (broadcast); the only
    per-document work is one window cumsum keyed by domain — a single
    shuffle, no global sort, no driver collect. Token totals per
    domain ride the same broadcast row.
    """
    w = domain_mix_weights(df, alpha, domain_col, text_col)
    targets = w.select(
        "domain",
        F.col("n_tokens").alias("dom_tokens"),
        F.floor(
            F.col("mix_weight").cast("decimal(18,6)")
            * F.lit(int(budget_tokens))
        )
        .cast("bigint")
        .alias("target_tokens"),
    )
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col).alias("domain"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("skey"),
    )
    win = (
        Window.partitionBy("domain")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    docs = docs.withColumn(
        "cum_before", F.sum("n_tokens").over(win) - F.col("n_tokens")
    )
    j = docs.join(F.broadcast(targets), "domain")
    # integer division (`div`), NOT floor(a / b): bigint `/` goes
    # through a double, and an exact-multiple boundary one ulp low
    # would floor to n-1 — `div` stays in exact integer arithmetic
    # on both engines (DuckDB `//`).
    n_full = F.least(
        F.expr("target_tokens div dom_tokens"),
        F.lit(int(max_epochs)),
    ).cast("bigint")
    rem = F.when(
        n_full < max_epochs,
        F.col("target_tokens") - n_full * F.col("dom_tokens"),
    ).otherwise(F.lit(0))
    n_epochs = (
        n_full + (F.col("cum_before") < rem).cast("bigint")
    ).alias("n_epochs")
    return (
        j.select("domain", "doc_id", "n_tokens", n_epochs)
        .filter(F.col("n_epochs") > 0)
    )
