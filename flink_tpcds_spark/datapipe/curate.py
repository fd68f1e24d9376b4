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
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    return (
        df.select(part_col, id_col, n_tok.alias("n_tokens"))
        .withColumn(
            "pack_id", F.floor(cum_before / F.lit(budget)).cast("bigint")
        )
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
