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
