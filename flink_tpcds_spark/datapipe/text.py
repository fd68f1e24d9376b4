"""Text analysis operators: tokenization, quality, language-ID,
fingerprinting.

All expressions are JVM-side (regexp/length/hash built-ins) so they
run inside whole-stage codegen — at 100 TB these are pure map-side
operators with zero shuffle.

Tokenization contract (shared with the DuckDB oracles):
``TOKEN_RE`` extracts lowercase alphanumeric runs; both engines use
RE2-compatible syntax so the token streams are identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOKEN_RE = "[a-z0-9]+"
WORD_RE = r"\p{L}[\p{L}\p{N}]*"  # unicode-aware (language-ID, counting)

# Tiny per-language stopword profiles for the rule-based language-ID
# heuristic (reference has no langid; this is the LLM-pipeline op).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "et", "des"],
}


def tokens(col: Column) -> Column:
    """Lowercase alphanumeric tokens (deterministic, oracle-shared)."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0)


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace/regex token counting + a BPE-ish subword estimate
    (≈ chars/4 like common BPE vocabularies average)."""
    t = tokens(F.col(text_col))
    return df.withColumns(
        {
            "n_tokens": F.size(t).cast("bigint"),
            "n_words": F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(WORD_RE), 0)
            ).cast("bigint"),
            "n_chars_m": F.length(text_col).cast("bigint"),
            "approx_bpe_tokens": F.ceil(F.length(text_col) / 4).cast("bigint"),
        }
    )


def add_quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, word shape, punctuation and
    digit ratios, stopword ratio; plus an ``is_quality`` gate in the
    style of Gopher/C4 rules (bounds tuned loosely).

    The tokenization regex is materialized ONCE through a dedicated
    projection (r12, guide §1.2 "per-task work"): inlining ``tokens()``
    into every feature put five copies of ``regexp_extract_all`` into
    one Project, and codegen subexpression elimination does not reach
    inside higher-order-function trees — measured 5× the regex cost
    per row. CollapseProject keeps the split (SPARK-36718: non-cheap
    expressions referenced more than once are not re-inlined), so the
    regex runs once per row and the features read the array column.
    """
    _tok = f"__{text_col}_toks"
    df = df.withColumn(_tok, tokens(F.col(text_col)))
    t = F.col(_tok)
    n_tok = F.size(t)
    text_len = F.length(F.col(text_col))
    punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[\.,;:!\?]"), 0)
    )
    digits = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[0-9]"), 0))
    stop_hits = F.size(
        F.filter(t, lambda w: w.isin(*LANG_PROFILES["en"]))
    )
    avg_tok_len = F.when(
        n_tok > 0,
        F.aggregate(
            F.transform(t, F.length), F.lit(0).cast("bigint"), lambda a, x: a + x
        )
        / n_tok,
    )
    out = df.withColumns(
        {
            "q_n_tokens": n_tok.cast("bigint"),
            "q_avg_token_len": avg_tok_len.cast("double"),
            "q_punct_ratio": (punct / F.greatest(text_len, F.lit(1))).cast("double"),
            "q_digit_ratio": (digits / F.greatest(text_len, F.lit(1))).cast("double"),
            "q_stopword_ratio": (
                stop_hits / F.greatest(n_tok, F.lit(1))
            ).cast("double"),
        }
    )
    return out.withColumn(
        "is_quality",
        (F.col("q_n_tokens") >= 10)
        & (F.col("q_avg_token_len") >= 2.0)
        & (F.col("q_avg_token_len") <= 12.0)
        & (F.col("q_digit_ratio") <= 0.3),
    ).drop(_tok)


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rule-based language ID: score = stopword hits per profile,
    predict the argmax (ties → lexicographic language order, 'und' if
    no hits). Deterministic and SQL-expressible for the oracle."""
    # Tokenize once through a projection boundary (same rationale as
    # add_quality_columns), then materialize each language score as a
    # column and build the argmax chain over the score COLUMNS — the
    # iteratively-built when/greatest chain otherwise embeds O(L²)
    # copies of the filter-over-tokens trees (each carrying its own
    # copy of the tokenization regex).
    _tok = f"__{text_col}_toks"
    out = df.withColumn(_tok, tokens(F.col(text_col)))
    t = F.col(_tok)

    def stopword_hits(sw: list[str]):
        # closure, not default-arg capture (HOF arity introspection)
        return F.size(F.filter(t, lambda w: w.isin(*sw)))

    for lang, sw in LANG_PROFILES.items():
        out = out.withColumn(f"score_{lang}", stopword_hits(sw).cast("bigint"))
    pred = F.lit("und")
    best = F.lit(0).cast("bigint")
    # iterate in reverse-lexicographic order so that on ties the
    # lexicographically FIRST language wins (matches oracle SQL).
    for lang in sorted(LANG_PROFILES, reverse=True):
        s = F.col(f"score_{lang}")
        pred = F.when(
            s >= F.greatest(best, F.lit(1).cast("bigint")), F.lit(lang)
        ).otherwise(pred)
        best = F.greatest(best, s)
    return out.withColumn("pred_lang", pred).drop(_tok)


# Hand-set logistic weights for the quality classifier — the shape of
# a fastText/linear quality model (Brown et al. 2020 §A; CCNet) with
# the feature scale of add_quality_columns. Documented constants, not
# trained: the operator contract is the scoring pipeline, and fixed
# weights keep it deterministic and oracle-checkable.
QUALITY_CLF_WEIGHTS: dict[str, float] = {
    "log_len": 0.25,        # ln(1 + n_tokens): longer docs mildly favored
    "avg_token_len": 0.10,  # prose-like word shape
    "stopword_ratio": 4.0,  # strong natural-language signal
    "punct_ratio": 2.0,     # sentence structure
    "digit_ratio": -6.0,    # tables/logs penalty
}
QUALITY_CLF_BIAS = -2.0


def quality_classifier(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Linear quality classifier: logistic score over the
    ``add_quality_columns`` features with fixed documented weights —
    the distilled-classifier scoring pass every corpus pipeline runs
    (GPT-3's quality LR, CCNet's fastText filter), expressed as pure
    JVM column algebra. Score is rounded to 4 digits so the rendered
    value is engine-stable; ``clf_keep`` thresholds at 0.5.

    Zero shuffle: a map-only expression chain over the feature
    columns, whole-stage codegen end to end.
    """
    q = add_quality_columns(df, text_col)
    w = QUALITY_CLF_WEIGHTS
    z = (
        F.lit(QUALITY_CLF_BIAS)
        + F.lit(w["log_len"]) * F.log(F.lit(1.0) + F.col("q_n_tokens"))
        + F.lit(w["avg_token_len"]) * F.coalesce("q_avg_token_len", F.lit(0.0))
        + F.lit(w["stopword_ratio"]) * F.col("q_stopword_ratio")
        + F.lit(w["punct_ratio"]) * F.col("q_punct_ratio")
        + F.lit(w["digit_ratio"]) * F.col("q_digit_ratio")
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
    return q.withColumn("clf_score", score).withColumn(
        "clf_keep", F.col("clf_score") >= 0.5
    )


def md5_fingerprint(col: Column, prefix_len: int = 16) -> Column:
    """Document fingerprint: first ``prefix_len`` hex chars of md5 over
    the normalized token stream (whitespace/punct-insensitive)."""
    normalized = F.array_join(tokens(col), " ")
    return F.substring(F.md5(normalized.cast("binary")), 1, prefix_len)


def rolling_fingerprint(col: Column, mod: int = (1 << 31) - 1) -> Column:
    """Polynomial rolling hash over the token stream in the 31-bit
    Mersenne field (same Carter-Wegman posture as the MinHash
    permutations): ``acc = (acc * 1000003 + (xxhash64(token) mod p))
    mod p``. Every intermediate stays ≤ 2^51, so the expression is
    ANSI-mode safe (wrapping int64 arithmetic would raise
    ARITHMETIC_OVERFLOW under Spark 4's default ANSI dialect).
    Spark-side only (uses xxhash64); oracle-checked via the md5 variant.
    """
    p = F.lit(mod).cast("long")
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, tok: F.pmod(
            acc * F.lit(1000003).cast("long") + F.pmod(F.xxhash64(tok), p), p
        ),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic keyword /
    topic-signal extraction (Salton & Buckley 1988) with sklearn's
    smoothed idf: ``tf × (ln((1+N)/(1+df)) + 1)``, where N counts
    documents that produced at least one token. The score is rounded
    to 4 digits and ties rank lexicographically so the top-k set is
    engine-stable.

    Scale shape: term frequencies and document frequencies are two
    map-side-combined aggregations off one explode; N arrives as a
    broadcast 1-row cross-join (never a driver collect); the top-k
    filter is a per-document window (WindowGroupLimit pushdown) —
    no global sort, no all-terms materialization per task.
    """
    tok = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    docfreq = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_t")
    )
    n_docs = tok.agg(
        F.count_distinct(F.col(id_col)).cast("bigint").alias("n_docs")
    )
    scored = (
        tok.join(docfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf4",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("n_docs"))
                        / (F.lit(1.0) + F.col("df_t"))
                    )
                    + F.lit(1.0)
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf4"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term_rank", "token", "tf", "tfidf4")
    )


def normalize_unicode(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode NFC canonicalization — the first text-pipeline pass:
    composed and decomposed forms of the same glyph ('é' vs
    'e'+U+0301) hash differently, so every dedup/fingerprint stage
    upstream of normalization silently misses duplicates. Emits
    ``text_nfc`` plus a ``was_denormalized`` audit flag.

    Spark has no built-in NFC (DuckDB does: ``nfc_normalize``), so
    this is one of the engine's few Python surfaces — an
    Arrow-batched pandas UDF over ``unicodedata.normalize``, the
    same vectorized-batch posture as the MinHash signature UDF;
    per-row Python never appears.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t)
            if t is not None
            else None
        )

    out = df.withColumn("text_nfc", nfc(F.col(text_col)))
    return out.withColumn(
        "was_denormalized", F.col(text_col) != F.col("text_nfc")
    )


def bigram_lm_scores(
    df: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram language-model scoring — the perplexity-style quality
    filter (CCNet trains a LM on a clean corpus and drops
    high-perplexity docs; here the corpus scores itself, which ranks
    documents by how typical their word transitions are). Add-α
    smoothing: ``P(w2|w1) = (c(w1,w2)+α) / (c(w1)+α·V)`` with
    ``c(w1) = Σ_w2 c(w1,w2)`` so probabilities sum to 1. Output per
    document: bigram count and the mean log-probability (higher =
    more typical; ``exp(-avg_logp)`` is the perplexity).

    Determinism: each bigram's log-prob is rounded per-row to 6
    digits, then averaged through the decimal bridge — the mean is
    associative and engine-exact, like every float aggregate here.

    Scale shape: counts are two map-combined aggregations off one
    explode; the vocabulary size arrives as a broadcast 1-row
    cross-join; scoring is two equi-joins on the bigram/unigram keys
    (the count tables are vocabulary-sized — broadcastable for any
    real vocabulary) and one final per-doc aggregation.
    """
    from ..functions.deterministic import dsum

    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__t")).filter(
        F.size("__t") >= 2
    )
    pairs = F.expr(
        "transform(sequence(1, size(__t) - 1), "
        "i -> struct(__t[i - 1] as w1, __t[i] as w2))"
    )
    # The instance stream feeds BOTH the model (c2/c1/vocab) and the
    # scoring join below; un-materialized, each consumer re-runs the
    # tokenize+explode pass over the corpus. One eager barrier = one
    # tokenize pass (measured 2.9 s -> 2.1 s at sf0.1); the stored
    # rows are (id, w1, w2) — the same order of bytes the count
    # shuffle would otherwise re-read, MEMORY_AND_DISK so it spills.
    inst = base.select(id_col, F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    ).localCheckpoint(eager=True)
    c2 = inst.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    # Vocabulary from the bigram table, not a third corpus pass: every
    # token of a >=2-token doc appears as a w1 (positions 0..L-2) or a
    # w2 (positions 1..L-1), so distinct(w1) U distinct(w2) over c2 IS
    # the distinct-token set of `base` — count it over the
    # vocabulary-sized aggregate instead of re-tokenizing the corpus.
    vocab = c2.select(
        F.explode(F.array("w1", "w2")).alias("u")
    ).agg(F.count_distinct("u").alias("v"))
    a = F.lit(float(alpha))
    # collapse the model to ONE vocabulary-sized table of per-bigram
    # log-probs (c1 and V fold in before the instance join): the
    # instance stream then makes a single join against it instead of
    # a chain of three instance-sized joins. Join strategy is left to
    # AQE — at bench scale the aggregate's runtime size selects a
    # broadcast (map-side, no instance shuffle); at 100 TB a bigram
    # vocabulary can exceed any broadcast budget and AQE falls back
    # to a shuffled join, which a forced broadcast hint would break
    logp_table = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("n2") + a) / (F.col("n1") + a * F.col("v"))), 6
            ).alias("__logp"),
        )
    )
    scored = inst.join(logp_table, ["w1", "w2"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(dsum(F.col("__logp")) / F.count(F.lit(1)), 4).alias(
            "avg_logp"
        ),
    )


def vocab_kl_divergence(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary drift between two corpus snapshots: symmetric
    KL divergence over Laplace-smoothed token unigram distributions
    (the token-level counterpart of the numeric drift detectors —
    what shifts when a new source enters the mix or a filter changes
    the register of the text). One row: token totals, union
    vocabulary size, both KL directions and their mean (Jeffreys
    divergence / 2), each rounded to 4 digits.

    Scale shape: one token-granular count per side, a full-outer
    vocabulary join, decimal-bridged term sums — vocabulary-sized
    after the first aggregation, never corpus-sized.
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(F.col(text_col))).alias("t"))
            .groupBy("t")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    j = (
        counts(old, "ca")
        .join(counts(new, "cb"), "t", "full_outer")
        .select(
            "t",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    tot = j.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    w = j.crossJoin(F.broadcast(tot))
    half = F.lit(0.5)
    pa = (F.col("ca") + half) / (F.col("na") + half * F.col("v"))
    pb = (F.col("cb") + half) / (F.col("nb") + half * F.col("v"))
    kl_ab = F.sum(F.round(pa * F.log(pa / pb), 8).cast("decimal(18,8)"))
    kl_ba = F.sum(F.round(pb * F.log(pb / pa), 8).cast("decimal(18,8)"))
    return w.agg(
        F.max("na").cast("bigint").alias("n_tokens_old"),
        F.max("nb").cast("bigint").alias("n_tokens_new"),
        F.max("v").cast("bigint").alias("vocab_union"),
        F.round(kl_ab.cast("double"), 4).alias("kl_old_new"),
        F.round(kl_ba.cast("double"), 4).alias("kl_new_old"),
        F.round(
            ((kl_ab + kl_ba) / F.lit(2)).cast("double"), 4
        ).alias("jeffreys_half"),
    )


# PII patterns, shared verbatim with the DuckDB oracles: the subset of
# regex syntax with identical semantics in Java (Spark) and RE2
# (DuckDB) — char classes, bounded repeats, \b, \d, alternation-free.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{3}-\d{4}"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction — the pre-training scrub every corpus pipeline
    runs: emails → ``<EMAIL>``, phone numbers → ``<PHONE>``, IPv4
    addresses → ``<IP>``, with per-document match counts kept for
    audit. Order matters (emails before IPs would otherwise leave a
    dotted remainder ambiguous): phone → email → ip.

    Scale shape: pure per-row regexp_replace/extract_all chains —
    JVM-side, whole-stage codegen, ZERO shuffle at any corpus size.
    """
    c = F.col(text_col)
    out = df.withColumns(
        {
            "pii_n_emails": F.size(
                F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0)
            ).cast("bigint"),
            "pii_n_phones": F.size(
                F.regexp_extract_all(c, F.lit(PII_PHONE_RE), 0)
            ).cast("bigint"),
            "pii_n_ips": F.size(
                F.regexp_extract_all(c, F.lit(PII_IPV4_RE), 0)
            ).cast("bigint"),
        }
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_PHONE_RE, "<PHONE>"),
            PII_EMAIL_RE,
            "<EMAIL>",
        ),
        PII_IPV4_RE,
        "<IP>",
    )
    return out.withColumn("text_scrubbed", scrubbed)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signal: the fraction of a document's
    2-grams taken by its single most-frequent 2-gram (high → boiler-
    plate/spam; the "top n-gram fraction" rule of Rae et al. 2021).

    Returns (id, n_bigrams, top_bigram_n, top_bigram_ratio) for docs
    with ≥1 bigram. Ratio is an exact int/int double division — no
    rounding needed for cross-engine hashing.

    Scale shape: explode → two-level aggregation, both with map-side
    partial aggregation on (id, gram) then (id); one shuffle pair,
    no windows, no skew risk beyond a single pathological document
    (bounded by its own length).
    """
    toks = tokens(F.col(text_col))
    grams = F.expr(
        f"transform(sequence(1, size(__toks) - 1), "
        f"i -> concat(__toks[i - 1], ' ', __toks[i]))"
    )
    per_gram = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= 2)
        .select(id_col, F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("n"))
    )
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum("n").cast("bigint").alias("n_bigrams"),
            F.max("n").cast("bigint").alias("top_bigram_n"),
        )
        .withColumn(
            "top_bigram_ratio",
            (F.col("top_bigram_n").cast("double") / F.col("n_bigrams")),
        )
    )
