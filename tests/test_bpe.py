"""BPE tokenizer: training vs an in-memory reference, apply known
answers, GPT-2-apply ≡ rank-sequential-apply equivalence on corpus
text, and the distributed encode's conservation invariants."""

from __future__ import annotations

import re

from flink_tpcds_spark.datapipe.curate import (
    bpe_apply_word,
    bpe_encode,
    bpe_train,
)
from flink_tpcds_spark.datapipe.text import TOKEN_RE
from flink_tpcds_spark.queries.datapipe import _BPE_MERGES
from flink_tpcds_spark.schemas import load_table

_RANKS = {p: r for r, p in enumerate(_BPE_MERGES)}


def _apply_rank_sequential(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Independent reference: apply merges one by one in rank order
    (Sennrich subword-nmt semantics)."""
    parts = list(word)
    for x, y in merges:
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


def test_apply_known_answers():
    assert bpe_apply_word("the", _RANKS) == ["the"]
    assert bpe_apply_word("and", _RANKS) == ["and"]
    # t-h wins first, then th-e; trailing n stays
    assert bpe_apply_word("then", _RANKS) == ["the", "n"]
    # i-n (rank 3) beats a-n (rank 4) for the shared n: "ain" → a, in
    assert bpe_apply_word("ain", _RANKS) == ["a", "in"]
    # no applicable merge
    assert bpe_apply_word("xyz", _RANKS) == ["x", "y", "z"]
    assert bpe_apply_word("a", _RANKS) == ["a"]


def test_apply_equivalence_on_corpus(spark, sf_dir):
    """GPT-2-style lowest-rank-first apply must equal rank-sequential
    apply for the training-ordered table — the property the DuckDB
    replace-chain oracle of dp_bpe_encode relies on."""
    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .limit(60)
        .collect()
    ]
    word_re = re.compile(TOKEN_RE)
    words = {w for t in texts for w in word_re.findall(t.lower())}
    assert len(words) > 20  # sf0.001 sample vocabulary is small
    for w in sorted(words):
        got = bpe_apply_word(w, _RANKS)
        ref = _apply_rank_sequential(w, _BPE_MERGES)
        assert got == ref, (w, got, ref)
        assert "".join(got) == w  # lossless


def test_train_planted_corpus(spark):
    df = spark.createDataFrame(
        [(0, "aa aa aa"), (1, "ab ab")], "doc_id long, text string"
    )
    assert bpe_train(df, 2) == [("a", "a"), ("a", "b")]


def test_train_matches_reference(spark, sf_dir):
    """Distributed word-count + local merge loop must equal a pure
    in-memory reference trainer over the same corpus."""
    docs = load_table(spark, sf_dir, "documents").limit(40)
    texts = [r["text"] for r in docs.select("text").collect()]
    word_re = re.compile(TOKEN_RE)
    freq: dict[str, int] = {}
    for t in texts:
        for w in word_re.findall(t.lower()):
            freq[w] = freq.get(w, 0) + 1

    def ref_train(n_merges: int) -> list[tuple[str, str]]:
        vocab = {
            tuple(w): n for w, n in freq.items() if len(w) >= 2
        }
        merges = []
        for _ in range(n_merges):
            pc: dict[tuple[str, str], int] = {}
            for parts, n in vocab.items():
                for i in range(len(parts) - 1):
                    p = (parts[i], parts[i + 1])
                    pc[p] = pc.get(p, 0) + n
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            x, y = best
            nv: dict[tuple[str, ...], int] = {}
            for parts, n in vocab.items():
                out, i = [], 0
                while i < len(parts):
                    if (
                        i < len(parts) - 1
                        and parts[i] == x
                        and parts[i + 1] == y
                    ):
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(parts[i])
                        i += 1
                nv[tuple(out)] = nv.get(tuple(out), 0) + n
            vocab = nv
        return merges

    assert bpe_train(docs, 12) == ref_train(12)


def test_tokenize_sequences(spark, sf_dir):
    from flink_tpcds_spark.datapipe.curate import bpe_tokenize

    d = load_table(spark, sf_dir, "documents").limit(25)
    word_re = re.compile(TOKEN_RE)
    got = {r["doc_id"]: list(r["tokens"]) for r in bpe_tokenize(d, _BPE_MERGES).collect()}
    for r in d.select("doc_id", "text").collect():
        exp: list[str] = []
        for w in word_re.findall(r["text"].lower()):
            exp.extend(bpe_apply_word(w, _RANKS))
        assert got[r["doc_id"]] == exp
        # lossless: concatenation reproduces the word stream
        assert "".join(exp) == "".join(word_re.findall(r["text"].lower()))


def test_bpe_pack_single_exchange(spark, sf_dir):
    """tokenize → pack must shuffle exactly once (the packer's window
    on the shard key); keep_cols pass-through means no re-join of
    counts against the input."""
    import re as _re

    from flink_tpcds_spark.datapipe.curate import bpe_encode, pack_rows

    d = load_table(spark, sf_dir, "documents")
    counts = bpe_encode(d, _BPE_MERGES, keep_cols=["source"])
    packed = pack_rows(counts, budget=256)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert len(_re.findall(r"Exchange", plan)) == 1, plan
    # and the pass-through is value-correct
    src = {
        r["doc_id"]: r["source"]
        for r in d.select("doc_id", "source").collect()
    }
    for r in packed.select("doc_id", "source").collect():
        assert src[r["doc_id"]] == r["source"]


def test_encode_conservation(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    rows = bpe_encode(d, _BPE_MERGES).collect()
    assert len(rows) == d.count()
    word_re = re.compile(TOKEN_RE)
    by_id = {r["doc_id"]: r for r in rows}
    for r in d.select("doc_id", "text").limit(30).collect():
        words = word_re.findall(r["text"].lower())
        exp_tokens = sum(len(bpe_apply_word(w, _RANKS)) for w in words)
        got = by_id[r["doc_id"]]
        assert got["n_words"] == len(words)
        assert got["n_chars"] == sum(len(w) for w in words)
        assert got["n_tokens"] == exp_tokens
        # merges strictly compress where any pattern is present
        assert got["n_tokens"] <= got["n_chars"]
        assert got["n_tokens"] >= got["n_words"]
