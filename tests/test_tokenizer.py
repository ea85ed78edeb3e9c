"""Tokenizer training: vocabulary table, BPE merge learning, application."""

from __future__ import annotations

import pytest

from vector_db_api_spark.operators import tokenizer as TK


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "low low low low low"),
            (2, "lower lower newest newest"),
            (3, "newest newest newest widest"),
        ],
        "doc_id bigint, text string",
    )


def test_vocabulary_ranks_and_coverage(docs):
    rows = {r["token"]: r for r in TK.corpus_vocabulary(docs).collect()}
    # counts: low 5, newest 5, lower 2, widest 1 -> total 13
    assert rows["low"]["count"] == 5 and rows["newest"]["count"] == 5
    # rank ties break by token asc: low before newest
    assert rows["low"]["rank"] == 1 and rows["newest"]["rank"] == 2
    assert rows["low"]["cum_coverage"] == pytest.approx(5 / 13)
    assert rows["widest"]["cum_coverage"] == pytest.approx(1.0)


def test_bpe_merges_classic_example(docs):
    """The Sennrich toy corpus: frequent word-final patterns merge first."""
    merges = TK.learn_bpe_merges(docs, n_merges=8, allow_unbounded=True)
    assert len(merges) == 8
    # 'lo' appears in low(5)+lower(2)=7 words; it must merge before any
    # pattern unique to 'newest' (count 5)
    assert merges.index(("l", "o")) < len(merges)
    first_counts_ok = merges[0] in {("l", "o"), ("e", "s"), ("s", "t"), ("n", "e"), ("w", "e")}
    assert first_counts_ok
    # determinism
    assert merges == TK.learn_bpe_merges(docs, n_merges=8, allow_unbounded=True)


def test_vocabulary_min_count_coverage_denominator(docs):
    # min_count filters the VOCAB but not the coverage denominator: the
    # retained tokens (low 5, newest 5, lower 2) cover 12 of 13 total
    # occurrences — widest's occurrence still counts in the denominator
    rows = {r["token"]: r for r in TK.corpus_vocabulary(docs, min_count=2).collect()}
    assert "widest" not in rows
    assert rows["lower"]["cum_coverage"] == pytest.approx(12 / 13)


def test_bpe_merges_max_words_bounds_the_collect(docs):
    # the full table here is 4 words; a cap >= 4 is exact, and a tight cap
    # still learns the merges supported by the surviving words
    assert TK.learn_bpe_merges(docs, n_merges=8, max_words=100) == \
        TK.learn_bpe_merges(docs, n_merges=8, allow_unbounded=True)
    # a tight cap behaves exactly as if the corpus held only the top words
    # (low 5, newest 5 — the count-desc, word-asc head of the table)
    top2 = TK.learn_bpe_merges(docs, n_merges=4, max_words=2)
    survivors = docs.sparkSession.createDataFrame(
        [(1, "low low low low low"), (2, "newest newest newest newest newest")],
        "doc_id bigint, text string",
    )
    assert top2 == TK.learn_bpe_merges(survivors, n_merges=4, allow_unbounded=True)


def test_apply_bpe_roundtrip(docs):
    merges = TK.learn_bpe_merges(docs, n_merges=30, allow_unbounded=True)
    out = {r["doc_id"]: r for r in TK.apply_bpe(docs, merges).collect()}
    # with enough merges every whole word becomes a single token (+</w>)
    toks1 = out[1]["bpe_tokens"]
    assert toks1 == ["low</w>"] * 5
    assert out[1]["n_bpe"] == 5
    # concatenating tokens reconstructs the normalized text
    joined = "".join(out[2]["bpe_tokens"]).replace("</w>", " ").strip()
    assert joined == "lower lower newest newest"


def test_apply_bpe_no_merges_is_chars(spark):
    docs = spark.createDataFrame([(1, "ab")], "doc_id bigint, text string")
    out = TK.apply_bpe(docs, []).collect()[0]
    assert out["bpe_tokens"] == ["a", "b", "</w>"]


def test_bpe_merge_loop_matches_reference_implementation(docs):
    """Differential: the vocab-table merge loop vs a direct per-corpus
    re-implementation (count pairs over every word occurrence)."""
    texts = [r["text"] for r in docs.collect()]
    words = [w for t in texts for w in t.split()]
    vocab: dict[tuple, int] = {}
    for w in words:
        key = tuple(list(w) + ["</w>"])
        vocab[key] = vocab.get(key, 0) + 1
    merges_ref = []
    for _ in range(8):
        pairs: dict[tuple, int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        pair, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges_ref.append(pair)
        nv = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                    out.append(pair[0] + pair[1]); i += 2
                else:
                    out.append(sym[i]); i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    assert TK.learn_bpe_merges(docs, n_merges=8, allow_unbounded=True) == merges_ref


def test_bpe_requires_vocab_cap(spark):
    """VERDICT r5 #6: uncapped BPE training collects the whole distinct-word
    table to the driver — refuse unless max_words is set or the caller
    explicitly opts out (allow_unbounded=True, the allow_full_cross
    contract)."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_words"):
        TK.learn_bpe_merges(docs, n_merges=2)
